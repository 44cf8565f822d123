"""Space-to-depth layout counter-experiment for the conv-stack roofline.

VERDICT r3 item 6: `roofline_bytes.py` brackets the B=128 train step
between a packed floor (3.9 ms) and a lane-padded bound (75 ms); the
measured 11.95 ms sits at 3.1× packed, and the per-layer padded ranking
puts ~73% of the padding waste in three 32×32 boundary layers with 1-3
channels (enc.coord_concat 524 KB/frame, enc.conv1 328, dec.deconv3 328
— every other layer has ≥8 channels). This bench tests whether that
headroom is reachable by an EXACT-equivalence layout change:

- **s2d encoder entry**: space-to-depth(2) the [N,32,32,1] input to
  [N,16,16,4] (4 lanes instead of 1), fold the CoordConv coordinate
  channels into a precomputed [16,16,C1] bias map (they are constant
  maps, so their conv contribution is input-independent), and run conv1
  as a k3 s1 conv on the s2d grid with weights rearranged from the
  shipped k3 s2 kernel. The [N,32,32,3] concat tensor never exists.
- **phase-space decoder exit**: the last deconv ([N,16,16,16] →
  [N,32,32,1], k4 s2 p1) becomes a k3 s1 conv producing the four
  depth-to-space phases [N,16,16,4]; tanh and the Gaussian NLL are
  elementwise/permutation-invariant, so the loss can be computed against
  s2d'd targets and the [N,32,32,1] tensor never exists either.

Both transforms are bit-exact re-expressions of the same math on the
same shipped parameters (asserted here before timing). If the A/B moves
the B=128 conv time materially, the layout ceiling is real and the knob
is worth productizing; if not, XLA's layout assignment was already
recovering the padding and the roofline section's 3.1× residual needs a
different explanation.

Run (TPU): python benchmarks/bench_s2d.py [--frames 3840] [--dtype bfloat16]
CPU check: python benchmarks/bench_s2d.py --check-only
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_mtrssm_tpu.nn.conv import (  # noqa: E402
    DecoderConfig,
    EncoderConfig,
    activation,
    conv_apply,
    coord_channels,
    decoder_apply,
    decoder_init,
    dense_apply,
    encoder_apply,
    encoder_init,
    residual_block_apply,
)


def space_to_depth(x: jax.Array, r: int = 2) -> jax.Array:
    """[N, H, W, C] → [N, H/r, W/r, C·r²]; channel index = (cy·r + cx)·C + c."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // r, w // r, r * r * c)


def depth_to_space(x: jax.Array, r: int = 2) -> jax.Array:
    """Inverse of :func:`space_to_depth`."""
    n, h, w, rc = x.shape
    c = rc // (r * r)
    x = x.reshape(n, h, w, r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * r, w * r, c)


def _conv1_s2d_weights(w: jax.Array) -> jax.Array:
    """Rearrange the shipped conv1 kernel (k3 s2 p1 on [32,32,1+coords])
    into a k3 s1 kernel over the s2d(2) grid's 4 image channels.

    Output pixel (i,j) of the shipped conv reads input rows 2i+di,
    di∈{-1,0,1}; on the s2d grid row 2p+cy that is (p−i, cy) ∈
    {(−1,1), (0,0), (0,1)} — taps fit in dy∈{−1,0} of a k3 window, with
    the (dy=−1, cy=0) and every dy=+1 tap zero. Only the image channel
    (index 0) of the shipped kernel is used; the coordinate channels are
    folded into a bias map by the caller.
    """
    k, _, _, out_ch = w.shape
    assert k == 3
    wp = jnp.zeros((3, 3, 4, out_ch), w.dtype)
    for cy in range(2):
        for cx in range(2):
            c = cy * 2 + cx
            for dy in (-1, 0, 1):
                di = 2 * dy + cy
                if not -1 <= di <= 1:
                    continue
                for dx in (-1, 0, 1):
                    dj = 2 * dx + cx
                    if not -1 <= dj <= 1:
                        continue
                    wp = wp.at[dy + 1, dx + 1, c].set(w[di + 1, dj + 1, 0])
    return wp


def _deconv3_phase_weights(w: jax.Array) -> jax.Array:
    """Rearrange the last deconv kernel (k4 s2 p1, HWIO [4,4,16,1]) into a
    k3 s1 conv producing the 4 depth-to-space phases.

    torch semantics: out(2i+r, 2j+c) = Σ_n in(n,·)·K(2i+r+1−2n, ·), so
    phase (r,c) reads taps n−i = dy with ky = r+1−2dy ∈ [0,4) — dy∈{−1,0}
    for r=0 and dy∈{0,1} for r=1 — all within a k3 window.
    """
    k, _, in_ch, out_ch = w.shape
    assert k == 4 and out_ch == 1
    # conv_transpose_apply(x, w) == Σ_n x(n)·w[y−2n+1] with the STORED
    # (unflipped) HWIO kernel — the index math below uses w directly.
    wp = jnp.zeros((3, 3, in_ch, 4), w.dtype)
    for r in range(2):
        for c in range(2):
            ph = r * 2 + c
            for dy in (-1, 0, 1):
                ky = r + 1 - 2 * dy
                if not 0 <= ky < 4:
                    continue
                for dx in (-1, 0, 1):
                    kx = c + 1 - 2 * dx
                    if not 0 <= kx < 4:
                        continue
                    wp = wp.at[dy + 1, dx + 1, :, ph].set(w[ky, kx, :, 0])
    return wp


def encoder_apply_s2d(params, cfg: EncoderConfig, xs: jax.Array) -> jax.Array:
    """`encoder_apply` on a space-to-depth input ([N,16,16,4] for the
    default 32×32×1 config) — same params, same math, no 32×32 tensors."""
    act = activation(cfg.activation_name)
    w1 = params["convs"][0]["w"].astype(xs.dtype)
    b1 = params["convs"][0]["b"].astype(xs.dtype)
    # Constant CoordConv contribution of conv1 as a [16,16,C1] bias map.
    h, w = cfg.in_hw
    coords = coord_channels(1, h, w, xs.dtype)
    coord_map = jax.lax.conv_general_dilated(
        coords, w1[:, :, 1:], window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        xs, _conv1_s2d_weights(w1), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = act(x + coord_map + b1)
    for conv, s, p in zip(params["convs"][1:], cfg.strides[1:], cfg.paddings[1:]):
        x = act(conv_apply(conv, x, stride=s, padding=p))
    if "res_proj" in params:
        x = act(conv_apply(params["res_proj"], x, stride=1, padding=0))
    for block in params.get("res_blocks", []):
        x = residual_block_apply(block, x, act)
    x = x.reshape((x.shape[0], -1))
    linears = params["linears"]
    for i, lin in enumerate(linears):
        x = dense_apply(lin, x)
        if i < len(linears) - 1:
            x = act(x)
    return activation(cfg.out_activation_name)(x)


def decoder_apply_s2d(params, cfg: DecoderConfig, f: jax.Array) -> jax.Array:
    """`decoder_apply` emitting the four d2s phases [N,16,16,4] instead of
    [N,32,32,1]; `depth_to_space` of the result equals the shipped output."""
    act = activation(cfg.activation_name)
    x = f
    for lin in params["linears"]:
        x = act(dense_apply(lin, x))
    c, h, w = cfg.conv_in_shape
    x = x.reshape((-1, c, h, w)).transpose(0, 2, 3, 1)
    if "res_proj" in params:
        x = act(conv_apply(params["res_proj"], x, stride=1, padding=0))
    for block in params.get("res_blocks", []):
        x = residual_block_apply(block, x, act)
    from multimodal_mtrssm_tpu.nn.conv import conv_transpose_apply
    deconvs = params["deconvs"]
    for i in range(len(deconvs) - 1):
        x = act(conv_transpose_apply(
            deconvs[i], x, stride=cfg.strides[i], padding=cfg.paddings[i],
            output_padding=cfg.output_paddings[i]))
    last = deconvs[-1]
    x = jax.lax.conv_general_dilated(
        x, _deconv3_phase_weights(last["w"]).astype(x.dtype),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + last["b"].astype(x.dtype)[0]
    return activation(cfg.out_activation_name)(x)


def _k3s2_to_k2s1(w: jax.Array) -> jax.Array:
    """Rearrange a k3 s2 p1 kernel ([3,3,C,C']) into a k2 s1 kernel
    ([2,2,4C,C'], padding ((1,0),(1,0))) over the s2d(2) input grid.

    Output pixel (i,j) of the shipped conv reads natural rows 2i+dy,
    dy∈{−1,0,1}; natural row 2(i−1+cy)+py (s2d cell tap cy∈{0,1}, phase
    py∈{0,1}) gives dy = 2cy+py−2 — (cy,py)=(0,0) falls outside the k3
    window and stays zero, the other three map 1:1. The contracting dim
    becomes 2·2·4C (e.g. 128 exactly for C=8) instead of 3·3·C padded to
    a lane tile."""
    k, _, cin, cout = w.shape
    assert k == 3
    wp = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    for cy in range(2):
        for py in range(2):
            dy = 2 * cy + py - 2
            if not -1 <= dy <= 1:
                continue
            for cx in range(2):
                for px in range(2):
                    dx = 2 * cx + px - 2
                    if not -1 <= dx <= 1:
                        continue
                    ch = (py * 2 + px) * cin
                    wp = wp.at[cy, cx, ch:ch + cin].set(w[dy + 1, dx + 1])
    return wp


def _deconv_phase_weights(w: jax.Array) -> jax.Array:
    """Generalize :func:`_deconv3_phase_weights` to any out_ch: a k4 s2 p1
    deconv kernel ([4,4,C,C']) becomes a k3 s1 conv kernel ([3,3,C,4C'])
    whose output's ``depth_to_space`` equals the deconv output."""
    k, _, cin, cout = w.shape
    assert k == 4
    wp = jnp.zeros((3, 3, cin, 4 * cout), w.dtype)
    for r in range(2):
        for c in range(2):
            ph = (r * 2 + c) * cout
            for dy in (-1, 0, 1):
                ky = r + 1 - 2 * dy
                if not 0 <= ky < 4:
                    continue
                for dx in (-1, 0, 1):
                    kx = c + 1 - 2 * dx
                    if not 0 <= kx < 4:
                        continue
                    wp = wp.at[dy + 1, dx + 1, :, ph:ph + cout].set(w[ky, kx])
    return wp


def encoder_apply_s2d_chain(params, cfg: EncoderConfig, xs: jax.Array) -> jax.Array:
    """Chained-s2d encoder: every mid-stack conv also runs on an s2d(2)
    input grid (k2 s1 via :func:`_k3s2_to_k2s1`), so conv2 reads 32 lanes
    instead of 8 and conv3 reads 64 instead of 16 — attacking the
    mid-stack padding residual the boundary-only variant left on the
    table (BASELINE.md roofline re-read). Same params, same math."""
    act = activation(cfg.activation_name)
    w1 = params["convs"][0]["w"].astype(xs.dtype)
    b1 = params["convs"][0]["b"].astype(xs.dtype)
    h, w = cfg.in_hw
    coords = coord_channels(1, h, w, xs.dtype)
    coord_map = jax.lax.conv_general_dilated(
        coords, w1[:, :, 1:], window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        xs, _conv1_s2d_weights(w1), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = act(x + coord_map + b1)
    for conv in params["convs"][1:]:
        wk = _k3s2_to_k2s1(conv["w"].astype(x.dtype))
        x = jax.lax.conv_general_dilated(
            space_to_depth(x), wk, window_strides=(1, 1),
            padding=((1, 0), (1, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = act(x + conv["b"].astype(x.dtype))
    if "res_proj" in params:
        x = act(conv_apply(params["res_proj"], x, stride=1, padding=0))
    for block in params.get("res_blocks", []):
        x = residual_block_apply(block, x, act)
    x = x.reshape((x.shape[0], -1))
    linears = params["linears"]
    for i, lin in enumerate(linears):
        x = dense_apply(lin, x)
        if i < len(linears) - 1:
            x = act(x)
    return activation(cfg.out_activation_name)(x)


def decoder_apply_phase_chain(params, cfg: DecoderConfig, f: jax.Array) -> jax.Array:
    """All-phase decoder: EVERY deconv runs as a k3 s1 phase conv
    (:func:`_deconv_phase_weights`) + ``depth_to_space`` — no
    input-dilated transposed convs anywhere, fuller output lanes
    (deconv1 writes 128 phase channels instead of 32). Returns the s2d
    form of the final frame (``depth_to_space`` of it equals
    ``decoder_apply``)."""
    act = activation(cfg.activation_name)
    x = f
    for lin in params["linears"]:
        x = act(dense_apply(lin, x))
    c, h, w = cfg.conv_in_shape
    x = x.reshape((-1, c, h, w)).transpose(0, 2, 3, 1)
    if "res_proj" in params:
        x = act(conv_apply(params["res_proj"], x, stride=1, padding=0))
    for block in params.get("res_blocks", []):
        x = residual_block_apply(block, x, act)
    deconvs = params["deconvs"]
    for i, dk in enumerate(deconvs):
        wp = _deconv_phase_weights(dk["w"]).astype(x.dtype)
        x = jax.lax.conv_general_dilated(
            x, wp, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # Phase-major channel blocks ⇒ the deconv bias tiles 4×.
        x = x + jnp.tile(dk["b"].astype(x.dtype).reshape(-1), 4)
        if i < len(deconvs) - 1:
            x = act(depth_to_space(x))
    return activation(cfg.out_activation_name)(x)


def _time_chained(run, ins, k, reps=5, warmup=2) -> float:
    out = None
    for _ in range(warmup):
        out = run(*ins)
    float(out[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(*ins)
        float(out[0])
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3 / k


def main() -> None:
    """Equivalence check + chained fwd/bwd A/B of base vs s2d conv stacks."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=3840, help="B*T conv batch")
    ap.add_argument("--dtype", choices=("float32", "bfloat16"), default="bfloat16")
    ap.add_argument("--k", type=int, default=16, help="chained reps per window")
    ap.add_argument("--check-only", action="store_true")
    args = ap.parse_args()
    if args.check_only:
        # Exactness only — never claim the (single-tenant) chip for it.
        jax.config.update("jax_platforms", "cpu")
    from multimodal_mtrssm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    ecfg = EncoderConfig()
    dcfg = DecoderConfig(in_features=48)
    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 4)
    eparams = encoder_init(k0, ecfg)
    dparams = decoder_init(k1, dcfg)

    # --- equivalence on a small batch (f32 for a tight tolerance) ---
    x = jax.random.normal(k2, (32, 32, 32, 1), jnp.float32)
    feats = jax.random.normal(k3, (32, 48), jnp.float32)
    e_base = encoder_apply(eparams, ecfg, x)
    e_s2d = encoder_apply_s2d(eparams, ecfg, space_to_depth(x))
    enc_gap = float(jnp.max(jnp.abs(e_base - e_s2d)))
    d_base = decoder_apply(dparams, dcfg, feats)
    d_s2d = depth_to_space(decoder_apply_s2d(dparams, dcfg, feats))
    dec_gap = float(jnp.max(jnp.abs(d_base - d_s2d)))
    e_chain = encoder_apply_s2d_chain(eparams, ecfg, space_to_depth(x))
    enc_chain_gap = float(jnp.max(jnp.abs(e_base - e_chain)))
    d_chain = depth_to_space(decoder_apply_phase_chain(dparams, dcfg, feats))
    dec_chain_gap = float(jnp.max(jnp.abs(d_base - d_chain)))
    print(json.dumps({"enc_max_abs_gap": enc_gap, "dec_max_abs_gap": dec_gap,
                      "enc_chain_max_abs_gap": enc_chain_gap,
                      "dec_chain_max_abs_gap": dec_chain_gap}), flush=True)
    assert enc_gap < 1e-5 and dec_gap < 1e-5, "s2d re-expression is not exact"
    assert enc_chain_gap < 1e-5 and dec_chain_gap < 1e-5, \
        "chained s2d re-expression is not exact"
    if args.check_only:
        return

    # --- timing: fwd+bwd of each stack, K chained reps per fence ---
    dt = jnp.float32 if args.dtype == "float32" else jnp.bfloat16
    n = args.frames
    kx, kf, kt = jax.random.split(jax.random.PRNGKey(1), 3)
    big_x = jax.random.normal(kx, (n, 32, 32, 1), dt)
    big_xs = space_to_depth(big_x)
    big_f = jax.random.normal(kf, (n, 48), dt)
    big_t = jax.random.normal(kt, (n, 32, 32, 1), dt)
    big_ts = space_to_depth(big_t)

    def chain(loss_fn, x0):
        grad = jax.grad(loss_fn)

        def run(xv):
            def body(s, _):
                # s-dependent no-op keeps reps sequenced without folding.
                g = grad(xv + (s * 1e-30).astype(dt))
                return jnp.sum(g).astype(jnp.float32), None
            s, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.k)
            return (s,)
        return jax.jit(run), (x0,)

    variants = {
        "enc_base": chain(lambda v: jnp.sum(encoder_apply(eparams, ecfg, v)
                                            .astype(jnp.float32)), big_x),
        "enc_s2d": chain(lambda v: jnp.sum(encoder_apply_s2d(eparams, ecfg, v)
                                           .astype(jnp.float32)), big_xs),
        # Differentiate w.r.t. the FEATURES (targets fixed) so the full
        # decoder backward is live — grad-w.r.t.-target would let XLA DCE it.
        "dec_base": chain(lambda v: jnp.sum(
            ((decoder_apply(dparams, dcfg, v) - big_t) ** 2)
            .astype(jnp.float32)), big_f),
        "dec_s2d": chain(lambda v: jnp.sum(
            ((decoder_apply_s2d(dparams, dcfg, v) - big_ts) ** 2)
            .astype(jnp.float32)), big_f),
        "enc_chain": chain(lambda v: jnp.sum(
            encoder_apply_s2d_chain(eparams, ecfg, v)
            .astype(jnp.float32)), big_xs),
        "dec_chain": chain(lambda v: jnp.sum(
            ((decoder_apply_phase_chain(dparams, dcfg, v) - big_ts) ** 2)
            .astype(jnp.float32)), big_f),
    }
    row = {"frames": n, "dtype": args.dtype, "k": args.k}
    for name, (run, ins) in variants.items():
        row[f"{name}_ms"] = round(_time_chained(run, ins, args.k), 4)
    row["enc_speedup"] = round(row["enc_base_ms"] / row["enc_s2d_ms"], 3)
    row["dec_speedup"] = round(row["dec_base_ms"] / row["dec_s2d_ms"], 3)
    row["enc_chain_speedup"] = round(row["enc_base_ms"] / row["enc_chain_ms"], 3)
    row["dec_chain_speedup"] = round(row["dec_base_ms"] / row["dec_chain_ms"], 3)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
