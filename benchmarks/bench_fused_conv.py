"""On-chip A/B: fused VMEM-resident Pallas encoder vs XLA conv stacks.

VERDICT r4 item 2 — attack the roofline's named residual (fusion
boundaries + weight traffic, 3.1× over the packed floor at B=128) with
kernel fusion rather than lane repacking. Arms:

- ``base``      — shipped ``encoder_apply`` (NHWC XLA convs; each layer its
                  own kernel, intermediates round-trip HBM)
- ``s2d``       — shipped ``encoder_apply_s2d`` (chained s2d layout, the
                  round-4 default at these shapes)
- ``superrow``  — the super-row operator formulation run as plain XLA
                  matmuls (isolates the FORMULATION change from VMEM
                  residency: same matmuls, still one XLA kernel per layer)
- ``fused``     — the Pallas kernel (``ops/pallas/fused_conv.py``): whole
                  stack in one program, activations VMEM-resident

Forward-only (the eval/serving hot path; the kernel has no VJP yet) and,
for the XLA arms, fwd+bwd. Frames default 3840 = B=128 T=30 per modality;
240 = B=8. Equivalence is asserted before timing.

Run (TPU): python benchmarks/bench_fused_conv.py [--frames 3840]
           [--dtype bfloat16] [--tile 64]
CPU check: python benchmarks/bench_fused_conv.py --check-only
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=3840)
    ap.add_argument("--dtype", choices=("float32", "bfloat16"), default="bfloat16")
    ap.add_argument("--k", type=int, default=16, help="chained reps per window")
    ap.add_argument("--tile", type=int, default=64, help="pallas frames/tile")
    ap.add_argument("--check-only", action="store_true")
    args = ap.parse_args()
    if args.check_only:
        jax.config.update("jax_platforms", "cpu")
    from multimodal_mtrssm_tpu.nn.conv import (
        DecoderConfig,
        EncoderConfig,
        decoder_apply,
        decoder_init,
        encoder_apply,
        encoder_apply_s2d,
        encoder_init,
    )
    from multimodal_mtrssm_tpu.ops.pallas.fused_conv import (
        build_decoder_operators,
        build_operators,
        fused_decoder_apply,
        fused_encoder_apply,
        superrow_decoder_xla,
        superrow_encoder_xla,
    )
    from multimodal_mtrssm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    ecfg = EncoderConfig()
    eparams = encoder_init(jax.random.PRNGKey(0), ecfg)
    dcfg = DecoderConfig(in_features=48)
    dparams = decoder_init(jax.random.PRNGKey(3), dcfg)

    # --- equivalence (f32, small batch) ---
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 32, 32, 1),
                           jnp.float32, -1, 1)
    feats = jax.random.normal(jax.random.PRNGKey(4), (32, 48), jnp.float32)
    ref = encoder_apply(eparams, ecfg, x)
    dref = decoder_apply(dparams, dcfg, feats)
    gap_sr = float(jnp.max(jnp.abs(ref - superrow_encoder_xla(eparams, ecfg, x))))
    gap_fx = float(jnp.max(jnp.abs(ref - fused_encoder_apply(
        eparams, ecfg, x, tile=16, interpret=args.check_only))))
    gap_dsr = float(jnp.max(jnp.abs(dref - superrow_decoder_xla(dparams, dcfg, feats))))
    gap_dfx = float(jnp.max(jnp.abs(dref - fused_decoder_apply(
        dparams, dcfg, feats, tile=16, interpret=args.check_only))))
    print(json.dumps({"superrow_gap": gap_sr, "fused_gap": gap_fx,
                      "dec_superrow_gap": gap_dsr, "dec_fused_gap": gap_dfx}),
          flush=True)
    # CPU computes true f32 (gaps ~2e-7); on TPU the DEFAULT matmul/conv
    # precision rounds f32 operands to bf16 (~0.4% relative), and the two
    # formulations round different intermediates — measured 3.7e-4 abs on
    # 2026-08-20. The bf16-rounding envelope is the honest gate on-chip.
    tol = 2e-6 if jax.default_backend() != "tpu" else 2e-3
    assert max(gap_sr, gap_fx, gap_dsr, gap_dfx) < tol, "equivalence failed — do not time"
    if args.check_only:
        return

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    n = args.frames
    big_x = jax.random.uniform(jax.random.PRNGKey(2), (n, 32, 32, 1), dt, -1, 1)
    big_f = jax.random.normal(jax.random.PRNGKey(5), (n, 48), dt)
    big_t = jax.random.uniform(jax.random.PRNGKey(6), (n, 32, 32, 1), dt, -1, 1)
    ops = build_operators(eparams, ecfg, 32, 32, dt)
    dops = build_decoder_operators(dparams, dcfg, dt)

    def chain_fwd(fn, x0):
        def run(xv):
            def body(s, _):
                y = fn(xv + (s * 1e-30).astype(dt))
                return jnp.sum(y.astype(jnp.float32)), None
            s, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.k)
            return (s,)
        return jax.jit(run), (x0,)

    def chain_grad(fn, x0):
        grad = jax.grad(lambda v: jnp.sum(fn(v).astype(jnp.float32)))

        def run(xv):
            def body(s, _):
                g = grad(xv + (s * 1e-30).astype(dt))
                return jnp.sum(g).astype(jnp.float32), None
            s, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.k)
            return (s,)
        return jax.jit(run), (x0,)

    variants = {
        "base_fwd": chain_fwd(lambda v: encoder_apply(eparams, ecfg, v), big_x),
        "s2d_fwd": chain_fwd(lambda v: encoder_apply_s2d(eparams, ecfg, v), big_x),
        "superrow_fwd": chain_fwd(
            lambda v: superrow_encoder_xla(eparams, ecfg, v, operators=ops), big_x),
        "fused_fwd": chain_fwd(
            lambda v: fused_encoder_apply(eparams, ecfg, v, tile=args.tile,
                                          operators=ops), big_x),
        "base_grad": chain_grad(lambda v: encoder_apply(eparams, ecfg, v), big_x),
        "superrow_grad": chain_grad(
            lambda v: superrow_encoder_xla(eparams, ecfg, v, operators=ops), big_x),
        "fused_grad": chain_grad(
            lambda v: fused_encoder_apply(eparams, ecfg, v, tile=args.tile,
                                          operators=ops), big_x),
        "dec_base_fwd": chain_fwd(lambda v: decoder_apply(dparams, dcfg, v), big_f),
        "dec_fused_fwd": chain_fwd(lambda v: fused_decoder_apply(
            dparams, dcfg, v, tile=args.tile, operators=dops), big_f),
        "dec_base_grad": chain_grad(lambda v: (decoder_apply(dparams, dcfg, v)
                                               - big_t) ** 2, big_f),
        "dec_fused_grad": chain_grad(lambda v: (fused_decoder_apply(
            dparams, dcfg, v, tile=args.tile, operators=dops) - big_t) ** 2, big_f),
    }
    row = {"frames": n, "dtype": args.dtype, "k": args.k, "tile": args.tile}
    for name, (run, ins) in variants.items():
        # Incremental + fault-isolated: one broken arm must not lose the
        # others' numbers (a Mosaic bwd failure cost a full run on
        # 2026-08-20 before this).
        try:
            row[f"{name}_ms"] = round(_time_chained(run, ins, args.k), 4)
        except Exception as e:  # noqa: BLE001 — report and continue
            row[f"{name}_ms"] = None
            row[f"{name}_error"] = f"{type(e).__name__}: {str(e)[:200]}"
        print(json.dumps({name: row.get(f"{name}_ms")}), flush=True)
    def ratio(a, b):
        return round(row[a] / row[b], 3) if row.get(a) and row.get(b) else None

    for arm in ("s2d", "superrow", "fused"):
        row[f"{arm}_fwd_speedup"] = ratio("base_fwd_ms", f"{arm}_fwd_ms")
    row["superrow_grad_speedup"] = ratio("base_grad_ms", "superrow_grad_ms")
    row["fused_grad_speedup"] = ratio("base_grad_ms", "fused_grad_ms")
    row["dec_fused_fwd_speedup"] = ratio("dec_base_fwd_ms", "dec_fused_fwd_ms")
    row["dec_fused_grad_speedup"] = ratio("dec_base_grad_ms", "dec_fused_grad_ms")
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
