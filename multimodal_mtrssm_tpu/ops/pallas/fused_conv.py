"""Fused VMEM-resident encoder: the whole conv stack as ONE Pallas kernel.

The roofline residual (BASELINE.md): at production batch the train step sits
at ~3.1× the packed activation-traffic floor, attributed to *fusion
boundaries* (every XLA conv is its own kernel — act1/act2/act3 and six
residual-block intermediates round-trip HBM between layers) and weight
traffic. Lane repacking (the s2d layout) recovered only ~7-10%; this module
attacks the boundaries themselves: the encoder runs as a single
``pallas_call`` whose grid tiles the frame batch, with every intermediate
activation resident in VMEM — HBM sees one input read and one [N, out]
embedding write.

**Super-row formulation.** Activations live as ``[TN, P=4, L]`` tensors:
the H axis is grouped into P=4 "super-rows" of R=H/4 base rows each, and
(base-row-within-group, W, C) flatten into the lane axis L — multiples of
128 at every layer of the reference config (256/512/256/128/256), so VMEM
tiles are fully lane-packed (the naive NHWC block would waste up to 32× on
1-4-channel lanes). Because every conv's vertical stride divides R, each
layer becomes 1-3 MXU matmuls::

    y[:, p, :] = ELU( Σ_d  x[:, p+d, :] @ A_d  + bias )      d ∈ {-1,0,1}

where ``A_d [L_in, L_out]`` is the conv's weights scattered into a banded
lane-operator (translation-invariant in p; H zero-padding = the missing
taps at p=0/P-1). The only non-matmul ops in the kernel are static
super-row shifts (pad/slice on the sublane axis) — no reshapes, no
transposes, no strided slicing.

``A_d`` is built from the ORIGINAL ``encoder_init`` params via
trace-time-constant gather indices (:func:`_conv_superrow_maps`), so the
kernel computes the same math as ``encoder_apply`` (reference cnn.Encoder,
``configs/default.yaml:31-60``) up to fp reassociation — pinned by
``tests/test_fused_conv.py``. CoordConv channels are constant maps, so
their contribution folds into conv1's per-position bias exactly as in the
s2d layout (``conv1_s2d_weights``).

Scope: encoder forward (the eval/serving hot path and the A/B evidence for
VERDICT r4 item 2); the custom-VJP training integration reuses the same
operators via :func:`superrow_encoder_xla` (the pure-XLA twin used for
equivalence tests and as a second A/B arm).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_mtrssm_tpu.nn.conv import EncoderConfig, coord_channels

P = 4  # super-rows; H=32/16/8/4 are all divisible, and P=4 keeps taps in {-1,0,1}


# ---------------------------------------------------------------------------
# Operator construction: conv weights → per-tap lane matrices A_d
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _conv_superrow_maps(hi: int, wi: int, ci: int, co: int, k: int, s: int,
                        pad: int) -> dict[int, tuple]:
    """Trace-time-constant gather maps for one conv layer.

    Returns {d: (IY, IX, ICI, ICO, VALID)} — int arrays of shape
    [L_in, L_out] such that ``A_d = where(VALID, w[IY, IX, ICI, ICO], 0)``
    realises ``y[:, p, :] += x[:, p+d, :] @ A_d`` ≡ the k×k stride-s pad-p
    conv on the base [hi, wi, ci] grid, in super-row layout
    (lane index = (base_row_in_group · W + col) · C + channel).
    """
    ho, wo = hi // s, wi // s
    rin, rout = hi // P, ho // P
    lin, lout = rin * wi * ci, rout * wo * co
    maps: dict[int, list] = {}
    for di in range(k):
        for r_out in range(rout):
            r_rel = s * r_out + di - pad
            d, r_in = r_rel // rin, r_rel % rin
            # r_rel < 0 → d = -1 with r_in wrapped (python floordiv) — exactly
            # the top-padding row of super-row p-1's bottom; r_rel ≥ rin → d=+1.
            if not -1 <= d <= 1:
                continue
            ent = maps.setdefault(d, [np.zeros((lin, lout), np.int32) for _ in range(4)]
                                  + [np.zeros((lin, lout), bool)])
            iy, ix, ici, ico, valid = ent
            for dj in range(k):
                j_out = np.arange(wo)
                j_in = s * j_out + dj - pad
                ok = (0 <= j_in) & (j_in < wi)
                j_out, j_in = j_out[ok], j_in[ok]
                # lane indices, broadcast over (j, ci_, co_)
                ci_ = np.arange(ci)
                co_ = np.arange(co)
                l_in = (r_in * wi + j_in[:, None, None]) * ci + ci_[None, :, None]
                l_out = (r_out * wo + j_out[:, None, None]) * co + co_[None, None, :]
                l_in = np.broadcast_to(l_in, (len(j_out), ci, co))
                l_out = np.broadcast_to(l_out, (len(j_out), ci, co))
                iy[l_in, l_out] = di
                ix[l_in, l_out] = dj
                ici[l_in, l_out] = np.broadcast_to(ci_[None, :, None], l_in.shape)
                ico[l_in, l_out] = np.broadcast_to(co_[None, None, :], l_in.shape)
                valid[l_in, l_out] = True
    return {d: tuple(v) for d, v in maps.items()}


def _conv_operators(w: jax.Array, hi: int, wi: int, s: int, pad: int) -> dict[int, jax.Array]:
    """{d: A_d [L_in, L_out]} for conv weights ``w [k, k, Ci, Co]``."""
    k, _, ci, co = w.shape
    out = {}
    for d, (iy, ix, ici, ico, valid) in _conv_superrow_maps(hi, wi, ci, co, k, s, pad).items():
        a = w[jnp.asarray(iy), jnp.asarray(ix), jnp.asarray(ici), jnp.asarray(ico)]
        out[d] = jnp.where(jnp.asarray(valid), a, jnp.zeros((), w.dtype))
    return out


def _tile_bias(b: jax.Array, ho: int, wo: int) -> jax.Array:
    """Conv bias [Co] → per-super-row lane bias [P, R_out·W_out·Co]."""
    return jnp.tile(b, (P, (ho // P) * wo))


@dataclasses.dataclass(frozen=True)
class _Plan:
    """Static shape plan for one encoder config (reference dims shown)."""

    grids: tuple  # per conv layer: (Hi, Wi, Ci, Co, stride, pad)
    res_grid: tuple | None  # (H, W, C_in, C_proj) for res_proj, or None
    n_res: int
    res_ch: tuple  # (channels, intermediate)
    out_dim: int
    l_in: int  # input lane width = (H/P)·W·C
    seg_l_mid: int  # lane width at the segment cut (last strided conv out)


def fused_encoder_applicable(cfg: EncoderConfig) -> bool:
    """Reference-shaped stacks only: 3 k3 s2 p1 convs from a 32×32 input,
    ELU activations, one linear head — the shapes whose super-row lanes are
    128-multiples. Anything else takes the XLA path."""
    return (
        tuple(cfg.kernel_sizes) == (3, 3, 3)
        and tuple(cfg.strides) == (2, 2, 2)
        and tuple(cfg.paddings) == (1, 1, 1)
        and len(cfg.channels) == 3
        and cfg.activation_name == "ELU"
        and cfg.out_activation_name == "Identity"
        and len(cfg.linear_sizes) == 1
    )


def _plan(cfg: EncoderConfig, h: int, w: int) -> _Plan:
    chans = (cfg.in_channels, *cfg.channels)
    grids, hi, wi = [], h, w
    for i in range(len(cfg.channels)):
        grids.append((hi, wi, chans[i] + (2 if cfg.coord_conv and i == 0 else 0),
                      chans[i + 1], cfg.strides[i], cfg.paddings[i]))
        hi, wi = hi // cfg.strides[i], wi // cfg.strides[i]
    res_grid = None
    if cfg.num_residual_blocks > 0:
        res_grid = (hi, wi, chans[-1], cfg.residual_output_size)
    hl, wl, _, col, sl, _ = grids[-1]
    return _Plan(
        grids=tuple(grids), res_grid=res_grid, n_res=cfg.num_residual_blocks,
        res_ch=(cfg.residual_output_size, cfg.residual_intermediate_size),
        out_dim=cfg.linear_sizes[-1], l_in=(h // P) * w * cfg.in_channels,
        seg_l_mid=(hl // sl // P) * (wl // sl) * col,
    )


def build_operators(params: dict, cfg: EncoderConfig, h: int = 32, w: int = 32,
                    dtype: jnp.dtype = jnp.float32) -> tuple:
    """Encoder params → (flat operator list, static meta) for the kernel.

    The operator list is a flat tuple of arrays (taps + biases in layer
    order); ``meta`` describes layer boundaries so the kernel can walk it.
    Fully jax-traceable: gradients flow through to the original params.
    """
    plan = _plan(cfg, h, w)
    arrays: list[jax.Array] = []
    meta: list[tuple] = []  # (kind, taps_d_tuple)

    # conv1: image channels only; CoordConv folds into the bias map.
    (h1, w1_, c1, co1, s1, p1) = plan.grids[0]
    wconv1 = params["convs"][0]["w"].astype(dtype)
    img_ch = cfg.in_channels
    ops1 = _conv_operators(wconv1[:, :, :img_ch], h1, w1_, s1, p1)
    bias1 = _tile_bias(params["convs"][0]["b"].astype(dtype), h1 // s1, w1_ // s1)
    if cfg.coord_conv:
        coords = coord_channels(1, h1, w1_, dtype)
        cmap = jax.lax.conv_general_dilated(
            coords, wconv1[:, :, img_ch:], window_strides=(s1, s1),
            padding=((p1, p1), (p1, p1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        bias1 = bias1 + cmap.reshape(P, -1)
    ds = sorted(ops1)
    meta.append(("conv", tuple(ds)))
    arrays += [ops1[d] for d in ds] + [bias1]

    # mid-stack convs
    for i, (hi, wi, ci, co, s, pad) in enumerate(plan.grids[1:], start=1):
        wk = params["convs"][i]["w"].astype(dtype)
        ops = _conv_operators(wk, hi, wi, s, pad)
        ds = sorted(ops)
        meta.append(("conv", tuple(ds)))
        arrays += [ops[d] for d in ds] + [
            _tile_bias(params["convs"][i]["b"].astype(dtype), hi // s, wi // s)]

    # res_proj (1×1) + residual blocks (3×3 pairs)
    if plan.res_grid is not None:
        hr, wr, cr, cproj = plan.res_grid
        if "res_proj" in params:
            ops = _conv_operators(params["res_proj"]["w"].astype(dtype), hr, wr, 1, 0)
            meta.append(("conv", tuple(sorted(ops))))
            arrays += [ops[d] for d in sorted(ops)] + [
                _tile_bias(params["res_proj"]["b"].astype(dtype), hr, wr)]
        for block in params.get("res_blocks", []):
            for j, tag in ((1, "res_in"), (2, "res_out")):
                wk = block[f"conv{j}"]["w"].astype(dtype)
                ops = _conv_operators(wk, hr, wr, 1, 1)
                meta.append((tag, tuple(sorted(ops))))
                arrays += [ops[d] for d in sorted(ops)] + [
                    _tile_bias(block[f"conv{j}"]["b"].astype(dtype), hr, wr)]

    # head: one linear over the flattened [P·L_res] features → P row-slices
    lin = params["linears"][0]
    wl = lin["w"].astype(dtype)  # [P·L, out]
    lrow = wl.shape[0] // P
    meta.append(("head", (0, 1, 2, 3)))
    arrays += [wl[r * lrow:(r + 1) * lrow] for r in range(P)] + [lin["b"].astype(dtype)]
    return tuple(arrays), (tuple(meta), plan)


def _elu(x):
    # exp(x)−1 rather than expm1: Mosaic has no expm1 lowering (verified
    # on-chip 2026-08-20); the negative branch only sees x ≤ 0 where the
    # f32 difference is ≤1e-8 absolute — inside the pinned tolerances.
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _shift_rows(z: jax.Array, d: int) -> jax.Array:
    """Contribution alignment: out[:, p] += z[:, p + d] with zero fill."""
    if d == 0:
        return z
    if d == 1:
        return jnp.pad(z[:, 1:], ((0, 0), (0, 1), (0, 0)))
    return jnp.pad(z[:, :-1], ((0, 0), (1, 0), (0, 0)))


def _act(name, y):
    if name == "elu":
        return _elu(y)
    if name == "tanh":
        return jnp.tanh(y)
    return y  # "id"


def _act_deriv(name, out):
    """Activation derivative from the OUTPUT value (recompute-friendly)."""
    o = out.astype(jnp.float32)
    if name == "elu":
        return jnp.where(o > 0, 1.0, o + 1.0)
    if name == "tanh":
        return 1.0 - o * o
    return jnp.ones_like(o)


def _layer_fwd(h, kind, ds, act, taps, b, saved, dtype):
    """One layer forward; returns (h_new, saved_new)."""
    if kind == "head":
        acc = None
        for r, tap in zip(ds, taps):
            z = jax.lax.dot_general(h[:, r, :], tap, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = z if acc is None else acc + z
        return _act(act, acc + b.astype(jnp.float32)).astype(dtype), saved
    if kind == "dense":
        # Flat [TN, L] @ tap — decoder entry linears (one tap).
        z = jax.lax.dot_general(h, taps[0], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return _act(act, z + b.astype(jnp.float32)).astype(dtype), saved
    if kind == "unflatten":
        # Flat [TN, P·L] → super-rows [TN, P, L] via the P row-taps
        # (avoids an in-kernel reshape relayout: one matmul per super-row).
        rows = [jax.lax.dot_general(h, tap, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                for tap in taps]
        y = jnp.stack(rows, axis=1) + b.astype(jnp.float32)[None]
        return _act(act, y).astype(dtype), saved
    acc = None
    for d, tap in zip(ds, taps):
        z = jax.lax.dot_general(h, tap, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        z = _shift_rows(z, d)
        acc = z if acc is None else acc + z
    y = acc + b.astype(jnp.float32)[None]
    if kind == "res_in":
        return _act(act, y).astype(dtype), h
    if kind == "res_out":
        return _act(act, saved.astype(jnp.float32) + y).astype(dtype), saved
    return _act(act, y).astype(dtype), saved


def _meta_entry(entry):
    """meta entry → (kind, ds, act); 2-tuples default to the encoder
    convention (ELU between layers, Identity on the head)."""
    if len(entry) == 2:
        return entry[0], entry[1], ("id" if entry[0] == "head" else "elu")
    return entry


def _split_arrays(arrays, meta):
    """Flat operator tuple → per-layer (kind, ds, act, taps, bias)."""
    it = iter(arrays)
    out = []
    for entry in meta:
        kind, ds, act = _meta_entry(entry)
        taps = tuple(next(it) for _ in ds)
        out.append((kind, ds, act, taps, next(it)))
    return out


def _walk(h, arrays, meta, dtype):
    """Shared fwd walk (kernel body AND the XLA twin). Returns the segment
    output: the [TN, out_dim] embedding if the segment ends in a head, else
    the last activation [TN, P, L]."""
    saved = None
    for kind, ds, act, taps, b in _split_arrays(arrays, meta):
        h, saved = _layer_fwd(h, kind, ds, act, taps, b, saved, dtype)
    return h


def _walk_bwd(h0, arrays, meta, g, dtype):
    """Backward of one segment: recompute activations from ``h0``, then
    reverse. Returns (d_arrays flat tuple in f32, dh0). Pure jnp — runs
    inside the Pallas kernel and as the XLA reference in tests."""
    layers = _split_arrays(arrays, meta)
    hs = [h0]
    saved = None
    for kind, ds, act, taps, b in layers:
        h_new, saved = _layer_fwd(hs[-1], kind, ds, act, taps, b, saved, dtype)
        hs.append(h_new)

    d_arrays: list = [None] * len(layers)
    dh = g.astype(jnp.float32)
    pending_saved: jax.Array | None = None
    for i in range(len(layers) - 1, -1, -1):
        kind, ds, act, taps, b = layers[i]
        h_in, h_out = hs[i], hs[i + 1]
        if kind == "head":
            dh = dh * _act_deriv(act, h_out)
            d_taps = tuple(
                jax.lax.dot_general(h_in[:, r, :], dh, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                for r in ds)
            db = jnp.sum(dh, axis=0)
            d_arrays[i] = (*d_taps, db)
            dh = jnp.stack(
                [jax.lax.dot_general(dh, taps[j], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
                 for j, _ in enumerate(ds)], axis=1)
            continue
        if kind == "dense":
            dy = dh * _act_deriv(act, h_out)
            d_tap = jax.lax.dot_general(h_in, dy, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            db = jnp.sum(dy, axis=0)
            d_arrays[i] = (d_tap, db)
            dh = jax.lax.dot_general(dy, taps[0], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            continue
        if kind == "unflatten":
            dy = dh * _act_deriv(act, h_out)  # [TN, P, L]
            d_taps = tuple(
                jax.lax.dot_general(h_in, dy[:, j, :], (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                for j, _ in enumerate(ds))
            db = jnp.sum(dy, axis=0)
            d_arrays[i] = (*d_taps, db)
            dh = None
            for j, _ in enumerate(ds):
                z = jax.lax.dot_general(dy[:, j, :], taps[j], (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                dh = z if dh is None else dh + z
            continue
        dy = dh * _act_deriv(act, h_out)
        if kind == "res_out":
            pending_saved = dy  # identity-path grad, consumed by res_in
        # conv input for this layer: res_out's conv reads h_in (=t); plain
        # convs and res_in read h_in too — uniform.
        d_taps = []
        dh_prev = None
        # (TN, P) flatten before the dA contraction: Mosaic's tpu.matmul
        # rejects two contracting dims (verified on-chip 2026-08-20); the
        # merge of leading (major) dims is layout-free.
        dy2 = dy.reshape(-1, dy.shape[-1])
        for d, tap in zip(ds, taps):
            sh = _shift_rows(h_in.astype(jnp.float32), d)
            d_taps.append(jax.lax.dot_general(
                sh.reshape(-1, sh.shape[-1]), dy2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            z = jax.lax.dot_general(dy, tap, (((2,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            z = _shift_rows(z, -d)
            dh_prev = z if dh_prev is None else dh_prev + z
        db = jnp.sum(dy, axis=0)
        d_arrays[i] = (*d_taps, db)
        dh = dh_prev
        if kind == "res_in" and pending_saved is not None:
            dh = dh + pending_saved
            pending_saved = None
    flat = tuple(a for layer in d_arrays for a in layer)
    return flat, dh


def superrow_input(x: jax.Array) -> jax.Array:
    """[N, H, W, C] → [N, P, (H/P)·W·C] (pure row-major reshape)."""
    n, h, w, c = x.shape
    return x.reshape(n, P, (h // P) * w * c)


def superrow_encoder_xla(params: dict, cfg: EncoderConfig, x: jax.Array,
                         operators: tuple | None = None) -> jax.Array:
    """Pure-XLA twin of the fused kernel — identical operator math, each
    matmul its own XLA op. Equivalence anchor for tests and the second
    A/B arm (isolates the VMEM-residency win from the formulation change)."""
    lead = x.shape[:-3]
    h, w = x.shape[-3], x.shape[-2]
    x = x.reshape((-1, *x.shape[-3:]))
    dtype = x.dtype
    arrays, (meta, _) = operators if operators is not None else build_operators(
        params, cfg, h, w, dtype)
    out = _walk(superrow_input(x), arrays, meta, dtype)
    return out.reshape(*lead, out.shape[-1])


# ---------------------------------------------------------------------------
# Pallas kernels (two segments, each with a custom VJP)
#
# The encoder splits at its SMALLEST activation (act3, [N, 4, 128]):
# segment 0 = the three strided convs, segment 1 = res_proj + residual
# blocks + head. One kernel per segment keeps VMEM under budget in the
# BACKWARD pass — a single kernel would hold every lane operator PLUS its
# f32 gradient accumulator (~16 MB before activations); per segment each
# side stays ≤ ~5 MB while the cut tensor's HBM round trip is the
# cheapest possible (act3 is 16× smaller than act1). The backward kernels
# RECOMPUTE activations from the segment input (nothing but the inputs is
# stashed), and gradient accumulators live in VMEM across the grid
# (zero-initialised at step 0, accumulated, written once).
# ---------------------------------------------------------------------------


def _n_arrays(meta) -> int:
    return sum(len(_meta_entry(e)[1]) + 1 for e in meta)


def _fwd_kernel(meta, dtype, x_ref, *refs):
    out_ref = refs[-1]
    arrays = tuple(r[:] for r in refs[:-1])
    out_ref[:] = _walk(x_ref[:], arrays, meta, dtype)


def _bwd_kernel(meta, dtype, n_ops, x_ref, g_ref, *refs):
    """refs = (*array_refs[n_ops], *d_array_refs[n_ops], dx_ref)."""
    import jax.experimental.pallas as pl

    array_refs = refs[:n_ops]
    d_refs = refs[n_ops:n_ops + n_ops]
    dx_ref = refs[-1]
    arrays = tuple(r[:] for r in array_refs)
    d_arrays, dh0 = _walk_bwd(x_ref[:], arrays, meta, g_ref[:], dtype)
    dx_ref[:] = dh0.astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in d_refs:
            r[:] = jnp.zeros_like(r)

    for r, da in zip(d_refs, d_arrays):
        r[:] += da


def _const_spec(a):
    from jax.experimental import pallas as pl

    if a.ndim == 2:
        return pl.BlockSpec(a.shape, lambda i: (0, 0))
    return pl.BlockSpec(a.shape, lambda i: (0,))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _segment_core(meta, out_l, tile, interpret, is_head, arrays, x):
    """One segment as a pallas_call. ``x``: [N, P, L_in] (N divisible by
    tile); returns [N, out_l] (head) or [N, P, out_l]."""
    return _segment_fwd_call(meta, out_l, tile, interpret, is_head, arrays, x)


def _io_spec(ndim_3, tile, width):
    """Block spec for a segment input/output: [N, P, L] or flat [N, L]."""
    from jax.experimental import pallas as pl

    if ndim_3:
        return pl.BlockSpec((tile, P, width), lambda i: (i, 0, 0))
    return pl.BlockSpec((tile, width), lambda i: (i, 0))


def _segment_fwd_call(meta, out_l, tile, interpret, is_head, arrays, x):
    from jax.experimental import pallas as pl

    n = x.shape[0]
    dtype = x.dtype
    grid = (n // tile,)
    in_specs = [_io_spec(x.ndim == 3, tile, x.shape[-1])]
    in_specs += [_const_spec(a) for a in arrays]
    if is_head:
        out_shape = jax.ShapeDtypeStruct((n, out_l), dtype)
    else:
        out_shape = jax.ShapeDtypeStruct((n, P, out_l), dtype)
    out_spec = _io_spec(not is_head, tile, out_l)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, meta, dtype),
        out_shape=out_shape, grid=grid, in_specs=in_specs,
        out_specs=out_spec, interpret=interpret,
    )(x, *arrays)


def _segment_core_fwd(meta, out_l, tile, interpret, is_head, arrays, x):
    out = _segment_fwd_call(meta, out_l, tile, interpret, is_head, arrays, x)
    return out, (arrays, x)


def _segment_core_bwd(meta, out_l, tile, interpret, is_head, res, g):
    from jax.experimental import pallas as pl

    arrays, x = res
    n = x.shape[0]
    dtype = x.dtype
    n_ops = len(arrays)
    grid = (n // tile,)
    in_specs = [
        _io_spec(x.ndim == 3, tile, x.shape[-1]),
        _io_spec(not is_head, tile, out_l),
    ] + [_const_spec(a) for a in arrays]
    # Gradient accumulators in f32 regardless of the compute dtype (bf16
    # accumulation across tiles would drift); cast to the primal dtype after
    # the call so custom_vjp's cotangent contract holds.
    out_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in arrays]
    out_specs = [_const_spec(a) for a in arrays]
    out_shapes.append(jax.ShapeDtypeStruct(x.shape, dtype))
    out_specs.append(_io_spec(x.ndim == 3, tile, x.shape[-1]))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, meta, dtype, n_ops),
        out_shape=tuple(out_shapes), grid=grid, in_specs=in_specs,
        out_specs=tuple(out_specs), interpret=interpret,
    )(x, g, *arrays)
    d_arrays = tuple(da.astype(a.dtype) for da, a in zip(outs[:-1], arrays))
    return d_arrays, outs[-1]


_segment_core.defvjp(_segment_core_fwd, _segment_core_bwd)


def fused_encoder_apply(params: dict, cfg: EncoderConfig, x: jax.Array,
                        *, tile: int = 64, interpret: bool | str = "auto",
                        operators: tuple | None = None) -> jax.Array:
    """Encoder forward as VMEM-resident Pallas programs (two segments, cut
    at act3 — see the segment comment above). Differentiable: each segment
    carries a custom VJP whose backward kernel recomputes activations
    in-VMEM, so training sees no stashed intermediates in HBM either.

    ``x``: [..., H, W, C]; returns [..., out_dim]. Guard with
    :func:`fused_encoder_applicable`. ``operators`` may be passed to reuse
    prebuilt lane matrices (eval loops with fixed params).
    """
    if interpret == "auto":
        # Mosaic exists only on TPU; everywhere else (tests, CPU meshes)
        # run the kernels through the interpreter — same math, slower.
        interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-3]
    hh, ww = x.shape[-3], x.shape[-2]
    x = x.reshape((-1, *x.shape[-3:]))
    n = x.shape[0]
    dtype = x.dtype
    arrays, (meta, plan) = operators if operators is not None else build_operators(
        params, cfg, hh, ww, dtype)

    tn = min(tile, max(8, n))
    n_pad = -n % tn
    xs = superrow_input(x)
    if n_pad:
        xs = jnp.pad(xs, ((0, n_pad), (0, 0), (0, 0)))

    # Segment 0 = the strided convs (res_proj is also tagged "conv", so
    # count layers from the plan, not the tags).
    seg0_layers = len(plan.grids)
    split = _n_arrays(meta[:seg0_layers])
    h = _segment_core(meta[:seg0_layers], plan.seg_l_mid, tn, interpret, False,
                      arrays[:split], xs)
    out = _segment_core(meta[seg0_layers:], plan.out_dim, tn, interpret, True,
                        arrays[split:], h)
    if n_pad:
        out = out[:n]
    return out.reshape(*lead, out.shape[-1])


# ---------------------------------------------------------------------------
# Decoder operators (reference cnn.Decoder, ``configs/default.yaml:61-92``):
# linears → (c,h,w)-unflatten → residual blocks → three k4 s2 p1 deconvs.
# Same super-row algebra; deconvs UPSAMPLE (R_out = s·R_in) and their tap
# relation is out[i] += x[(i+pad−ky)/s] @ w[ky,kx] (torch ConvTranspose2d
# semantics, verified against ``conv_transpose_apply`` to 6e-8). The final
# output is the super-row form of the [H,W,C] frame — ``superrow_output``
# inverts it with a pure reshape.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _deconv_superrow_maps(hi: int, wi: int, ci: int, co: int, k: int, s: int,
                          pad: int) -> dict[int, tuple]:
    """Gather maps for one ConvTranspose2d layer (out = s·in for the
    k−2·pad = s family, e.g. the reference's k4 s2 p1)."""
    ho, wo = (hi - 1) * s - 2 * pad + k, (wi - 1) * s - 2 * pad + k
    rin, rout = hi // P, ho // P
    lin, lout = rin * wi * ci, rout * wo * co
    maps: dict[int, list] = {}
    for ky in range(k):
        for r_out in range(rout):
            num = r_out + pad - ky
            if num % s:
                continue
            r_rel = num // s
            d, r_in = r_rel // rin, r_rel % rin
            if not -1 <= d <= 1:
                continue
            ent = maps.setdefault(d, [np.zeros((lin, lout), np.int32) for _ in range(4)]
                                  + [np.zeros((lin, lout), bool)])
            iy, ix, ici, ico, valid = ent
            for kx in range(k):
                j_out = np.arange(wo)
                num_j = j_out + pad - kx
                ok = (num_j % s == 0) & (num_j >= 0) & (num_j < wi * s)
                j_out = j_out[ok]
                j_in = (np.asarray(j_out) + pad - kx) // s
                ok2 = (0 <= j_in) & (j_in < wi)
                j_out, j_in = j_out[ok2], j_in[ok2]
                if len(j_out) == 0:
                    continue
                ci_ = np.arange(ci)
                co_ = np.arange(co)
                l_in = (r_in * wi + j_in[:, None, None]) * ci + ci_[None, :, None]
                l_out = (r_out * wo + j_out[:, None, None]) * co + co_[None, None, :]
                l_in = np.broadcast_to(l_in, (len(j_out), ci, co))
                l_out = np.broadcast_to(l_out, (len(j_out), ci, co))
                iy[l_in, l_out] = ky
                ix[l_in, l_out] = kx
                ici[l_in, l_out] = np.broadcast_to(ci_[None, :, None], l_in.shape)
                ico[l_in, l_out] = np.broadcast_to(co_[None, None, :], l_in.shape)
                valid[l_in, l_out] = True
    return {d: tuple(v) for d, v in maps.items()}


def _deconv_operators(w: jax.Array, hi: int, wi: int, s: int, pad: int) -> dict[int, jax.Array]:
    k, _, ci, co = w.shape
    out = {}
    for d, (iy, ix, ici, ico, valid) in _deconv_superrow_maps(
            hi, wi, ci, co, k, s, pad).items():
        a = w[jnp.asarray(iy), jnp.asarray(ix), jnp.asarray(ici), jnp.asarray(ico)]
        out[d] = jnp.where(jnp.asarray(valid), a, jnp.zeros((), w.dtype))
    return out


def fused_decoder_applicable(cfg: object) -> bool:
    """Reference-shaped decoders: two linears, [C,4,4] conv-in, k4 s2 p1
    deconvs ×3 to 32×32, ELU inner / Tanh output."""
    return (
        len(cfg.linear_sizes) == 2
        and tuple(cfg.conv_in_shape[1:]) == (4, 4)
        and len(cfg.channels) == 3
        and tuple(cfg.kernel_sizes) == (4, 4, 4)
        and tuple(cfg.strides) == (2, 2, 2)
        and tuple(cfg.paddings) == (1, 1, 1)
        and tuple(cfg.output_paddings) == (0, 0, 0)
        and cfg.activation_name == "ELU"
        and cfg.out_activation_name == "Tanh"
    )


def build_decoder_operators(params: dict, cfg: object,
                            dtype: jnp.dtype = jnp.float32) -> tuple:
    """Decoder params → (flat operator tuple, (meta, seg_bounds, out_hw)).

    ``seg_bounds``: meta indices where a kernel segment may cut (after the
    res stack and after each deconv) — used by the fused decoder call to
    keep each backward kernel under the VMEM budget.
    """
    c0, h0, w0 = cfg.conv_in_shape
    arrays: list[jax.Array] = []
    meta: list[tuple] = []

    lin0, lin1 = params["linears"]
    arrays += [lin0["w"].astype(dtype), lin0["b"].astype(dtype)]
    meta.append(("dense", (0,), "elu"))
    # unflatten: linear to [P, h0·w0·c0·... ] in (h,w,c) order — fold the
    # reference's (c,h,w)-major reshape permutation into the weight columns.
    w1 = lin1["w"].astype(dtype)  # [in, c0·h0·w0]
    b1 = lin1["b"].astype(dtype)
    rows_per_p = h0 // P  # 1 for the 4×4 conv-in
    lane = rows_per_p * w0 * c0
    perm = np.empty((P, lane), np.int64)
    for h_ in range(h0):
        for w_ in range(w0):
            for c_ in range(c0):
                pr, rr = divmod(h_, rows_per_p)
                perm[pr, (rr * w0 + w_) * c0 + c_] = c_ * (h0 * w0) + h_ * w0 + w_
    taps = [w1[:, perm[r]] for r in range(P)]
    bias = jnp.stack([b1[perm[r]] for r in range(P)])
    arrays += taps + [bias]
    meta.append(("unflatten", tuple(range(P)), "elu"))

    hi, wi = h0, w0
    if "res_proj" in params:
        ops = _conv_operators(params["res_proj"]["w"].astype(dtype), hi, wi, 1, 0)
        meta.append(("conv", tuple(sorted(ops)), "elu"))
        arrays += [ops[d] for d in sorted(ops)] + [
            _tile_bias(params["res_proj"]["b"].astype(dtype), hi, wi)]
    for block in params.get("res_blocks", []):
        for j, tag in ((1, "res_in"), (2, "res_out")):
            wk = block[f"conv{j}"]["w"].astype(dtype)
            ops = _conv_operators(wk, hi, wi, 1, 1)
            meta.append((tag, tuple(sorted(ops)), "elu"))
            arrays += [ops[d] for d in sorted(ops)] + [
                _tile_bias(block[f"conv{j}"]["b"].astype(dtype), hi, wi)]
    seg_bounds = [len(meta)]
    for i, dk in enumerate(params["deconvs"]):
        wk = dk["w"].astype(dtype)
        ops = _deconv_operators(wk, hi, wi, cfg.strides[i], cfg.paddings[i])
        act = "elu" if i < len(params["deconvs"]) - 1 else "tanh"
        ho = (hi - 1) * cfg.strides[i] - 2 * cfg.paddings[i] + cfg.kernel_sizes[i]
        wo = (wi - 1) * cfg.strides[i] - 2 * cfg.paddings[i] + cfg.kernel_sizes[i]
        meta.append(("conv", tuple(sorted(ops)), act))
        arrays += [ops[d] for d in sorted(ops)] + [
            _tile_bias(dk["b"].astype(dtype), ho, wo)]
        hi, wi = ho, wo
        seg_bounds.append(len(meta))
    return tuple(arrays), (tuple(meta), tuple(seg_bounds), (hi, wi, wk.shape[-1]))


def superrow_output(y: jax.Array, h: int, w: int, c: int) -> jax.Array:
    """[N, P, (H/P)·W·C] → [N, H, W, C] (pure reshape, inverse of
    :func:`superrow_input`)."""
    return y.reshape(y.shape[0], h, w, c)


def superrow_decoder_xla(params: dict, cfg: object, feats: jax.Array,
                         operators: tuple | None = None) -> jax.Array:
    """Pure-XLA twin of the fused decoder — equivalence anchor vs
    ``decoder_apply`` and the formulation A/B arm."""
    lead = feats.shape[:-1]
    feats = feats.reshape((-1, feats.shape[-1]))
    dtype = feats.dtype
    arrays, (meta, _, (ho, wo, co)) = operators if operators is not None else \
        build_decoder_operators(params, cfg, dtype)
    y = _walk(feats, arrays, meta, dtype)
    out = superrow_output(y, ho, wo, co)
    return out.reshape(*lead, *out.shape[1:])


def fused_decoder_apply(params: dict, cfg: object, feats: jax.Array, *, tile: int = 64,
                        interpret: bool | str = "auto",
                        operators: tuple | None = None) -> jax.Array:
    """Decoder forward as VMEM-resident Pallas segments: [linears + res
    stack] fused in one kernel, then one kernel per deconv (each deconv's
    operator pair + f32 gradient accumulator must fit VMEM alone — deconv2's
    is 6.3 MB). Differentiable via the same per-segment custom VJP as the
    encoder. Returns [..., H, W, C] (identical contract to
    ``decoder_apply``); guard with :func:`fused_decoder_applicable`.
    """
    if interpret == "auto":
        interpret = jax.default_backend() != "tpu"
    lead = feats.shape[:-1]
    feats = feats.reshape((-1, feats.shape[-1]))
    n = feats.shape[0]
    dtype = feats.dtype
    arrays, (meta, seg_bounds, (ho, wo, co)) = operators if operators is not None \
        else build_decoder_operators(params, cfg, dtype)

    tn = min(tile, max(8, n))
    n_pad = -n % tn
    if n_pad:
        feats = jnp.pad(feats, ((0, n_pad), (0, 0)))

    bounds = [0, *seg_bounds]
    h = feats
    for lo, hi_b in zip(bounds[:-1], bounds[1:]):
        seg_meta = meta[lo:hi_b]
        lo_a, hi_a = _n_arrays(meta[:lo]), _n_arrays(meta[:hi_b])
        # Segment output lane width: bias of the segment's last layer.
        seg_arrays = arrays[lo_a:hi_a]
        out_l = seg_arrays[-1].shape[-1]
        h = _segment_core(seg_meta, out_l, tn, interpret, False,
                          seg_arrays, h)
    out = superrow_output(h, ho, wo, co)
    if n_pad:
        out = out[:n]
    return out.reshape(*lead, *out.shape[1:])
