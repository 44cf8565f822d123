"""Conv encoder/decoder stacks (TPU-native, NHWC).

Replaces the reference's external ``cnn`` package (git-pinned
``nomutin/CNN``; config surface at reference
``src/multimodal_rssm/models/mrssm/mopoe_mrssm/configs/default.yaml:31-92``):
config-driven strided-conv encoders with CoordConv + residual blocks and a
64-dim linear head, and linear→reshape→transposed-conv decoders with a lazy
input width (the same decoder config serves feature dim 48 for MRSSM and 96
for MMTRSSM — reference ``mopoe_mrssm/core.py:272-273`` vs
``mopoe_mmtrssm/core.py:556-557``).

TPU-first choices:
- NHWC activations / HWIO kernels (XLA's native TPU conv layout — no
  transposes around every conv).
- Sequences [B, T, H, W, C] are flattened to [B*T, H, W, C] so the conv
  lands on the MXU as one big batch (the reference likewise feeds full
  sequences, ``mopoe_mrssm/core.py:215-216``).
- Transposed conv implemented as input-dilated conv (XLA fuses it onto the
  MXU like a regular conv).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from multimodal_mtrssm_tpu.nn.core import (
    Params,
    _fan_in_uniform,
    activation,
    dense_apply,
    dense_init,
)


# ---------------------------------------------------------------------------
# Conv primitives
# ---------------------------------------------------------------------------


def cast_conv_in(model_cfg: object, x: jax.Array) -> jax.Array:
    """Cast a conv-stack input to the model's ``conv_dtype`` (weights follow
    the input dtype inside this module). The single home of the
    mixed-precision cast policy — every encoder/decoder call site in every
    model family must route through this pair so the AMP mapping
    (``trainer.precision: 16-mixed`` → bf16 convs) cannot be partially
    applied."""
    cd = getattr(model_cfg, "conv_dtype", None)
    return x if cd is None else x.astype(cd)


def cast_conv_out(model_cfg: object, x: jax.Array) -> jax.Array:
    """Cast a conv-stack output back to the model compute dtype (see
    ``cast_conv_in``)."""
    cd = getattr(model_cfg, "conv_dtype", None)
    return x if cd is None else x.astype(model_cfg.compute_dtype)


def conv_init(key: jax.Array, in_ch: int, out_ch: int, kernel: int) -> Params:
    """Conv2d params (HWIO), torch-style fan-in uniform init."""
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel * kernel
    return {
        "w": _fan_in_uniform(kw, (kernel, kernel, in_ch, out_ch), fan_in),
        "b": _fan_in_uniform(kb, (out_ch,), fan_in),
    }


def deconv_init(key: jax.Array, in_ch: int, out_ch: int, kernel: int) -> Params:
    """ConvTranspose2d params (HWIO), torch-style init.

    torch computes the init fan from ``weight.size(1) * k * k``; a
    ConvTranspose2d weight is laid out (in, out, kH, kW), so its fan is
    OUT_ch·k² — not in_ch·k² as for Conv2d. Matching that keeps the decoder's
    starting scale (and so optimizer dynamics) in the reference's regime.
    """
    kw, kb = jax.random.split(key)
    fan_in = out_ch * kernel * kernel
    return {
        "w": _fan_in_uniform(kw, (kernel, kernel, in_ch, out_ch), fan_in),
        "b": _fan_in_uniform(kb, (out_ch,), fan_in),
    }


def conv_apply(params: Params, x: jax.Array, stride: int, padding: int) -> jax.Array:
    """2-D conv, NHWC x HWIO → NHWC."""
    w = params["w"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + params["b"].astype(x.dtype)


def conv_transpose_apply(
    params: Params,
    x: jax.Array,
    stride: int,
    padding: int,
    output_padding: int = 0,
) -> jax.Array:
    """Transposed 2-D conv with torch ``ConvTranspose2d`` shape semantics.

    ``out = (in - 1) * stride - 2 * padding + kernel + output_padding``,
    implemented as an input-dilated regular conv (lhs_dilation=stride,
    per-side padding ``kernel - 1 - padding``) with a spatially flipped
    kernel — the standard equivalence, and the form XLA maps onto the MXU.
    """
    w = params["w"].astype(x.dtype)
    k = w.shape[0]
    pad = k - 1 - padding
    y = jax.lax.conv_general_dilated(
        x,
        jnp.flip(w, axis=(0, 1)),
        window_strides=(1, 1),
        padding=((pad, pad + output_padding), (pad, pad + output_padding)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + params["b"].astype(x.dtype)


def coord_channels(batch: int, h: int, w: int, dtype: jnp.dtype) -> jax.Array:
    """CoordConv coordinate feature maps in [-1, 1], shape [batch, h, w, 2]."""
    ys = jnp.linspace(-1.0, 1.0, h, dtype=dtype)
    xs = jnp.linspace(-1.0, 1.0, w, dtype=dtype)
    yy = jnp.broadcast_to(ys[:, None], (h, w))
    xx = jnp.broadcast_to(xs[None, :], (h, w))
    coords = jnp.stack([yy, xx], axis=-1)  # [h, w, 2]
    return jnp.broadcast_to(coords[None], (batch, h, w, 2))


# ---------------------------------------------------------------------------
# Residual block: x + conv3x3(act(conv3x3(x))), then act.
# ---------------------------------------------------------------------------


def residual_block_init(key: jax.Array, channels: int, intermediate: int) -> Params:
    """Init a 2-conv residual block (channels -> intermediate -> channels, 3x3)."""
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv_init(k1, channels, intermediate, 3),
        "conv2": conv_init(k2, intermediate, channels, 3),
    }


def residual_block_apply(params: Params, x: jax.Array,
                         act: Callable[[jax.Array], jax.Array]) -> jax.Array:
    """Apply a residual block: act(x + conv(act(conv(x))))."""
    y = conv_apply(params["conv1"], x, stride=1, padding=1)
    y = act(y)
    y = conv_apply(params["conv2"], y, stride=1, padding=1)
    return act(x + y)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Mirror of the reference's ``cnn.EncoderConfig`` YAML surface
    (reference ``configs/default.yaml:31-45``)."""

    linear_sizes: tuple[int, ...] = (64,)
    activation_name: str = "ELU"
    out_activation_name: str = "Identity"
    channels: tuple[int, ...] = (8, 16, 32)
    kernel_sizes: tuple[int, ...] = (3, 3, 3)
    strides: tuple[int, ...] = (2, 2, 2)
    paddings: tuple[int, ...] = (1, 1, 1)
    num_residual_blocks: int = 3
    residual_intermediate_size: int = 64
    residual_output_size: int = 64
    coord_conv: bool = True
    in_channels: int = 1
    in_hw: tuple[int, int] = (32, 32)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "EncoderConfig":
        d = dict(d)
        for k in ("linear_sizes", "channels", "kernel_sizes", "strides", "paddings", "in_hw"):
            if k in d:
                d[k] = tuple(d[k])
        return cls(**d)

    @property
    def out_dim(self) -> int:
        return self.linear_sizes[-1]

    def _spatial_out(self) -> tuple[int, int]:
        h, w = self.in_hw
        for k, s, p in zip(self.kernel_sizes, self.strides, self.paddings):
            h = (h + 2 * p - k) // s + 1
            w = (w + 2 * p - k) // s + 1
        return h, w


def encoder_init(key: jax.Array, cfg: EncoderConfig) -> Params:
    """Init encoder params: strided convs + residual blocks + linear head."""
    keys = iter(
        jax.random.split(key, len(cfg.channels) + cfg.num_residual_blocks + len(cfg.linear_sizes) + 2)
    )
    in_ch = cfg.in_channels + (2 if cfg.coord_conv else 0)
    convs = []
    for ch, k in zip(cfg.channels, cfg.kernel_sizes):
        convs.append(conv_init(next(keys), in_ch, ch, k))
        in_ch = ch
    params: Params = {"convs": convs}
    if cfg.num_residual_blocks > 0:
        if in_ch != cfg.residual_output_size:
            params["res_proj"] = conv_init(next(keys), in_ch, cfg.residual_output_size, 1)
            in_ch = cfg.residual_output_size
        params["res_blocks"] = [
            residual_block_init(next(keys), in_ch, cfg.residual_intermediate_size)
            for _ in range(cfg.num_residual_blocks)
        ]
    h, w = cfg._spatial_out()
    flat = h * w * in_ch
    linears = []
    for size in cfg.linear_sizes:
        linears.append(dense_init(next(keys), flat, size))
        flat = size
    params["linears"] = linears
    return params


def encoder_apply(params: Params, cfg: EncoderConfig, x: jax.Array) -> jax.Array:
    """Encode ``[..., H, W, C]`` → ``[..., out_dim]`` (any leading batch dims).

    Leading dims are flattened into one conv batch (the reference feeds
    [B, T, C, H, W] sequences whole, ``mopoe_mrssm/core.py:215-216``).
    """
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    x = x.reshape((-1, h, w, c))
    act = activation(cfg.activation_name)
    if cfg.coord_conv:
        x = jnp.concatenate([x, coord_channels(x.shape[0], h, w, x.dtype)], axis=-1)
    for conv, s, p in zip(params["convs"], cfg.strides, cfg.paddings):
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
    x = activation(cfg.out_activation_name)(x)
    return x.reshape((*lead, x.shape[-1]))


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Mirror of the reference's ``cnn.DecoderConfig`` YAML surface
    (reference ``configs/default.yaml:61-92``).

    ``conv_in_shape`` keeps the reference's CHW ordering ``[C, H, W]``;
    internally we reshape to HWC. ``in_features`` replaces the reference's
    lazy/inferred input width (SURVEY §7 "lazy decoder input width"): 48 for
    MRSSM features, 96 for MMTRSSM.
    """

    in_features: int
    linear_sizes: tuple[int, ...] = (64, 1024)
    conv_in_shape: tuple[int, int, int] = (64, 4, 4)
    activation_name: str = "ELU"
    out_activation_name: str = "Tanh"
    channels: tuple[int, ...] = (32, 16, 1)
    kernel_sizes: tuple[int, ...] = (4, 4, 4)
    strides: tuple[int, ...] = (2, 2, 2)
    paddings: tuple[int, ...] = (1, 1, 1)
    output_paddings: tuple[int, ...] = (0, 0, 0)
    num_residual_blocks: int = 3
    residual_intermediate_size: int = 128
    residual_input_size: int = 64

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "DecoderConfig":
        d = dict(d)
        d.pop("residual_output_size", None)
        for k in (
            "linear_sizes", "conv_in_shape", "channels", "kernel_sizes",
            "strides", "paddings", "output_paddings",
        ):
            if k in d:
                d[k] = tuple(d[k])
        return cls(**d)


def decoder_init(key: jax.Array, cfg: DecoderConfig) -> Params:
    """Init decoder params: linear stack + residual blocks + transposed convs."""
    keys = iter(
        jax.random.split(key, len(cfg.linear_sizes) + cfg.num_residual_blocks + len(cfg.channels) + 2)
    )
    linears = []
    flat = cfg.in_features
    for size in cfg.linear_sizes:
        linears.append(dense_init(next(keys), flat, size))
        flat = size
    c_in = cfg.conv_in_shape[0]
    params: Params = {"linears": linears}
    if cfg.num_residual_blocks > 0:
        in_ch = c_in
        if in_ch != cfg.residual_input_size:
            params["res_proj"] = conv_init(next(keys), in_ch, cfg.residual_input_size, 1)
            in_ch = cfg.residual_input_size
        params["res_blocks"] = [
            residual_block_init(next(keys), in_ch, cfg.residual_intermediate_size)
            for _ in range(cfg.num_residual_blocks)
        ]
        c_in = in_ch
    deconvs = []
    for ch, k in zip(cfg.channels, cfg.kernel_sizes):
        deconvs.append(deconv_init(next(keys), c_in, ch, k))
        c_in = ch
    params["deconvs"] = deconvs
    return params


# ---------------------------------------------------------------------------
# Space-to-depth (s2d) conv layout — exact re-expression of the same math
# ---------------------------------------------------------------------------
#
# The toy-width conv stacks are HBM-layout-bound on TPU: NHWC activations
# with 1-32 channels pad to the 128-lane register tile, and the measured
# counter-experiments (benchmarks/bench_s2d.py, 2026-08-19 on-chip, exact to
# ≤3e-8) put the recoverable share at encoder 1.106× / last-deconv 1.056× of
# conv time at B·T=3840 bf16. The transforms below are those experiments
# productized: every k3 s2 p1 conv runs as a small-kernel s1 conv over the
# space-to-depth(2) grid of its input (4× the lanes), and the last k4 s2 p1
# deconv emits the four depth-to-space phases directly. Same parameters,
# same math — the rearranged kernels are pure gathers of the shipped ones,
# so gradients flow back to the canonical layout and checkpoints/eval/viz
# are layout-agnostic. Opt in per model via ``conv_layout="s2d"``.


def space_to_depth(x: jax.Array, r: int = 2) -> jax.Array:
    """[..., H, W, C] → [..., H/r, W/r, C·r²]; channel index = (cy·r + cx)·C + c."""
    *lead, h, w, c = x.shape
    x = x.reshape(*lead, h // r, r, w // r, r, c)
    nd = len(lead)
    perm = (*range(nd), nd, nd + 2, nd + 1, nd + 3, nd + 4)
    return x.transpose(perm).reshape(*lead, h // r, w // r, r * r * c)


def depth_to_space(x: jax.Array, r: int = 2) -> jax.Array:
    """Inverse of :func:`space_to_depth`."""
    *lead, h, w, rc = x.shape
    c = rc // (r * r)
    x = x.reshape(*lead, h, w, r, r, c)
    nd = len(lead)
    perm = (*range(nd), nd, nd + 2, nd + 1, nd + 3, nd + 4)
    return x.transpose(perm).reshape(*lead, h * r, w * r, c)


def _entry_s2d_index_maps() -> tuple:
    """Static index/mask tensors mapping a k3 s2 p1 entry kernel (single
    image channel) onto a k3 s1 kernel over the s2d(2) grid's 4 image
    channels. Output pixel (i,j) of the shipped conv reads input rows
    2i+di, di∈{−1,0,1}; on the s2d grid row 2p+cy that is dy=(di−cy)/2,
    valid when di−cy is even and |dy|≤1."""
    import numpy as np

    iy = np.zeros((3, 3, 4), np.int32)
    ix = np.zeros((3, 3, 4), np.int32)
    valid = np.zeros((3, 3, 4), bool)
    for cy in range(2):
        for cx in range(2):
            ch = cy * 2 + cx
            for dy in (-1, 0, 1):
                di = 2 * dy + cy
                if not -1 <= di <= 1:
                    continue
                for dx in (-1, 0, 1):
                    dj = 2 * dx + cx
                    if not -1 <= dj <= 1:
                        continue
                    iy[dy + 1, dx + 1, ch] = di + 1
                    ix[dy + 1, dx + 1, ch] = dj + 1
                    valid[dy + 1, dx + 1, ch] = True
    return iy, ix, valid


def conv1_s2d_weights(w: jax.Array) -> jax.Array:
    """Rearrange a k3 s2 p1 entry kernel's IMAGE channel ([3,3,·,out] —
    channel 0; CoordConv channels are folded into a bias map by the caller)
    into a [3,3,4,out] k3 s1 kernel over the s2d(2) grid, as ONE gather
    (trace-time-constant indices) so the per-step cost inside jit is a
    single tiny gather, not a scatter chain."""
    iy, ix, valid = _entry_s2d_index_maps()
    gathered = w[jnp.asarray(iy), jnp.asarray(ix), 0]  # [3,3,4,out]
    return jnp.where(jnp.asarray(valid)[..., None], gathered, 0)


def _k3s2_index_maps() -> tuple:
    """Static maps for :func:`k3s2_to_k2s1_weights`: (cy,cx,phase) →
    source tap (dy+1, dx+1), phase = py·2+px, dy = 2·cy+py−2."""
    import numpy as np

    iy = np.zeros((2, 2, 4), np.int32)
    ix = np.zeros((2, 2, 4), np.int32)
    valid = np.zeros((2, 2, 4), bool)
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
                    ph = py * 2 + px
                    iy[cy, cx, ph] = dy + 1
                    ix[cy, cx, ph] = dx + 1
                    valid[cy, cx, ph] = True
    return iy, ix, valid


def k3s2_to_k2s1_weights(w: jax.Array) -> jax.Array:
    """Rearrange a k3 s2 p1 kernel ([3,3,C,C']) into a k2 s1 kernel
    ([2,2,4C,C'], padding ((1,0),(1,0))) over the s2d(2) input grid — the
    mid-stack half of the chained-s2d encoder. The contracting dim becomes
    2·2·4C (128 exactly for C=8) instead of 3·3·C padded to a lane tile."""
    iy, ix, valid = _k3s2_index_maps()
    g = w[jnp.asarray(iy), jnp.asarray(ix)]  # [2,2,4,C,C']
    g = jnp.where(jnp.asarray(valid)[..., None, None], g, 0)
    return g.reshape(2, 2, 4 * w.shape[2], w.shape[3])


def _deconv_phase_index_maps() -> tuple:
    """Static maps for :func:`deconv_phase_weights`: (dy+1, dx+1, phase) →
    source tap (ky, kx), phase = r·2+c, ky = r+1−2·dy."""
    import numpy as np

    iy = np.zeros((3, 3, 4), np.int32)
    ix = np.zeros((3, 3, 4), np.int32)
    valid = np.zeros((3, 3, 4), bool)
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
                    iy[dy + 1, dx + 1, ph] = ky
                    ix[dy + 1, dx + 1, ph] = kx
                    valid[dy + 1, dx + 1, ph] = True
    return iy, ix, valid


def deconv_phase_weights(w: jax.Array) -> jax.Array:
    """Rearrange a k4 s2 p1 deconv kernel ([4,4,C,C'], stored HWIO,
    unflipped) into a k3 s1 conv kernel ([3,3,C,4C']) whose output's
    ``depth_to_space`` equals the deconv output — phase blocks are
    channel-major (phase·C' + c')."""
    iy, ix, valid = _deconv_phase_index_maps()
    g = w[jnp.asarray(iy), jnp.asarray(ix)]  # [3,3,4,C,C']
    g = jnp.where(jnp.asarray(valid)[..., None, None], g, 0)
    # [3,3,4,C,C'] → [3,3,C,4,C'] → [3,3,C,4C']
    return g.transpose(0, 1, 3, 2, 4).reshape(3, 3, w.shape[2], 4 * w.shape[3])


def encoder_s2d_applicable(cfg: EncoderConfig) -> bool:
    """Whether :func:`encoder_apply_s2d` can re-express this encoder
    exactly: single image channel, every conv k3 s2 p1, and spatial dims
    even at every stage (the default 32×32 Audio-MNIST stack qualifies)."""
    n = len(cfg.channels)
    h, w = cfg.in_hw
    return (
        cfg.in_channels == 1
        and all(k == 3 for k in cfg.kernel_sizes)
        and all(s == 2 for s in cfg.strides)
        and all(p == 1 for p in cfg.paddings)
        and h % (2 ** n) == 0
        and w % (2 ** n) == 0
    )


def decoder_s2d_applicable(cfg: DecoderConfig) -> bool:
    """Whether :func:`decoder_apply_s2d` applies: the LAST deconv (the only
    transformed layer — the measured win lives in the 1-channel boundary,
    BASELINE.md roofline) must be k4 s2 p1 without output padding."""
    return (
        cfg.kernel_sizes[-1] == 4
        and cfg.strides[-1] == 2
        and cfg.paddings[-1] == 1
        and cfg.output_paddings[-1] == 0
    )


def s2d_auto_profitable(
    encoder_cfgs: tuple[EncoderConfig, ...],
    decoder_cfgs: tuple[DecoderConfig, ...],
) -> bool:
    """Whether ``conv_layout="auto"`` should pick the s2d layout for these
    stacks: every stack must be s2d-eligible AND every chained-s2d encoder
    conv's expanded read (4× its input channels) must fit ONE 128-lane
    register tile. The re-expression trades 16/9× nominal taps per
    mid-stack conv (a k3 kernel scattered into a k2 kernel over 4× lanes)
    for recovered lane padding — profitable only while the original reads
    sit far below the 128-lane tile. Both regimes are measured on-chip
    (2026-08-20, BASELINE.md): the toy-width reference stacks (max conv
    width 32 ⇒ expanded reads ≤64 lanes) win 1.04-1.09×; the 27M scaled
    config (widths to 256 ⇒ expanded reads to 512 lanes) loses 0.93×."""
    for c in encoder_cfgs:
        if not encoder_s2d_applicable(c):
            return False
        # conv_i (i ≥ 2) reads s2d-expanded channels[i-1]·4 lanes.
        if any(4 * ch > 128 for ch in c.channels[:-1]):
            return False
    return all(decoder_s2d_applicable(c) for c in decoder_cfgs)


def encoder_apply_s2d(params: Params, cfg: EncoderConfig, x: jax.Array) -> jax.Array:
    """:func:`encoder_apply` in the chained-s2d layout — bit-identical math
    on the same params (pinned by ``tests/test_s2d_layout.py``), but every
    conv reads 4× the input lanes: the entry conv runs k3 s1 on the
    s2d(2)'d input with the CoordConv contribution folded into a
    precomputed bias map (coordinate channels are constant, so their conv
    response is input-independent), and each mid-stack k3 s2 conv runs as
    k2 s1 over its input's s2d grid. Callers pass NATURAL [..., H, W, C]
    inputs; guard with :func:`encoder_s2d_applicable`."""
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    x = x.reshape((-1, h, w, c))
    act = activation(cfg.activation_name)
    w1 = params["convs"][0]["w"].astype(x.dtype)
    b1 = params["convs"][0]["b"].astype(x.dtype)
    x = space_to_depth(x)
    y = jax.lax.conv_general_dilated(
        x, conv1_s2d_weights(w1), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if cfg.coord_conv:
        coords = coord_channels(1, h, w, x.dtype)
        coord_map = jax.lax.conv_general_dilated(
            coords, w1[:, :, 1:], window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + coord_map
    x = act(y + b1)
    for conv in params["convs"][1:]:
        wk = k3s2_to_k2s1_weights(conv["w"].astype(x.dtype))
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
    x = activation(cfg.out_activation_name)(x)
    return x.reshape((*lead, x.shape[-1]))


def decoder_apply_s2d(params: Params, cfg: DecoderConfig, x: jax.Array) -> jax.Array:
    """:func:`decoder_apply` emitting the LAST layer's depth-to-space
    phases [..., H/2, W/2, 4·C_out] instead of [..., H, W, C_out]
    (``depth_to_space`` of the result equals ``decoder_apply`` exactly —
    pinned by ``tests/test_s2d_layout.py``). The Gaussian NLL sums over
    the event dims, so training losses can be computed against
    ``space_to_depth``'d targets without ever materializing the full-res
    frame. Guard with :func:`decoder_s2d_applicable`."""
    lead = x.shape[:-1]
    x = x.reshape((-1, x.shape[-1]))
    act = activation(cfg.activation_name)
    for lin in params["linears"]:
        x = act(dense_apply(lin, x))
    c, h, w = cfg.conv_in_shape
    x = x.reshape((-1, c, h, w)).transpose(0, 2, 3, 1)
    if "res_proj" in params:
        x = act(conv_apply(params["res_proj"], x, stride=1, padding=0))
    for block in params.get("res_blocks", []):
        x = residual_block_apply(block, x, act)
    deconvs = params["deconvs"]
    for i, (dc, s, p, op) in enumerate(
        zip(deconvs[:-1], cfg.strides, cfg.paddings, cfg.output_paddings)
    ):
        x = act(conv_transpose_apply(dc, x, stride=s, padding=p, output_padding=op))
    last = deconvs[-1]
    x = jax.lax.conv_general_dilated(
        x, deconv_phase_weights(last["w"]).astype(x.dtype),
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # Phase-major channel blocks ⇒ the deconv bias tiles 4× over phases.
    x = x + jnp.tile(last["b"].astype(x.dtype).reshape(-1), 4)
    x = activation(cfg.out_activation_name)(x)
    return x.reshape((*lead, *x.shape[1:]))


def decoder_apply(params: Params, cfg: DecoderConfig, x: jax.Array) -> jax.Array:
    """Decode ``[..., in_features]`` → ``[..., H, W, C_out]``."""
    lead = x.shape[:-1]
    x = x.reshape((-1, x.shape[-1]))
    act = activation(cfg.activation_name)
    for lin in params["linears"]:
        x = act(dense_apply(lin, x))
    c, h, w = cfg.conv_in_shape
    # Reshape via CHW then move channels last, so the linear head's unit
    # ordering matches the reference's torch [C, H, W] view.
    x = x.reshape((-1, c, h, w)).transpose(0, 2, 3, 1)
    if "res_proj" in params:
        x = act(conv_apply(params["res_proj"], x, stride=1, padding=0))
    for block in params.get("res_blocks", []):
        x = residual_block_apply(block, x, act)
    deconvs = params["deconvs"]
    for i, (dc, k, s, p, op) in enumerate(
        zip(deconvs, cfg.kernel_sizes, cfg.strides, cfg.paddings, cfg.output_paddings)
    ):
        x = conv_transpose_apply(dc, x, stride=s, padding=p, output_padding=op)
        if i < len(deconvs) - 1:
            x = act(x)
    x = activation(cfg.out_activation_name)(x)
    return x.reshape((*lead, *x.shape[1:]))
