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
