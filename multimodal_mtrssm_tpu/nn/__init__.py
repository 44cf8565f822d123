"""Functional NN toolkit (pure init/apply pairs over param pytrees)."""

from multimodal_mtrssm_tpu.nn.conv import (
    DecoderConfig,
    EncoderConfig,
    decoder_apply,
    decoder_init,
    encoder_apply,
    encoder_init,
)
from multimodal_mtrssm_tpu.nn.core import (
    ACTIVATIONS,
    activation,
    dense_apply,
    dense_init,
    gru_apply,
    gru_init,
    mlp_apply,
    mlp_init,
    mtrnn_apply,
    mtrnn_init,
)

__all__ = [
    "ACTIVATIONS",
    "DecoderConfig",
    "EncoderConfig",
    "activation",
    "decoder_apply",
    "decoder_init",
    "dense_apply",
    "dense_init",
    "encoder_apply",
    "encoder_init",
    "gru_apply",
    "gru_init",
    "mlp_apply",
    "mlp_init",
    "mtrnn_apply",
    "mtrnn_init",
]
