"""Compute primitives: distributions, fusion, likelihood, fused kernels."""

from multimodal_mtrssm_tpu.ops.distributions import (
    MultiOneHot,
    cat_distributions,
    kl_balanced,
    kl_categorical,
    multi_one_hot,
    stack_distributions,
)
from multimodal_mtrssm_tpu.ops.fusion import mopoe_mix_log_probs, poe_fuse_log_probs
from multimodal_mtrssm_tpu.ops.likelihood import gaussian_nll

__all__ = [
    "MultiOneHot",
    "cat_distributions",
    "gaussian_nll",
    "kl_balanced",
    "kl_categorical",
    "mopoe_mix_log_probs",
    "multi_one_hot",
    "poe_fuse_log_probs",
    "stack_distributions",
]
