"""Pallas TPU kernels for the recurrence hot paths."""

from multimodal_mtrssm_tpu.ops.pallas.rollout import fused_rollout_transition, pack_params
from multimodal_mtrssm_tpu.ops.pallas.rollout_mt import (
    fused_mt_rollout_transition,
    pack_mt_params,
)

__all__ = [
    "fused_mt_rollout_transition",
    "fused_rollout_transition",
    "pack_mt_params",
    "pack_params",
]
