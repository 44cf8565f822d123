"""Pallas TPU kernels for the recurrence hot paths."""

from multimodal_mtrssm_tpu.ops.pallas.rollout import fused_rollout_transition, pack_params

__all__ = ["fused_rollout_transition", "pack_params"]
