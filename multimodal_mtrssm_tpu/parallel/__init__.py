"""Mesh construction and data-parallel sharding."""

from multimodal_mtrssm_tpu.parallel.mesh import (
    DATA_AXIS,
    DCN_AXIS,
    batch_sharding,
    ici_size,
    make_hybrid_mesh,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
    slice_groups,
)

__all__ = [
    "DATA_AXIS",
    "DCN_AXIS",
    "batch_sharding",
    "ici_size",
    "make_hybrid_mesh",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
    "slice_groups",
]
