"""Device mesh + batch-data-parallel sharding.

The reference has no parallelism of its own — its only distributed-aware
code is Lightning's ``sync_dist=True`` metric reduction (reference
``src/multimodal_rssm/models/core.py:243,265``; SURVEY §2.3). The TPU-native
equivalent implemented here:

- a 1-D ``data`` mesh over all chips (ICI within a slice, DCN across
  slices — JAX orders the mesh so collectives ride ICI first),
- parameters and optimizer state replicated (the models are ~100k-1M
  params; sharding them would only add collective latency),
- the batch sharded on axis 0,
- loss/metric reduction via ``jax.lax.pmean`` semantics supplied implicitly
  by jit-over-sharded-batch: the mean in the loss already averages over the
  global batch, and XLA inserts the cross-chip psum.

Everything goes through ``jax.jit`` + ``NamedSharding`` (no pmap, no
shard_map needed at this model scale).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: list | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs.reshape(-1), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard axis 0 (batch) across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params, optimizer state, RNG keys)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: tuple, mesh: Mesh, axis_name: str = DATA_AXIS) -> tuple:
    """Place a host batch on the mesh, sharded along the batch axis.

    The global batch size must divide the mesh size; callers control this by
    choosing per-chip batch × n_chips.
    """
    sharding = batch_sharding(mesh, axis_name)
    return tuple(jax.device_put(x, sharding) for x in batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.device_put(tree, sharding)
