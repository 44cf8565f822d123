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

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
DCN_AXIS = "dcn"


def make_mesh(devices: list | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs.reshape(-1), (axis_name,))


def slice_groups(devices: list) -> list[list]:
    """Group devices by TPU slice (``slice_index``; one group off-TPU).

    Within a group, links are ICI; across groups, DCN.
    """
    groups: dict[int, list] = {}
    for d in devices:
        groups.setdefault(getattr(d, "slice_index", 0) or 0, []).append(d)
    return [groups[k] for k in sorted(groups)]


def make_hybrid_mesh(
    devices: list | None = None,
    dcn_size: int | None = None,
    dcn_axis: str = DCN_AXIS,
    axis_name: str = DATA_AXIS,
) -> Mesh:
    """2-D ``(dcn, data)`` mesh for multi-slice pods: the inner ``data`` axis
    stays within one slice (ICI), the outer ``dcn`` axis crosses slices.

    Both axes carry data parallelism; the split matters for WHERE collectives
    run: anything annotated over ``data`` only (e.g. ZeRO-1 moment shards and
    their parameter-step all-gather) rides ICI, while only the gradient psum
    crosses DCN — the layout recipe from the scaling-book mental model.

    ``dcn_size=None`` auto-detects slices (1-D ``data`` mesh when there is
    only one); an explicit ``dcn_size`` forces the outer dimension, which is
    how the virtual CPU mesh tests a simulated 2-slice pod.
    """
    devs = list(devices if devices is not None else jax.devices())
    if dcn_size is None:
        groups = slice_groups(devs)
        if len(groups) <= 1:
            return make_mesh(devs, axis_name)
        sizes = {len(g) for g in groups}
        if len(sizes) != 1:
            raise ValueError(f"unequal slice sizes {sorted(sizes)}; pass dcn_size explicitly")
        dcn_size = len(groups)
        devs = [d for g in groups for d in g]
    if len(devs) % dcn_size:
        raise ValueError(f"{len(devs)} devices not divisible by dcn_size={dcn_size}")
    arr = np.asarray(devs).reshape(dcn_size, -1)
    return Mesh(arr, (dcn_axis, axis_name))


def ici_size(mesh: Mesh, axis_name: str = DATA_AXIS) -> int:
    """Size of the within-slice (ICI) axis — the ZeRO-1 shard count."""
    return mesh.shape[axis_name]


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard axis 0 (batch) across every mesh axis (pure DP: on a hybrid
    mesh the batch splits over slices and chips alike)."""
    names = mesh.axis_names
    return NamedSharding(mesh, P(names if len(names) > 1 else axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params, optimizer state, RNG keys)."""
    return NamedSharding(mesh, P())


def stacked_batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding for a [K, B, ...] stack of K batches (the multi-step-scan
    training path): leading scan axis replicated, batch axis sharded."""
    names = mesh.axis_names
    return NamedSharding(mesh, P(None, names if len(names) > 1 else axis_name))


def shard_batch(batch: tuple, mesh: Mesh, axis_name: str = DATA_AXIS) -> tuple:
    """Place a host batch on the mesh, sharded along the batch axis.

    The global batch size must divide the mesh size; callers control this by
    choosing per-chip batch × n_chips.
    """
    sharding = batch_sharding(mesh, axis_name)
    return tuple(jax.device_put(x, sharding) for x in batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.device_put(tree, sharding)


def put_sharded(x: np.ndarray, sharding: NamedSharding) -> jax.Array:
    """Place one host array onto a (possibly multi-host) sharding.

    Single-process: plain ``jax.device_put``. Under multi-process (pod-scale
    DP, one process per host), a sharding spans devices this process cannot
    address, so the global array is assembled from per-shard callbacks
    instead — each process materializes ONLY the rows its local chips own
    (``jax.make_array_from_callback``); JAX stitches the global logical
    array without any cross-host data movement. The Audio-MNIST dataset is
    tiny, so every host holds the full preprocessed arrays and slices its
    own shard — the standard "replicated dataset, sharded batch" input
    recipe for data-parallel pods.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])
