"""Small shared utilities (seeding, pytree introspection)."""

from __future__ import annotations

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed host numpy and return a fresh JAX root key (the TPU-native
    counterpart of Lightning's ``seed_everything``, reference
    ``configs/default.yaml:2`` — device RNG in JAX is per-key, so the key is
    the seed)."""
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def count_params(tree) -> int:
    """Total number of scalar parameters in a pytree."""
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def tree_size_bytes(tree) -> int:
    """Total bytes of all arrays in a pytree."""
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def describe_params(tree, prefix: str = "") -> str:
    """Human-readable parameter summary (name, shape, count) for debugging."""
    lines = []

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{path}/{k}" if path else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f"{path}[{i}]")
        else:
            lines.append(f"{prefix}{path}: {tuple(node.shape)} = {int(np.prod(node.shape))}")

    walk(tree, "")
    lines.append(f"{prefix}TOTAL: {count_params(tree):,}")
    return "\n".join(lines)
