"""Small shared utilities (seeding, pytree introspection, compile cache)."""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache (first TPU compile of the
    train step costs ~20-40s; cached reloads take ~4s). Harness entry points
    call this; set ``MMTRSSM_NO_COMPILE_CACHE=1`` to disable."""
    if os.environ.get("MMTRSSM_NO_COMPILE_CACHE"):
        return None
    cache_dir = cache_dir or os.environ.get(
        "MMTRSSM_COMPILE_CACHE", os.path.expanduser("~/.cache/multimodal_mtrssm_tpu/jax")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return cache_dir


def seed_everything(seed: int) -> jax.Array:
    """Seed host numpy and return a fresh JAX root key (the TPU-native
    counterpart of Lightning's ``seed_everything``, reference
    ``configs/default.yaml:2`` — device RNG in JAX is per-key, so the key is
    the seed)."""
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def count_params(tree: Any) -> int:
    """Total number of scalar parameters in a pytree."""
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def tree_size_bytes(tree: Any) -> int:
    """Total bytes of all arrays in a pytree."""
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def describe_params(tree: Any, prefix: str = "") -> str:
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
