"""Shared benchmark utilities: synthetic batches + the backend-safe timing
policy.

Timing policy (CLAUDE.md invariants, measured on this tunneled backend):
- warm up ≥30 iterations before timing (the backend does background work
  for ~1-2 s after first execution);
- fence timing windows with a HOST TRANSFER (``float(x)``), never
  ``block_until_ready`` (observed returning early post-warmup);
- take the min over windows but REJECT windows below 0.25× the median
  (early-return anomalies produce impossible sub-ms readings).

``bench.py`` and ``benchmarks/bench_train_kernel.py`` pioneered the policy;
every other benchmark reuses it from here so it cannot drift.
"""

from __future__ import annotations

import statistics
import time
from typing import Any, Callable

import jax

MIN_WARMUP_ITERS = 30


def synthetic_batch6(key: jax.Array, B: int, T: int, stacked_k: int | None = None,
                     hw: int = 32) -> tuple:
    """The 6-tuple (action, audio_in, vision_in, action, audio, vision)
    batch every benchmark feeds ``shared_step`` — one home for the contract
    (mirrors ``data/pipeline.py::_make_batch``'s stream order). Inputs and
    targets share the same arrays (bit-identical to generating twice from
    the same keys, half the device footprint).

    ``stacked_k``: if set, returns [K, B, ...] stacks for the multi-step
    scan path.
    """
    ks = jax.random.split(key, 3)
    lead = (B,) if stacked_k is None else (stacked_k, B)
    act = jax.random.normal(ks[0], (*lead, T, 6))
    aud = jax.random.uniform(ks[1], (*lead, T, hw, hw, 1), minval=-1, maxval=1)
    vis = jax.random.uniform(ks[2], (*lead, T, hw, hw, 1), minval=-1, maxval=1)
    return (act, aud, vis, act, aud, vis)


def best_window(times: list[float]) -> float:
    """Min over timing windows, rejecting sub-0.25×median anomalies."""
    med = statistics.median(times)
    return min(t for t in times if t > 0.25 * med)


def timeit_fenced(fn: Callable[..., Any], *args: Any,
                  warmup: int = MIN_WARMUP_ITERS, windows: int = 5,
                  iters: int = 10) -> float:
    """Seconds per call of ``fn(*args)`` under the full timing policy.

    ``fn`` must return a value with a float()-able leaf (an array or a tuple
    whose first element is); each window is fenced by transferring it.
    """

    def fence(out):
        x = out[0] if isinstance(out, (tuple, list)) else out
        leaves = jax.tree.leaves(x)
        float(jax.numpy.ravel(leaves[0])[0])

    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    fence(out)
    times = []
    for _ in range(max(windows, 2)):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        fence(out)
        times.append((time.perf_counter() - t0) / iters)
    return best_window(times)
