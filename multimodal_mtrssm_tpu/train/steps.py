"""Shared jitted-step builders: ONE home for the train-step math.

The Trainer's fast path, ``bench.py``, and the driver's multi-chip dry run
(``__graft_entry__.dryrun_multichip``) all build their steps here, so the
equivalence test pinning the Trainer's multi-step scan
(``tests/test_trainer.py::test_steps_per_dispatch_matches_per_step_loop``)
covers exactly the math the benchmarks measure — a private re-implementation
in a bench harness could silently drift (e.g. a Trainer-side change to the
key-folding scheme or optimizer application would otherwise keep old bench
numbers "green").

Semantics (pinned): per-step RNG is ``fold_in(key, step)`` computed INSIDE
jit; the optimizer update is applied as ``p + u`` (the flat-vector AdamW
returns displacement updates); the scan variant sums the per-step metric
vectors on device so one host transfer serves K steps.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import jax
import jax.numpy as jnp


def one_update(model: Any, optimizer: Any, params: Any, opt_state: Any,
               batch: tuple, key: jax.Array) -> tuple:
    """One optimizer step at an already-folded per-step key."""

    def loss_fn(p):
        d = model.shared_step(p, batch, key)
        return d["loss"], d

    grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = jax.tree.map(lambda p, u: p + u, params, updates)
    return params, opt_state, metrics


def make_train_step(model: Any, optimizer: Any) -> Callable:
    """(params, opt_state, batch, key, step) → (params, opt_state, metrics)."""

    def train_step(params, opt_state, batch, key, step):
        # Per-step key derived inside jit: no host→device RNG traffic.
        return one_update(
            model, optimizer, params, opt_state, batch, jax.random.fold_in(key, step)
        )

    return train_step


def make_train_scan(model: Any, optimizer: Any) -> Callable:
    """K train steps in one dispatch: scan over the leading axis of a
    [K, B, ...] batch stack. Per-step math/RNG identical to
    ``make_train_step(...)(…, step0 + i)``."""

    def train_scan(params, opt_state, stacked, key, step0):
        k = stacked[0].shape[0]

        def body(carry, xs):
            p, s = carry
            batch, step = xs
            p, s, metrics = one_update(
                model, optimizer, p, s, batch, jax.random.fold_in(key, step)
            )
            return (p, s), metrics

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), (stacked, step0 + jnp.arange(k))
        )
        # Per-step metric vectors summed on device (all k batches are
        # full-size, so the host applies one weight to the sum).
        return params, opt_state, jax.tree.map(jnp.sum, metrics)

    return train_scan
