"""Latent-state pytrees for RSSM variants.

TPU-native replacement for the reference's ``State``/``MTState`` classes
(reference ``src/multimodal_rssm/models/state.py:11-152`` and
``src/multimodal_rssm/models/mmtrssm/state.py:11-248``). Differences by
design:

- States are immutable ``flax.struct`` pytrees, so they flow through
  ``jax.jit`` / ``lax.scan`` / ``pjit`` transparently and can be sharded.
- Sampling is explicit: the reference's ``State.__init__`` lazily calls
  ``distribution.rsample()`` when ``stoch`` is missing (reference
  ``state.py:17``); in JAX randomness needs a key, so construction sites
  pass ``stoch`` explicitly (use :func:`state_from_logits` to replicate the
  sample-on-construction behavior with a key).
- ``stack``/``cat`` are generic pytree maps instead of per-field code.
- The reference's ``MTState.clone()`` bug (assigns ``distribution_h`` from
  ``distribution_l``, reference ``mmtrssm/state.py:133``) is NOT replicated;
  pytrees are immutable so ``clone`` is the identity.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from multimodal_mtrssm_tpu.ops.distributions import MultiOneHot


@struct.dataclass
class State:
    """Latent state: deterministic ``deter`` + stochastic ``stoch`` + posterior dist.

    Reference parity: ``state.py:11-18``. ``feature`` is a property (computed,
    never stored) = ``concat(deter, stoch)`` (reference ``state.py:18``).
    """

    deter: jax.Array
    stoch: jax.Array
    distribution: MultiOneHot

    @property
    def feature(self) -> jax.Array:
        return jnp.concatenate([self.deter, self.stoch.astype(self.deter.dtype)], axis=-1)

    def __getitem__(self, loc) -> "State":
        return State(
            deter=self.deter[loc],
            stoch=self.stoch[loc],
            distribution=self.distribution[loc],
        )

    def detach(self) -> "State":
        return jax.tree.map(jax.lax.stop_gradient, self)

    def squeeze(self, axis: int) -> "State":
        return jax.tree.map(lambda x: jnp.squeeze(x, axis=axis), self)

    def unsqueeze(self, axis: int) -> "State":
        return jax.tree.map(lambda x: jnp.expand_dims(x, axis=axis), self)


@struct.dataclass
class MTState:
    """Hierarchical two-timescale latent state (reference ``mmtrssm/state.py:11-51``).

    ``hidden_h``/``hidden_l`` are the MTRNN pre-tanh leaky-integrator cells —
    the reference keeps them as *mutable module attributes* on ``MTRNN``
    (reference ``mopoe_mmtrssm/core.py:38,51-59``); here they are explicit
    carried fields, which functionalizes the recurrence for ``lax.scan``.
    """

    deter_h: jax.Array
    deter_l: jax.Array
    stoch_h: jax.Array
    stoch_l: jax.Array
    distribution_h: MultiOneHot
    distribution_l: MultiOneHot
    hidden_h: jax.Array
    hidden_l: jax.Array

    @property
    def feature(self) -> jax.Array:
        """``concat(deter_h, stoch_h, deter_l, stoch_l)`` (reference ``state.py:51``)."""
        d = self.deter_h.dtype
        return jnp.concatenate(
            [self.deter_h, self.stoch_h.astype(d), self.deter_l, self.stoch_l.astype(d)],
            axis=-1,
        )

    def __getitem__(self, loc) -> "MTState":
        return jax.tree.map(lambda x: x[loc], self)

    def detach(self) -> "MTState":
        return jax.tree.map(jax.lax.stop_gradient, self)

    def squeeze(self, axis: int) -> "MTState":
        return jax.tree.map(lambda x: jnp.squeeze(x, axis=axis), self)

    def unsqueeze(self, axis: int) -> "MTState":
        return jax.tree.map(lambda x: jnp.expand_dims(x, axis=axis), self)


def state_from_logits(
    deter: jax.Array,
    logits: jax.Array,
    class_size: int,
    category_size: int,
    key: jax.Array | None = None,
    stoch: jax.Array | None = None,
) -> State:
    """Build a ``State``, sampling ``stoch`` if not given (reference ``state.py:17``)."""
    dist = MultiOneHot(logits=logits, class_size=class_size, category_size=category_size)
    if stoch is None:
        if key is None:
            raise ValueError("state_from_logits needs `key` when `stoch` is not given")
        stoch = dist.rsample(key)
    return State(deter=deter, stoch=stoch, distribution=dist)


def stack_states(states: list, axis: int) -> Any:
    """Stack states along a new axis (reference ``state.py:121-135`` / ``:184-216``)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=axis), *states)


def cat_states(states: list, axis: int) -> Any:
    """Concatenate states along an existing axis (reference ``state.py:138-152``)."""
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=axis), *states)
