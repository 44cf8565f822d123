"""MoPoE fusion primitives (PoE product + MoE mixture of modality subsets).

Behavior contract from the reference (replicated exactly, including its two
quirks — do NOT "fix" them, they define the trained objective):

1. ``log_softmax`` is taken over the FULL flat logit axis (width
   ``class*category``), not per category block
   (reference ``mopoe_mrssm/core.py:101-102,241-242``).
2. The PoE term inside the mixture is the *unnormalized* sum of
   log-probabilities — it is not renormalized before the logsumexp
   (reference ``mopoe_mrssm/core.py:105,243``).

The mixed output is then fed as raw logits to ``MultiOneHot``, whose
per-block softmax performs the only normalization that matters downstream.

All fusion math runs in float32.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# Computed host-side: a device op here would initialize the JAX backend
# (and claim the single-tenant TPU) as an import side effect. f32-rounded
# to keep the fusion math bit-identical to the previous device-computed
# value.
_LOG_THIRD = float(np.float32(-math.log(3.0)))


def poe_fuse_log_probs(audio_logits: jax.Array, vision_logits: jax.Array) -> jax.Array:
    """PoE fusion: sum of full-axis log-softmaxed logits.

    Reference ``mopoe_mrssm/core.py:100-105``. Returns the *unnormalized*
    fused log-probabilities (f32).
    """
    a = jax.nn.log_softmax(audio_logits.astype(jnp.float32), axis=-1)
    v = jax.nn.log_softmax(vision_logits.astype(jnp.float32), axis=-1)
    return a + v


def mopoe_mix_log_probs(
    audio_logits: jax.Array,
    vision_logits: jax.Array,
    log_weights: jax.Array | None = None,
) -> jax.Array:
    """MoE logsumexp over the subsets {A}, {V}, {A+V}.

    Reference ``mopoe_mrssm/core.py:136-154`` (the 2^M - 1 non-empty modality
    subsets for M=2). Returns mixed log-probabilities (f32) to be used as
    ``MultiOneHot`` logits.

    ``log_weights`` (``[..., 3]``, log-space, broadcast against the logits'
    batch dims) replaces the fixed log(1/3) per-subset weight — this is the
    ONE home of the mixture (including the intentional unnormalized-PoE
    quirk), shared by the equal-weight models and ``WeightedMoPoEMRSSM``'s
    learned weights so the quirk cannot be "fixed" in one copy and not the
    other.

    With identical expert logits the mixture must agree with each expert up
    to the (unnormalized) PoE term:

    >>> import jax.numpy as jnp
    >>> uniform = jnp.zeros((1, 4))  # equal scores over 4 categories
    >>> mixed = mopoe_mix_log_probs(uniform, uniform)
    >>> bool(jnp.allclose(mixed, mixed[0, 0]))  # still uniform
    True
    """
    a = jax.nn.log_softmax(audio_logits.astype(jnp.float32), axis=-1)
    v = jax.nn.log_softmax(vision_logits.astype(jnp.float32), axis=-1)
    fused = a + v  # unnormalized PoE term, kept unnormalized on purpose
    stacked = jnp.stack([a, v, fused], axis=-2)
    if log_weights is None:
        stacked = stacked + _LOG_THIRD
    else:
        stacked = stacked + log_weights.astype(jnp.float32)[..., None]
    return jax.nn.logsumexp(stacked, axis=-2)
