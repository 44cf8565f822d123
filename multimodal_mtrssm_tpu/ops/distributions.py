"""Categorical latent distributions (MultiOneHot) for RSSM latents.

TPU-native functional replacement for the reference's external
``distribution_extension`` dependency (behavior contract documented in the
reference at ``src/multimodal_rssm/models/networks.py:65-68`` and
``src/multimodal_rssm/models/core.py:212-216``):

- ``MultiOneHot``: ``class_size`` independent categorical blocks over
  ``category_size`` categories, parameterized by flat logits of width
  ``class_size * category_size``. Samples are straight-through one-hot
  blocks, flat-concatenated so they can be ``concatenate``-d with the
  deterministic state (reference ``state.py:18``).
- ``kl_categorical`` / ``kl_balanced``: categorical KL with optional
  DreamerV2-style two-term stop-gradient balancing.

All math runs in float32 regardless of the surrounding compute dtype —
softmax/KL of 16-wide logit blocks is negligible FLOPs but precision-critical
for the ELBO.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

# DreamerV2 KL-balancing mixing weight for the prior-training term.
KL_BALANCE_ALPHA = 0.8


@struct.dataclass
class MultiOneHot:
    """Product of ``class_size`` categorical distributions over ``category_size``.

    ``logits`` has shape ``[..., class_size * category_size]`` and may be any
    unnormalized score (the reference feeds raw MLP outputs *and* summed
    log-probabilities through the same factory — reference
    ``mopoe_mrssm/core.py:108,161``). Normalization happens per
    ``category_size`` block.
    """

    logits: jax.Array
    class_size: int = struct.field(pytree_node=False)
    category_size: int = struct.field(pytree_node=False)

    # ---- shape helpers -------------------------------------------------
    @property
    def batch_shape(self) -> tuple[int, ...]:
        return self.logits.shape[:-1]

    @property
    def event_size(self) -> int:
        return self.class_size * self.category_size

    def _block_logits(self) -> jax.Array:
        """Logits reshaped to ``[..., class_size, category_size]`` in f32."""
        x = self.logits.astype(jnp.float32)
        return x.reshape(*x.shape[:-1], self.class_size, self.category_size)

    # ---- distribution ops ----------------------------------------------
    def log_probs(self) -> jax.Array:
        """Per-block log-probabilities, flat ``[..., class*category]`` (f32)."""
        lp = jax.nn.log_softmax(self._block_logits(), axis=-1)
        return lp.reshape(*lp.shape[:-2], self.event_size)

    def probs(self) -> jax.Array:
        """Per-block probabilities, flat ``[..., class*category]`` (f32)."""
        p = jax.nn.softmax(self._block_logits(), axis=-1)
        return p.reshape(*p.shape[:-2], self.event_size)

    def rsample(self, key: jax.Array) -> jax.Array:
        """Straight-through one-hot sample, flat ``[..., class*category]``.

        Matches torch's ``OneHotCategoricalStraightThrough.rsample``:
        hard one-hot forward value, ``probs`` gradient
        (``sample = onehot + probs - stop_grad(probs)``).
        """
        bl = self._block_logits()
        idx = jax.random.categorical(key, bl, axis=-1)  # [..., class]
        onehot = jax.nn.one_hot(idx, self.category_size, dtype=jnp.float32)
        onehot = onehot.reshape(*onehot.shape[:-2], self.event_size)
        p = self.probs()
        return onehot + p - jax.lax.stop_gradient(p)

    def mode(self) -> jax.Array:
        """Most likely one-hot blocks, flat ``[..., class*category]``."""
        bl = self._block_logits()
        idx = jnp.argmax(bl, axis=-1)
        onehot = jax.nn.one_hot(idx, self.category_size, dtype=jnp.float32)
        return onehot.reshape(*onehot.shape[:-2], self.event_size)

    def log_prob(self, value: jax.Array) -> jax.Array:
        """Log-probability of flat one-hot ``value``; shape = batch_shape."""
        lp = self.log_probs()
        return jnp.sum(lp * value.astype(jnp.float32), axis=-1)

    def entropy(self) -> jax.Array:
        """Entropy summed over classes; shape = batch_shape."""
        bl = self._block_logits()
        lp = jax.nn.log_softmax(bl, axis=-1)
        p = jnp.exp(lp)
        return -jnp.sum(p * lp, axis=(-2, -1))

    # ---- structural ops (reference ``state.py:30-152`` parity) ---------
    def __getitem__(self, loc) -> "MultiOneHot":
        return self.replace(logits=self.logits[loc])

    def detach(self) -> "MultiOneHot":
        return self.replace(logits=jax.lax.stop_gradient(self.logits))

    def squeeze(self, axis: int) -> "MultiOneHot":
        return self.replace(logits=jnp.squeeze(self.logits, axis=axis))

    def unsqueeze(self, axis: int) -> "MultiOneHot":
        return self.replace(logits=jnp.expand_dims(self.logits, axis=axis))


def multi_one_hot(logits: jax.Array, class_size: int, category_size: int) -> MultiOneHot:
    """Factory mirroring the reference's ``MultiOneHotFactory.forward``."""
    return MultiOneHot(logits=logits, class_size=class_size, category_size=category_size)


def stack_distributions(dists: list[MultiOneHot], axis: int) -> MultiOneHot:
    """Stack distributions along a new axis (reference ``stack_distribution``)."""
    first = dists[0]
    return first.replace(logits=jnp.stack([d.logits for d in dists], axis=axis))


def cat_distributions(dists: list[MultiOneHot], axis: int) -> MultiOneHot:
    """Concatenate distributions along an existing axis."""
    first = dists[0]
    return first.replace(logits=jnp.concatenate([d.logits for d in dists], axis=axis))


# ---- KL divergence ------------------------------------------------------


def kl_categorical(q: MultiOneHot, p: MultiOneHot) -> jax.Array:
    """KL(q || p) summed over the class blocks; shape = batch_shape.

    Straight categorical KL: ``sum_k q_k (log q_k - log p_k)`` per block.
    """
    q_lp = jax.nn.log_softmax(q._block_logits(), axis=-1)
    p_lp = jax.nn.log_softmax(p._block_logits(), axis=-1)
    q_p = jnp.exp(q_lp)
    return jnp.sum(q_p * (q_lp - p_lp), axis=(-2, -1))


def kl_balanced(
    q: MultiOneHot,
    p: MultiOneHot,
    *,
    use_balancing: bool,
    alpha: float = KL_BALANCE_ALPHA,
) -> jax.Array:
    """Per-element KL with optional DreamerV2 balancing; shape = batch_shape.

    With balancing (reference ``distribution_extension.kl_divergence``
    behavior contract, reference ``core.py:212-216``):

        alpha * KL(sg(q) || p) + (1 - alpha) * KL(q || sg(p))

    The forward *value* equals plain KL(q || p) either way (stop_gradient is
    an identity in the primal), so logged KL curves are balancing-invariant;
    only the gradient mix differs.
    """
    if not use_balancing:
        return kl_categorical(q, p)
    kl_prior = kl_categorical(q.detach(), p)  # trains the prior toward q
    kl_post = kl_categorical(q, p.detach())  # regularizes the posterior
    return alpha * kl_prior + (1.0 - alpha) * kl_post
