"""Gaussian reconstruction likelihood.

Replaces the reference's ``likelihood`` helper
(``src/multimodal_rssm/models/objective.py:7-23``): the negative mean
log-probability of the target under ``Independent(Normal(pred, scale), k)``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def gaussian_nll(
    prediction: jax.Array,
    target: jax.Array,
    event_ndims: int,
    scale: float = 1.0,
) -> jax.Array:
    """``-mean(Independent(Normal(pred, scale), event_ndims).log_prob(target))``.

    The last ``event_ndims`` axes are summed (event axes); the remaining
    leading axes are averaged. Runs in float32.

    A perfect unit-scale prediction of one scalar event costs exactly
    ``0.5*log(2*pi)`` nats:

    >>> import jax.numpy as jnp, math
    >>> x = jnp.zeros((3, 1))
    >>> abs(float(gaussian_nll(x, x, event_ndims=1)) - 0.5 * math.log(2 * math.pi)) < 1e-6
    True
    """
    pred = prediction.astype(jnp.float32)
    tgt = target.astype(jnp.float32)
    inv_scale = 1.0 / scale
    log_scale = math.log(scale)
    elem = 0.5 * jnp.square((tgt - pred) * inv_scale) + log_scale + _HALF_LOG_2PI
    event_axes = tuple(range(elem.ndim - event_ndims, elem.ndim))
    log_prob = -jnp.sum(elem, axis=event_axes)
    return -jnp.mean(log_prob)
