"""Unit tests for MultiOneHot distributions, fusion, and likelihood.

torch (CPU) is used purely as an independent numerical oracle for the
distribution math the reference delegates to torch.distributions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.distributions as td

from multimodal_mtrssm_tpu.ops import (
    gaussian_nll,
    kl_balanced,
    kl_categorical,
    mopoe_mix_log_probs,
    multi_one_hot,
    poe_fuse_log_probs,
)

CLASS, CAT = 4, 4


def _torch_dist(logits: np.ndarray) -> td.Independent:
    t = torch.tensor(logits, dtype=torch.float64)
    t = t.reshape(*t.shape[:-1], CLASS, CAT)
    return td.Independent(td.OneHotCategoricalStraightThrough(logits=t), 1)


def test_log_probs_match_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(3, 5, CLASS * CAT)).astype(np.float32)
    d = multi_one_hot(jnp.asarray(logits), CLASS, CAT)
    ours = np.asarray(d.log_probs()).reshape(3, 5, CLASS, CAT)
    theirs = _torch_dist(logits).base_dist.logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_log_prob_of_onehot_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(7, CLASS * CAT)).astype(np.float32)
    idx = rng.integers(0, CAT, size=(7, CLASS))
    onehot = np.eye(CAT, dtype=np.float32)[idx]  # [7, CLASS, CAT]
    d = multi_one_hot(jnp.asarray(logits), CLASS, CAT)
    ours = np.asarray(d.log_prob(jnp.asarray(onehot.reshape(7, -1))))
    theirs = _torch_dist(logits).log_prob(torch.tensor(onehot, dtype=torch.float64)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_kl_matches_torch():
    rng = np.random.default_rng(2)
    ql = rng.normal(size=(4, 6, CLASS * CAT)).astype(np.float32)
    pl = rng.normal(size=(4, 6, CLASS * CAT)).astype(np.float32)
    q = multi_one_hot(jnp.asarray(ql), CLASS, CAT)
    p = multi_one_hot(jnp.asarray(pl), CLASS, CAT)
    ours = np.asarray(kl_categorical(q, p))
    theirs = td.kl_divergence(_torch_dist(ql), _torch_dist(pl)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)


def test_kl_balanced_value_equals_plain_kl():
    rng = np.random.default_rng(3)
    ql = rng.normal(size=(4, CLASS * CAT)).astype(np.float32)
    pl = rng.normal(size=(4, CLASS * CAT)).astype(np.float32)
    q = multi_one_hot(jnp.asarray(ql), CLASS, CAT)
    p = multi_one_hot(jnp.asarray(pl), CLASS, CAT)
    plain = kl_balanced(q, p, use_balancing=False)
    bal = kl_balanced(q, p, use_balancing=True)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(bal), rtol=1e-6)


def test_kl_balanced_gradient_mixing():
    """Balanced KL must send alpha of the gradient to p and (1-alpha) to q."""
    ql = jnp.asarray(np.random.default_rng(4).normal(size=(2, CLASS * CAT)), jnp.float32)
    pl = jnp.asarray(np.random.default_rng(5).normal(size=(2, CLASS * CAT)), jnp.float32)

    def loss(ql, pl, use_balancing):
        q = multi_one_hot(ql, CLASS, CAT)
        p = multi_one_hot(pl, CLASS, CAT)
        return jnp.sum(kl_balanced(q, p, use_balancing=use_balancing))

    gq_plain, gp_plain = jax.grad(loss, argnums=(0, 1))(ql, pl, False)
    gq_bal, gp_bal = jax.grad(loss, argnums=(0, 1))(ql, pl, True)
    np.testing.assert_allclose(np.asarray(gq_bal), 0.2 * np.asarray(gq_plain), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gp_bal), 0.8 * np.asarray(gp_plain), rtol=1e-5, atol=1e-6)


def test_rsample_is_valid_onehot_and_straight_through():
    logits = jnp.asarray(np.random.default_rng(6).normal(size=(256, CLASS * CAT)), jnp.float32)
    d = multi_one_hot(logits, CLASS, CAT)
    s = d.rsample(jax.random.key(0))
    blocks = np.asarray(s).reshape(256, CLASS, CAT)
    np.testing.assert_allclose(blocks.sum(-1), 1.0, atol=1e-6)
    assert set(np.unique(blocks.round(6))) <= {0.0, 1.0}

    # Straight-through: d(sample)/d(logits) equals d(probs)/d(logits).
    def mean_sample(lg):
        return jnp.sum(multi_one_hot(lg, CLASS, CAT).rsample(jax.random.key(1)))

    def mean_probs(lg):
        return jnp.sum(multi_one_hot(lg, CLASS, CAT).probs())

    g_s = jax.grad(mean_sample)(logits)
    g_p = jax.grad(mean_probs)(logits)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_p), atol=1e-6)


def test_rsample_distribution_matches_probs():
    logits = jnp.asarray([[2.0, 0.0, -1.0, 0.5] * CLASS], jnp.float32)
    d = multi_one_hot(logits, CLASS, CAT)
    keys = jax.random.split(jax.random.key(42), 20000)
    samples = jax.vmap(lambda k: d.rsample(k))(keys)  # [N, 1, CLASS*CAT]
    freq = np.asarray(samples).mean(axis=0).reshape(CLASS, CAT)
    expected = np.asarray(d.probs()).reshape(CLASS, CAT)
    np.testing.assert_allclose(freq, expected, atol=0.02)


def test_poe_and_moe_fusion_match_reference_math():
    """Replicate the reference fusion quirks with a numpy hand calculation."""
    rng = np.random.default_rng(7)
    al = rng.normal(size=(5, CLASS * CAT)).astype(np.float32)
    vl = rng.normal(size=(5, CLASS * CAT)).astype(np.float32)

    def np_log_softmax(x):
        x = x.astype(np.float64)
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    # Full-axis log_softmax (reference mopoe_mrssm/core.py:101-102) — NOT per block.
    a_lp = np_log_softmax(al)
    v_lp = np_log_softmax(vl)
    fused_np = a_lp + v_lp
    np.testing.assert_allclose(
        np.asarray(poe_fuse_log_probs(jnp.asarray(al), jnp.asarray(vl))), fused_np, atol=5e-4
    )

    stack = np.stack([a_lp, v_lp, fused_np], axis=-2) + np.log(1.0 / 3.0)
    m = stack.max(-2, keepdims=True)
    mixed_np = (m + np.log(np.exp(stack - m).sum(-2, keepdims=True))).squeeze(-2)
    np.testing.assert_allclose(
        np.asarray(mopoe_mix_log_probs(jnp.asarray(al), jnp.asarray(vl))), mixed_np, atol=5e-4
    )


@pytest.mark.parametrize("event_ndims", [1, 3])
def test_gaussian_nll_matches_torch(event_ndims):
    rng = np.random.default_rng(8)
    shape = (2, 3, 4, 5, 6)[: 2 + event_ndims]
    pred = rng.normal(size=shape).astype(np.float32)
    tgt = rng.normal(size=shape).astype(np.float32)
    ours = float(gaussian_nll(jnp.asarray(pred), jnp.asarray(tgt), event_ndims))
    dist = td.Independent(td.Normal(torch.tensor(pred), 1.0), event_ndims)
    theirs = float(-dist.log_prob(torch.tensor(tgt)).mean())
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)
