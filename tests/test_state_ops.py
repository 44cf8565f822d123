"""Tests: State/MTState pytree ops + MultiOneHot corners."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_mtrssm_tpu.models.state import MTState, State, cat_states, stack_states, state_from_logits
from multimodal_mtrssm_tpu.ops.distributions import (
    MultiOneHot,
    cat_distributions,
    stack_distributions,
)


def make_state(key, B=3):
    k1, k2 = jax.random.split(key)
    logits = jax.random.normal(k1, (B, 16))
    return state_from_logits(jax.random.normal(k2, (B, 32)), logits, 4, 4, key=key)


def test_state_ops_and_feature():
    s = make_state(jax.random.PRNGKey(0))
    assert s.feature.shape == (3, 48)
    # one-hot stoch
    np.testing.assert_allclose(np.asarray(s.stoch).reshape(3, 4, 4).sum(-1), 1.0, atol=1e-6)
    s1 = s[1]
    assert s1.deter.shape == (32,)
    assert s1.distribution.logits.shape == (16,)
    u = s.unsqueeze(1)
    assert u.deter.shape == (3, 1, 32)
    assert u.squeeze(1).deter.shape == (3, 32)
    d = s.detach()
    np.testing.assert_array_equal(np.asarray(d.deter), np.asarray(s.deter))


def test_stack_and_cat_states():
    a = make_state(jax.random.PRNGKey(0))
    b = make_state(jax.random.PRNGKey(1))
    st = stack_states([a, b], axis=1)
    assert st.deter.shape == (3, 2, 32)
    assert st.distribution.logits.shape == (3, 2, 16)
    ct = cat_states([a, b], axis=0)
    assert ct.deter.shape == (6, 32)


def test_state_is_pytree_through_jit():
    s = make_state(jax.random.PRNGKey(0))

    @jax.jit
    def f(state: State):
        return state.feature.sum()

    assert jnp.isfinite(f(s))


def test_multionehot_mode_entropy_and_dist_utils():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(5, 16)), jnp.float32)
    d = MultiOneHot(logits=logits, class_size=4, category_size=4)
    m = d.mode()
    np.testing.assert_allclose(np.asarray(m).reshape(5, 4, 4).sum(-1), 1.0)
    # mode maximizes per-block log-prob over samples
    lp_mode = np.asarray(d.log_prob(m))
    key = jax.random.PRNGKey(0)
    for i in range(5):
        lp_s = np.asarray(d.log_prob(d.rsample(jax.random.fold_in(key, i))))
        assert (lp_mode >= lp_s - 1e-5).all()
    ent = np.asarray(d.entropy())
    assert (ent > 0).all() and (ent <= 4 * np.log(4) + 1e-6).all()
    # stack/cat utils
    st = stack_distributions([d, d], axis=0)
    assert st.logits.shape == (2, 5, 16)
    ct = cat_distributions([d, d], axis=0)
    assert ct.logits.shape == (10, 16)
    # slicing/detach/squeeze surface
    assert d[0].logits.shape == (16,)
    assert d.unsqueeze(1).logits.shape == (5, 1, 16)


def test_mtstate_ops():
    B = 2
    k = jax.random.PRNGKey(0)
    dist16 = MultiOneHot(logits=jax.random.normal(k, (B, 16)), class_size=4, category_size=4)
    s = MTState(
        deter_h=jnp.zeros((B, 32)), deter_l=jnp.zeros((B, 32)),
        stoch_h=dist16.rsample(k), stoch_l=dist16.rsample(k),
        distribution_h=dist16, distribution_l=dist16,
        hidden_h=jnp.zeros((B, 32)), hidden_l=jnp.zeros((B, 32)),
    )
    assert s.feature.shape == (B, 96)
    assert s[0].deter_h.shape == (32,)
    assert s.unsqueeze(1).feature.shape == (B, 1, 96)
