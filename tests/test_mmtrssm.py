"""Integration tests: MoPoE-MMTRSSM hierarchical rollout + dual-KL ELBO."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_mtrssm_tpu.models import MMTRSSMConfig, MoPoEMMTRSSM

B, T, A = 2, 4, 6


def tiny_batch(key):
    ks = jax.random.split(key, 3)
    action = jax.random.normal(ks[0], (B, T, A))
    audio = jax.random.uniform(ks[1], (B, T, 32, 32, 1), minval=-1, maxval=1)
    vision = jax.random.uniform(ks[2], (B, T, 32, 32, 1), minval=-1, maxval=1)
    return (action, audio, vision, action, audio, vision)


def test_hierarchical_rollout_shapes():
    model = MoPoEMMTRSSM(MMTRSSMConfig())
    params = model.init(jax.random.PRNGKey(0))
    batch = tiny_batch(jax.random.PRNGKey(1))
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    init = model.initial_state(params, batch[1][:, 0], batch[2][:, 0], k1)
    assert init.deter_h.shape == (B, 32)
    assert init.deter_l.shape == (B, 32)
    assert init.stoch_h.shape == (B, 16)
    assert init.stoch_l.shape == (B, 16)
    posterior, prior = model.rollout_representation(params, batch[0], batch[1], batch[2], init, k2)
    # Feature = hd + hs + ld + ls = 96 (reference core.py:196-204).
    assert posterior.feature.shape == (B, T, 96)
    assert prior.distribution_h.logits.shape == (B, T, 16)
    assert prior.distribution_l.logits.shape == (B, T, 16)
    # h_stoch one-hot per 8-block (class 2 × category 8).
    s = np.asarray(posterior.stoch_h).reshape(B, T, 2, 8)
    np.testing.assert_allclose(s.sum(-1), 1.0, atol=1e-5)


def test_rollout_transition_continues_from_posterior():
    model = MoPoEMMTRSSM(MMTRSSMConfig())
    params = model.init(jax.random.PRNGKey(0))
    batch = tiny_batch(jax.random.PRNGKey(1))
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    init = model.initial_state(params, batch[1][:, 0], batch[2][:, 0], keys[0])
    posterior, _ = model.rollout_representation(params, batch[0], batch[1], batch[2], init, keys[1])
    # Imagination from the last posterior step (eval workload shape).
    last = posterior[:, -1]
    imag = model.rollout_transition(params, batch[0], last, keys[2])
    assert imag.feature.shape == (B, T, 96)


def test_shared_step_dual_kl_and_grads():
    model = MoPoEMMTRSSM(MMTRSSMConfig())
    params = model.init(jax.random.PRNGKey(0))
    batch = tiny_batch(jax.random.PRNGKey(1))

    @jax.jit
    def loss_fn(p, key):
        d = model.shared_step(p, batch, key)
        return d["loss"], d

    (loss, d), grads = jax.jit(
        lambda p, k: jax.value_and_grad(loss_fn, has_aux=True)(p, k)
    )(params, jax.random.PRNGKey(2))
    assert jnp.isfinite(loss)
    assert "kl_h" in d and "kl" in d and "recon" in d
    np.testing.assert_allclose(
        float(d["loss"]), float(d["recon"] + d["kl"] + d["kl_h"]), rtol=1e-6
    )
    for name in ("l_rnn", "h_rnn", "l_prior", "h_prior", "h_posterior",
                 "audio_representation", "vision_representation"):
        n = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads[name]))
        assert n > 0.0, f"no gradient reached {name}"


def test_w_kl_h_scales_higher_kl():
    batch = tiny_batch(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    m1 = MoPoEMMTRSSM(MMTRSSMConfig(w_kl_h=1.0))
    m2 = MoPoEMMTRSSM(MMTRSSMConfig(w_kl_h=2.0))
    params = m1.init(jax.random.PRNGKey(0))
    d1 = m1.shared_step(params, batch, key)
    d2 = m2.shared_step(params, batch, key)
    np.testing.assert_allclose(float(d2["kl_h"]), 2 * float(d1["kl_h"]), rtol=1e-5)
