"""Tests: fused hierarchical (MTRNN) pallas rollout vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_mtrssm_tpu.models import MMTRSSMConfig, MoPoEMMTRSSM


@pytest.fixture(scope="module")
def setup():
    from multimodal_mtrssm_tpu.ops.pallas import pack_mt_params

    model = MoPoEMMTRSSM(MMTRSSMConfig())
    params = model.init(jax.random.PRNGKey(0))
    packed = pack_mt_params(params)
    B, T = 3, 7
    actions = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (B, T, 6)))
    rng = np.random.default_rng(2)
    hd = rng.normal(size=(B, 32)).astype(np.float32)
    ld = rng.normal(size=(B, 32)).astype(np.float32)
    hs = np.eye(8, dtype=np.float32)[rng.integers(0, 8, (B, 2))].reshape(B, 16)
    ls = np.eye(4, dtype=np.float32)[rng.integers(0, 4, (B, 4))].reshape(B, 16)
    hidh = np.arctanh(np.clip(hd, -0.9, 0.9)).astype(np.float32)
    hidl = np.arctanh(np.clip(ld, -0.9, 0.9)).astype(np.float32)
    return model, params, packed, actions, (hd, ld, hs, ls, hidh, hidl)


def _run(packed, actions, init, chunk=None):
    from multimodal_mtrssm_tpu.ops.pallas import fused_mt_rollout_transition

    out = fused_mt_rollout_transition(
        packed, jnp.asarray(actions, jnp.float32),
        tuple(jnp.asarray(x) for x in init), jnp.int32(11),
        interpret=True, chunk=chunk,
    )
    return [np.asarray(x) for x in out]


def _np_replay(packed, actions, init, h_stochs, l_stochs, l_tau=2.0, h_tau=4.0):
    (ld2w, ld2b, lin2w, lin2b, hd2w, hd2b, hin2w, hin2b,
     lp1w, lp1b, lp2w, lp2b, hp1w, hp1b, hp2w, hp2b) = [np.asarray(x) for x in packed]
    hd, ld, hs, ls, hidh, hidl = [np.asarray(x) for x in init]
    elu = lambda v: np.where(v > 0, v, np.expm1(v))  # noqa: E731
    h_deters, l_deters, h_logits_all, l_logits_all = [], [], [], []
    h_hiddens, l_hiddens = [], []
    for t in range(actions.shape[1]):
        l_in = np.concatenate([actions[:, t], ls, hs], -1)
        hidl = (1 - 1 / l_tau) * hidl + (ld @ ld2w + ld2b + l_in @ lin2w + lin2b) / l_tau
        l_deter = np.tanh(hidl)
        l_logits = elu(l_deter @ lp1w + lp1b) @ lp2w + lp2b
        ls_new = l_stochs[:, t]
        hidh = (1 - 1 / h_tau) * hidh + (hd @ hd2w + hd2b + hs @ hin2w + hin2b) / h_tau
        h_deter = np.tanh(hidh)
        h_logits = elu(h_deter @ hp1w + hp1b) @ hp2w + hp2b
        hs = h_stochs[:, t]
        ls = ls_new
        hd, ld = h_deter, l_deter
        h_deters.append(h_deter)
        l_deters.append(l_deter)
        h_logits_all.append(h_logits)
        l_logits_all.append(l_logits)
        h_hiddens.append(hidh.copy())
        l_hiddens.append(hidl.copy())
    return (np.stack(h_deters, 1), np.stack(l_deters, 1),
            np.stack(h_logits_all, 1), np.stack(l_logits_all, 1),
            np.stack(h_hiddens, 1), np.stack(l_hiddens, 1))


def test_mt_kernel_matches_reference_math(setup):
    model, params, packed, actions, init = setup
    h_deter, l_deter, h_logits, l_logits, h_stoch, l_stoch, h_hidden, l_hidden = _run(
        packed, actions, init
    )
    # valid one-hot blocks
    np.testing.assert_allclose(h_stoch.reshape(*h_stoch.shape[:-1], 2, 8).sum(-1), 1.0, atol=1e-6)
    np.testing.assert_allclose(l_stoch.reshape(*l_stoch.shape[:-1], 4, 4).sum(-1), 1.0, atol=1e-6)
    rhd, rld, rhl, rll, rhh, rlh = _np_replay(packed, actions, init, h_stoch, l_stoch)
    np.testing.assert_allclose(h_deter, rhd, atol=2e-5)
    np.testing.assert_allclose(l_deter, rld, atol=2e-5)
    np.testing.assert_allclose(h_logits, rhl, atol=2e-5)
    np.testing.assert_allclose(l_logits, rll, atol=2e-5)
    # Emitted integrator trajectories are the exact hidden states (not an
    # atanh reconstruction), so tanh(hidden) == deter and they match replay.
    np.testing.assert_allclose(h_hidden, rhh, atol=2e-5)
    np.testing.assert_allclose(l_hidden, rlh, atol=2e-5)
    np.testing.assert_allclose(np.tanh(h_hidden), h_deter, atol=1e-6)


def test_mt_kernel_chunked(setup):
    model, params, packed, actions, init = setup
    out = _run(packed, actions, init, chunk=3)  # T=7 → 3+3+ragged 1
    h_deter, l_deter, h_logits, l_logits, h_stoch, l_stoch, h_hidden, l_hidden = out
    rhd, rld, _, _, rhh, rlh = _np_replay(packed, actions, init, h_stoch, l_stoch)
    np.testing.assert_allclose(h_deter, rhd, atol=2e-5)
    np.testing.assert_allclose(l_deter, rld, atol=2e-5)
    np.testing.assert_allclose(h_hidden, rhh, atol=2e-5)
    np.testing.assert_allclose(l_hidden, rlh, atol=2e-5)


def test_mt_kernel_matches_xla_rollout(setup):
    """Replay kernel stochs through the model's XLA rollout math."""
    from multimodal_mtrssm_tpu.models.state import MTState
    from multimodal_mtrssm_tpu.ops.distributions import MultiOneHot

    model, params, packed, actions, init = setup
    h_deter, l_deter, h_logits, l_logits, h_stoch, l_stoch, _, _ = _run(packed, actions, init)
    hd, ld, hs, ls, hidh, hidl = (jnp.asarray(x) for x in init)

    def step(carry, xs):
        hd, ld, hs, ls, hidh, hidl = carry
        action_t, hs_next, ls_next = xs
        l_deter, l_logits, hidl = model._lower_prior(params, action_t, ls, hs, ld, hidl)
        from multimodal_mtrssm_tpu.nn.core import mlp_apply, mtrnn_apply

        h_deter, hidh = mtrnn_apply(params["h_rnn"], hs, hd, hidh, model.cfg.h_tau)
        h_logits = mlp_apply(params["h_prior"], h_deter, model.cfg.activation_name)
        return (h_deter, l_deter, hs_next, ls_next, hidh, hidl), (h_deter, l_deter, h_logits, l_logits)

    xs = (
        jnp.swapaxes(jnp.asarray(actions, jnp.float32), 0, 1),
        jnp.swapaxes(jnp.asarray(h_stoch), 0, 1),
        jnp.swapaxes(jnp.asarray(l_stoch), 0, 1),
    )
    _, (xh, xl, xhl, xll) = jax.lax.scan(step, (hd, ld, hs, ls, hidh, hidl), xs)
    np.testing.assert_allclose(np.swapaxes(np.asarray(xh), 0, 1), h_deter, atol=2e-5)
    np.testing.assert_allclose(np.swapaxes(np.asarray(xl), 0, 1), l_deter, atol=2e-5)
    np.testing.assert_allclose(np.swapaxes(np.asarray(xhl), 0, 1), h_logits, atol=2e-5)
    np.testing.assert_allclose(np.swapaxes(np.asarray(xll), 0, 1), l_logits, atol=2e-5)
