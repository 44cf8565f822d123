"""Tests: STACKED-layout fused training kernel vs the shipped kernel/reference.

Interpret mode on CPU. The stacked variant
(``ops/pallas/train_step_stacked.py``) folds the three state heads and the
GRU gate pair into block matmuls — same math, fewer issued ops. Forward
outputs and ALL gradients must agree with ``reference_train_recurrence``
(autodiff oracle); the weight stack/unstack round trip must be exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
from multimodal_mtrssm_tpu.ops.pallas.train_step import (
    _forward_step,
    pack_train_params,
    reference_train_recurrence,
)
from multimodal_mtrssm_tpu.ops.pallas.train_step_stacked import (
    _forward_step_stacked,
    fused_train_recurrence_stacked,
    stack_train_params,
    unstack_train_grads,
)

B, T, A, E, D, S = 4, 7, 6, 64, 32, 16
H = 32
CLASS, CAT = 4, 4


@pytest.fixture(scope="module")
def setup():
    model = MoPoEMRSSM(MRSSMConfig())
    params = model.init(jax.random.PRNGKey(0))
    packed = pack_train_params(params)
    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    actions = jax.random.normal(ks[0], (T, B, A))
    a_emb = jax.random.normal(ks[1], (T, B, E))
    v_emb = jax.random.normal(ks[2], (T, B, E))
    init_deter = jax.random.normal(ks[3], (B, D))
    idx = jax.random.randint(ks[4], (B, CLASS), 0, CAT)
    init_stoch = jax.nn.one_hot(idx, CAT).reshape(B, S)
    g_prior = jax.random.gumbel(ks[5], (T, B, S))
    g_post = jax.random.gumbel(ks[6], (T, B, S))
    args = (packed, actions, a_emb, v_emb, init_deter, init_stoch, g_prior, g_post)
    return model, params, args


def test_stacked_step_matches_unstacked(setup):
    """One stacked step reproduces the shipped step function's full record
    (block matmuls with zero off-blocks are exact)."""
    _, _, args = setup
    packed, actions, a_emb, v_emb, init_deter, init_stoch, g_prior, g_post = args
    stacked = stack_train_params(packed)
    rec_s = _forward_step_stacked(stacked, actions[0], a_emb[0], v_emb[0],
                                  init_deter, init_stoch, g_prior[0], g_post[0],
                                  CLASS, CAT)
    rec = _forward_step(packed, actions[0], a_emb[0], v_emb[0],
                        init_deter, init_stoch, g_prior[0], g_post[0], CLASS, CAT)
    for k in ("deter", "prior_logits", "a_logits", "v_logits", "mixed",
              "prior_stoch", "post_stoch"):
        np.testing.assert_allclose(
            np.asarray(rec_s[k]), np.asarray(rec[k]), atol=1e-5, err_msg=k)


def test_stack_unstack_roundtrip(setup):
    """unstack(d_stacked) recovers exactly the blocks stack() placed — the
    gradient-layout contract (zero blocks are discarded, real blocks map
    1:1)."""
    _, _, args = setup
    packed = args[0]
    stacked = stack_train_params(packed)
    # Treat the stacked weights THEMSELVES as "grads": unstacking must give
    # back the original packed weights bit-for-bit.
    back = unstack_train_grads(stacked, (A, H, D, E))
    for i, (a, b) in enumerate(zip(back, packed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"packed[{i}]")


def test_stacked_forward_matches_reference(setup):
    _, _, args = setup
    fused = fused_train_recurrence_stacked(
        *args, class_size=CLASS, category_size=CAT, interpret=True)
    ref = reference_train_recurrence(*args, class_size=CLASS, category_size=CAT)
    names = ("deter", "prior_logits", "prior_stoch", "mixed", "post_stoch")
    for name, a, b in zip(names, fused, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, err_msg=name)
    s = np.asarray(fused[4]).reshape(T, B, CLASS, CAT)
    np.testing.assert_allclose(s.sum(-1), 1.0, atol=1e-5)


def test_stacked_vjp_matches_autodiff(setup):
    """The stacked backward kernel (with its block-sliced weight grads)
    equals autodiff through the reference for every differentiable input —
    including that the zero-block garbage contractions never leak into a
    returned gradient."""
    _, _, args = setup
    ks = jax.random.split(jax.random.PRNGKey(9), 5)
    shapes = ((T, B, D), (T, B, S), (T, B, S), (T, B, S), (T, B, S))
    cots = tuple(jax.random.normal(k, s) for k, s in zip(ks, shapes))

    def loss_stacked(packed, actions, a_emb, v_emb, init_deter, init_stoch):
        outs = fused_train_recurrence_stacked(
            packed, actions, a_emb, v_emb, init_deter, init_stoch,
            args[6], args[7], class_size=CLASS, category_size=CAT, interpret=True)
        return sum(jnp.sum(o * c) for o, c in zip(outs, cots))

    def loss_ref(packed, actions, a_emb, v_emb, init_deter, init_stoch):
        outs = reference_train_recurrence(
            packed, actions, a_emb, v_emb, init_deter, init_stoch,
            args[6], args[7], class_size=CLASS, category_size=CAT)
        return sum(jnp.sum(o * c) for o, c in zip(outs, cots))

    argnums = (0, 1, 2, 3, 4, 5)
    gf = jax.grad(loss_stacked, argnums)(*args[:6])
    gr = jax.grad(loss_ref, argnums)(*args[:6])
    for i, (a, b) in enumerate(zip(gf[0], gr[0])):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4 * scale,
                                   err_msg=f"packed[{i}]")
    for name, a, b in zip(("actions", "a_emb", "v_emb", "init_deter", "init_stoch"),
                          gf[1:], gr[1:]):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4 * scale,
                                   err_msg=name)


def test_stacked_value_and_grad_finite_under_jit(setup):
    _, _, args = setup

    @jax.jit
    def f(packed):
        outs = fused_train_recurrence_stacked(
            packed, *args[1:], class_size=CLASS, category_size=CAT, interpret=True)
        return jnp.sum(outs[0] ** 2) + jnp.sum(outs[3] ** 2)

    val, grads = jax.value_and_grad(f)(args[0])
    assert np.isfinite(float(val))
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in grads)


# ---------------------------------------------------------------------------
# Model-level integration (use_pallas_train="stacked_interpret")
# ---------------------------------------------------------------------------


def _small_model(mode):
    from conftest import small_encoder_config

    enc = small_encoder_config()
    return MoPoEMRSSM(MRSSMConfig(audio_encoder=enc, vision_encoder=enc,
                                  init_proj_cells=32, use_pallas_train=mode))


def test_model_stacked_equals_reference_path():
    """shared_step through the stacked kernel ("stacked_interpret") matches
    the pure-JAX twin ("reference") — same key → same Gumbel noise → same
    samples, losses, and gradients."""
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    act = jax.random.normal(ks[0], (2, 5, 6))
    audio = jax.random.uniform(ks[1], (2, 5, 32, 32, 1), minval=-1, maxval=1)
    vision = jax.random.uniform(ks[2], (2, 5, 32, 32, 1), minval=-1, maxval=1)
    batch = (act, audio, vision, act, audio, vision)
    ms, mr = _small_model("stacked_interpret"), _small_model("reference")
    assert ms._train_kernel_mode(2, 5) == "stacked_interpret"
    params = ms.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(2)
    ds = ms.shared_step(params, batch, key)
    dr = mr.shared_step(params, batch, key)
    for k in ("loss", "recon", "kl"):
        np.testing.assert_allclose(float(ds[k]), float(dr[k]), rtol=2e-5, err_msg=k)
    from jax.flatten_util import ravel_pytree

    gs = jax.grad(lambda p: ms.shared_step(p, batch, key)["loss"])(params)
    gr = jax.grad(lambda p: mr.shared_step(p, batch, key)["loss"])(params)
    flat_s, _ = ravel_pytree(gs)
    flat_r, _ = ravel_pytree(gr)
    scale = max(1.0, float(jnp.max(jnp.abs(flat_r))))
    np.testing.assert_allclose(np.asarray(flat_s), np.asarray(flat_r), atol=3e-4 * scale)


def test_stacked_mode_dispatch(monkeypatch):
    """'stacked' resolves like an explicit True (single-device kernel,
    multi-device warn+fallback); 'stacked_interpret' resolves when
    eligible."""
    import warnings

    m = _small_model("stacked")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert m._train_kernel_mode(8, 30) is None  # 8 virtual devices
    assert any("multi-device" in str(w.message) for w in caught)
    one = jax.devices()[:1]
    monkeypatch.setattr(jax, "devices", lambda *a: one)
    assert m._train_kernel_mode(8, 30) == "stacked"
