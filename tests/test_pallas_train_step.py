"""Tests: fused Pallas TRAINING recurrence (fwd + custom VJP) vs pure JAX.

Interpret mode on CPU (the TPU compile/perf path is exercised by
benchmarks/bench_train_kernel.py on hardware). The kernel consumes
pre-generated Gumbel noise, so it is deterministic given inputs — forward
outputs AND gradients are compared against ``reference_train_recurrence``
(same math via ``lax.scan``, differentiated by autodiff), and the shared
step math is pinned against the model's own XLA building blocks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
from multimodal_mtrssm_tpu.ops.pallas.train_step import (
    _forward_step,
    fused_train_recurrence,
    pack_train_params,
    reference_train_recurrence,
)

B, T, A, E, D, S = 4, 7, 6, 64, 32, 16
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


def test_forward_step_matches_model_math(setup):
    """The kernel's shared step function reproduces the model's XLA building
    blocks (transition core, posterior heads, fusion, ST sample)."""
    from multimodal_mtrssm_tpu.ops.distributions import MultiOneHot
    from multimodal_mtrssm_tpu.ops.fusion import mopoe_mix_log_probs

    model, params, args = setup
    packed, actions, a_emb, v_emb, init_deter, init_stoch, g_prior, g_post = args
    rec = _forward_step(packed, actions[0], a_emb[0], v_emb[0], init_deter,
                        init_stoch, g_prior[0], g_post[0], CLASS, CAT)
    deter, prior_logits = model._transition_core(params, actions[0], init_stoch, init_deter)
    np.testing.assert_allclose(np.asarray(rec["deter"]), np.asarray(deter), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rec["prior_logits"]), np.asarray(prior_logits), atol=1e-5)
    a_logits = model._posterior_logits(params, "audio", deter, a_emb[0])
    v_logits = model._posterior_logits(params, "vision", deter, v_emb[0])
    mixed = mopoe_mix_log_probs(a_logits, v_logits)
    np.testing.assert_allclose(np.asarray(rec["mixed"]), np.asarray(mixed), atol=1e-5)
    # The Gumbel-argmax selection matches categorical-with-that-noise, and
    # the ST value matches MultiOneHot.rsample's construction given the
    # same selection.
    bl = mixed.reshape(B, CLASS, CAT) + g_post[0].reshape(B, CLASS, CAT)
    onehot = jax.nn.one_hot(jnp.argmax(bl, -1), CAT).reshape(B, S)
    d = MultiOneHot(logits=mixed, class_size=CLASS, category_size=CAT)
    p = d.probs()
    expect = onehot + p - jax.lax.stop_gradient(p)
    np.testing.assert_allclose(np.asarray(rec["post_stoch"]), np.asarray(expect), atol=1e-6)


def test_kernel_forward_matches_reference(setup):
    _, _, args = setup
    fused = fused_train_recurrence(*args, class_size=CLASS, category_size=CAT, interpret=True)
    ref = reference_train_recurrence(*args, class_size=CLASS, category_size=CAT)
    names = ("deter", "prior_logits", "prior_stoch", "mixed", "post_stoch")
    for name, a, b in zip(names, fused, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, err_msg=name)
    # Samples are valid one-hot blocks (up to ST float cancellation noise).
    s = np.asarray(fused[4]).reshape(T, B, CLASS, CAT)
    np.testing.assert_allclose(s.sum(-1), 1.0, atol=1e-5)


def test_kernel_vjp_matches_autodiff(setup):
    """The hand-derived backward kernel equals autodiff through the
    reference implementation, for every differentiable input (weights,
    actions, embeddings, initial state) under a cotangent that touches all
    five outputs — the BPTT chain, ST probs paths, fusion backward, and GRU
    backward all have to line up."""
    _, _, args = setup
    ks = jax.random.split(jax.random.PRNGKey(9), 5)
    shapes = ((T, B, D), (T, B, S), (T, B, S), (T, B, S), (T, B, S))
    cots = tuple(jax.random.normal(k, s) for k, s in zip(ks, shapes))

    def loss_fused(packed, actions, a_emb, v_emb, init_deter, init_stoch):
        outs = fused_train_recurrence(packed, actions, a_emb, v_emb, init_deter,
                                      init_stoch, args[6], args[7],
                                      class_size=CLASS, category_size=CAT, interpret=True)
        return sum(jnp.sum(o * c) for o, c in zip(outs, cots))

    def loss_ref(packed, actions, a_emb, v_emb, init_deter, init_stoch):
        outs = reference_train_recurrence(packed, actions, a_emb, v_emb, init_deter,
                                          init_stoch, args[6], args[7],
                                          class_size=CLASS, category_size=CAT)
        return sum(jnp.sum(o * c) for o, c in zip(outs, cots))

    argnums = (0, 1, 2, 3, 4, 5)
    gf = jax.grad(loss_fused, argnums)(*args[:6])
    gr = jax.grad(loss_ref, argnums)(*args[:6])
    # Packed-weight grads.
    for i, (a, b) in enumerate(zip(gf[0], gr[0])):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4 * scale,
                                   err_msg=f"packed[{i}]")
    for name, a, b in zip(("actions", "a_emb", "v_emb", "init_deter", "init_stoch"),
                          gf[1:], gr[1:]):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4 * scale,
                                   err_msg=name)


def test_kernel_value_and_grad_finite_under_jit(setup):
    """The custom_vjp composes with jit + value_and_grad (the trainer's
    usage shape) and yields finite results."""
    _, _, args = setup

    @jax.jit
    def f(packed):
        outs = fused_train_recurrence(packed, *args[1:], class_size=CLASS,
                                      category_size=CAT, interpret=True)
        return jnp.sum(outs[0] ** 2) + jnp.sum(outs[3] ** 2)

    val, grads = jax.value_and_grad(f)(args[0])
    assert np.isfinite(float(val))
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in grads)


# ---------------------------------------------------------------------------
# Model-level integration (MRSSMConfig.use_pallas_train)
# ---------------------------------------------------------------------------


def _small_model(mode):
    from conftest import small_encoder_config

    enc = small_encoder_config()
    return MoPoEMRSSM(MRSSMConfig(audio_encoder=enc, vision_encoder=enc,
                                  init_proj_cells=32, use_pallas_train=mode))


def _small_batch(key, b=2, t=5):
    ks = jax.random.split(key, 3)
    act = jax.random.normal(ks[0], (b, t, 6))
    audio = jax.random.uniform(ks[1], (b, t, 32, 32, 1), minval=-1, maxval=1)
    vision = jax.random.uniform(ks[2], (b, t, 32, 32, 1), minval=-1, maxval=1)
    return (act, audio, vision, act, audio, vision)


def test_model_shared_step_kernel_equals_reference_path():
    """shared_step through the fused kernel ("interpret") is numerically
    identical to the pure-JAX twin ("reference") — same key → same Gumbel
    noise → same samples, losses, and gradients."""
    mk, mr = _small_model("interpret"), _small_model("reference")
    params = mk.init(jax.random.PRNGKey(0))
    batch = _small_batch(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    dk = mk.shared_step(params, batch, key)
    dr = mr.shared_step(params, batch, key)
    for k in ("loss", "recon", "kl"):
        np.testing.assert_allclose(float(dk[k]), float(dr[k]), rtol=2e-5, err_msg=k)
    from jax.flatten_util import ravel_pytree

    gk = jax.grad(lambda p: mk.shared_step(p, batch, key)["loss"])(params)
    gr = jax.grad(lambda p: mr.shared_step(p, batch, key)["loss"])(params)
    flat_k, _ = ravel_pytree(gk)
    flat_r, _ = ravel_pytree(gr)
    scale = max(1.0, float(jnp.max(jnp.abs(flat_r))))
    np.testing.assert_allclose(np.asarray(flat_k), np.asarray(flat_r), atol=3e-4 * scale)


def test_model_kernel_path_trains():
    """A few optimizer steps through the fused kernel reduce the loss."""
    from multimodal_mtrssm_tpu.train.optim import make_optimizer

    model = _small_model("interpret")
    params = model.init(jax.random.PRNGKey(0))
    batch = _small_batch(jax.random.PRNGKey(1))
    opt = make_optimizer(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(
            lambda p: model.shared_step(p, batch, key)["loss"]
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), opt_state, loss

    losses = []
    for i in range(8):
        params, opt_state, loss = step(params, opt_state, jax.random.fold_in(jax.random.PRNGKey(3), i))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_dispatch_eligibility(monkeypatch):
    """use_pallas_train falls back to the XLA path for non-ELU / bf16 /
    VMEM-oversized configs and multi-device backends — loudly for an
    explicit True — and rejects unknown values outright."""
    import warnings

    import pytest

    # This test env runs 8 virtual CPU devices: an explicit True must warn
    # and fall back (GSPMD can't partition a bare pallas_call over a mesh).
    m = _small_model(True)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert m._train_kernel_mode(8, 30) is None
    assert any("multi-device" in str(w.message) for w in caught)
    # Single-device backend: True dispatches the kernel.
    one = jax.devices()[:1]
    monkeypatch.setattr(jax, "devices", lambda *a: one)
    assert m._train_kernel_mode(8, 30) == "kernel"
    monkeypatch.undo()
    m_gelu = MoPoEMRSSM(MRSSMConfig(activation_name="GELU", use_pallas_train=True))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert m_gelu._train_kernel_mode(8, 30) is None
    assert any("use_pallas_train" in str(w.message) for w in caught)
    m_bf16 = MoPoEMRSSM(MRSSMConfig(compute_dtype=jnp.bfloat16, use_pallas_train="interpret"))
    assert m_bf16._train_kernel_mode(8, 30) is None
    # Oversized [T, B] no longer disqualifies the kernel (time-chunked grid
    # variants stream residuals through VMEM); "stacked" (single-block
    # only) downgrades to the chunked regular kernel with a warning.
    m_big = MoPoEMRSSM(MRSSMConfig(use_pallas_train="interpret"))
    assert m_big._train_kernel_mode(4096, 180) == "interpret"
    m_big_stacked = MoPoEMRSSM(MRSSMConfig(use_pallas_train="stacked_interpret"))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert m_big_stacked._train_kernel_mode(4096, 180) == "interpret"
    assert any("chunked" in str(w.message) for w in caught)
    monkeypatch.setattr(jax, "devices", lambda *a: one)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    m_auto = MoPoEMRSSM(MRSSMConfig(use_pallas_train="auto"))
    # AUTO_TRAIN_KERNEL_CHUNKED (2026-08-19 B=128 A/B): "auto" keeps the
    # kernel past the single-block VMEM fit via the time-chunked grid.
    assert m_auto._train_kernel_mode(4096, 180) == "kernel"
    assert m_auto._train_kernel_mode(8, 30) == "kernel"
    monkeypatch.undo()
    # "auto" stays on XLA off-TPU regardless.
    assert _small_model("auto")._train_kernel_mode(8, 30) is None
    # A YAML typo like "false" (quoted) or "atuo" must raise, not silently
    # pick a path.
    for bad in ("false", "atuo", "on", 1):
        with pytest.raises(ValueError, match="use_pallas_train"):
            _small_model(bad)._train_kernel_mode(8, 30)


# ---------------------------------------------------------------------------
# Time-chunked grid kernels (oversized [T, B] — round 4)
# ---------------------------------------------------------------------------


def test_chunked_forward_matches_reference(setup, monkeypatch):
    """With the VMEM budget shrunk so T=7 splits into chunks of 3 (with a
    zero-padded tail), the grid-chunked forward matches the reference."""
    import multimodal_mtrssm_tpu.ops.pallas.train_step as ts

    _, _, args = setup
    tc_full = ts.chunk_len(B)
    assert tc_full >= T  # default budget keeps this shape single-block
    row = (10 << 20) // tc_full
    monkeypatch.setattr(ts, "VMEM_BUDGET_BYTES", row * 3)
    assert ts.chunk_len(B, ts.VMEM_BUDGET_BYTES) == 3
    fused = fused_train_recurrence(*args, class_size=CLASS, category_size=CAT,
                                   interpret=True)
    ref = reference_train_recurrence(*args, class_size=CLASS, category_size=CAT)
    names = ("deter", "prior_logits", "prior_stoch", "mixed", "post_stoch")
    for name, a, b in zip(names, fused, ref):
        assert a.shape == b.shape, name
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   err_msg=name)


def test_chunked_vjp_matches_autodiff(setup, monkeypatch):
    """The chunked backward (scratch carry across grid steps, revisited
    weight-grad accumulators, reversed chunk order, zero-padded tail)
    equals autodiff through the reference for every input."""
    import multimodal_mtrssm_tpu.ops.pallas.train_step as ts

    _, _, args = setup
    row = (10 << 20) // ts.chunk_len(B)
    monkeypatch.setattr(ts, "VMEM_BUDGET_BYTES", row * 3)

    ks = jax.random.split(jax.random.PRNGKey(9), 5)
    shapes = ((T, B, D), (T, B, S), (T, B, S), (T, B, S), (T, B, S))
    cots = tuple(jax.random.normal(k, s) for k, s in zip(ks, shapes))

    def loss_fused(packed, actions, a_emb, v_emb, init_deter, init_stoch):
        outs = fused_train_recurrence(packed, actions, a_emb, v_emb, init_deter,
                                      init_stoch, args[6], args[7],
                                      class_size=CLASS, category_size=CAT,
                                      interpret=True)
        return sum(jnp.sum(o * c) for o, c in zip(outs, cots))

    def loss_ref(packed, actions, a_emb, v_emb, init_deter, init_stoch):
        outs = reference_train_recurrence(packed, actions, a_emb, v_emb,
                                          init_deter, init_stoch, args[6], args[7],
                                          class_size=CLASS, category_size=CAT)
        return sum(jnp.sum(o * c) for o, c in zip(outs, cots))

    argnums = (0, 1, 2, 3, 4, 5)
    gf = jax.grad(loss_fused, argnums)(*args[:6])
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
