"""Tests: fused Pallas hierarchical (MMTRSSM) TRAINING recurrence vs pure JAX.

Interpret mode on CPU. Same strategy as test_pallas_train_step.py: the
kernel consumes pre-generated Gumbel noise, so forward outputs AND the full
hand-derived VJP are compared against ``reference_mt_train_recurrence``
(identical math via ``lax.scan``, autodiff), and the step function is pinned
against the model's own XLA building blocks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_mtrssm_tpu.models import MMTRSSMConfig, MoPoEMMTRSSM
from multimodal_mtrssm_tpu.ops.pallas.train_step_mt import (
    _mt_forward_step,
    fused_mt_train_recurrence,
    pack_mt_train_params,
    reference_mt_train_recurrence,
)

B, T, A, E = 4, 6, 6, 64
HD = LD = 32
LS = HS = 16
HP = dict(l_tau=2.0, h_tau=4.0, ls_class=4, ls_category=4, hs_class=2, hs_category=8)


@pytest.fixture(scope="module")
def setup():
    model = MoPoEMMTRSSM(MMTRSSMConfig())
    params = model.init(jax.random.PRNGKey(0))
    packed = pack_mt_train_params(params)
    ks = jax.random.split(jax.random.PRNGKey(1), 12)
    actions = jax.random.normal(ks[0], (T, B, A))
    a_emb = jax.random.normal(ks[1], (T, B, E))
    v_emb = jax.random.normal(ks[2], (T, B, E))
    init6 = (
        jax.random.normal(ks[3], (B, HD)) * 0.5,
        jax.random.normal(ks[4], (B, LD)) * 0.5,
        jax.nn.one_hot(jax.random.randint(ks[5], (B, 2), 0, 8), 8).reshape(B, HS),
        jax.nn.one_hot(jax.random.randint(ks[6], (B, 4), 0, 4), 4).reshape(B, LS),
        jax.random.normal(ks[7], (B, HD)) * 0.5,
        jax.random.normal(ks[8], (B, LD)) * 0.5,
    )
    gumbels = (
        jax.random.gumbel(ks[9], (T, B, LS)),
        jax.random.gumbel(ks[10], (T, B, LS)),
        jax.random.gumbel(ks[11], (T, B, HS)),
        jax.random.gumbel(jax.random.fold_in(ks[11], 1), (T, B, HS)),
    )
    args = (packed, actions, a_emb, v_emb, init6, gumbels)
    return model, params, args


def test_mt_forward_step_matches_model_math(setup):
    """The kernel's step function reproduces the model's XLA building blocks
    (lower MTRNN prior, fusion, higher prior/posterior)."""
    from multimodal_mtrssm_tpu.ops.fusion import mopoe_mix_log_probs

    model, params, args = setup
    packed, actions, a_emb, v_emb, init6, gumbels = args
    hd0, ld0, hs0, ls0, hidh0, hidl0 = init6
    rec = _mt_forward_step(packed, actions[0], a_emb[0], v_emb[0],
                           hd0, ld0, hs0, ls0, hidh0, hidl0,
                           gumbels[0][0], gumbels[1][0], gumbels[2][0], gumbels[3][0],
                           **HP)
    l_deter, l_prior_logits, hidl1 = model._lower_prior(params, actions[0], ls0, hs0, ld0, hidl0)
    np.testing.assert_allclose(np.asarray(rec["l_deter"]), np.asarray(l_deter), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rec["l_prior_logits"]), np.asarray(l_prior_logits), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rec["hidl1"]), np.asarray(hidl1), atol=1e-5)
    a_logits = model._posterior_logits(params, "audio", l_deter, a_emb[0])
    v_logits = model._posterior_logits(params, "vision", l_deter, v_emb[0])
    np.testing.assert_allclose(np.asarray(rec["mixed"]),
                               np.asarray(mopoe_mix_log_probs(a_logits, v_logits)), atol=1e-5)
    h_deter, h_prior_logits, h_post_logits, hidh1 = model._higher_prior_posterior(
        params, l_deter, hd0, hs0, hidh0
    )
    np.testing.assert_allclose(np.asarray(rec["h_deter"]), np.asarray(h_deter), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rec["h_prior_logits"]), np.asarray(h_prior_logits), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rec["h_post_logits"]), np.asarray(h_post_logits), atol=1e-5)


def test_mt_kernel_forward_matches_reference(setup):
    _, _, args = setup
    fused = fused_mt_train_recurrence(*args, **HP, interpret=True)
    ref = reference_mt_train_recurrence(*args, **HP)
    names = ("h_deter", "l_deter", "hid_h", "hid_l", "l_prior_logits", "l_prior_stoch",
             "mixed", "l_stoch", "h_prior_logits", "h_prior_stoch", "h_post_logits", "h_stoch")
    for name, a, b in zip(names, fused, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, err_msg=name)
    # Sampled blocks are valid one-hots (2×8 for h, 4×4 for l).
    hs = np.asarray(fused[11]).reshape(T, B, 2, 8)
    np.testing.assert_allclose(hs.sum(-1), 1.0, atol=1e-5)
    ls = np.asarray(fused[7]).reshape(T, B, 4, 4)
    np.testing.assert_allclose(ls.sum(-1), 1.0, atol=1e-5)


def test_mt_kernel_vjp_matches_autodiff(setup):
    """Hand-derived backward == autodiff through the reference: weights,
    actions, embeddings, all six initial-state legs, under a cotangent
    touching all 12 outputs (dual MTRNN backward, both fusion paths, four
    ST probs paths, the cross-layer l_deter→h_posterior edge)."""
    _, _, args = setup
    packed, actions, a_emb, v_emb, init6, gumbels = args
    ks = jax.random.split(jax.random.PRNGKey(9), 12)
    dims = (HD, LD, HD, LD, LS, LS, LS, LS, HS, HS, HS, HS)
    cots = tuple(jax.random.normal(k, (T, B, d)) for k, d in zip(ks, dims))

    def loss(fn, packed, actions, a_emb, v_emb, init6):
        outs = fn(packed, actions, a_emb, v_emb, init6, gumbels)
        return sum(jnp.sum(o * c) for o, c in zip(outs, cots))

    fused = lambda *a: fused_mt_train_recurrence(*a, **HP, interpret=True)  # noqa: E731
    ref = lambda *a: reference_mt_train_recurrence(*a, **HP)  # noqa: E731
    argnums = (1, 2, 3, 4, 5)
    gf = jax.grad(loss, argnums)(fused, packed, actions, a_emb, v_emb, init6)
    gr = jax.grad(loss, argnums)(ref, packed, actions, a_emb, v_emb, init6)

    def check(a, b, name):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4 * scale,
                                   err_msg=name)

    for i, (a, b) in enumerate(zip(gf[0], gr[0])):
        check(a, b, f"packed[{i}]")
    for name, a, b in zip(("actions", "a_emb", "v_emb"), gf[1:4], gr[1:4]):
        check(a, b, name)
    for i, (a, b) in enumerate(zip(gf[4], gr[4])):
        check(a, b, f"init6[{i}]")


def _small_model(mode):
    from conftest import small_encoder_config

    enc = small_encoder_config()
    return MoPoEMMTRSSM(MMTRSSMConfig(audio_encoder=enc, vision_encoder=enc,
                                      init_proj_cells=32, use_pallas_train=mode))


def test_mt_model_shared_step_kernel_equals_reference_path():
    """shared_step through the fused hierarchical kernel ("interpret")
    numerically equals the pure-JAX twin ("reference"): losses (incl. the
    dual-KL terms) and full gradients."""
    from jax.flatten_util import ravel_pytree

    mk, mr = _small_model("interpret"), _small_model("reference")
    params = mk.init(jax.random.PRNGKey(0))
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    act = jax.random.normal(ks[0], (2, 5, 6))
    audio = jax.random.uniform(ks[1], (2, 5, 32, 32, 1), minval=-1, maxval=1)
    vision = jax.random.uniform(ks[2], (2, 5, 32, 32, 1), minval=-1, maxval=1)
    batch = (act, audio, vision, act, audio, vision)
    key = jax.random.PRNGKey(2)
    dk = mk.shared_step(params, batch, key)
    dr = mr.shared_step(params, batch, key)
    for k in ("loss", "recon", "kl", "kl_h"):
        if k in dk:
            np.testing.assert_allclose(float(dk[k]), float(dr[k]), rtol=2e-5, err_msg=k)
    gk = jax.grad(lambda p: mk.shared_step(p, batch, key)["loss"])(params)
    gr = jax.grad(lambda p: mr.shared_step(p, batch, key)["loss"])(params)
    fk, _ = ravel_pytree(gk)
    fr, _ = ravel_pytree(gr)
    scale = max(1.0, float(jnp.max(jnp.abs(fr))))
    np.testing.assert_allclose(np.asarray(fk), np.asarray(fr), atol=3e-4 * scale)


def test_mt_dispatch_eligibility(monkeypatch):
    import warnings

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
    assert _small_model("auto")._train_kernel_mode(8, 30) is None  # off-TPU
    m_bf16 = MoPoEMMTRSSM(MMTRSSMConfig(compute_dtype=jnp.bfloat16,
                                        use_pallas_train="interpret"))
    assert m_bf16._train_kernel_mode(8, 30) is None
    # Oversized [T, B] no longer disqualifies the kernel (the time-chunked
    # grid variants stream residuals through VMEM).
    m_big = MoPoEMMTRSSM(MMTRSSMConfig(use_pallas_train="interpret"))
    assert m_big._train_kernel_mode(4096, 180) == "interpret"
    monkeypatch.setattr(jax, "devices", lambda *a: one)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    m_auto = MoPoEMMTRSSM(MMTRSSMConfig(use_pallas_train="auto"))
    # AUTO_MT_TRAIN_KERNEL_CHUNKED (2026-08-19 B=32 A/B): "auto" keeps the
    # kernel past the single-block VMEM fit via the time-chunked grid.
    assert m_auto._train_kernel_mode(4096, 180) == "kernel"
    assert m_auto._train_kernel_mode(8, 30) == "kernel"


# ---------------------------------------------------------------------------
# Time-chunked grid kernels (oversized [T, B] — VERDICT r4)
# ---------------------------------------------------------------------------


def test_mt_chunked_forward_matches_reference(setup, monkeypatch):
    """With the VMEM budget shrunk so T=6 splits into multiple chunks
    (including a PADDED tail chunk), the grid-chunked forward matches the
    reference exactly."""
    import multimodal_mtrssm_tpu.ops.pallas.train_step_mt as mt

    _, _, args = setup
    tc = mt.mt_chunk_len(B)
    assert tc >= T  # sanity: default budget keeps this shape single-block
    # Budget for exactly 4 timesteps per chunk → chunks of 4 + padded tail.
    row = (10 << 20) // tc
    monkeypatch.setattr(mt, "MT_VMEM_BUDGET_BYTES", row * 4)
    assert mt.mt_chunk_len(B, mt.MT_VMEM_BUDGET_BYTES) == 4
    fused = fused_mt_train_recurrence(*args, **HP, interpret=True)
    ref = reference_mt_train_recurrence(*args, **HP)
    for i, (a, b) in enumerate(zip(fused, ref)):
        assert a.shape == b.shape, i
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   err_msg=f"out[{i}]")


def test_mt_chunked_vjp_matches_autodiff(setup, monkeypatch):
    """The chunked backward (scratch carry across grid steps, revisited
    weight-grad accumulators, reversed chunk order, zero-padded tail)
    equals autodiff through the reference for every input."""
    import multimodal_mtrssm_tpu.ops.pallas.train_step_mt as mt

    _, _, args = setup
    tc = mt.mt_chunk_len(B)
    row = (10 << 20) // tc
    monkeypatch.setattr(mt, "MT_VMEM_BUDGET_BYTES", row * 4)

    ks = jax.random.split(jax.random.PRNGKey(7), 12)
    dims = (HD, LD, HD, LD, LS, LS, LS, LS, HS, HS, HS, HS)
    cots = tuple(jax.random.normal(k, (T, B, d)) for k, d in zip(ks, dims))

    def loss_fused(packed, actions, a_emb, v_emb, init6):
        outs = fused_mt_train_recurrence(packed, actions, a_emb, v_emb,
                                         init6, args[5], **HP, interpret=True)
        return sum(jnp.sum(o * c) for o, c in zip(outs, cots))

    def loss_ref(packed, actions, a_emb, v_emb, init6):
        outs = reference_mt_train_recurrence(packed, actions, a_emb, v_emb,
                                             init6, args[5], **HP)
        return sum(jnp.sum(o * c) for o, c in zip(outs, cots))

    argnums = (0, 1, 2, 3, 4)
    gf = jax.grad(loss_fused, argnums)(*args[:5])
    gr = jax.grad(loss_ref, argnums)(*args[:5])
    for name, a_tree, b_tree in (("packed", gf[0], gr[0]),
                                 ("init6", gf[4], gr[4])):
        for i, (a, b) in enumerate(zip(a_tree, b_tree)):
            scale = max(1.0, float(jnp.max(jnp.abs(b))))
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4 * scale,
                                       err_msg=f"{name}[{i}]")
    for name, a, b in zip(("actions", "a_emb", "v_emb"), gf[1:4], gr[1:4]):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4 * scale, err_msg=name)
