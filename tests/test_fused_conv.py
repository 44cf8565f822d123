"""Fused VMEM-resident encoder (ops/pallas/fused_conv.py): the super-row
operator formulation and the Pallas kernel must reproduce ``encoder_apply``
(reference cnn.Encoder) exactly up to fp reassociation."""

import jax
import jax.numpy as jnp
import pytest

from multimodal_mtrssm_tpu.nn.conv import EncoderConfig, encoder_apply, encoder_init
from multimodal_mtrssm_tpu.ops.pallas.fused_conv import (
    build_operators,
    fused_encoder_applicable,
    fused_encoder_apply,
    superrow_encoder_xla,
)

REF = EncoderConfig()  # reference dims: 3×k3s2p1, coord_conv, 3 res blocks


def test_applicable_gates():
    assert fused_encoder_applicable(REF)
    assert not fused_encoder_applicable(
        EncoderConfig(channels=(8, 16), kernel_sizes=(3, 3), strides=(2, 2),
                      paddings=(1, 1)))
    assert not fused_encoder_applicable(
        EncoderConfig(activation_name="ReLU"))


def test_superrow_xla_twin_matches_encoder_apply():
    params = encoder_init(jax.random.PRNGKey(0), REF)
    x = jax.random.uniform(jax.random.PRNGKey(1), (9, 32, 32, 1), minval=-1, maxval=1)
    ref = encoder_apply(params, REF, x)
    got = superrow_encoder_xla(params, REF, x)
    assert jnp.max(jnp.abs(ref - got)) < 2e-6


def test_superrow_no_coordconv():
    cfg = EncoderConfig(coord_conv=False)
    params = encoder_init(jax.random.PRNGKey(2), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(3), (5, 32, 32, 1), minval=-1, maxval=1)
    assert jnp.max(jnp.abs(encoder_apply(params, cfg, x)
                           - superrow_encoder_xla(params, cfg, x))) < 2e-6


def test_fused_kernel_interpret_matches_and_pads():
    params = encoder_init(jax.random.PRNGKey(0), REF)
    # N=13 with tile=8 exercises the batch-padding path.
    x = jax.random.uniform(jax.random.PRNGKey(1), (13, 32, 32, 1), minval=-1, maxval=1)
    ref = encoder_apply(params, REF, x)
    got = fused_encoder_apply(params, REF, x, tile=8, interpret=True)
    assert got.shape == ref.shape
    assert jnp.max(jnp.abs(ref - got)) < 2e-6


def test_fused_kernel_leading_dims():
    params = encoder_init(jax.random.PRNGKey(0), REF)
    x = jax.random.uniform(jax.random.PRNGKey(4), (3, 4, 32, 32, 1), minval=-1, maxval=1)
    ref = encoder_apply(params, REF, x)
    got = fused_encoder_apply(params, REF, x, tile=8, interpret=True)
    assert got.shape == ref.shape
    assert jnp.max(jnp.abs(ref - got)) < 2e-6


def test_operators_are_differentiable():
    """Gradients flow through the operator construction to the original
    params — required for training integration."""
    params = encoder_init(jax.random.PRNGKey(0), REF)
    x = jax.random.uniform(jax.random.PRNGKey(5), (4, 32, 32, 1), minval=-1, maxval=1)

    def loss_ref(p):
        return jnp.sum(encoder_apply(p, REF, x) ** 2)

    def loss_sr(p):
        return jnp.sum(superrow_encoder_xla(p, REF, x) ** 2)

    from jax import flatten_util

    g_ref = jax.grad(loss_ref)(params)
    g_sr = jax.grad(loss_sr)(params)
    flat_ref, _ = flatten_util.ravel_pytree(g_ref)
    flat_sr, _ = flatten_util.ravel_pytree(g_sr)
    assert jnp.max(jnp.abs(flat_ref - flat_sr)) < 5e-5


def test_fused_kernel_backward_matches_encoder_grads():
    """The custom-VJP backward kernels (in-VMEM recompute, f32 gradient
    accumulators) must reproduce ``encoder_apply``'s parameter gradients."""
    from jax import flatten_util

    params = encoder_init(jax.random.PRNGKey(0), REF)
    x = jax.random.uniform(jax.random.PRNGKey(8), (12, 32, 32, 1), minval=-1, maxval=1)
    tgt = jax.random.normal(jax.random.PRNGKey(9), (12, REF.linear_sizes[-1]))

    def loss_ref(p):
        return jnp.mean((encoder_apply(p, REF, x) - tgt) ** 2)

    def loss_fused(p):
        return jnp.mean((fused_encoder_apply(p, REF, x, tile=4, interpret=True)
                         - tgt) ** 2)

    l_ref, g_ref = jax.value_and_grad(loss_ref)(params)
    l_fused, g_fused = jax.value_and_grad(loss_fused)(params)
    assert abs(float(l_ref) - float(l_fused)) < 1e-6
    fr, _ = flatten_util.ravel_pytree(g_ref)
    ff, _ = flatten_util.ravel_pytree(g_fused)
    assert jnp.max(jnp.abs(fr - ff)) < 5e-6, float(jnp.max(jnp.abs(fr - ff)))


def test_fused_kernel_input_grads():
    """d/dx through the fused kernels matches the XLA encoder (the dx chain
    crosses the segment cut)."""
    params = encoder_init(jax.random.PRNGKey(0), REF)
    x = jax.random.uniform(jax.random.PRNGKey(10), (8, 32, 32, 1), minval=-1, maxval=1)

    g_ref = jax.grad(lambda v: jnp.sum(encoder_apply(params, REF, v) ** 2))(x)
    g_fused = jax.grad(lambda v: jnp.sum(
        fused_encoder_apply(params, REF, v, tile=8, interpret=True) ** 2))(x)
    assert jnp.max(jnp.abs(g_ref - g_fused)) < 5e-6


def test_prebuilt_operators_reused():
    params = encoder_init(jax.random.PRNGKey(0), REF)
    ops = build_operators(params, REF, 32, 32, jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(6), (4, 32, 32, 1), minval=-1, maxval=1)
    a = superrow_encoder_xla(params, REF, x, operators=ops)
    b = superrow_encoder_xla(params, REF, x)
    assert jnp.array_equal(a, b)


def test_bf16_path():
    params = encoder_init(jax.random.PRNGKey(0), REF)
    x = jax.random.uniform(jax.random.PRNGKey(7), (4, 32, 32, 1),
                           minval=-1, maxval=1).astype(jnp.bfloat16)
    ref = encoder_apply(params, REF, x)
    got = fused_encoder_apply(params, REF, x, tile=4, interpret=True)
    assert got.dtype == ref.dtype
    assert jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))) < 0.1


def test_fused_decoder_fwd_and_grads():
    """Decoder twin + fused segments reproduce ``decoder_apply`` (fwd and
    parameter grads) — linears' (c,h,w)-reshape permutation folded into the
    unflatten taps, deconvs via the ConvTranspose2d tap relation."""
    from jax import flatten_util

    from multimodal_mtrssm_tpu.nn.conv import DecoderConfig, decoder_apply, decoder_init
    from multimodal_mtrssm_tpu.ops.pallas.fused_conv import (
        fused_decoder_applicable,
        fused_decoder_apply,
        superrow_decoder_xla,
    )

    cfg = DecoderConfig(in_features=48)
    assert fused_decoder_applicable(cfg)
    params = decoder_init(jax.random.PRNGKey(0), cfg)
    f = jax.random.normal(jax.random.PRNGKey(1), (11, 48))
    ref = decoder_apply(params, cfg, f)
    assert jnp.max(jnp.abs(ref - superrow_decoder_xla(params, cfg, f))) < 2e-6
    got = fused_decoder_apply(params, cfg, f, tile=8, interpret=True)
    assert got.shape == ref.shape
    assert jnp.max(jnp.abs(ref - got)) < 2e-6

    tgt = jax.random.normal(jax.random.PRNGKey(2), ref.shape)
    g_ref = jax.grad(lambda p: jnp.mean((decoder_apply(p, cfg, f) - tgt) ** 2))(params)
    g_fus = jax.grad(lambda p: jnp.mean(
        (fused_decoder_apply(p, cfg, f, tile=8, interpret=True) - tgt) ** 2))(params)
    fr, _ = flatten_util.ravel_pytree(g_ref)
    ff, _ = flatten_util.ravel_pytree(g_fus)
    assert jnp.max(jnp.abs(fr - ff)) < 1e-5


def test_fused_decoder_leading_dims():
    from multimodal_mtrssm_tpu.nn.conv import DecoderConfig, decoder_apply, decoder_init
    from multimodal_mtrssm_tpu.ops.pallas.fused_conv import fused_decoder_apply

    cfg = DecoderConfig(in_features=48)
    params = decoder_init(jax.random.PRNGKey(3), cfg)
    f = jax.random.normal(jax.random.PRNGKey(4), (3, 5, 48))
    ref = decoder_apply(params, cfg, f)
    got = fused_decoder_apply(params, cfg, f, tile=8, interpret=True)
    assert got.shape == ref.shape
    assert jnp.max(jnp.abs(ref - got)) < 2e-6


def test_model_conv_layout_fused_enc_loss_and_grads():
    """conv_layout='fused_enc' is a drop-in training path: the full ELBO
    shared_step and its parameter gradients match the nhwc layout."""
    from jax import flatten_util

    from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig

    m_ref = MoPoEMRSSM(MRSSMConfig(conv_layout="nhwc"))
    m_fused = MoPoEMRSSM(MRSSMConfig(conv_layout="fused_enc"))
    params = m_ref.init(jax.random.PRNGKey(0))
    B, T = 2, 5
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    act = jax.random.normal(ks[0], (B, T, 6))
    aud = jax.random.uniform(ks[1], (B, T, 32, 32, 1), minval=-1, maxval=1)
    vis = jax.random.uniform(ks[2], (B, T, 32, 32, 1), minval=-1, maxval=1)
    batch = (act, aud, vis, act, aud, vis)
    k = jax.random.PRNGKey(2)
    l_ref = m_ref.shared_step(params, batch, k)["loss"]
    l_fused = m_fused.shared_step(params, batch, k)["loss"]
    assert abs(float(l_ref) - float(l_fused)) < 1e-3 * abs(float(l_ref))
    g_ref = jax.grad(lambda p: m_ref.shared_step(p, batch, k)["loss"])(params)
    g_fused = jax.grad(lambda p: m_fused.shared_step(p, batch, k)["loss"])(params)
    fr, _ = flatten_util.ravel_pytree(g_ref)
    ff, _ = flatten_util.ravel_pytree(g_fused)
    rel = float(jnp.max(jnp.abs(fr - ff) / (jnp.abs(fr) + 1e-3)))
    assert rel < 5e-3, rel


def test_model_conv_layout_fused_enc_rejects_ineligible():
    from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
    from multimodal_mtrssm_tpu.nn.conv import EncoderConfig as EC

    bad = EC(channels=(8, 16), kernel_sizes=(3, 3), strides=(2, 2), paddings=(1, 1))
    with pytest.raises(ValueError, match="fused_enc"):
        MoPoEMRSSM(MRSSMConfig(conv_layout="fused_enc", audio_encoder=bad,
                               vision_encoder=bad))


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
