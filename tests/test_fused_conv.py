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


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
