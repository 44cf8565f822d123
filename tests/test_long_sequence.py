"""Tests: full-length (T=180) episode training path (SURVEY §5.7).

The reference truncates 180-frame episodes to T=30 (``TakeFirstN``); the
TPU build's long-sequence story is the same ``lax.scan`` at full length —
this asserts the fused step compiles and differentiates at T=180.
"""

import jax
import jax.numpy as jnp

from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig, MoPoEMMTRSSM, MMTRSSMConfig
from multimodal_mtrssm_tpu.nn.conv import EncoderConfig

ENC = EncoderConfig(channels=(4, 8), kernel_sizes=(3, 3), strides=(2, 2), paddings=(1, 1),
                    num_residual_blocks=0, coord_conv=False)


def full_length_batch(B=1, T=180):
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    a = jax.random.normal(ks[0], (B, T, 6))
    au = jax.random.uniform(ks[1], (B, T, 32, 32, 1), minval=-1, maxval=1)
    vi = jax.random.uniform(ks[2], (B, T, 32, 32, 1), minval=-1, maxval=1)
    return (a, au, vi, a, au, vi)


def test_mrssm_full_length_grad():
    model = MoPoEMRSSM(MRSSMConfig(audio_encoder=ENC, vision_encoder=ENC, init_proj_cells=16))
    params = model.init(jax.random.PRNGKey(0))
    batch = full_length_batch()
    loss, grads = jax.jit(
        jax.value_and_grad(lambda p, k: model.shared_step(p, batch, k)["loss"])
    )(params, jax.random.PRNGKey(2))
    assert jnp.isfinite(loss)
    assert all(jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads))


def test_mrssm_remat_matches_nonremat():
    import numpy as np

    batch = full_length_batch(T=12)
    key = jax.random.PRNGKey(2)
    m1 = MoPoEMRSSM(MRSSMConfig(audio_encoder=ENC, vision_encoder=ENC, init_proj_cells=16))
    m2 = MoPoEMRSSM(MRSSMConfig(audio_encoder=ENC, vision_encoder=ENC, init_proj_cells=16, remat=True))
    params = m1.init(jax.random.PRNGKey(0))
    g1 = jax.grad(lambda p: m1.shared_step(p, batch, key)["loss"])(params)
    g2 = jax.grad(lambda p: m2.shared_step(p, batch, key)["loss"])(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_mmtrssm_full_length_grad():
    model = MoPoEMMTRSSM(MMTRSSMConfig(audio_encoder=ENC, vision_encoder=ENC, init_proj_cells=16))
    params = model.init(jax.random.PRNGKey(0))
    batch = full_length_batch()
    loss, grads = jax.jit(
        jax.value_and_grad(lambda p, k: model.shared_step(p, batch, k)["loss"])
    )(params, jax.random.PRNGKey(2))
    assert jnp.isfinite(loss)
    assert all(jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads))
