"""Tests: ZeRO-1-style sharded optimizer state matches the replicated path."""

import jax
import numpy as np

from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
from multimodal_mtrssm_tpu.nn.conv import EncoderConfig
from multimodal_mtrssm_tpu.parallel import make_mesh, replicate, shard_batch
from multimodal_mtrssm_tpu.train.optim import make_optimizer, shard_opt_state


def small_model():
    enc = EncoderConfig(channels=(4, 8), kernel_sizes=(3, 3), strides=(2, 2), paddings=(1, 1),
                        num_residual_blocks=0, coord_conv=False)
    return MoPoEMRSSM(MRSSMConfig(audio_encoder=enc, vision_encoder=enc, init_proj_cells=16))


def make_batch(B=8, T=3):
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    a = jax.random.normal(ks[0], (B, T, 6))
    au = jax.random.uniform(ks[1], (B, T, 32, 32, 1), minval=-1, maxval=1)
    vi = jax.random.uniform(ks[2], (B, T, 32, 32, 1), minval=-1, maxval=1)
    return (a, au, vi, a, au, vi)


def test_zero1_sharded_opt_matches_replicated():
    model = small_model()
    mesh = make_mesh()
    n_dev = mesh.devices.size
    batch = make_batch()
    key = jax.random.PRNGKey(2)

    def train_step(opt):
        def step(p, st, k):
            loss, g = jax.value_and_grad(lambda q: model.shared_step(q, batch, k)["loss"])(p)
            u, st = opt.update(g, st, p)
            return jax.tree.map(lambda a, b: a + b, p, u), st, loss

        return jax.jit(step)

    # Replicated baseline.
    opt_r = make_optimizer()
    p1 = model.init(jax.random.PRNGKey(0))
    s1 = opt_r.init(p1)
    f1 = train_step(opt_r)
    for i in range(3):
        p1, s1, l1 = f1(p1, s1, jax.random.fold_in(key, i))

    # ZeRO-1: padded + sharded moments, sharded batch, replicated params.
    opt_z = make_optimizer(shard_pad=n_dev)
    p2 = replicate(model.init(jax.random.PRNGKey(0)), mesh)
    s2 = shard_opt_state(opt_z.init(p2), mesh)
    assert "data" in str(s2.m.sharding.spec)
    f2 = train_step(opt_z)
    b2 = shard_batch(batch, mesh)
    for i in range(3):
        p2, s2, l2 = f2(p2, s2, jax.random.fold_in(key, i))

    # The SPMD layout reassociates f32 reductions, and Adam's normalized
    # update amplifies that noise to ±lr for near-zero-gradient entries —
    # exact equality is not expected. A wiring bug (mis-sliced padding,
    # wrong shard offsets) would corrupt essentially every entry by ≫ lr,
    # so assert distributional closeness instead.
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-3)
    diffs = np.concatenate([
        (np.asarray(a) - np.asarray(b)).ravel()
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2))
    ])
    lr = 1e-3
    assert np.abs(diffs).mean() < 0.1 * lr, np.abs(diffs).mean()
    assert np.abs(diffs).max() < 10 * lr, np.abs(diffs).max()
    m_diff = np.abs(np.asarray(s1.m) - np.asarray(s2.m)[: s1.m.shape[0]])
    assert m_diff.mean() < 1e-5, m_diff.mean()
