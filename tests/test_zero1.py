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

    def train_step(opt, bt):
        def step(p, st, k):
            loss, g = jax.value_and_grad(lambda q: model.shared_step(q, bt, k)["loss"])(p)
            u, st = opt.update(g, st, p)
            return jax.tree.map(lambda a, b: a + b, p, u), st, loss

        return jax.jit(step)

    # Replicated baseline.
    opt_r = make_optimizer()
    p1 = model.init(jax.random.PRNGKey(0))
    s1 = opt_r.init(p1)
    f1 = train_step(opt_r, batch)
    for i in range(3):
        p1, s1, l1 = f1(p1, s1, jax.random.fold_in(key, i))

    # ZeRO-1: padded + sharded moments, sharded batch, replicated params.
    opt_z = make_optimizer(shard_pad=n_dev)
    p2 = replicate(model.init(jax.random.PRNGKey(0)), mesh)
    s2 = shard_opt_state(opt_z.init(p2), mesh)
    assert "data" in str(s2.m.sharding.spec)
    b2 = shard_batch(batch, mesh)
    f2 = train_step(opt_z, b2)  # the ZeRO leg really runs on the SHARDED batch
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
    # Mean first-moment drift from reduction reassociation over 3 steps;
    # scales with gradient magnitude (a shard-offset bug is orders larger).
    assert m_diff.mean() < 5e-5, m_diff.mean()


def test_zero1_update_vector_exact():
    """Shard-offset bugs cannot hide: with distinct non-zero moment patterns
    and a fixed gradient, one sharded opt.update must reproduce the
    replicated update to float32 round-off (the only cross-element op is the
    replicated clip-norm reduction). A mis-sliced pad or wrong shard offset
    displaces moment entries and produces O(1) relative errors here."""
    import jax.numpy as jnp

    model = small_model()
    mesh = make_mesh()
    n_dev = mesh.devices.size
    params = model.init(jax.random.PRNGKey(0))

    # Fixed deterministic gradient with per-position structure.
    sizes = np.cumsum([0] + [np.asarray(p).size for p in jax.tree.leaves(params)])
    leaves = [
        jnp.sin(0.1 * (jnp.arange(np.asarray(p).size, dtype=jnp.float32) + off)).reshape(
            np.asarray(p).shape
        ) * 0.01
        for p, off in zip(jax.tree.leaves(params), sizes)
    ]
    grads = jax.tree.unflatten(jax.tree.structure(params), leaves)

    opt_r = make_optimizer()
    s_r = opt_r.init(params)
    n = s_r.m.shape[0]
    pos = jnp.arange(n, dtype=jnp.float32)
    m_pat = jnp.sin(0.01 * pos) * 1e-3
    v_pat = 1e-6 + 1e-4 * jnp.cos(0.02 * pos) ** 2
    s_r = s_r._replace(m=m_pat, v=v_pat, count=jnp.asarray(3, jnp.int32))

    opt_z = make_optimizer(shard_pad=n_dev)
    p_z = replicate(params, mesh)
    s_z = opt_z.init(p_z)
    pad = s_z.m.shape[0]
    s_z = s_z._replace(
        m=jnp.zeros(pad).at[:n].set(m_pat),
        v=jnp.zeros(pad).at[:n].set(v_pat),
        count=jnp.asarray(3, jnp.int32),
    )
    s_z = shard_opt_state(s_z, mesh)

    u_r, s_r2 = jax.jit(opt_r.update)(grads, s_r, params)
    u_z, s_z2 = jax.jit(opt_z.update)(grads, s_z, p_z)

    for a, b in zip(jax.tree.leaves(u_r), jax.tree.leaves(u_z)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(np.asarray(s_r2.m), np.asarray(s_z2.m)[:n], rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_r2.v), np.asarray(s_z2.v)[:n], rtol=1e-6, atol=1e-15)
