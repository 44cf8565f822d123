"""Tests: serving WorldModel API (observe / imagine / decode / from_checkpoint)."""

import jax
import numpy as np

from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
from multimodal_mtrssm_tpu.nn.conv import EncoderConfig
from multimodal_mtrssm_tpu.serving import WorldModel

ENC = EncoderConfig(channels=(4, 8), kernel_sizes=(3, 3), strides=(2, 2), paddings=(1, 1),
                    num_residual_blocks=0, coord_conv=False)
B, T = 2, 5


def make_wm():
    model = MoPoEMRSSM(MRSSMConfig(audio_encoder=ENC, vision_encoder=ENC, init_proj_cells=16))
    params = model.init(jax.random.PRNGKey(0))
    return WorldModel(model, params)


def obs():
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    return (
        jax.random.normal(ks[0], (B, T, 6)),
        jax.random.uniform(ks[1], (B, T, 32, 32, 1), minval=-1, maxval=1),
        jax.random.uniform(ks[2], (B, T, 32, 32, 1), minval=-1, maxval=1),
    )


def test_observe_imagine_decode_roundtrip():
    wm = make_wm()
    actions, audio, vision = obs()
    posterior, prior = wm.observe(actions, audio, vision, jax.random.PRNGKey(2))
    assert posterior.feature.shape == (B, T, 48)
    last = posterior[:, -1]
    imagined = wm.imagine(actions, last, jax.random.PRNGKey(3))
    frames = wm.decode(imagined)
    assert frames["recon/vision"].shape == (B, T, 32, 32, 1)
    combo = wm.imagine_frames(actions, last, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(
        np.asarray(combo["recon/audio"]), np.asarray(frames["recon/audio"])
    )


def test_mmtrssm_observe_imagine():
    from multimodal_mtrssm_tpu.models import MMTRSSMConfig, MoPoEMMTRSSM

    model = MoPoEMMTRSSM(MMTRSSMConfig(audio_encoder=ENC, vision_encoder=ENC, init_proj_cells=16))
    wm = WorldModel(model, model.init(jax.random.PRNGKey(0)))
    actions, audio, vision = obs()
    posterior, _ = wm.observe(actions, audio, vision, jax.random.PRNGKey(2))
    assert posterior.feature.shape == (B, T, 96)
    imagined = wm.imagine(actions, posterior[:, -1], jax.random.PRNGKey(3))
    frames = wm.decode(imagined)
    assert frames["recon/audio"].shape == (B, T, 32, 32, 1)


def test_from_checkpoint(tmp_path):
    from multimodal_mtrssm_tpu.data import DataModuleConfig, EpisodeDataModule, generate_synthetic_audio_mnist
    from multimodal_mtrssm_tpu.train import Trainer, TrainerConfig
    from multimodal_mtrssm_tpu.train.config import load_experiment
    from pathlib import Path

    # Tiny train run producing a checkpoint loadable through the config.
    repo = Path(__file__).resolve().parent.parent
    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=4, episode_length=6)
    exp = load_experiment(repo / "configs" / "mopoe_mrssm.yaml")
    exp.trainer.max_epochs = 1
    exp.trainer.log_dir = str(tmp_path / "run")
    exp.data.data_dir = data_dir
    exp.data.sequence_length = 4
    Trainer(exp.model, EpisodeDataModule(exp.data), exp.trainer).fit()

    wm = WorldModel.from_checkpoint(
        repo / "configs" / "mopoe_mrssm.yaml", tmp_path / "run" / "checkpoints"
    )
    actions, audio, vision = obs()
    posterior, _ = wm.observe(actions, audio, vision, jax.random.PRNGKey(2))
    assert posterior.feature.shape == (B, T, 48)

    # A run preempted before any validation epoch has ONLY a full-state
    # 'last' (params + opt_state): from_checkpoint must extract the params
    # subtree, not die on Orbax's params-template/structure mismatch.
    import shutil

    ckpts = tmp_path / "run" / "checkpoints"
    shutil.rmtree(ckpts / "best")
    (ckpts / "best.json").unlink(missing_ok=True)
    wm2 = WorldModel.from_checkpoint(repo / "configs" / "mopoe_mrssm.yaml", ckpts)
    p2, _ = wm2.observe(actions, audio, vision, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(p2.deter), np.asarray(posterior.deter))


def test_worldmodel_rejects_unimodal_model():
    """The observe surface is multimodal; a unimodal RSSM must fail fast at
    construction, not deep inside jit on the first request."""
    import pytest

    from multimodal_mtrssm_tpu.models.rssm import RSSM, RSSMConfig

    model = RSSM(RSSMConfig(encoder=ENC))
    with pytest.raises(TypeError, match="multimodal"):
        WorldModel(model, model.init(jax.random.PRNGKey(0)))


def test_use_pallas_auto_dispatch():
    """"auto" resolves per shape: XLA off-TPU always; on TPU, MT always and
    MRSSM from the measured batch*horizon crossover up."""
    from unittest import mock

    import multimodal_mtrssm_tpu.ops.pallas as P

    # Tests run on CPU: auto must always resolve to the XLA path.
    assert P.resolve_use_pallas("auto", "mrssm", 256, 180) is False
    assert P.resolve_use_pallas("auto", "mt", 10, 10) is False
    # Explicit booleans pass through regardless of backend.
    assert P.resolve_use_pallas(True, "mrssm", 1, 1) is True
    assert P.resolve_use_pallas(False, "mt", 256, 180) is False
    # On a TPU backend: MT always wins; MRSSM from the crossover up.
    with mock.patch("jax.default_backend", return_value="tpu"):
        assert P.resolve_use_pallas("auto", "mt", 1, 1) is True
        assert P.resolve_use_pallas("auto", "mrssm", 10, 10) is False
        assert P.resolve_use_pallas("auto", "mrssm", 60, 10) is True
        assert P.resolve_use_pallas("auto", "mrssm", 64, 30) is True
    # Unknown values (e.g. a quoted "true" from YAML) raise instead of
    # silently truth-testing to the kernel path. (Python equality makes
    # 1/0 indistinguishable from True/False — those pass through.)
    import pytest

    for bad in ("true", "on", "none"):
        with pytest.raises(ValueError, match="use_pallas"):
            P.resolve_use_pallas(bad, "mrssm", 8, 30)


def test_worldmodel_mesh_parallel_matches_single_device():
    """Batch-parallel serving: WorldModel(mesh=...) shards request batches
    over the data mesh; observe/imagine/decode numerics equal the
    single-device path (GSPMD partitioning only)."""
    from multimodal_mtrssm_tpu.parallel import make_mesh

    model = MoPoEMRSSM(MRSSMConfig(audio_encoder=ENC, vision_encoder=ENC, init_proj_cells=16))
    params = model.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(7)
    Bm, Tm = 8, 4
    ks = jax.random.split(key, 3)
    actions = jax.random.normal(ks[0], (Bm, Tm, 6))
    audio = jax.random.uniform(ks[1], (Bm, Tm, 32, 32, 1), minval=-1, maxval=1)
    vision = jax.random.uniform(ks[2], (Bm, Tm, 32, 32, 1), minval=-1, maxval=1)

    wm1 = WorldModel(model, params, use_pallas=False)
    wm8 = WorldModel(model, params, mesh=make_mesh())
    post1, _ = wm1.observe(actions, audio, vision, key)
    post8, _ = wm8.observe(actions, audio, vision, key)
    np.testing.assert_allclose(np.asarray(post1.deter), np.asarray(post8.deter),
                               rtol=1e-5, atol=1e-6)

    last1 = post1[:, -1]
    last8 = post8[:, -1]
    img1 = wm1.imagine(actions, last1, key)
    img8 = wm8.imagine(actions, last8, key)
    np.testing.assert_allclose(np.asarray(img1.deter), np.asarray(img8.deter),
                               rtol=1e-5, atol=1e-6)
    dec1 = wm1.decode(img1)
    dec8 = wm8.decode(img8)
    np.testing.assert_allclose(np.asarray(dec1["recon/vision"]),
                               np.asarray(dec8["recon/vision"]), rtol=1e-5, atol=1e-6)


def test_mesh_serving_pads_odd_batches():
    """A request batch not divisible by the mesh is padded (loudly), sharded,
    and truncated back — never silently run unsharded (VERDICT r2 item 4).
    Mechanics check: the internally-padded B=6 request must bit-equal a
    manually padded B=8 request sliced back to 6."""
    import warnings

    from multimodal_mtrssm_tpu.parallel import make_mesh

    model = MoPoEMRSSM(MRSSMConfig(audio_encoder=ENC, vision_encoder=ENC, init_proj_cells=16))
    params = model.init(jax.random.PRNGKey(0))
    wm = WorldModel(model, params, mesh=make_mesh())
    key = jax.random.PRNGKey(7)
    Bo, Tm = 6, 4
    ks = jax.random.split(key, 3)
    actions = jax.random.normal(ks[0], (Bo, Tm, 6))
    audio = jax.random.uniform(ks[1], (Bo, Tm, 32, 32, 1), minval=-1, maxval=1)
    vision = jax.random.uniform(ks[2], (Bo, Tm, 32, 32, 1), minval=-1, maxval=1)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        post, prior = wm.observe(actions, audio, vision, key)
    assert any("not divisible" in str(w.message) for w in caught)
    assert post.deter.shape[0] == Bo  # truncated back to the true batch

    # Manual padding (repeat last row to the mesh multiple) must reproduce it.
    def pad(x):
        return jax.numpy.concatenate([x, jax.numpy.broadcast_to(x[-1:], (2, *x.shape[1:]))])
    wm2 = WorldModel(model, params, mesh=make_mesh())
    post8, _ = wm2.observe(pad(actions), pad(audio), pad(vision), key)
    np.testing.assert_array_equal(np.asarray(post.deter), np.asarray(post8.deter[:Bo]))

    # imagine/decode also pad+truncate.
    img = wm.imagine(actions, post[:, -1], key)
    assert img.deter.shape[0] == Bo
    dec = wm.decode(img)
    assert dec["recon/vision"].shape[0] == Bo


def test_mesh_pallas_shard_map_interpret():
    """The fused MRSSM kernel runs per-shard under shard_map on the 8-device
    mesh (interpret mode on CPU): outputs keep the sharded layout and the
    deterministic recurrence replayed from the kernel's own samples matches
    the model math (VERDICT r2 item 4 — mesh serving keeps the kernel win)."""
    import jax.numpy as jnp

    from multimodal_mtrssm_tpu.parallel import make_mesh

    model = MoPoEMRSSM(MRSSMConfig(audio_encoder=ENC, vision_encoder=ENC, init_proj_cells=16))
    params = model.init(jax.random.PRNGKey(0))
    wm = WorldModel(model, params, use_pallas=True, mesh=make_mesh())
    wm.pallas_interpret = True
    Bm, Tm = 8, 5
    actions = jax.random.normal(jax.random.PRNGKey(1), (Bm, Tm, 6))
    idx = jax.random.randint(jax.random.PRNGKey(2), (Bm, 4), 0, 4)
    init = __import__("multimodal_mtrssm_tpu.models.state", fromlist=["State"]).State(
        deter=jax.random.normal(jax.random.PRNGKey(3), (Bm, 32)),
        stoch=jax.nn.one_hot(idx, 4).reshape(Bm, 16),
        distribution=model._dist(jnp.zeros((Bm, 16))),
    )
    img = wm.imagine(actions, init, jax.random.PRNGKey(4))
    # Valid one-hot samples.
    s = np.asarray(img.stoch).reshape(Bm, Tm, 4, 4)
    np.testing.assert_allclose(s.sum(-1), 1.0, atol=1e-6)
    # Replay the kernel's samples through the XLA transition math.
    deter, stoch = init.deter, init.stoch
    replayed = []
    for t in range(Tm):
        deter, _ = model._transition_core(params, actions[:, t], stoch, deter)
        replayed.append(deter)
        stoch = img.stoch[:, t]
    np.testing.assert_allclose(
        np.asarray(img.deter), np.asarray(jnp.stack(replayed, 1)), atol=2e-5
    )
    # Shards drew decorrelated samples (seed offset by axis_index): with 8
    # single-row shards, at least two rows must differ somewhere.
    assert not all(
        np.array_equal(np.asarray(img.stoch[0]), np.asarray(img.stoch[i])) for i in range(1, Bm)
    )
