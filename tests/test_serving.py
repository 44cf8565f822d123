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
