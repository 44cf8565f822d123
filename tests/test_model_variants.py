"""Tests: unimodal RSSM + WeightedMoPoE-MRSSM model families."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_mtrssm_tpu.models import (
    RSSM,
    RSSMConfig,
    WeightedMoPoEMRSSM,
    WeightedMRSSMConfig,
)
from multimodal_mtrssm_tpu.nn.conv import EncoderConfig

ENC = EncoderConfig(channels=(4, 8), kernel_sizes=(3, 3), strides=(2, 2), paddings=(1, 1),
                    num_residual_blocks=0, coord_conv=False)
B, T = 2, 4


def test_unimodal_rssm_trains():
    model = RSSM(RSSMConfig(encoder=ENC, init_proj_cells=16))
    params = model.init(jax.random.PRNGKey(0))
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    action = jax.random.normal(ks[0], (B, T, 6))
    obs = jax.random.uniform(ks[1], (B, T, 32, 32, 1), minval=-1, maxval=1)
    batch = (action, obs, action, obs)

    @jax.jit
    def step(p, k):
        d = model.shared_step(p, batch, k)
        return d["loss"], d

    (loss, d), grads = jax.value_and_grad(step, has_aux=True)(params, jax.random.PRNGKey(2))
    assert jnp.isfinite(loss)
    assert {"recon", "kl", "loss"} <= set(d)
    for name, g in grads.items():
        n = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
        assert n > 0.0, f"no grad to {name}"
    # imagination + decode
    init = model.initial_state(params, obs[:, 0], jax.random.PRNGKey(3))
    prior = model.rollout_transition(params, action, init, jax.random.PRNGKey(4))
    rec = model.decode_state(params, prior)
    assert rec["recon"].shape == (B, T, 32, 32, 1)


def test_weighted_mopoe_learned_weights():
    model = WeightedMoPoEMRSSM(
        WeightedMRSSMConfig(audio_encoder=ENC, vision_encoder=ENC, init_proj_cells=16)
    )
    params = model.init(jax.random.PRNGKey(0))
    assert "moe_weight_head" in params
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    action = jax.random.normal(ks[0], (B, T, 6))
    audio = jax.random.uniform(ks[1], (B, T, 32, 32, 1), minval=-1, maxval=1)
    vision = jax.random.uniform(ks[2], (B, T, 32, 32, 1), minval=-1, maxval=1)
    batch = (action, audio, vision, action, audio, vision)

    init = model.initial_state(params, audio[:, 0], vision[:, 0], jax.random.PRNGKey(2))
    posterior, prior, weights = model.rollout_representation_with_weights(
        params, action, audio, vision, init, jax.random.PRNGKey(3)
    )
    assert weights.shape == (B, T, 3)
    np.testing.assert_allclose(np.asarray(weights).sum(-1), 1.0, atol=1e-5)
    assert posterior.feature.shape == (B, T, 48)

    # the full ELBO + grads flow through the weight head
    loss, grads = jax.value_and_grad(
        lambda p: model.shared_step(p, batch, jax.random.PRNGKey(4))["loss"]
    )(params)
    assert jnp.isfinite(loss)
    n = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(grads["moe_weight_head"]))
    assert n > 0.0


def test_weighted_mopoe_reduces_to_fixed_with_uniform_weights():
    """Zeroed weight head ⇒ log_softmax gives exactly log(1/3) ⇒ identical
    mixture to the fixed MoPoE."""
    from multimodal_mtrssm_tpu.ops.fusion import mopoe_mix_log_probs

    model = WeightedMoPoEMRSSM(
        WeightedMRSSMConfig(audio_encoder=ENC, vision_encoder=ENC, init_proj_cells=16)
    )
    params = model.init(jax.random.PRNGKey(0))
    params["moe_weight_head"] = jax.tree.map(jnp.zeros_like, params["moe_weight_head"])
    rng = np.random.default_rng(0)
    deter = jnp.asarray(rng.normal(size=(B, 32)), jnp.float32)
    a = jnp.asarray(rng.normal(size=(B, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, 16)), jnp.float32)
    mixed_w, (weights,) = model._posterior_mix(params, deter, a, v)
    np.testing.assert_allclose(np.asarray(weights), 1.0 / 3.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mixed_w), np.asarray(mopoe_mix_log_probs(a, v)), atol=1e-5
    )


def test_unimodal_pipeline_and_trainer(tmp_path):
    from multimodal_mtrssm_tpu.data import DataModuleConfig, EpisodeDataModule, generate_synthetic_audio_mnist
    from multimodal_mtrssm_tpu.train import Trainer, TrainerConfig

    generate_synthetic_audio_mnist(tmp_path / "d", n_episodes=4, episode_length=6)
    dm = EpisodeDataModule(DataModuleConfig(
        data_dir=tmp_path / "d", batch_size=2, sequence_length=4, modality="vision"
    ))
    dm.setup()
    b = next(iter(dm.train_batches(0)))
    assert len(b) == 4
    assert np.asarray(b[1]).shape == (2, 4, 32, 32, 1)
    model = RSSM(RSSMConfig(encoder=ENC, init_proj_cells=16))
    out = Trainer(model, dm, TrainerConfig(max_epochs=2, log_dir=str(tmp_path / "run"))).fit()
    assert len(out["history"]) == 2
    assert np.isfinite(out["history"][-1]["train/loss"])


def test_weighted_config_dispatch():
    import yaml
    from pathlib import Path

    from multimodal_mtrssm_tpu.train.config import load_experiment

    repo = Path(__file__).resolve().parent.parent
    raw = yaml.safe_load((repo / "configs" / "mopoe_mrssm.yaml").read_text())
    raw["model"]["class_path"] = "multimodal_mtrssm_tpu.models.WeightedMoPoEMRSSM"
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        yaml.safe_dump(raw, f)
        path = f.name
    exp = load_experiment(path)
    assert isinstance(exp.model, WeightedMoPoEMRSSM)
    assert exp.model.cfg.deterministic_size == 32
    assert exp.model.cfg.decoder_cfg("audio").in_features == 48


def test_plot_weights_timeseries(tmp_path):
    from multimodal_mtrssm_tpu.models.weighted_mopoe import plot_weights_timeseries

    w = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(0), (2, 10, 3)), axis=-1)
    p = plot_weights_timeseries(w, tmp_path / "weights.png")
    assert p.exists() and p.stat().st_size > 0
