"""Tests: YAML experiment loading (ours + reference schema) and viz rendering."""

from pathlib import Path

import jax
import numpy as np

from multimodal_mtrssm_tpu.models.mmtrssm import MoPoEMMTRSSM
from multimodal_mtrssm_tpu.models.mrssm import MoPoEMRSSM
from multimodal_mtrssm_tpu.train.config import load_experiment

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")


def test_load_our_mrssm_config():
    exp = load_experiment(REPO / "configs" / "mopoe_mrssm.yaml")
    assert isinstance(exp.model, MoPoEMRSSM)
    cfg = exp.model.cfg
    assert cfg.deterministic_size == 32
    assert (cfg.class_size, cfg.category_size) == (4, 4)
    assert cfg.audio_encoder.coord_conv is True
    assert cfg.decoder_cfg("audio").in_features == 48
    assert exp.trainer.max_epochs == 100
    assert exp.trainer.seed == 42
    assert exp.trainer.learning_rate == 0.001
    assert exp.trainer.plateau_patience == 50
    assert exp.trainer.early_stop_patience == 200
    assert exp.data.batch_size == 8
    assert exp.data.sequence_length == 30
    assert exp.data.audio_min == -80.0
    assert exp.viz.every_n_epochs == 10
    assert exp.viz.query_length == 10
    # GaussianNoise moves on-device: model applies it, pipeline serves clean.
    assert exp.model.cfg.input_noise_std == 0.1
    assert exp.data.noise_std == 0.0
    assert exp.data.device_resident is False  # opt-in via data.device_resident


def test_load_our_mmtrssm_config():
    exp = load_experiment(REPO / "configs" / "mopoe_mmtrssm.yaml")
    assert isinstance(exp.model, MoPoEMMTRSSM)
    cfg = exp.model.cfg
    assert (cfg.hd_dim, cfg.hs_dim, cfg.ld_dim, cfg.ls_dim) == (32, 16, 32, 16)
    assert (cfg.hs_class, cfg.hs_category) == (2, 8)
    assert (cfg.l_tau, cfg.h_tau) == (2.0, 4.0)
    assert cfg.feature_size == 96
    assert cfg.decoder_cfg("vision").in_features == 96


def test_load_reference_configs_directly():
    """The reference's own YAML files must parse (public API surface)."""
    ref_mrssm = REFERENCE / "src/multimodal_rssm/models/mrssm/mopoe_mrssm/configs/default.yaml"
    if not ref_mrssm.exists():
        import pytest

        pytest.skip("reference not mounted")
    exp = load_experiment(ref_mrssm)
    assert isinstance(exp.model, MoPoEMRSSM)
    assert exp.model.cfg.init_proj_cells == 200
    ref_mmtrssm = REFERENCE / "src/multimodal_rssm/models/mmtrssm/mopoe_mmtrssm/configs/default.yaml"
    exp2 = load_experiment(ref_mmtrssm)
    assert isinstance(exp2.model, MoPoEMMTRSSM)
    assert exp2.model.cfg.w_kl_h == 1.0
    assert exp2.model.cfg.prior_cells == 32


def test_preprocess_transforms_from_yaml(tmp_path):
    """YAML-declared preprocess transforms (incl. RemoveDim) instantiate."""
    import numpy as np
    import yaml

    raw = yaml.safe_load((REPO / "configs" / "mopoe_mrssm.yaml").read_text())
    raw["data"]["init_args"]["config"]["action_preprocess"] = {
        "class_path": "multimodal_rssm.models.transform.RemoveDim",
        "init_args": {"axis": 1, "indices_to_remove": [0]},
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(raw))
    exp = load_experiment(p)
    out = exp.data.action_preprocess(np.zeros((4, 6), np.float32))
    assert out.shape == (4, 5)
    # audio preprocess instantiated from YAML with its min/max
    a = exp.data.audio_preprocess(np.array([[-80.0, 0.0]], np.float32))
    np.testing.assert_allclose(a, [[-1.0, 1.0]], atol=1e-6)


def test_load_crossmodal_config():
    exp = load_experiment(REPO / "configs" / "mopoe_mrssm_crossmodal.yaml")
    assert isinstance(exp.model, MoPoEMRSSM)
    assert exp.data.drop_modality == "audio"


def test_viz_gif_rendering(tmp_path):
    from multimodal_mtrssm_tpu.nn.conv import EncoderConfig
    from multimodal_mtrssm_tpu.models import MRSSMConfig
    from multimodal_mtrssm_tpu.viz import log_rollout_gifs

    enc = EncoderConfig(channels=(4, 8), kernel_sizes=(3, 3), strides=(2, 2), paddings=(1, 1),
                        num_residual_blocks=0, coord_conv=False)
    model = MoPoEMRSSM(MRSSMConfig(audio_encoder=enc, vision_encoder=enc, init_proj_cells=16))
    params = model.init(jax.random.PRNGKey(0))
    B, T = 2, 6
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    batch = (
        jax.random.normal(ks[0], (B, T, 6)),
        jax.random.uniform(ks[1], (B, T, 32, 32, 1), minval=-1, maxval=1),
        jax.random.uniform(ks[2], (B, T, 32, 32, 1), minval=-1, maxval=1),
    )
    paths = log_rollout_gifs(model, params, batch, tmp_path, query_length=3, fps=5.0,
                             key=jax.random.PRNGKey(2), indices=(0, 1))
    assert len(paths) == 2
    for p in paths:
        assert p.exists() and p.stat().st_size > 0
        from PIL import Image

        im = Image.open(p)
        assert im.format == "GIF"
        assert getattr(im, "n_frames", 1) == T


def test_config_scans_all_input_transform_streams(tmp_path):
    """ADVICE r1: GaussianNoise/TakeFirstN on non-audio streams must be seen;
    disagreeing TakeFirstN errors; disagreeing stds warn and collapse."""
    import pytest

    from multimodal_mtrssm_tpu.train.config import load_experiment

    def write(cfg, name):
        p = tmp_path / name
        import yaml

        p.write_text(yaml.safe_dump(cfg))
        return p

    def stream(n=None, std=None):
        ts = []
        if n is not None:
            ts.append({"class_path": "multimodal_rssm.models.transform.TakeFirstN",
                       "init_args": {"n": n}})
        if std is not None:
            ts.append({"class_path": "multimodal_rssm.models.transform.GaussianNoise",
                       "init_args": {"std": std}})
        return {"class_path": "torchvision.transforms.Compose",
                "init_args": {"transforms": ts}}

    base = {"model": {"class_path": "x.MoPoE_MRSSM", "init_args": {}}}

    # noise only on the ACTION stream is still picked up (per-stream stds)
    cfg = dict(base)
    cfg["data"] = {"init_args": {"config": {"init_args": {
        "action_input_transform": stream(n=12, std=0.3),
    }}}}
    exp = load_experiment(write(cfg, "a.yaml"))
    assert exp.model.cfg.input_noise_std == (0.3, 0.0, 0.0)
    assert exp.data.sequence_length == 12

    # disagreeing TakeFirstN values error
    cfg = dict(base)
    cfg["data"] = {"init_args": {"config": {"init_args": {
        "action_input_transform": stream(n=10),
        "vision_observation_input_transform": stream(n=20),
    }}}}
    with pytest.raises(ValueError, match="TakeFirstN"):
        load_experiment(write(cfg, "b.yaml"))

    # differing per-stream stds are carried through exactly
    cfg = dict(base)
    cfg["data"] = {"init_args": {"config": {"init_args": {
        "audio_observation_input_transform": stream(n=10, std=0.1),
        "vision_observation_input_transform": stream(n=10, std=0.5),
    }}}}
    exp = load_experiment(write(cfg, "c.yaml"))
    assert exp.model.cfg.input_noise_std == (0.0, 0.1, 0.5)

    # uniform stds collapse to the reference's scalar form
    cfg = dict(base)
    cfg["data"] = {"init_args": {"config": {"init_args": {
        "action_input_transform": stream(n=10, std=0.1),
        "audio_observation_input_transform": stream(n=10, std=0.1),
        "vision_observation_input_transform": stream(n=10, std=0.1),
    }}}}
    exp = load_experiment(write(cfg, "d.yaml"))
    assert exp.model.cfg.input_noise_std == 0.1


def test_effective_data_dir_common_override(tmp_path, monkeypatch):
    """Reference get_effective_processed_data_dir parity (dataset.py:136-161):
    a populated common processed_data dir wins over data_dir."""
    from multimodal_mtrssm_tpu.data import (
        DataModuleConfig,
        EpisodeDataModule,
        generate_synthetic_audio_mnist,
    )
    from multimodal_mtrssm_tpu.data.pipeline import effective_data_dir

    common = tmp_path / "data" / "processed_data"
    generate_synthetic_audio_mnist(common, n_episodes=4, episode_length=5)
    cfg = DataModuleConfig(data_dir=tmp_path / "data" / "audio_mnist", batch_size=2,
                           sequence_length=3, common_processed_dir=common)
    assert effective_data_dir(cfg) == common
    dm = EpisodeDataModule(cfg)
    dm.setup()  # loads from the common dir even though data_dir is empty
    assert dm.n_train == 3

    # empty common dir → fall back to data_dir
    cfg2 = DataModuleConfig(data_dir=common, batch_size=2, sequence_length=3,
                            common_processed_dir=tmp_path / "nope")
    assert effective_data_dir(cfg2) == common


def test_scheduler_spec_exact_class_matching():
    """Substring lookalikes (CosineAnnealingWarmRestarts, MultiStepLR) must
    warn + fall back to plateau, not silently misparse as cosine/step."""
    import warnings

    from multimodal_mtrssm_tpu.train.config import _scheduler_spec

    def node(leaf, args=None):
        return {"class_path": f"torch.optim.lr_scheduler.{leaf}", "init_args": args or {}}

    assert _scheduler_spec(node("CosineAnnealingLR", {"T_max": 7})) == {
        "kind": "cosine", "t_max": 7, "eta_min": 0.0}
    assert _scheduler_spec(node("StepLR", {"step_size": 4}))["kind"] == "step"
    for lookalike in ("CosineAnnealingWarmRestarts", "MultiStepLR"):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            assert _scheduler_spec(node(lookalike)) is None
        assert any("unsupported lr_scheduler" in str(x.message) for x in w)


def test_optimizer_and_scheduler_args_parse_from_yaml(tmp_path):
    """weight_decay/betas/eps, plateau min_lr/threshold, and EarlyStopping
    min_delta from the YAML reach TrainerConfig (they used to be silently
    dropped in favor of hardcoded defaults)."""
    import yaml

    from multimodal_mtrssm_tpu.train.config import load_experiment

    base = yaml.safe_load(open("configs/mopoe_mrssm.yaml"))
    base["optimizer"] = {
        "class_path": "torch.optim.AdamW",
        "init_args": {"lr": 2e-3, "weight_decay": 0.0, "betas": [0.85, 0.95], "eps": 1e-6},
    }
    base["lr_scheduler"] = {
        "class_path": "torch.optim.lr_scheduler.ReduceLROnPlateau",
        "init_args": {"factor": 0.3, "patience": 7, "min_lr": [1e-5], "threshold": 1e-3},
    }
    for cb in base["trainer"]["callbacks"]:
        if "EarlyStopping" in cb.get("class_path", ""):
            cb["init_args"]["min_delta"] = 0.01
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(base))
    t = load_experiment(p).trainer
    assert t.learning_rate == 2e-3 and t.weight_decay == 0.0
    assert t.adam_b1 == 0.85 and t.adam_b2 == 0.95 and t.adam_eps == 1e-6
    assert t.plateau_factor == 0.3 and t.plateau_patience == 7
    assert t.plateau_min_lr == 1e-5 and t.plateau_threshold == 1e-3
    assert t.early_stop_min_delta == 0.01


def test_conv_layout_yaml_passthrough(tmp_path):
    """The s2d conv layout is the default (on-chip A/B win, BASELINE.md);
    model.conv_layout: nhwc in the YAML restores the canonical layout."""
    import yaml

    base = yaml.safe_load((REPO / "configs" / "mopoe_mrssm.yaml").read_text())
    assert load_experiment(REPO / "configs" / "mopoe_mrssm.yaml").model._use_s2d is True
    base["model"]["init_args"]["conv_layout"] = "nhwc"
    p = tmp_path / "nhwc.yaml"
    p.write_text(yaml.safe_dump(base))
    exp = load_experiment(p)
    assert exp.model.cfg.conv_layout == "nhwc"
    assert exp.model._use_s2d is False
