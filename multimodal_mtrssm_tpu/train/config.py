"""YAML experiment configuration.

The reference's config schema — LightningCLI YAML with recursive
``class_path``/``init_args`` object instantiation — is a public, load-bearing
API surface (it is re-parsed by the evaluation scripts, reference
``evaluate_word_transitions_mrssm.py:603-805``; SURVEY §5.6). This module
reads that exact schema (our shipped configs under ``configs/`` use it, and
the reference's own ``default.yaml`` files parse too) and translates it to
this build's dataclasses:

- ``model`` section → ``MRSSMConfig`` / ``MMTRSSMConfig`` (+ which model)
- ``optimizer`` / ``lr_scheduler`` / ``trainer`` (+ callback list) → ``TrainerConfig``
- ``data`` section → ``DataModuleConfig``
- ``seed_everything`` → seed

Torch-specific knobs with no TPU meaning (``accelerator: gpu``,
``precision: 16-mixed``, ``num_workers``, W&B logger blocks) are accepted
and mapped to their TPU-native equivalents or ignored, with the mapping
documented inline.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

import yaml

from multimodal_mtrssm_tpu.data.pipeline import DataModuleConfig
from multimodal_mtrssm_tpu.models.mmtrssm import MMTRSSMConfig, MoPoEMMTRSSM
from multimodal_mtrssm_tpu.models.mrssm import MoPoEMRSSM, MRSSMConfig
from multimodal_mtrssm_tpu.nn.conv import DecoderConfig, EncoderConfig
from multimodal_mtrssm_tpu.train.trainer import TrainerConfig


@dataclasses.dataclass
class VizConfig:
    """Viz callback settings (reference ``configs/default.yaml:149-155``)."""

    every_n_epochs: int = 10
    indices: tuple[int, ...] = (0, 1, 2)
    query_length: int = 10
    fps: float = 10.0


@dataclasses.dataclass
class Experiment:
    """A fully instantiated experiment parsed from a YAML config."""

    model: Any  # MoPoEMRSSM | MoPoEMMTRSSM
    trainer: TrainerConfig
    data: DataModuleConfig
    viz: VizConfig
    raw: dict


def _init_args(node: dict | None) -> dict:
    if not node:
        return {}
    return node.get("init_args", node) or {}


def _class_name(node: dict | None) -> str:
    if not node:
        return ""
    return str(node.get("class_path", "")).rsplit(".", 1)[-1]


def _encoder_cfg(node: dict | None) -> EncoderConfig:
    cfg = _init_args(node).get("config", {})
    known = {f.name for f in dataclasses.fields(EncoderConfig)}
    return EncoderConfig.from_dict({k: v for k, v in cfg.items() if k in known})


def _decoder_cfg(node: dict | None, in_features: int) -> DecoderConfig:
    cfg = dict(_init_args(node).get("config", {}))
    cfg["in_features"] = cfg.get("in_features", in_features)
    known = {f.name for f in dataclasses.fields(DecoderConfig)}
    return DecoderConfig.from_dict({k: v for k, v in cfg.items() if k in known})


def _scheduler_spec(node: dict | None) -> dict | None:
    """Map a YAML ``lr_scheduler`` node (torch/Lightning ``class_path``) to a
    :func:`multimodal_mtrssm_tpu.train.optim.make_scheduler` spec.

    ``ReduceLROnPlateau`` (the reference default, ``configs/default.yaml:
    108-114``) returns None — the Trainer builds plateau from the separately
    parsed factor/patience. Unknown scheduler classes warn and fall back to
    plateau rather than silently training with a different schedule name.
    """
    name = _class_name(node)
    if not name:
        return None
    # Exact class-name matching on the final path segment: substring checks
    # would silently misread e.g. CosineAnnealingWarmRestarts as plain
    # cosine or MultiStepLR as StepLR.
    leaf = name.rsplit(".", 1)[-1]
    if leaf == "ReduceLROnPlateau":
        return None
    args = _init_args(node)
    if leaf == "CosineAnnealingLR":
        return {"kind": "cosine", "t_max": int(args.get("T_max", 100)),
                "eta_min": float(args.get("eta_min", 0.0))}
    if leaf == "StepLR":
        return {"kind": "step", "step_size": int(args.get("step_size", 30)),
                "gamma": float(args.get("gamma", 0.1))}
    if leaf == "ExponentialLR":
        return {"kind": "exponential", "gamma": float(args.get("gamma", 0.95))}
    import warnings

    warnings.warn(f"unsupported lr_scheduler class {name!r}; using ReduceLROnPlateau",
                  stacklevel=2)
    return None



def _first_scalar(v):
    """torch ReduceLROnPlateau accepts min_lr as a scalar or per-group list;
    a single param group here, so take the first element of a list."""
    if isinstance(v, (list, tuple)):
        return v[0] if v else 0.0
    return v


def _find_callback(callbacks: list, name: str) -> dict:
    for cb in callbacks or []:
        if _class_name(cb).endswith(name):
            return _init_args(cb)
    return {}


def load_experiment(path: str | Path, overrides: dict | None = None) -> Experiment:
    """Parse a YAML config (ours or the reference LightningCLI schema) into an Experiment."""
    raw = yaml.safe_load(Path(path).read_text())
    if overrides:
        raw = _deep_merge(raw, overrides)
    model_node = raw.get("model", {})
    model_cls = _class_name(model_node)
    margs = _init_args(model_node)

    data_args = _init_args(raw.get("data"))
    # The config value is a flat mapping in the reference YAML but may also
    # appear as a class_path/init_args node; unwrap either.
    dconf = _init_args(data_args.get("config", data_args))
    # TakeFirstN n / GaussianNoise std from the composed input transforms of
    # ALL streams (the reference schema allows per-stream transforms on
    # action/audio/vision alike). Noise is applied on device per stream;
    # TakeFirstN must agree across streams (they share the scan length).
    seq_lens: dict[str, int] = {}
    noise_stds: dict[str, float] = {}
    for stream in ("action", "audio_observation", "vision_observation"):
        node = dconf.get(f"{stream}_input_transform")
        for t in _init_args(node).get("transforms", []):
            name = _class_name(t)
            if name == "TakeFirstN":
                seq_lens[stream] = int(_init_args(t).get("n", 30))
            elif name == "GaussianNoise":
                noise_stds[stream] = float(_init_args(t).get("std", 0.1))  # transform default
    if len(set(seq_lens.values())) > 1:
        raise ValueError(
            f"TakeFirstN lengths disagree across input streams: {seq_lens} — "
            "all streams must share one sequence length"
        )
    seq_len = next(iter(seq_lens.values()), 30)
    stds3 = (
        noise_stds.get("action", 0.0),
        noise_stds.get("audio_observation", 0.0),
        noise_stds.get("vision_observation", 0.0),
    )
    # Scalar when uniform (the common case — keeps configs/ckpt metadata tidy).
    noise_std = stds3[0] if len(set(stds3)) == 1 else stds3

    # Input noise runs on device inside shared_step (TPU-native home of the
    # GaussianNoise transform); the host pipeline then serves clean inputs.
    cls_u = model_cls.upper()
    if "MMTRSSM" in cls_u:
        model = _build_mmtrssm(margs, noise_std)
    elif "WEIGHTED" in cls_u:
        model = _build_weighted_mrssm(margs, noise_std)
    elif "MRSSM" in cls_u or not model_cls:
        model = _build_mrssm(margs, noise_std)
    elif "RSSM" in cls_u:
        # Unimodal models take (action, obs) stds; pick the obs stream.
        obs_std = stds3[2] if dconf.get("modality") == "vision" else stds3[1]
        uni_std = stds3[0] if stds3[0] == obs_std else (stds3[0], obs_std)
        model = _build_unimodal_rssm(margs, uni_std)
    else:
        raise ValueError(f"unknown model class_path: {model_node.get('class_path')}")

    trainer_node = raw.get("trainer", {})
    # Lightning ``trainer.precision: 16-mixed`` (the reference default.yaml
    # trains under AMP) maps to the TPU-native mixed path: conv stacks in
    # bf16, recurrence/ELBO in f32 — the AMP contract (half matmuls/convs,
    # f32 master math), and it keeps the fused training kernels eligible,
    # which full-model bf16 would not.
    precision = str(trainer_node.get("precision", "32")).lower()
    if ("16" in precision and hasattr(model.cfg, "conv_dtype")
            and model.cfg.conv_dtype is None):
        import jax.numpy as jnp

        model = type(model)(dataclasses.replace(model.cfg, conv_dtype=jnp.bfloat16))
    callbacks = trainer_node.get("callbacks", [])
    sched = _init_args(raw.get("lr_scheduler"))
    sched_spec = _scheduler_spec(raw.get("lr_scheduler"))
    early = _find_callback(callbacks, "EarlyStopping")
    viz_args = _find_callback(callbacks, "Output")  # LogMoPoE*Output
    logger_args = _init_args(trainer_node.get("logger"))

    opt_args = _init_args(raw.get("optimizer"))
    betas = opt_args.get("betas", (0.9, 0.999))
    trainer = TrainerConfig(
        max_epochs=int(trainer_node.get("max_epochs", 100)),
        seed=int(raw.get("seed_everything", 42)),
        learning_rate=float(opt_args.get("lr", 1e-3)),
        grad_clip=float(trainer_node.get("gradient_clip_val", 10.0)),
        weight_decay=float(opt_args.get("weight_decay", 0.01)),
        adam_b1=float(betas[0]),
        adam_b2=float(betas[1]),
        adam_eps=float(opt_args.get("eps", 1e-8)),
        plateau_factor=float(sched.get("factor", 0.5)),
        plateau_patience=int(sched.get("patience", 50)),
        plateau_min_lr=float(_first_scalar(sched.get("min_lr", 0.0))),
        plateau_threshold=float(sched.get("threshold", 1e-4)),
        early_stop_patience=int(early.get("patience", 200)),
        early_stop_min_delta=float(early.get("min_delta", 0.0)),
        log_dir=str(raw.get("log_dir", f"runs/{logger_args.get('project', 'default')}")),
        use_wandb=bool(raw.get("use_wandb", False)),
        wandb_project=logger_args.get("project"),
        zero1=bool(trainer_node.get("zero1", False)),
        dcn_size=trainer_node.get("dcn_size"),
        accumulate_grad_batches=int(trainer_node.get("accumulate_grad_batches", 1)),
        steps_per_dispatch=(
            spd if (spd := trainer_node.get("steps_per_dispatch", "auto")) == "auto" else int(spd)
        ),
        lr_scheduler=sched_spec,
    )

    audio_pre = _init_args(dconf.get("audio_observation_preprocess"))
    data = DataModuleConfig(
        action_preprocess=_build_transform(dconf.get("action_preprocess"), "Identity"),
        audio_preprocess=_build_transform(
            dconf.get("audio_observation_preprocess"), "NormalizeAudioMelSpectrogram"
        ),
        vision_preprocess=_build_transform(
            dconf.get("vision_observation_preprocess"), "NormalizeVisionImage"
        ),
        data_dir=dconf.get("data_dir", f"data/{dconf.get('data_name', 'audio_mnist')}"),
        batch_size=int(dconf.get("batch_size", 8)),
        sequence_length=seq_len,
        noise_std=0.0,  # noise applied on device by the model (input_noise_std)
        audio_min=float(audio_pre.get("min_value", -80.0)),
        audio_max=float(audio_pre.get("max_value", 0.0)),
        seed=int(raw.get("seed_everything", 42)),
        drop_modality=dconf.get("drop_modality"),
        modality=dconf.get("modality", "multimodal"),
        device_resident=bool(dconf.get("device_resident", False)),
        device_resident_max_bytes=int(dconf.get("device_resident_max_bytes", 8 << 30)),
    )

    viz = VizConfig(
        every_n_epochs=int(viz_args.get("every_n_epochs", 10)),
        indices=tuple(viz_args.get("indices", (0, 1, 2))),
        query_length=int(viz_args.get("query_length", 10)),
        fps=float(viz_args.get("fps", 10.0)),
    )
    return Experiment(model=model, trainer=trainer, data=data, viz=viz, raw=raw)


def _build_mrssm(margs: dict, noise_std: float = 0.1) -> MoPoEMRSSM:
    rep = _init_args(margs.get("audio_representation"))
    trans = _init_args(margs.get("transition"))
    dist = rep.get("distribution_config", [4, 4])
    deter = int(rep.get("deterministic_size", 32))
    stoch = int(dist[0]) * int(dist[1])
    feature = deter + stoch
    cfg = MRSSMConfig(
        deterministic_size=deter,
        hidden_size=int(rep.get("hidden_size", 32)),
        obs_embed_size=int(rep.get("obs_embed_size", 64)),
        class_size=int(dist[0]),
        category_size=int(dist[1]),
        action_size=int(trans.get("action_size", 6)),
        activation_name=rep.get("activation_name", "ELU"),
        init_proj_cells=int(_init_args(margs.get("init_proj")).get("num_cells", 200)),
        init_proj_activation=_activation_name(
            _init_args(margs.get("init_proj")).get("activation_class"), "Tanh"
        ),
        kl_coeff=float(margs.get("kl_coeff", 1.0)),
        use_kl_balancing=bool(margs.get("use_kl_balancing", True)),
        input_noise_std=noise_std,
        # TPU knobs beyond the reference schema: fused training kernel
        # dispatch ("auto" default; False forces the XLA scan) and the
        # space-to-depth conv layout ("auto" default = s2d exactly at the
        # measured-profitable narrow widths; "nhwc"/"s2d" force a layout,
        # nn/conv.py).
        use_pallas_train=margs.get("use_pallas_train", "auto"),
        conv_layout=margs.get("conv_layout", "auto"),
        audio_encoder=_encoder_cfg(margs.get("audio_encoder")),
        vision_encoder=_encoder_cfg(margs.get("vision_encoder")),
        audio_decoder=_decoder_cfg(margs.get("audio_decoder"), feature),
        vision_decoder=_decoder_cfg(margs.get("vision_decoder"), feature),
    )
    return MoPoEMRSSM(cfg)


def _build_weighted_mrssm(margs: dict, noise_std: float = 0.1):
    from multimodal_mtrssm_tpu.models.weighted_mopoe import (
        WeightedMoPoEMRSSM,
        WeightedMRSSMConfig,
    )

    base = _build_mrssm(margs, noise_std).cfg
    cfg = WeightedMRSSMConfig(
        **dataclasses.asdict(base) | {
            "audio_encoder": base.audio_encoder,
            "vision_encoder": base.vision_encoder,
            "audio_decoder": base.audio_decoder,
            "vision_decoder": base.vision_decoder,
            "compute_dtype": base.compute_dtype,
        },
        weight_head_cells=int(_init_args(margs.get("moe_weight_head")).get("num_cells", 32)),
    )
    return WeightedMoPoEMRSSM(cfg)


def _build_unimodal_rssm(margs: dict, noise_std: float = 0.1):
    from multimodal_mtrssm_tpu.models.rssm import RSSM, RSSMConfig

    rep = _init_args(margs.get("representation") or margs.get("audio_representation"))
    trans = _init_args(margs.get("transition"))
    dist = rep.get("distribution_config", [4, 4])
    deter = int(rep.get("deterministic_size", 32))
    feature = deter + int(dist[0]) * int(dist[1])
    cfg = RSSMConfig(
        deterministic_size=deter,
        hidden_size=int(rep.get("hidden_size", 32)),
        obs_embed_size=int(rep.get("obs_embed_size", 64)),
        class_size=int(dist[0]),
        category_size=int(dist[1]),
        action_size=int(trans.get("action_size", 6)),
        activation_name=rep.get("activation_name", "ELU"),
        init_proj_cells=int(_init_args(margs.get("init_proj")).get("num_cells", 200)),
        kl_coeff=float(margs.get("kl_coeff", 1.0)),
        use_kl_balancing=bool(margs.get("use_kl_balancing", True)),
        input_noise_std=noise_std,
        encoder=_encoder_cfg(margs.get("encoder") or margs.get("audio_encoder")),
        decoder=_decoder_cfg(margs.get("decoder") or margs.get("audio_decoder"), feature),
    )
    return RSSM(cfg)


def _build_mmtrssm(margs: dict, noise_std: float = 0.1) -> MoPoEMMTRSSM:
    rep = _init_args(margs.get("audio_representation"))
    l_dist = _init_args(margs.get("l_dist"))
    h_dist = _init_args(margs.get("h_dist"))
    hd = int(margs.get("hd_dim", 32))
    ld = int(margs.get("ld_dim", 32))
    hs = int(margs.get("hs_dim", 16))
    ls = int(margs.get("ls_dim", 16))
    feature = hd + hs + ld + ls
    cfg = MMTRSSMConfig(
        action_size=int(margs.get("action_size", 6)),
        obs_embed_size=int(rep.get("obs_embed_size", 64)),
        hd_dim=hd,
        hs_class=int(h_dist.get("class_size", 2)),
        hs_category=int(h_dist.get("category_size", 8)),
        ld_dim=ld,
        ls_class=int(l_dist.get("class_size", 4)),
        ls_category=int(l_dist.get("category_size", 4)),
        l_tau=float(margs.get("l_tau", 2.0)),
        h_tau=float(margs.get("h_tau", 4.0)),
        prior_cells=int(_init_args(margs.get("l_prior")).get("num_cells", 32)),
        rep_hidden_size=int(rep.get("hidden_size", 32)),
        activation_name=rep.get("activation_name", "ELU"),
        init_proj_cells=int(_init_args(margs.get("init_proj")).get("num_cells", 200)),
        init_proj_activation=_activation_name(
            _init_args(margs.get("init_proj")).get("activation_class"), "Tanh"
        ),
        kl_coeff=float(margs.get("kl_coeff", 1.0)),
        use_kl_balancing=bool(margs.get("use_kl_balancing", True)),
        input_noise_std=noise_std,
        w_kl_h=float(margs.get("w_kl_h", 1.0)),
        # Same TPU knobs as the MRSSM family (fused hierarchical kernel,
        # width-resolved s2d conv layout).
        use_pallas_train=margs.get("use_pallas_train", "auto"),
        conv_layout=margs.get("conv_layout", "auto"),
        audio_encoder=_encoder_cfg(margs.get("audio_encoder")),
        vision_encoder=_encoder_cfg(margs.get("vision_encoder")),
        audio_decoder=_decoder_cfg(margs.get("audio_decoder"), feature),
        vision_decoder=_decoder_cfg(margs.get("vision_decoder"), feature),
    )
    # Sanity: the declared stoch dims must match the dist factories
    # (reference configs keep these in sync by hand).
    if cfg.hs_dim != int(margs.get("hs_dim", cfg.hs_dim)):
        raise ValueError(f"hs_dim {margs.get('hs_dim')} != h_dist {cfg.hs_dim}")
    if cfg.ls_dim != int(margs.get("ls_dim", cfg.ls_dim)):
        raise ValueError(f"ls_dim {margs.get('ls_dim')} != l_dist {cfg.ls_dim}")
    return MoPoEMMTRSSM(cfg)


def _build_transform(node: dict | None, default_cls: str | None = None):
    """Instantiate a preprocess transform from a YAML ``class_path`` node
    (reference schema: ``torch.nn.Identity``, the ``multimodal_rssm``
    transforms, or a torchvision ``Compose``). Returns None for absent nodes
    (the pipeline then applies its defaults); a node without ``class_path``
    uses ``default_cls`` (our shipped configs omit it for the standard
    normalizers)."""
    if not node:
        return None
    from multimodal_mtrssm_tpu.data.transforms import TRANSFORMS, Compose

    name = _class_name(node) or default_cls
    args = {k: v for k, v in (node.get("init_args") or {}).items()}
    if name == "Compose":
        return Compose([_build_transform(t) for t in args.get("transforms", [])])
    cls = TRANSFORMS.get(name)
    if cls is None:
        raise ValueError(f"unknown transform class_path: {node.get('class_path')}")
    return cls(**{k: v for k, v in args.items()})


def _activation_name(value, default: str) -> str:
    """'torch.nn.ELU' / 'ELU' → 'ELU'; None → default."""
    if not value:
        return default
    return str(value).rsplit(".", 1)[-1]


def _deep_merge(base: dict, over: dict) -> dict:
    out = dict(base)
    for k, v in over.items():
        out[k] = _deep_merge(out[k], v) if isinstance(v, dict) and isinstance(out.get(k), dict) else v
    return out
