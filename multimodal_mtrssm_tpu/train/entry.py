"""Training CLI harness (packaged, so console entry points work from an
installed distribution, not just a repo checkout).

Replaces the reference's ``scripts/_train_common.py:9-33`` (LightningCLI argv
surgery): a plain argparse front-end over ``train.config.load_experiment`` +
``Trainer.fit``. The default config is used unless ``-c/--config`` is passed,
matching the reference's override behavior (reference ``README.md:55-58``).
"""

from __future__ import annotations

import argparse
from pathlib import Path


def default_config_path(name: str) -> Path:
    """Path of a packaged default config (``multimodal_mtrssm_tpu/configs``).

    The repo root's ``configs/`` directory symlinks to these, so both the
    checkout and an installed distribution resolve the same files.
    """
    return Path(__file__).resolve().parent.parent / "configs" / name


def run_training(default_config: str) -> None:
    """Train from ``default_config`` (or ``-c`` override): argparse → Trainer.fit."""
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", default=default_config, help="experiment YAML")
    parser.add_argument("--max-epochs", type=int, default=None)
    parser.add_argument("--data-dir", default=None)
    parser.add_argument("--log-dir", default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--synthetic", type=int, metavar="N", default=None,
                        help="generate N synthetic episodes into --data-dir first")
    args = parser.parse_args()

    from multimodal_mtrssm_tpu.data import EpisodeDataModule, generate_synthetic_audio_mnist
    from multimodal_mtrssm_tpu.train.config import load_experiment
    from multimodal_mtrssm_tpu.train.trainer import Trainer
    from multimodal_mtrssm_tpu.viz.callback import make_viz_callback

    exp = load_experiment(args.config)
    if args.max_epochs is not None:
        exp.trainer.max_epochs = args.max_epochs
    if args.data_dir is not None:
        exp.data.data_dir = args.data_dir
    if args.log_dir is not None:
        exp.trainer.log_dir = args.log_dir

    if args.synthetic:
        generate_synthetic_audio_mnist(exp.data.data_dir, n_episodes=args.synthetic)

    dm = EpisodeDataModule(exp.data)
    callbacks = [make_viz_callback(exp)]
    trainer = Trainer(exp.model, dm, exp.trainer, callbacks=callbacks)
    out = trainer.fit(resume=args.resume)
    print(f"done: best val/loss = {out['best_val']:.4f} over {len(out['history'])} epochs "
          f"(log_dir={exp.trainer.log_dir})")
