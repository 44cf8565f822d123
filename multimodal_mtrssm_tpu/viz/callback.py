"""Trainer viz callbacks (reference ``LogMoPoEMRSSMOutput`` /
``LogMoPoEMMTRSSMOutput``, reference ``mopoe_mrssm/callback.py:12-37`` and
``mopoe_mmtrssm/callback.py:12-133``): every N epochs (skipping epoch 0,
reference ``callback.py:178-192``) render rollout GIFs for BOTH stages —
episodes are collected across each stage's dataloader (reference collects
≤60, ``callback.py:156-176``) and ≤7 per stage are rendered (reference
``callback.py:188-190``), here as one device-side batched rollout per stage.
At the final epoch, repeat with the best checkpoint (reference
``callback.py:194-210``)."""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np

# Reference caps (reference callback.py:14 and :188-190).
MAX_EPISODES = 60
EPISODES_PER_STAGE = 7


class LogRSSMOutput:
    """Every-N-epochs rollout-GIF callback (reference callback.py:126-210)."""

    def __init__(self, every_n_epochs: int = 10, indices=(0, 1, 2), query_length: int = 10,
                 fps: float = 10.0, episodes_per_stage: int = EPISODES_PER_STAGE):
        self.every_n_epochs = every_n_epochs
        # Accepted for YAML-surface parity and intentionally unused: the
        # reference stores `indices` (callback.py:139) but its render loops
        # use `all_episodes[:7]`, never consulting it (callback.py:188-190,
        # 205-210) — a dead parameter there, replicated as dead here.
        self.indices = tuple(indices)
        self.query_length = query_length
        self.fps = fps
        self.episodes_per_stage = min(episodes_per_stage, MAX_EPISODES)

    def __call__(self, trainer, epoch: int, params, row: dict) -> None:
        if epoch == 0 or epoch % self.every_n_epochs != 0:
            return
        self._render(trainer, params, f"epoch_{epoch:04d}", epoch)

    def on_train_end(self, trainer: Any, best_params: Any) -> None:
        """Final render with the best checkpoint, also after early stopping
        (reference ``callback.py:194-210``)."""
        self._render(trainer, best_params, "final_best", seed=0)

    def _collect_stage_batch(self, trainer, stage: str):
        """First ≤7 episodes of a stage's loader, stacked into one batch
        (reference iterates the dataloader up to 60 episodes then renders
        the first 7, ``callback.py:156-176,188-190``; collecting beyond
        what is rendered would be dead work here)."""
        # epoch=0 → deterministic (unshuffled-seed) episode order for viz.
        # Host batches: frame assembly is host-side, so staging them on
        # device here would just round-trip host→device→host.
        batches = trainer.dm.host_batches(stage)
        parts: list[tuple] = []
        have = 0
        for batch in batches:
            if len(batch) != 6:
                return None  # GIF grid is for multimodal batches
            parts.append(batch)
            have += batch[0].shape[0]
            if have >= self.episodes_per_stage:
                break
        if not parts:
            return None
        n = min(have, self.episodes_per_stage)
        return tuple(
            np.concatenate([np.asarray(p[i]) for p in parts], axis=0)[:n]
            for i in range(6)
        )

    def _render(self, trainer, params, name: str, seed: int) -> None:
        from multimodal_mtrssm_tpu.viz.rollout import log_rollout_gifs

        for stage in ("train", "val"):
            batch = self._collect_stage_batch(trainer, stage)
            if batch is None:
                continue
            out_dir = Path(trainer.cfg.log_dir) / "viz" / name / stage
            q = min(self.query_length, batch[0].shape[1] - 1)
            paths = log_rollout_gifs(
                trainer.model, params, batch, out_dir, q, self.fps,
                jax.random.PRNGKey(seed), range(batch[0].shape[0]),
            )
            # Mirror to W&B when enabled (reference logs videos per
            # stage/episode, callback.py:426-502).
            logger = getattr(trainer, "logger", None)
            if logger is not None:
                for i, p in enumerate(paths):
                    logger.log_video(f"{stage}/rollout_{name}_ep{i}", p, self.fps)


# Reference-named aliases (class_path targets in YAML configs).
LogMoPoEMRSSMOutput = LogRSSMOutput
LogMoPoEMMTRSSMOutput = LogRSSMOutput


def make_viz_callback(exp: Any) -> LogRSSMOutput:
    """Build the viz callback from an ``Experiment``'s ``VizConfig``."""
    v = exp.viz
    return LogRSSMOutput(v.every_n_epochs, v.indices, v.query_length, v.fps)
