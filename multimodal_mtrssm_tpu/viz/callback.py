"""Trainer viz callbacks (reference ``LogMoPoEMRSSMOutput`` /
``LogMoPoEMMTRSSMOutput``, reference ``mopoe_mrssm/callback.py:12-37`` and
``mopoe_mmtrssm/callback.py:12-133``): every N epochs (skipping epoch 0,
reference ``callback.py:178-192``) render rollout GIFs from the first
validation batch; at the final epoch, repeat with the best checkpoint
(reference ``callback.py:194-210``)."""

from __future__ import annotations

from pathlib import Path

import jax


class LogRSSMOutput:
    def __init__(self, every_n_epochs: int = 10, indices=(0, 1, 2), query_length: int = 10,
                 fps: float = 10.0):
        self.every_n_epochs = every_n_epochs
        self.indices = tuple(indices)
        self.query_length = query_length
        self.fps = fps

    def __call__(self, trainer, epoch: int, params, row: dict) -> None:
        if epoch == 0 or epoch % self.every_n_epochs != 0:
            return
        self._render(trainer, params, f"epoch_{epoch:04d}", epoch)

    def on_train_end(self, trainer, best_params) -> None:
        """Final render with the best checkpoint, also after early stopping
        (reference ``callback.py:194-210``)."""
        self._render(trainer, best_params, "final_best", seed=0)

    def _render(self, trainer, params, name: str, seed: int) -> None:
        from multimodal_mtrssm_tpu.viz.rollout import log_rollout_gifs

        batch = next(iter(trainer.dm.val_batches()), None)
        if batch is None or len(batch) != 6:
            return  # GIF grid is for multimodal batches
        out_dir = Path(trainer.cfg.log_dir) / "viz" / name
        q = min(self.query_length, batch[0].shape[1] - 1)
        log_rollout_gifs(
            trainer.model, params, batch, out_dir, q, self.fps,
            jax.random.PRNGKey(seed), self.indices,
        )


# Reference-named aliases (class_path targets in YAML configs).
LogMoPoEMRSSMOutput = LogRSSMOutput
LogMoPoEMMTRSSMOutput = LogRSSMOutput


def make_viz_callback(exp) -> LogRSSMOutput:
    """Build the viz callback from an ``Experiment``'s ``VizConfig``."""
    v = exp.viz
    return LogRSSMOutput(v.every_n_epochs, v.indices, v.query_length, v.fps)
