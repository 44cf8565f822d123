"""Rollout visualization: GIF grids + trainer callbacks."""

from multimodal_mtrssm_tpu.viz.callback import (
    LogMoPoEMMTRSSMOutput,
    LogMoPoEMRSSMOutput,
    LogRSSMOutput,
    make_viz_callback,
)
from multimodal_mtrssm_tpu.viz.charts import load_metrics, render_combined_charts
from multimodal_mtrssm_tpu.viz.rollout import (
    compute_reconstructions,
    log_rollout_gifs,
    render_episode_gif,
)

__all__ = [
    "LogMoPoEMMTRSSMOutput",
    "LogMoPoEMRSSMOutput",
    "LogRSSMOutput",
    "compute_reconstructions",
    "load_metrics",
    "log_rollout_gifs",
    "render_combined_charts",
    "make_viz_callback",
    "render_episode_gif",
]
