"""Training harness: optimizer, schedulers, checkpointing, trainer loop."""

from multimodal_mtrssm_tpu.train.checkpoint import CheckpointManager
from multimodal_mtrssm_tpu.train.metrics import MetricLogger
from multimodal_mtrssm_tpu.train.optim import (
    EarlyStopping,
    PlateauScheduler,
    make_optimizer,
    set_learning_rate,
)
from multimodal_mtrssm_tpu.train.trainer import Trainer, TrainerConfig

__all__ = [
    "CheckpointManager",
    "EarlyStopping",
    "MetricLogger",
    "PlateauScheduler",
    "Trainer",
    "TrainerConfig",
    "make_optimizer",
    "set_learning_rate",
]
