"""Optimizer + LR scheduling + early stopping as explicit functional state.

Replaces the reference's Lightning-managed pieces (reference
``mopoe_mrssm/configs/default.yaml:103-148``): AdamW(lr=1e-3), global-norm
grad clip 10, ``ReduceLROnPlateau(monitor=val/loss, factor=0.5,
patience=50)``, ``EarlyStopping(val/loss, patience=200)``, best-k
checkpoint selection. Schedulers are pure pytree states updated on host
between epochs, injected into the jitted step as a scalar LR multiplier —
no recompilation when the LR changes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax


def make_optimizer(learning_rate: float = 1e-3, grad_clip: float = 10.0, weight_decay: float = 0.01):
    """AdamW with global-norm clipping; LR is ``base_lr * scale`` where
    ``scale`` is an injectable runtime scalar (plateau scheduler output)."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.inject_hyperparams(optax.adamw)(learning_rate=learning_rate, weight_decay=weight_decay),
    )


def set_learning_rate(opt_state, learning_rate: float):
    """Update the injected LR inside an optax state (host-side, no recompile)."""
    inner = opt_state[1]  # inject_hyperparams wraps the adamw state
    inner.hyperparams["learning_rate"] = jnp.asarray(learning_rate, dtype=jnp.float32)
    return opt_state


@dataclasses.dataclass
class PlateauScheduler:
    """ReduceLROnPlateau on a monitored value (min mode), reference
    ``configs/default.yaml:108-114``."""

    base_lr: float
    factor: float = 0.5
    patience: int = 50
    min_lr: float = 0.0
    best: float = float("inf")
    bad_epochs: int = 0
    lr: float | None = None

    def __post_init__(self):
        if self.lr is None:
            self.lr = self.base_lr

    def step(self, value: float) -> float:
        """Feed one epoch's monitored value; returns the (possibly reduced) LR."""
        if value < self.best:
            self.best = value
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.bad_epochs = 0
        return self.lr

    def state_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_state_dict(cls, d: dict) -> "PlateauScheduler":
        return cls(**d)


@dataclasses.dataclass
class EarlyStopping:
    """EarlyStopping on a monitored value (min mode), reference
    ``configs/default.yaml:137-142``."""

    patience: int = 200
    min_delta: float = 0.0
    best: float = float("inf")
    bad_epochs: int = 0
    should_stop: bool = False

    def step(self, value: float) -> bool:
        if value < self.best - self.min_delta:
            self.best = value
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.should_stop = True
        return self.should_stop

    def state_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_state_dict(cls, d: dict) -> "EarlyStopping":
        return cls(**d)


def global_norm(tree) -> jax.Array:
    return optax.global_norm(tree)
