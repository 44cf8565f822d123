"""Checkpointing: params + optimizer state + harness counters via Orbax.

Replaces Lightning's ``ModelCheckpoint(monitor=val/loss, mode=min,
save_top_k=1)`` + ``fit(ckpt_path=…)`` resume (reference
``configs/default.yaml:144-148``; SURVEY §5.4). We persist the full
training state — params, optax state, epoch, RNG key, plateau-scheduler and
early-stopping counters — so resume is exact, and keep a separate
``best`` checkpoint selected on ``val/loss``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Orbax-backed checkpoint store: full train state, params-only, and mid-epoch aux."""

    def __init__(self, directory: str | Path):
        self.dir = Path(directory).resolve()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._ckpt = ocp.PyTreeCheckpointer()

    # ---- full training state -------------------------------------------------
    def save(self, name: str, state: dict[str, Any], aux: dict[str, Any] | None = None) -> Path:
        """Save a device pytree under ``name`` plus a JSON sidecar of host
        counters (epoch, scheduler/early-stop dicts, best metric)."""
        path = self.dir / name
        self._ckpt.save(path, jax.device_get(state), force=True)
        if aux is not None:
            (self.dir / f"{name}.json").write_text(json.dumps(aux, default=_jsonify))
        return path

    def restore(self, name: str, template: dict[str, Any] | None = None) -> tuple[dict, dict]:
        path = self.dir / name
        state = self._ckpt.restore(path, item=jax.device_get(template) if template is not None else None)
        aux_path = self.dir / f"{name}.json"
        aux = json.loads(aux_path.read_text()) if aux_path.exists() else {}
        return state, aux

    def restore_params(self, name: str, template: dict[str, Any]) -> tuple[dict, dict]:
        """Restore only the ``params`` subtree of checkpoint ``name``.

        Works for params-only checkpoints (``best``) AND full training-state
        checkpoints (``last``/``diverged``): Orbax rejects a params-only
        template against an on-disk tree that also holds ``opt_state``
        (structure mismatch), so on that failure the raw tree is restored
        and its ``params`` subtree extracted and validated against the
        model's template.
        """
        try:
            state, aux = self.restore(name, {"params": template})
            return state["params"], aux
        except ValueError:
            state, aux = self.restore(name)
        if not isinstance(state, dict) or "params" not in state:
            raise ValueError(
                f"checkpoint {self.dir / name} has no 'params' subtree "
                f"(keys: {sorted(state) if isinstance(state, dict) else type(state)})"
            )
        params = state["params"]
        want = jax.tree.structure(jax.device_get(template))
        got = jax.tree.structure(params)
        if got != want:
            raise ValueError(
                f"checkpoint {self.dir / name} 'params' tree does not match "
                f"the model: checkpoint {got} vs model {want}"
            )
        return params, aux

    def exists(self, name: str) -> bool:
        return (self.dir / name).exists()


def _jsonify(o):
    if isinstance(o, (np.floating, np.integer)):
        return o.item()
    raise TypeError(f"not JSON-serializable: {type(o)}")
