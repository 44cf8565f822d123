"""Console entry points (reference ``pyproject.toml:100-104`` poe tasks:
``train-mopoe-mrssm`` / ``train-mopoe-mmtrssm``)."""

from __future__ import annotations

import sys
from pathlib import Path

_CONFIGS = Path(__file__).resolve().parent.parent / "configs"


def _run(default_config: str) -> None:
    scripts = Path(__file__).resolve().parent.parent / "scripts"
    sys.path.insert(0, str(scripts))
    from _train_common import run_training  # noqa: PLC0415

    run_training(default_config)


def train_mopoe_mrssm() -> None:
    """`train-mopoe-mrssm` console entry (reference pyproject.toml:100-101)."""
    _run(str(_CONFIGS / "mopoe_mrssm.yaml"))


def train_mopoe_mmtrssm() -> None:
    """`train-mopoe-mmtrssm` console entry (reference pyproject.toml:102-103)."""
    _run(str(_CONFIGS / "mopoe_mmtrssm.yaml"))


def evaluate_word_transitions() -> None:
    """`evaluate-word-transitions` console entry wrapping scripts/evaluate_word_transitions.py."""
    scripts = Path(__file__).resolve().parent.parent / "scripts"
    sys.path.insert(0, str(scripts))
    import evaluate_word_transitions as ev  # noqa: PLC0415

    ev.main()
