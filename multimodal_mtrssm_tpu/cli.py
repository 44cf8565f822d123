"""Console entry points (reference ``pyproject.toml:100-104`` poe tasks:
``train-mopoe-mrssm`` / ``train-mopoe-mmtrssm``).

Everything resolves inside the installed package (``train.entry``,
``evaluation.cli``, packaged ``configs/``) — no repo checkout required.
"""

from __future__ import annotations

from multimodal_mtrssm_tpu.train.entry import default_config_path, run_training


def train_mopoe_mrssm() -> None:
    """`train-mopoe-mrssm` console entry (reference pyproject.toml:100-101)."""
    run_training(str(default_config_path("mopoe_mrssm.yaml")))


def train_mopoe_mmtrssm() -> None:
    """`train-mopoe-mmtrssm` console entry (reference pyproject.toml:102-103)."""
    run_training(str(default_config_path("mopoe_mmtrssm.yaml")))


def evaluate_word_transitions() -> None:
    """`evaluate-word-transitions` console entry (packaged eval CLI)."""
    from multimodal_mtrssm_tpu.evaluation.cli import main

    main()
