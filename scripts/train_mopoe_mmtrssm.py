"""Train MoPoE-MMTRSSM (reference entry point ``train-mopoe-mmtrssm``,
``scripts/train_mopoe_mmtrssm.py:12-14``)."""

from pathlib import Path

from _train_common import run_training

if __name__ == "__main__":
    run_training(str(Path(__file__).resolve().parent.parent / "configs" / "mopoe_mmtrssm.yaml"))
