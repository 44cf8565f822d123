"""Evaluate word-transition Matching Rate of a trained model.

Thin repo-checkout wrapper over the packaged CLI
(``multimodal_mtrssm_tpu.evaluation.cli`` — also installed as the
``evaluate-word-transitions`` console script).

Usage:
    python scripts/evaluate_word_transitions.py \
        --config configs/mopoe_mrssm.yaml \
        --checkpoint runs/mopoe_mrssm/checkpoints \
        --test-data data/audio_mnist_test_labeled \
        [--classifier ckpts/mnist_classifier.npz] [--mnist-root ...] \
        [--out evaluation_results]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from multimodal_mtrssm_tpu.evaluation.cli import main  # noqa: E402

if __name__ == "__main__":
    main()
