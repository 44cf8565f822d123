"""Shared CLI harness for the repo-checkout training entry points.

The implementation lives in the package (``multimodal_mtrssm_tpu.train.entry``)
so the installed console scripts work outside a checkout; this module keeps
the reference's ``scripts/_train_common.py`` name for the wrapper scripts.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from multimodal_mtrssm_tpu.train.entry import run_training  # noqa: E402

__all__ = ["run_training"]
