"""Stand a trained world model behind the HTTP inference server.

Thin wrapper over :func:`multimodal_mtrssm_tpu.server.main` (the logic lives
in the package so ``python -m multimodal_mtrssm_tpu serve`` works from an
installed distribution too).

Usage:
    python scripts/serve.py --config configs/mopoe_mrssm.yaml \
        --checkpoint runs/x/checkpoints [--host 0.0.0.0] [--port 8000]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from multimodal_mtrssm_tpu.server import main  # noqa: E402

if __name__ == "__main__":
    main()
