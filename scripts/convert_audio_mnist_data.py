"""Convert audio-mnist-generator ``.npz`` files into the episode store.

Replaces reference ``scripts/convert_audio_mnist_data.py:28-94``: each input
``.npz`` holds ``audio`` (180, 32, 32), ``image`` (180, 1, 32, 32),
``speaker`` (180, 6); train files are converted first, then test files with
continued numbering.

Usage:
    python scripts/convert_audio_mnist_data.py --train-dir ... --test-dir ... --out data/audio_mnist
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from multimodal_mtrssm_tpu.data import convert_audio_mnist_npz  # noqa: E402

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-dir", type=Path, required=True)
    ap.add_argument("--test-dir", type=Path, default=None)
    ap.add_argument("--out", type=Path, required=True)
    args = ap.parse_args()

    n = convert_audio_mnist_npz(sorted(args.train_dir.glob("*.npz")), args.out, start_index=0)
    print(f"converted {n} train episodes")
    if args.test_dir is not None:
        total = convert_audio_mnist_npz(sorted(args.test_dir.glob("*.npz")), args.out, start_index=n)
        print(f"converted {total - n} test episodes (indices {n}..{total - 1})")
