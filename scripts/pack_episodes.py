"""Consolidate an episode store into a memory-mapped pack.

Usage: python scripts/pack_episodes.py --episodes data/audio_mnist [--out data/audio_mnist/pack]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from multimodal_mtrssm_tpu.data.pack import pack_episodes  # noqa: E402

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=Path, required=True)
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args()
    out = args.out or (args.episodes / "pack")
    meta = pack_episodes(args.episodes, out)
    print(f"packed {meta['n_episodes']} episodes into {out}: "
          + ", ".join(f"{k}{tuple(v)}" for k, v in meta["shapes"].items()))
