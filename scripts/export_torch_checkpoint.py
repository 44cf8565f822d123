"""Export a trained checkpoint from this framework as a reference-shaped
torch/Lightning ``.ckpt`` (inverse of ``scripts/import_torch_checkpoint.py``).

Usage:
    python scripts/export_torch_checkpoint.py --checkpoint runs/x/checkpoints/best \
        --config configs/mopoe_mrssm.yaml --out exported.ckpt
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from multimodal_mtrssm_tpu.train.checkpoint import CheckpointManager  # noqa: E402
from multimodal_mtrssm_tpu.train.config import load_experiment  # noqa: E402
from multimodal_mtrssm_tpu.train.torch_export import save_lightning_checkpoint  # noqa: E402

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="checkpoint name dir (e.g. runs/x/checkpoints/best)")
    ap.add_argument("--config", required=True, help="experiment YAML")
    ap.add_argument("--out", required=True, help="output .ckpt path")
    args = ap.parse_args()

    import jax

    exp = load_experiment(args.config)
    template = exp.model.init(jax.random.PRNGKey(0))
    ckpt_dir = Path(args.checkpoint)
    mgr = CheckpointManager(ckpt_dir.parent)
    # restore_params also serves full training-state checkpoints ('last').
    params, _ = mgr.restore_params(ckpt_dir.name, template)
    model_type = "mmtrssm" if "MMTRSSM" in type(exp.model).__name__.upper() else "mrssm"
    manifest = save_lightning_checkpoint(params, args.out, model_type)
    print(f"exported {manifest['keys']} tensors ({manifest['n_params']:,} params, "
          f"{model_type}) -> {args.out}")
