"""Import a reference (torch/Lightning) checkpoint into this framework.

Supports both reference model families: MoPoE-MRSSM and MoPoE-MMTRSSM (the
family is inferred from the config's model class, or forced with
``--model-type``).

Usage:
    python scripts/import_torch_checkpoint.py \
        --config configs/mopoe_mrssm.yaml \
        --ckpt path/to/reference.ckpt \
        --out runs/imported/checkpoints

Named networks (transition/GRU/representations/init_proj) import exactly;
encoder/decoder tensors (from the pinned nomutin/CNN package whose source
is not available) import by shape matching — review the printed report and
fine-tune if anything was left unmatched.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True, help="checkpoint dir to write 'best' into")
    ap.add_argument("--model-type", choices=("auto", "mrssm", "mmtrssm"), default="auto")
    args = ap.parse_args()

    import jax

    from multimodal_mtrssm_tpu.models import MoPoEMMTRSSM
    from multimodal_mtrssm_tpu.train.checkpoint import CheckpointManager
    from multimodal_mtrssm_tpu.train.config import load_experiment
    from multimodal_mtrssm_tpu.train.torch_import import load_reference_checkpoint

    exp = load_experiment(args.config)
    model_type = args.model_type
    if model_type == "auto":
        model_type = "mmtrssm" if isinstance(exp.model, MoPoEMMTRSSM) else "mrssm"
    template = exp.model.init(jax.random.PRNGKey(0))
    params, report = load_reference_checkpoint(template, args.ckpt, model_type=model_type)
    print(f"model type: {model_type}; imported {report['imported']} tensors")
    for k in ("missing", "unmatched", "ambiguous", "skipped"):
        if report.get(k):
            print(f"{k} ({len(report[k])}):")
            for name in report[k]:
                print(f"  - {name}")
    CheckpointManager(args.out).save("best", {"params": params}, {"source": args.ckpt, **{
        k: report[k] for k in ("missing", "unmatched", "ambiguous") if k in report
    }})
    print(f"wrote 'best' checkpoint under {args.out}")


if __name__ == "__main__":
    main()
