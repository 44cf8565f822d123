"""End-to-end trainer throughput: the full host pipeline, not just the kernel.

``bench.py`` measures the device fast path on pre-staged batches; this
benchmark runs the REAL ``Trainer.fit`` loop — synthetic episodes on disk,
host gather/normalize/noise (native fastbatch), [K,B,...] chunk stacking,
host→device transfer over the tunnel, the K-step scan, and the val epoch —
and reports the trainer's own fenced ``seq_per_sec`` so the gap between
"device capability" (bench.py) and "what an epoch actually sustains"
is a measured number, not an assumption.

Episode count is sized so the train split is an exact multiple of
batch_size×K (default 2560 → train 2048 = 8×256): one full-size scan chunk
per epoch, no ragged tail, i.e. the same program bench.py times.

Run (TPU): python benchmarks/bench_e2e_train.py [--epochs 5 --episodes 2560]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax.numpy as jnp  # noqa: E402

from multimodal_mtrssm_tpu.data import (  # noqa: E402
    DataModuleConfig,
    EpisodeDataModule,
    generate_synthetic_audio_mnist,
)
from multimodal_mtrssm_tpu.models import (  # noqa: E402
    MMTRSSMConfig,
    MoPoEMMTRSSM,
    MoPoEMRSSM,
    MRSSMConfig,
)
from multimodal_mtrssm_tpu.train import Trainer, TrainerConfig  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=2560)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--seq-len", type=int, default=30)
    ap.add_argument("--conv-dtype", choices=("float32", "bfloat16"),
                    default="bfloat16", help="bfloat16 = the bench.py headline config")
    ap.add_argument("--model", choices=("mrssm", "mmtrssm"), default="mrssm")
    ap.add_argument("--device-resident", action="store_true",
                    help="hold the dataset in HBM and assemble chunks on "
                         "device (DataModuleConfig.device_resident)")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()
    from multimodal_mtrssm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    wd = Path(args.workdir) if args.workdir else Path(tempfile.mkdtemp(prefix="bench_e2e_"))
    data_dir = wd / "data"
    marker = wd / "dataset.json"
    spec = {"episodes": args.episodes, "seq_len": args.seq_len}
    if not data_dir.exists():
        print(f"# generating {args.episodes} episodes of T={args.seq_len} under {data_dir}",
              flush=True)
        generate_synthetic_audio_mnist(data_dir, n_episodes=args.episodes,
                                       episode_length=args.seq_len)
        marker.write_text(json.dumps(spec))
    elif not marker.exists() or json.loads(marker.read_text()) != spec:
        raise SystemExit(
            f"{data_dir} holds a different dataset than requested "
            f"({marker.read_text() if marker.exists() else 'no marker'} vs {spec}); "
            "pick a fresh --workdir or delete it")
    dm = EpisodeDataModule(DataModuleConfig(
        data_dir=data_dir, batch_size=args.batch_size, sequence_length=args.seq_len,
        device_resident=args.device_resident))
    conv_dtype = jnp.bfloat16 if args.conv_dtype == "bfloat16" else None
    model = (MoPoEMRSSM(MRSSMConfig(conv_dtype=conv_dtype))
             if args.model == "mrssm"
             else MoPoEMMTRSSM(MMTRSSMConfig(conv_dtype=conv_dtype)))
    tr = Trainer(model, dm, TrainerConfig(
        max_epochs=args.epochs, log_dir=str(wd / "run"),
        checkpoint_every_n_epochs=10_000))
    dm.setup()
    spd = tr._resolve_spd()
    print(f"# auto steps_per_dispatch={spd}, train episodes={dm.n_train}", flush=True)
    out = tr.fit()
    rates = [row["seq_per_sec"] for row in out["history"]]
    for i, r in enumerate(rates):
        print(f"# epoch {i}: {r:,.0f} seq/s (epoch 0 includes compile)", flush=True)
    steady = max(rates[1:]) if len(rates) > 1 else rates[0]
    print(json.dumps({
        "metric": "e2e_train_seq_per_s", "value": round(steady, 1),
        "unit": "seq/s", "model": args.model,
        "spd": spd, "conv_dtype": args.conv_dtype,
        "device_resident": args.device_resident,
        "B": args.batch_size, "T": args.seq_len,
        "epoch_rates": [round(r, 1) for r in rates],
    }))


if __name__ == "__main__":
    main()
