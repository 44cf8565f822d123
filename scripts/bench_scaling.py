"""Batch-DP scaling curve: train-step seq/s vs device count over the ``data`` mesh.

Produces the ICI-scaling artifact from BASELINE.md ("linear scaling of
batch-parallel training over ICI"). On real multi-chip hardware this
measures true scaling; in this image (one chip) it validates the sharded
step end-to-end on the virtual CPU mesh — correctness of the curve
machinery, not CPU speed.

Usage:
    # virtual 8-device CPU mesh (default in this image):
    python scripts/bench_scaling.py --cpu --devices 1 2 4 8
    # real hardware, weak scaling (fixed per-chip batch):
    python scripts/bench_scaling.py --per-device-batch 64

Prints one JSON line per device count plus a summary line with the
parallel efficiency vs the 1-device point.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU mesh (sets 8 host devices)")
    ap.add_argument("--devices", type=int, nargs="+", default=None,
                    help="device counts to sweep (default: 1,2,4,...,all)")
    ap.add_argument("--per-device-batch", type=int, default=8,
                    help="weak scaling: global batch = n_devices * this")
    ap.add_argument("--seq-len", type=int, default=30)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=30,
                    help=">=30 iters before timing (CLAUDE.md backend warmup)")
    ap.add_argument("--zero1", action="store_true", help="shard optimizer state too")
    args = ap.parse_args()

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
    from multimodal_mtrssm_tpu.parallel import make_mesh, replicate, shard_batch
    from multimodal_mtrssm_tpu.train.optim import make_optimizer, shard_opt_state
    from multimodal_mtrssm_tpu.train.steps import make_train_step
    from multimodal_mtrssm_tpu.utils.benchtools import best_window, synthetic_batch6
    from multimodal_mtrssm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    all_devices = jax.devices()
    counts = args.devices or sorted(
        {n for n in (1, 2, 4, 8, 16, 32) if n <= len(all_devices)} | {len(all_devices)}
    )
    T = args.seq_len
    model = MoPoEMRSSM(MRSSMConfig())
    results = []

    for n in counts:
        if n > len(all_devices):
            print(json.dumps({"n_devices": n, "skipped": "not enough devices"}))
            continue
        mesh = make_mesh(all_devices[:n])
        B = args.per_device_batch * n
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        batch = synthetic_batch6(jax.random.PRNGKey(0), B, T)
        opt = make_optimizer(shard_pad=n if args.zero1 else 1)
        params = replicate(model.init(jax.random.PRNGKey(1)), mesh)
        opt_state = opt.init(params)
        opt_state = shard_opt_state(opt_state, mesh) if args.zero1 else replicate(opt_state, mesh)
        batch = shard_batch(batch, mesh)

        # The Trainer's actual step math (train/steps.py).
        f = jax.jit(make_train_step(model, opt), donate_argnums=(0, 1))
        for i in range(args.warmup):
            params, opt_state, m = f(params, opt_state, batch, ks[3], i)
        float(m["loss"])  # host-transfer fence (block_until_ready can return early; CLAUDE.md)
        times = []
        for w in range(3):
            t0 = time.perf_counter()
            for i in range(args.iters):
                params, opt_state, m = f(params, opt_state, batch, ks[3], i)
            loss = m["loss"]
            float(loss)
            times.append((time.perf_counter() - t0) / args.iters)
        dt = best_window(times)  # reject sub-0.25x-median anomaly windows
        row = {
            "n_devices": n,
            "global_batch": B,
            "ms_per_step": round(dt * 1e3, 3),
            "seq_per_s": round(B / dt, 1),
            "loss": round(float(loss), 4),
            "platform": all_devices[0].platform,
            "zero1": bool(args.zero1),
        }
        results.append(row)
        print(json.dumps(row))

    if results and results[0]["n_devices"] == 1:
        base = results[0]["seq_per_s"]
        summary = {
            "metric": "dp_scaling_efficiency",
            "curve": {str(r["n_devices"]): round(r["seq_per_s"] / (base * r["n_devices"]), 3)
                      for r in results},
        }
        print(json.dumps(summary))


if __name__ == "__main__":
    main()
