"""A/B: fused Pallas training recurrence vs XLA scan, full train step on TPU.

Measures the SURVEY §7.7 kernel (ops/pallas/train_step.py) inside the same
multi-step-scan harness bench.py uses (K optimizer steps per dispatch,
donated buffers) at the reference config B=8 T=30, plus optional extra
shapes. Reports ms/step for both paths; BASELINE.md records the outcome and
ops/pallas/train_step.AUTO_TRAIN_KERNEL encodes the dispatch decision.

Run (TPU): python benchmarks/bench_train_kernel.py [--shapes 8x30,32x30]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_mtrssm_tpu.models import (  # noqa: E402
    MMTRSSMConfig,
    MoPoEMMTRSSM,
    MoPoEMRSSM,
    MRSSMConfig,
)
from multimodal_mtrssm_tpu.train.optim import make_optimizer  # noqa: E402
from multimodal_mtrssm_tpu.utils.benchtools import synthetic_batch6  # noqa: E402

K = 32
WARMUP = 3
WINDOWS = 8
GAP_S = 4.0


def measure(model, B: int, T: int) -> float:
    """Steady-state ms per optimizer step for the K-step scan train path."""
    print(f"# measuring B={B} T={T} use_pallas_train={model.cfg.use_pallas_train} "
          f"-> mode={model._train_kernel_mode(B, T)}", flush=True)
    optimizer = make_optimizer()
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    stacked = synthetic_batch6(jax.random.PRNGKey(0), B, T, stacked_k=K)
    params = model.init(jax.random.PRNGKey(1))
    opt_state = optimizer.init(params)

    def train_scan(params, opt_state, stacked, key, step0):
        def body(carry, xs):
            p, s = carry
            batch, step = xs

            def loss_fn(pp):
                return model.shared_step(pp, batch, jax.random.fold_in(key, step))["loss"]

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = optimizer.update(grads, s, p)
            p = jax.tree.map(lambda a, u: a + u, p, updates)
            return (p, s), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (stacked, step0 + jnp.arange(K))
        )
        return params, opt_state, losses[-1]

    train_scan = jax.jit(train_scan, donate_argnums=(0, 1))
    step_no = 0
    for _ in range(WARMUP):
        params, opt_state, loss = train_scan(params, opt_state, stacked, ks[3], step_no)
        step_no += K
    float(loss)  # host-transfer fence (block_until_ready can return early)
    times = []
    for w in range(WINDOWS):
        t0 = time.perf_counter()
        params, opt_state, loss = train_scan(params, opt_state, stacked, ks[3], step_no)
        step_no += K
        float(loss)
        times.append((time.perf_counter() - t0) / K)
        if w < WINDOWS - 1:
            time.sleep(GAP_S)
    med = statistics.median(times)
    return min(t for t in times if t > 0.25 * med) * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="8x30", help="comma list of BxT")
    ap.add_argument("--model", choices=("mrssm", "mmtrssm"), default="mrssm")
    ap.add_argument("--k", type=int, default=None,
                    help="steps per dispatch (default: module K=32; the "
                         "BASELINE.md K-sweep was run by overriding this). "
                         "With --default-only and no --k, K follows the "
                         "Trainer auto formula (1 GB chunk budget, cap 256).")
    ap.add_argument("--conv-dtype", choices=("float32", "bfloat16"),
                    default="float32",
                    help="conv stack dtype (bfloat16 = the shipped "
                         "'16-mixed' analogue bench.py measures)")
    ap.add_argument("--default-only", action="store_true",
                    help="measure only the shipped default dispatch "
                         "(use_pallas_train='auto') instead of the "
                         "XLA-vs-kernel A/B — for batch-scaling sweeps")
    ap.add_argument("--stacked", action="store_true",
                    help="three-way A/B: XLA vs kernel vs the stacked-"
                         "layout kernel (train_step_stacked.py, mrssm only)")
    ap.add_argument("--conv-layout", choices=("nhwc", "s2d"), default="nhwc",
                    help="conv-stack layout (s2d = the exact space-to-depth "
                         "re-expression, nn/conv.py)")
    ap.add_argument("--layout-ab", action="store_true",
                    help="A/B the shipped default dispatch with "
                         "conv_layout nhwc vs s2d at each shape")
    args = ap.parse_args()
    global K
    if args.k:
        K = args.k
    from multimodal_mtrssm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    results = []
    conv_dtype = jnp.bfloat16 if args.conv_dtype == "bfloat16" else None
    make = (lambda up, layout=args.conv_layout: MoPoEMRSSM(MRSSMConfig(
        use_pallas_train=up, conv_dtype=conv_dtype, conv_layout=layout))) \
        if args.model == "mrssm" else \
        (lambda up, layout=args.conv_layout: MoPoEMMTRSSM(MMTRSSMConfig(
            use_pallas_train=up, conv_dtype=conv_dtype, conv_layout=layout)))
    for shape in args.shapes.split(","):
        B, T = (int(v) for v in shape.split("x"))
        if args.layout_ab:
            if args.k is None:
                from multimodal_mtrssm_tpu.train.trainer import (
                    SPD_CHUNK_BUDGET_BYTES,
                    SPD_MAX_STEPS,
                )

                nbytes = 4 * B * T * (4 * 32 * 32 + 2 * 6)
                K = max(1, min(SPD_MAX_STEPS, SPD_CHUNK_BUDGET_BYTES // nbytes))
            ms_nhwc = measure(make("auto", "nhwc"), B, T)
            ms_s2d = measure(make("auto", "s2d"), B, T)
            row = {"model": args.model, "B": B, "T": T, "K": K,
                   "conv_dtype": args.conv_dtype,
                   "ms_per_step_nhwc": round(ms_nhwc, 3),
                   "ms_per_step_s2d": round(ms_s2d, 3),
                   "speedup_s2d": round(ms_nhwc / ms_s2d, 3)}
        elif args.default_only:
            if args.k is None:
                # Trainer._resolve_spd auto formula (shared constants) on this
                # shape's batch bytes (== EpisodeDataModule.batch_nbytes: four
                # 32×32×1 image streams + two 6-dim action streams, f32).
                from multimodal_mtrssm_tpu.train.trainer import (
                    SPD_CHUNK_BUDGET_BYTES,
                    SPD_MAX_STEPS,
                )

                nbytes = 4 * B * T * (4 * 32 * 32 + 2 * 6)
                K = max(1, min(SPD_MAX_STEPS, SPD_CHUNK_BUDGET_BYTES // nbytes))
            ms = measure(make("auto"), B, T)
            row = {"model": args.model, "B": B, "T": T, "K": K,
                   "conv_dtype": args.conv_dtype,
                   "ms_per_step": round(ms, 3),
                   "seq_per_s": round(B / (ms / 1e3), 1)}
        else:
            ms_xla = measure(make(False), B, T)
            ms_kernel = measure(make(True), B, T)
            row = {
                "model": args.model, "B": B, "T": T,
                "ms_per_step_xla": round(ms_xla, 3),
                "ms_per_step_kernel": round(ms_kernel, 3),
                "speedup": round(ms_xla / ms_kernel, 3),
            }
            if args.stacked:
                ms_stacked = measure(make("stacked"), B, T)
                row["ms_per_step_stacked"] = round(ms_stacked, 3)
                row["speedup_stacked_vs_kernel"] = round(ms_kernel / ms_stacked, 3)
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"metric": "train_kernel_ab", "results": results}))


if __name__ == "__main__":
    main()
