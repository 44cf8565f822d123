"""Interleaved A/B of train-step variants on the real chip.

The chip tunnel's throughput fluctuates ±2× across seconds, so variants are
timed in alternating windows within one process and compared on best-window
time (steady-state capability). Usage:

    python benchmarks/bench_ab.py [--rounds 6] [--iters 30]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
from multimodal_mtrssm_tpu.train.optim import make_optimizer
from multimodal_mtrssm_tpu.train.steps import make_train_step
from multimodal_mtrssm_tpu.utils.benchtools import (
    MIN_WARMUP_ITERS,
    best_window,
    synthetic_batch6,
)

B, T = 8, 30


def build(cfg: MRSSMConfig):
    model = MoPoEMRSSM(cfg)
    opt = make_optimizer()
    params = model.init(jax.random.PRNGKey(1))
    opt_state = opt.init(params)
    # The Trainer's actual step math (train/steps.py).
    f = jax.jit(make_train_step(model, opt), donate_argnums=(0, 1))
    return f, params, opt_state


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    variants = {
        "base": MRSSMConfig(),
        "unroll5": MRSSMConfig(scan_unroll=5),
        "unroll15": MRSSMConfig(scan_unroll=15),
        "bf16": MRSSMConfig(compute_dtype=jnp.bfloat16),
        "bf16+unroll5": MRSSMConfig(compute_dtype=jnp.bfloat16, scan_unroll=5),
    }
    batch = synthetic_batch6(jax.random.PRNGKey(0), B, T)
    key = jax.random.PRNGKey(2)
    states = {}
    for name, cfg in variants.items():
        f, p, s = build(cfg)
        for i in range(MIN_WARMUP_ITERS):  # warmup + donation settle (CLAUDE.md)
            p, s, m = f(p, s, batch, key, i)
        float(m["loss"])  # host-transfer fence (CLAUDE.md)
        states[name] = [f, p, s]

    times = {name: [] for name in variants}
    step_no = 100
    for _ in range(args.rounds):
        for name in variants:
            f, p, s = states[name]
            t0 = time.perf_counter()
            for _ in range(args.iters):
                p, s, m = f(p, s, batch, key, step_no)
                step_no += 1
            float(m["loss"])  # host-transfer fence (CLAUDE.md)
            dt = (time.perf_counter() - t0) / args.iters
            states[name][1], states[name][2] = p, s
            times[name].append(dt)

    # min over rounds, rejecting sub-0.25x-median anomaly windows.
    best = {name: best_window(ts) for name, ts in times.items()}
    print(f"\n{'variant':<14}{'ms/step':>9}{'seq/s':>9}")
    for name, dt in sorted(best.items(), key=lambda kv: kv[1]):
        print(f"{name:<14}{dt * 1e3:>9.3f}{B / dt:>9.1f}")


if __name__ == "__main__":
    main()
