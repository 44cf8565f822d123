"""Capture a jax.profiler trace of the training step (SURVEY §5.1 — the
reference has no profiling hooks at all).

Usage:
    python scripts/profile_train.py --out /tmp/trace [--steps 20] [--model mmtrssm]

View with TensorBoard's profile plugin or xprof.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--model", choices=("mrssm", "mmtrssm"), default="mrssm")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq-len", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multimodal_mtrssm_tpu.models import (
        MMTRSSMConfig,
        MoPoEMMTRSSM,
        MoPoEMRSSM,
        MRSSMConfig,
    )
    from multimodal_mtrssm_tpu.train.optim import make_optimizer
    from multimodal_mtrssm_tpu.utils.benchtools import synthetic_batch6

    B, T = args.batch, args.seq_len
    model = (
        MoPoEMRSSM(MRSSMConfig(input_noise_std=0.1))
        if args.model == "mrssm"
        else MoPoEMMTRSSM(MMTRSSMConfig(input_noise_std=0.1))
    )
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    batch = synthetic_batch6(jax.random.PRNGKey(0), B, T)
    params = model.init(jax.random.PRNGKey(1))
    opt = make_optimizer()
    opt_state = opt.init(params)

    def step(p, st, k):
        loss, g = jax.value_and_grad(lambda q: model.shared_step(q, batch, k)["loss"])(p)
        u, st = opt.update(g, st, p)
        return jax.tree.map(lambda a, b: a + b, p, u), st, loss

    f = jax.jit(step, donate_argnums=(0, 1))
    params, opt_state, loss = f(params, opt_state, ks[3])
    float(loss)  # host-transfer fence (block_until_ready can return early; CLAUDE.md)
    for i in range(30):  # warm past backend background work
        params, opt_state, loss = f(params, opt_state, jax.random.fold_in(ks[3], i))
    float(loss)

    jax.profiler.start_trace(args.out)
    t0 = time.perf_counter()
    for i in range(args.steps):
        params, opt_state, loss = f(params, opt_state, jax.random.fold_in(ks[3], 100 + i))
    float(loss)
    dt = (time.perf_counter() - t0) / args.steps
    jax.profiler.stop_trace()
    print(f"{args.model}: {dt * 1e3:.2f} ms/step; trace written to {args.out}")


if __name__ == "__main__":
    main()
