"""ELBO training-CURVE parity: JAX trainer vs the torch reference twin.

SURVEY §6's last unproven north-star. The single-step golden test
(tests/test_torch_parity.py) pins one weight-synced loss evaluation; this
harness pins the TRAINING TRAJECTORY: both frameworks start from the same
init (JAX init copied into the torch twin via benchmarks/torch_sync.py),
consume the same synthetic dataset in the same per-epoch batch order, take
the same optimizer steps (AdamW lr 1e-3, betas (0.9, 0.999), eps 1e-8,
decoupled weight decay 0.01, global-norm grad clip 10 — the semantics of
``train/optim.py::FusedAdamW`` and the reference trainer's
``gradient_clip_val`` at reference ``configs/default.yaml:96-107``), and
log per-epoch train loss/recon/kl.

The one semantic divergence between the frameworks is the CATEGORICAL NOISE
STREAM: jax.random and torch.distributions cannot draw identical gumbels,
so sampling is replaced with the distribution expectation in BOTH (the same
device the golden test uses). With noise out of the picture, any curve gap
is real semantics drift (loss math, grads, optimizer); float32 accumulation
across steps is the only expected residual and compounds geometrically.

Usage:
    python benchmarks/curve_parity.py --epochs 25 --episodes 16 --batch 4 \
        --out /tmp/curve_parity.json

Prints one JSON line per epoch plus a final summary line with the max
relative loss gap.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import jax
import jax.numpy as jnp
import numpy as np

T = 30  # torch_reference_bench hard-codes the reference horizon


def _jax_side(model_name, params_key, epochs, episodes, batch, data):
    """Train the JAX model with expectation-sampling; returns (init params as
    numpy tree, per-epoch metric list)."""
    from multimodal_mtrssm_tpu.models import (
        MMTRSSMConfig,
        MoPoEMMTRSSM,
        MoPoEMRSSM,
        MRSSMConfig,
    )
    from multimodal_mtrssm_tpu.ops.distributions import MultiOneHot
    from multimodal_mtrssm_tpu.train.optim import make_optimizer
    from multimodal_mtrssm_tpu.train.steps import make_train_step

    # Expectation sampling (same patch as tests/test_torch_parity.py).
    orig = MultiOneHot.rsample
    MultiOneHot.rsample = lambda self, key: self.probs()
    try:
        model = (MoPoEMRSSM(MRSSMConfig(use_pallas_train=False))
                 if model_name == "mrssm"
                 else MoPoEMMTRSSM(MMTRSSMConfig(use_pallas_train=False)))
        params = model.init(jax.random.PRNGKey(params_key))
        init_np = jax.tree.map(np.asarray, params)
        optimizer = make_optimizer()
        opt_state = optimizer.init(params)
        step_fn = jax.jit(make_train_step(model, optimizer))

        action, audio, vision = data
        history = []
        step = 0
        for epoch in range(epochs):
            order = np.random.default_rng((0, epoch)).permutation(episodes)
            ep_metrics = []
            for i in range(0, episodes - episodes % batch, batch):
                idx = order[i:i + batch]
                b = (jnp.asarray(action[idx]), jnp.asarray(audio[idx]),
                     jnp.asarray(vision[idx]), jnp.asarray(action[idx]),
                     jnp.asarray(audio[idx]), jnp.asarray(vision[idx]))
                params, opt_state, m = step_fn(
                    params, opt_state, b, jax.random.PRNGKey(0), step)
                step += 1
                ep_metrics.append({k: float(m[k]) for k in ("loss", "recon", "kl")})
            history.append({k: float(np.mean([d[k] for d in ep_metrics]))
                            for k in ("loss", "recon", "kl")})
        return init_np, history
    finally:
        MultiOneHot.rsample = orig


def _torch_side(model_name, init_np, epochs, episodes, batch, data):
    """Train the torch twin from the same init; returns per-epoch metrics."""
    import torch
    from torch_reference_bench import TorchMoPoEMMTRSSM, TorchMoPoEMRSSM
    from torch_sync import sync_mmtrssm, sync_mrssm

    torch.set_num_threads(1)

    if model_name == "mrssm":
        def expectation(logits):
            b = logits.shape[:-1]
            probs = torch.softmax(logits.view(*b, 4, 4), dim=-1)
            return probs.reshape(*b, 16)

        TorchMoPoEMRSSM._rsample = staticmethod(expectation)
        tm = TorchMoPoEMRSSM()
        sync_mrssm(tm, init_np)
    else:
        def expectation_mt(logits, classes, cats):
            b = logits.shape[:-1]
            probs = torch.softmax(logits.view(*b, classes, cats), dim=-1)
            return probs.reshape(*b, classes * cats)

        TorchMoPoEMMTRSSM._rsample = staticmethod(expectation_mt)
        tm = TorchMoPoEMMTRSSM()
        sync_mmtrssm(tm, init_np)
    opt = torch.optim.AdamW(tm.parameters(), lr=1e-3, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=0.01)

    action, audio, vision = data
    to_chw = lambda x: torch.tensor(x.transpose(0, 1, 4, 2, 3))  # noqa: E731
    history = []
    for epoch in range(epochs):
        order = np.random.default_rng((0, epoch)).permutation(episodes)
        ep_metrics = []
        for i in range(0, episodes - episodes % batch, batch):
            idx = order[i:i + batch]
            bt = (torch.tensor(action[idx]), to_chw(audio[idx]), to_chw(vision[idx]),
                  torch.tensor(action[idx]), to_chw(audio[idx]), to_chw(vision[idx]))
            opt.zero_grad()
            loss = tm(bt)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(tm.parameters(), 10.0)
            opt.step()
            ep_metrics.append({"loss": float(loss), **tm.last_metrics})
        history.append({k: float(np.mean([d[k] for d in ep_metrics]))
                        for k in ("loss", "recon", "kl")})
    return history


def main() -> None:
    """Run both sides and report per-epoch curve agreement."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--episodes", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--model", default="mrssm", choices=["mrssm", "mmtrssm"])
    ap.add_argument("--out", default=None, help="write the full JSON here")
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")  # CPU-feasible twin experiment

    rng = np.random.default_rng(0)
    data = (
        rng.normal(size=(args.episodes, T, 6)).astype(np.float32),
        rng.uniform(-1, 1, (args.episodes, T, 32, 32, 1)).astype(np.float32),
        rng.uniform(-1, 1, (args.episodes, T, 32, 32, 1)).astype(np.float32),
    )

    t0 = time.time()
    init_np, jax_hist = _jax_side(args.model, 0, args.epochs, args.episodes,
                                  args.batch, data)
    t1 = time.time()
    torch_hist = _torch_side(args.model, init_np, args.epochs, args.episodes,
                             args.batch, data)
    t2 = time.time()

    rows = []
    for e, (j, t) in enumerate(zip(jax_hist, torch_hist)):
        rel = {k: abs(j[k] - t[k]) / max(abs(t[k]), 1e-9) for k in j}
        row = {"epoch": e, "jax": j, "torch": t, "rel_gap": rel}
        rows.append(row)
        print(json.dumps(row), flush=True)

    summary = {
        "model": args.model,
        "epochs": args.epochs,
        "max_rel_loss_gap": max(r["rel_gap"]["loss"] for r in rows),
        "final_rel_loss_gap": rows[-1]["rel_gap"]["loss"],
        "max_rel_kl_gap": max(r["rel_gap"]["kl"] for r in rows),
        "jax_s": round(t1 - t0, 1),
        "torch_s": round(t2 - t1, 1),
    }
    print(json.dumps({"summary": summary}), flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps({"rows": rows, "summary": summary}, indent=1))


if __name__ == "__main__":
    main()
