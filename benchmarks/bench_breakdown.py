"""Break the reference-config train step (B=8, T=30) into component times.

VERDICT r1 item 2: the chip is latency-bound at the reference config; this
script quantifies where the ~10 ms go (encoders / scan / decoders / loss
bwd / optimizer) and reports achieved FLOP/s + MFU per component so the
biggest slice can be attacked with evidence.

Run on the real TPU: ``python benchmarks/bench_breakdown.py [--unroll N]
[--bf16]``.

Round-2 caveat: each component here is timed per-dispatch, and a host
dispatch round-trip costs ~3 ms on this tunneled backend (measured via the
scan A/B, BASELINE.md) — so ABSOLUTE numbers overstate device time and the
components do not sum to the scan-mode step (2.1 ms). Use these figures
for RELATIVE comparisons; the true end-to-end step time is what
``bench.py`` (K-step scan) reports.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_mtrssm_tpu.utils.benchtools import best_window, synthetic_batch6
from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
from multimodal_mtrssm_tpu.nn.conv import encoder_apply
from multimodal_mtrssm_tpu.train.optim import make_optimizer

B, T = 8, 30
WARMUP, ITERS, WINDOWS = 30, 20, 4


def timeit(fn, *args):
    for _ in range(WARMUP):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])  # host-transfer fence
    times = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])  # host-transfer fence
        times.append((time.perf_counter() - t0) / ITERS)
    # min over windows, rejecting sub-0.25x-median anomalies (CLAUDE.md).
    return best_window(times), out


def flops_of(fn, *args):
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--unroll", type=int, default=1)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    cfg = MRSSMConfig(scan_unroll=args.unroll)
    if args.bf16:
        cfg = dataclasses.replace(cfg, compute_dtype=jnp.bfloat16)
    model = MoPoEMRSSM(cfg)
    opt = make_optimizer()
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    batch = synthetic_batch6(jax.random.PRNGKey(0), B, T)
    params = model.init(jax.random.PRNGKey(1))
    opt_state = opt.init(params)
    key = ks[3]

    def full_step(params, opt_state, batch, key):
        def loss_fn(p):
            return model.shared_step(p, batch, key)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    def fwd_loss(params, batch, key):
        return model.shared_step(params, batch, key)["loss"]

    def fwd_bwd(params, batch, key):
        return jax.value_and_grad(lambda p: model.shared_step(p, batch, key)["loss"])(params)[1]

    def encoders(params, batch):
        a = encoder_apply(params["audio_encoder"], cfg.audio_encoder, batch[1])
        v = encoder_apply(params["vision_encoder"], cfg.vision_encoder, batch[2])
        return a, v

    # Pre-computed latents for isolated scan / decoder timing.
    init = model.initial_state(params, batch[1][:, 0], batch[2][:, 0], key)
    posterior, _ = jax.jit(model.rollout_representation)(
        params, batch[0], batch[1], batch[2], init, key
    )
    a_emb, v_emb = jax.jit(encoders)(params, batch)

    def scan_only(params, actions, a_emb, v_emb, init, key):
        # Re-runs the recurrence on precomputed embeddings (encoder excluded
        # from cost by passing embeds; rollout_representation re-encodes, so
        # use the rollout_transition prior scan as the isolated-scan proxy).
        return model.rollout_transition(params, actions, init, key).deter

    def decoders(params, state):
        return model.decode_state(params, state)

    def opt_only(grads, opt_state, params):
        u, st = opt.update(grads, opt_state, params)
        return jax.tree.map(lambda p, q: p + q, params, u), st

    grads = jax.jit(fwd_bwd)(params, batch, key)

    rows = []
    for name, fn, fargs in [
        ("full_train_step", jax.jit(full_step, donate_argnums=()), (params, opt_state, batch, key)),
        ("fwd_loss", jax.jit(fwd_loss), (params, batch, key)),
        ("fwd_bwd", jax.jit(fwd_bwd), (params, batch, key)),
        ("encoders[B*T]", jax.jit(encoders), (params, batch)),
        ("prior_scan_T30", jax.jit(scan_only), (params, batch[0], a_emb, v_emb, init, key)),
        ("decoders[B*T]", jax.jit(decoders), (params, posterior)),
        ("optimizer", jax.jit(opt_only), (grads, opt_state, params)),
    ]:
        dt, _ = timeit(fn, *fargs)
        try:
            fl, by = flops_of(fn._fun if hasattr(fn, "_fun") else fn, *fargs)
        except Exception:
            fl, by = 0.0, 0.0
        rows.append((name, dt * 1e3, fl, by))

    peak_flops = 197e12  # v5e bf16
    peak_bw = 819e9  # v5e HBM GB/s
    print(f"\nconfig: unroll={args.unroll} bf16={args.bf16}  B={B} T={T}")
    print(f"{'component':<18}{'ms':>8}{'GFLOP':>10}{'MB':>9}{'TFLOP/s':>10}{'MFU%':>7}{'BW%':>6}")
    for name, ms, fl, by in rows:
        tfs = fl / (ms / 1e3) / 1e12 if ms else 0
        print(f"{name:<18}{ms:>8.3f}{fl / 1e9:>10.2f}{by / 1e6:>9.1f}"
              f"{tfs:>10.2f}{100 * tfs * 1e12 / peak_flops:>7.2f}"
              f"{100 * (by / (ms / 1e3)) / peak_bw:>6.1f}")
    full_ms = rows[0][1]
    print(f"\nseq/s at B={B}: {B / (full_ms / 1e3):.1f}")


if __name__ == "__main__":
    main()
