"""In-kernel phase attribution for the fused MRSSM training kernel.

VERDICT r3 item 5: the K-sweep fit put the train-step floor at ~0.97 ms —
~32 µs per timestep inside ONE Pallas program — with no evidence of where
that time goes. This bench produces that evidence two ways, on TPU:

1. **Ablation ladder**: local pallas kernels that run the same T-step loop
   with successive phases removed (posterior ST sample → MoPoE fusion →
   posterior heads → prior head+sample → GRU+projector → empty loop).
   Deltas between rungs attribute per-phase cost. The ablated kernels are
   bench-local (the shipped kernel stays unmodified); they reuse the
   shipped step helpers so the math per remaining phase is identical.
2. **T-scaling fit**: each variant timed at several horizons; the slope of
   ms(T) is the true per-iteration cost, the intercept the per-call fixed
   overhead (issue/setup). A large intercept would mean the floor is
   program-entry overhead, not loop latency — a different fix.

Also times the shipped forward, the hand-derived backward (via jax.vjp),
and the stacked-layout variant (train_step_stacked.py) for the same
shapes, so the stacked A/B and the attribution come from one session.

Run (TPU): python benchmarks/bench_kernel_phases.py [--b 8] [--ts 15,30,60]
"""

from __future__ import annotations

import argparse
import functools
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig  # noqa: E402
from multimodal_mtrssm_tpu.ops.pallas.train_step import (  # noqa: E402
    N_W,
    _elu,
    _forward_step,
    _mopoe_forward,
    _st_sample,
    fused_train_recurrence,
    pack_train_params,
)
from multimodal_mtrssm_tpu.ops.pallas.train_step_stacked import (  # noqa: E402
    fused_train_recurrence_stacked,
)

CLASS, CAT = 4, 4
WARMUP = 20
REPS = 200

# Ablation rungs, outermost phase removed first. Each rung REPLACES the
# named phase's outputs with cheap constants so downstream shapes hold.
PHASES = ("full", "no_post_sample", "no_fusion", "no_heads", "no_prior",
          "gru_only", "empty")


def _ablated_step(weights, action, a_emb, v_emb, in_deter, in_stoch,
                  g_prior, g_post, phase):
    """The shipped step with phases stripped from the top of the dataflow.

    Returns (deter, prior_logits, prior_stoch, mixed, post_stoch) — zeros
    for outputs whose producing phase is ablated."""
    if phase == "full":
        rec = _forward_step(weights, action, a_emb, v_emb, in_deter, in_stoch,
                            g_prior, g_post, CLASS, CAT)
        return (rec["deter"], rec["prior_logits"], rec["prior_stoch"],
                rec["mixed"], rec["post_stoch"])

    (w1, b1, w2, b2, wih, bih, whh, bhh, wp1, bp1, wp2, bp2,
     wa1, ba1, wa2, ba2, wv1, bv1, wv2, bv2) = weights
    D = whh.shape[0]
    S = wp2.shape[1]
    B = action.shape[0]
    zS = jnp.zeros((B, S), jnp.float32)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)

    if phase == "empty":
        # Just the loop carry: measures fori_loop + VMEM store cost.
        return in_deter, zS, zS, zS, in_stoch

    # GRU + action_state_projector (always present below "empty").
    x = jnp.concatenate([action, in_stoch], axis=-1)
    h1 = _elu(dot(x, w1) + b1)
    x2 = dot(h1, w2) + b2
    gi = dot(x2, wih) + bih
    gh = dot(in_deter, whh) + bhh
    r = jax.nn.sigmoid(gi[:, :D] + gh[:, :D])
    z = jax.nn.sigmoid(gi[:, D : 2 * D] + gh[:, D : 2 * D])
    n = jnp.tanh(gi[:, 2 * D :] + r * gh[:, 2 * D :])
    deter = (1.0 - z) * n + z * in_deter
    if phase == "gru_only":
        return deter, zS, zS, zS, in_stoch

    # Prior head (+ its ST sample).
    p1 = _elu(dot(deter, wp1) + bp1)
    prior_logits = dot(p1, wp2) + bp2
    prior_stoch, _ = _st_sample(prior_logits, g_prior, CLASS, CAT)
    if phase == "no_heads":
        # posterior heads/fusion/post-sample ablated; carry the prior sample.
        return deter, prior_logits, prior_stoch, zS, prior_stoch
    if phase == "no_prior":
        # Inverse rung: posterior path WITHOUT the prior head, to separate
        # the two head groups. (Keeps heads+fusion+post sample.)
        prior_logits, prior_stoch = zS, zS

    # Posterior heads.
    xa = jnp.concatenate([deter, a_emb], axis=-1)
    a_logits = dot(_elu(dot(xa, wa1) + ba1), wa2) + ba2
    xv = jnp.concatenate([deter, v_emb], axis=-1)
    v_logits = dot(_elu(dot(xv, wv1) + bv1), wv2) + bv2
    if phase == "no_fusion":
        mixed = a_logits + v_logits  # placeholder combine, no log-softmaxes
        post_stoch, _ = _st_sample(mixed, g_post, CLASS, CAT)
        return deter, prior_logits, prior_stoch, mixed, post_stoch

    mixed, _, _ = _mopoe_forward(a_logits, v_logits)
    if phase == "no_post_sample":
        return deter, prior_logits, prior_stoch, mixed, jnp.tanh(mixed)
    if phase == "no_prior":
        post_stoch, _ = _st_sample(mixed, g_post, CLASS, CAT)
        return deter, prior_logits, prior_stoch, mixed, post_stoch

    raise ValueError(phase)


def _make_ablated_call(T, B, D, S, A, E, phase, interpret=False):
    def kernel(actions_ref, a_emb_ref, v_emb_ref, init_deter_ref,
               init_stoch_ref, g_prior_ref, g_post_ref, *rest):
        w_refs, outs = rest[:N_W], rest[N_W:]
        deter_ref, prior_logits_ref, prior_stoch_ref, mixed_ref, post_stoch_ref = outs
        weights = tuple(r[:] for r in w_refs)

        def body(t, carry):
            in_deter, in_stoch = carry
            deter, prior_logits, prior_stoch, mixed, post_stoch = _ablated_step(
                weights, actions_ref[t], a_emb_ref[t], v_emb_ref[t],
                in_deter, in_stoch, g_prior_ref[t], g_post_ref[t], phase)
            deter_ref[t] = deter
            prior_logits_ref[t] = prior_logits
            prior_stoch_ref[t] = prior_stoch
            mixed_ref[t] = mixed
            post_stoch_ref[t] = post_stoch
            return deter, post_stoch

        jax.lax.fori_loop(0, T, body, (init_deter_ref[:], init_stoch_ref[:]))

    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = tuple(
        jax.ShapeDtypeStruct((T, B, d), jnp.float32) for d in (D, S, S, S, S))
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[spec] * (7 + N_W),
        out_specs=tuple(spec for _ in range(5)),
        interpret=pltpu.InterpretParams() if interpret else False,
    )


def _inputs(B, T, packed):
    ks = jax.random.split(jax.random.PRNGKey(1), 7)
    A, E, D, S = 6, 64, 32, 16
    return (packed,
            jax.random.normal(ks[0], (T, B, A)),
            jax.random.normal(ks[1], (T, B, E)),
            jax.random.normal(ks[2], (T, B, E)),
            jax.random.normal(ks[3], (B, D)),
            jax.nn.one_hot(jax.random.randint(ks[4], (B, CLASS), 0, CAT),
                           CAT).reshape(B, S),
            jax.random.gumbel(ks[5], (T, B, S)),
            jax.random.gumbel(ks[6], (T, B, S)))


def _chained(fn, carry_of, k):
    """Jit a K-rep chain of ``fn`` with a real data dependency between reps.

    One host fence per K calls amortizes the tunneled backend's ~33 ms
    per-dispatch round trip to RTT/K — a CONSTANT additive term shared by
    every variant, so rung deltas and ms(T) slopes are unaffected (the
    first cut of this bench fenced every rep and measured pure RTT: all
    variants landed at 31-35 ms regardless of T or ablation).

    ``carry_of(out) -> (deter[B,D], stoch[B,S])`` extracts the next rep's
    initial state from the previous rep's outputs, forcing sequencing.
    """
    def run(packed, actions, a_emb, v_emb, init_d, init_s, gp, gq):
        def body(carry, _):
            d, s = carry
            out = fn(packed, actions, a_emb, v_emb, d, s, gp, gq)
            return carry_of(out), None
        (d, s), _ = jax.lax.scan(body, (init_d, init_s), None, length=k)
        return d, s
    return jax.jit(run)


def _time(run, ins, k) -> float:
    """Median-of-WINDOWS ms per call; each window = one K-rep chain."""
    out = None
    for _ in range(WARMUP):
        out = run(*ins)
    fence = lambda o: float(jnp.sum(o[0])) + float(jnp.sum(o[1]))  # noqa: E731
    fence(out)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = run(*ins)
        fence(out)
        times.append(time.perf_counter() - t0)
    return statistics.median(times) * 1e3 / k


def main() -> None:
    """Run the ablation ladder + T-scaling fit; print one JSON per row."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--ts", default="15,30,60")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke mode (no timings of record)")
    ap.add_argument("--reps", type=int, default=None,
                    help="timing windows per variant (default 5)")
    ap.add_argument("--warmup", type=int, default=None)
    ap.add_argument("--k", type=int, default=256,
                    help="chained reps per window (amortizes dispatch RTT)")
    args = ap.parse_args()
    global REPS, WARMUP
    REPS = args.reps if args.reps else 5
    if args.warmup is not None:
        WARMUP = args.warmup
    else:
        WARMUP = 2
    if args.interpret:
        args.k = 2
        REPS = 1
        WARMUP = 1
    from multimodal_mtrssm_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    model = MoPoEMRSSM(MRSSMConfig())
    packed = pack_train_params(model.init(jax.random.PRNGKey(0)))
    B = args.b
    ts = [int(t) for t in args.ts.split(",")]
    rows = []
    # Carry extractors: forward variants return (deter, prior_logits,
    # prior_stoch, mixed, post_stoch) time-major; fwd_bwd returns grads
    # w.r.t. the 8 inputs (packed, actions, a_emb, v_emb, init_deter,
    # init_stoch, g_prior, g_post). tanh keeps chained values bounded.
    fwd_carry = lambda o: (o[0][-1], o[4][-1])  # noqa: E731
    bwd_carry = lambda g: (jnp.tanh(g[4]), jnp.tanh(g[5]))  # noqa: E731
    for T in ts:
        ins = _inputs(B, T, packed)
        # Shipped forward / stacked forward / backward via vjp.
        fwd = lambda *a: fused_train_recurrence(
            *a, class_size=CLASS, category_size=CAT, interpret=args.interpret)
        stk = lambda *a: fused_train_recurrence_stacked(
            *a, class_size=CLASS, category_size=CAT, interpret=args.interpret)

        def fwd_bwd(*a):
            outs, vjp = jax.vjp(
                lambda *x: fused_train_recurrence(
                    *x, class_size=CLASS, category_size=CAT,
                    interpret=args.interpret), *a)
            return vjp(outs)  # cotangents = outputs (arbitrary, well-shaped)

        row = {"B": B, "T": T, "k": args.k,
               "fwd_ms": round(_time(_chained(fwd, fwd_carry, args.k), ins, args.k), 4),
               "fwd_stacked_ms": round(_time(_chained(stk, fwd_carry, args.k), ins, args.k), 4),
               "fwd_bwd_ms": round(_time(_chained(fwd_bwd, bwd_carry, args.k), ins, args.k), 4)}
        for phase in PHASES:
            call = _make_ablated_call(T, B, 32, 16, 6, 64, phase, args.interpret)
            f = lambda *a, _c=call: _c(*a[1:], *a[0])
            row[f"ablate_{phase}_ms"] = round(
                _time(_chained(f, fwd_carry, args.k), ins, args.k), 4)
        rows.append(row)
        print(json.dumps(row), flush=True)
    # Per-iteration slope + intercept per variant across T.
    if len(ts) >= 2:
        fits = {}
        keys = [k for k in rows[0] if k.endswith("_ms")]
        for k in keys:
            xs = [r["T"] for r in rows]
            ys = [r[k] for r in rows]
            n = len(xs)
            mx, my = sum(xs) / n, sum(ys) / n
            slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
                (x - mx) ** 2 for x in xs)
            fits[k] = {"us_per_step": round(slope * 1e3, 2),
                       "intercept_ms": round(my - slope * mx, 4)}
        print(json.dumps({"fits": fits}), flush=True)


if __name__ == "__main__":
    main()
