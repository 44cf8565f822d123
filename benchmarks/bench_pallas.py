"""Benchmark: fused Pallas imagination rollout vs the XLA lax.scan path.

The eval workload shape (reference ``evaluate_word_transitions_mrssm.py:
286-372``): B = n_predictions samples, T = n_frames imagination steps.
Prints one JSON line per configuration.
"""

from __future__ import annotations

import json

import sys
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
from multimodal_mtrssm_tpu.utils.benchtools import timeit_fenced
from multimodal_mtrssm_tpu.ops.pallas import fused_rollout_transition, pack_params


def main() -> None:
    _bench_mrssm()
    _bench_mmtrssm()


def _bench_mrssm() -> None:
    model = MoPoEMRSSM(MRSSMConfig())
    params = model.init(jax.random.PRNGKey(0))
    packed = pack_params(params)

    for B, T in ((10, 10), (64, 30), (256, 180)):
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        actions = jax.random.normal(ks[0], (B, T, 6))
        init_deter = jax.random.normal(ks[1], (B, 32))
        idx = jax.random.randint(ks[2], (B, 4), 0, 4)
        init_stoch = jax.nn.one_hot(idx, 4).reshape(B, 16)

        xla_fn = jax.jit(
            lambda a, d, s, k: model.rollout_transition(
                params,
                a,
                __import__("multimodal_mtrssm_tpu.models.state", fromlist=["State"]).State(
                    deter=d, stoch=s, distribution=model._dist(jnp.zeros_like(s))
                ),
                k,
            ).deter
        )
        pallas_fn = jax.jit(
            lambda a, d, s, seed: fused_rollout_transition(packed, a, d, s, seed)[0]
        )

        t_xla = timeit_fenced(xla_fn, actions, init_deter, init_stoch, jax.random.PRNGKey(2))
        t_pal = timeit_fenced(pallas_fn, actions, init_deter, init_stoch, jnp.int32(7))
        print(json.dumps({
            "metric": f"imagination_rollout_B{B}_T{T}",
            "xla_ms": round(t_xla * 1e3, 3),
            "pallas_ms": round(t_pal * 1e3, 3),
            "speedup": round(t_xla / t_pal, 2),
            "steps_per_s_pallas": round(B * T / t_pal, 0),
        }))


def _bench_mmtrssm() -> None:
    from multimodal_mtrssm_tpu.models import MMTRSSMConfig, MoPoEMMTRSSM
    from multimodal_mtrssm_tpu.models.state import MTState
    from multimodal_mtrssm_tpu.ops.pallas import fused_mt_rollout_transition, pack_mt_params

    model = MoPoEMMTRSSM(MMTRSSMConfig())
    params = model.init(jax.random.PRNGKey(0))
    packed = pack_mt_params(params)
    cfg = model.cfg
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    for B, T in ((10, 10), (64, 30), (256, 180)):
        a = jax.random.normal(ks[0], (B, T, 6))
        hd = jax.random.normal(ks[1], (B, cfg.hd_dim))
        ld = jax.random.normal(ks[2], (B, cfg.ld_dim))
        hs = jax.nn.one_hot(jax.random.randint(ks[3], (B, cfg.hs_class), 0, cfg.hs_category),
                            cfg.hs_category).reshape(B, cfg.hs_dim)
        ls = jax.nn.one_hot(jax.random.randint(ks[4], (B, cfg.ls_class), 0, cfg.ls_category),
                            cfg.ls_category).reshape(B, cfg.ls_dim)
        init = (hd, ld, hs, ls, hd, ld)
        st = MTState(deter_h=hd, deter_l=ld, stoch_h=hs, stoch_l=ls,
                     distribution_h=model._h_dist(jnp.zeros((B, cfg.hs_dim))),
                     distribution_l=model._l_dist(jnp.zeros((B, cfg.ls_dim))),
                     hidden_h=hd, hidden_l=ld)
        xla_fn = jax.jit(lambda a, st, k: model.rollout_transition(params, a, st, k).deter_h)
        pal_fn = jax.jit(lambda a: fused_mt_rollout_transition(
            packed, a, init, jnp.int32(7), l_tau=cfg.l_tau, h_tau=cfg.h_tau,
            ls_class=cfg.ls_class, ls_category=cfg.ls_category,
            hs_class=cfg.hs_class, hs_category=cfg.hs_category)[0])

        t_xla = timeit_fenced(xla_fn, a, st, ks[5])
        t_pal = timeit_fenced(pal_fn, a)
        print(json.dumps({
            "metric": f"mt_imagination_rollout_B{B}_T{T}",
            "xla_ms": round(t_xla * 1e3, 3),
            "pallas_ms": round(t_pal * 1e3, 3),
            "speedup": round(t_xla / t_pal, 2),
        }))


if __name__ == "__main__":
    main()
