"""Benchmark: fused Pallas imagination rollout vs the XLA lax.scan path.

The eval workload shape (reference ``evaluate_word_transitions_mrssm.py:
286-372``): B = n_predictions samples, T = n_frames imagination steps.
Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
from multimodal_mtrssm_tpu.ops.pallas import fused_rollout_transition, pack_params


def main() -> None:
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

        def timeit(fn, *args, n=50):
            r = fn(*args)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            for _ in range(n):
                r = fn(*args)
            jax.block_until_ready(r)
            return (time.perf_counter() - t0) / n

        t_xla = timeit(xla_fn, actions, init_deter, init_stoch, jax.random.PRNGKey(2))
        t_pal = timeit(pallas_fn, actions, init_deter, init_stoch, jnp.int32(7))
        print(json.dumps({
            "metric": f"imagination_rollout_B{B}_T{T}",
            "xla_ms": round(t_xla * 1e3, 3),
            "pallas_ms": round(t_pal * 1e3, 3),
            "speedup": round(t_xla / t_pal, 2),
            "steps_per_s_pallas": round(B * T / t_pal, 0),
        }))


if __name__ == "__main__":
    main()
