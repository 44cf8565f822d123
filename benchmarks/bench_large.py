"""Benchmark: scaled-up MoPoE-MRSSM (production-size config).

The reference caps at ~100k params and 32×32 frames; this config stresses
the MXU properly — 64×64 frames, deter 512, 32×32 categorical latent
(1024-dim stoch), 4-stage conv stacks, bf16 compute — to show the framework
isn't toy-locked. Prints one JSON line.
"""

from __future__ import annotations

import json
import time

import sys
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
from multimodal_mtrssm_tpu.nn.conv import DecoderConfig, EncoderConfig
from multimodal_mtrssm_tpu.train.optim import make_optimizer

B, T = 16, 30


def large_config(conv_layout: str = "auto") -> MRSSMConfig:
    enc = EncoderConfig(
        linear_sizes=(512,), channels=(32, 64, 128, 256), kernel_sizes=(3, 3, 3, 3),
        strides=(2, 2, 2, 2), paddings=(1, 1, 1, 1), num_residual_blocks=2,
        residual_intermediate_size=256, residual_output_size=256, coord_conv=True,
        in_hw=(64, 64),
    )
    S = 32 * 32
    dec = DecoderConfig(
        in_features=512 + S, linear_sizes=(512, 4096), conv_in_shape=(256, 4, 4),
        channels=(128, 64, 32, 1), kernel_sizes=(4, 4, 4, 4), strides=(2, 2, 2, 2),
        paddings=(1, 1, 1, 1), output_paddings=(0, 0, 0, 0),
        num_residual_blocks=2, residual_intermediate_size=256, residual_input_size=256,
    )
    return MRSSMConfig(
        deterministic_size=512, hidden_size=512, obs_embed_size=512,
        class_size=32, category_size=32, action_size=6,
        init_proj_cells=512, input_noise_std=0.1,
        audio_encoder=enc, vision_encoder=enc, audio_decoder=dec, vision_decoder=dec,
        compute_dtype=jnp.bfloat16, conv_layout=conv_layout,
    )


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--conv-layout", choices=("auto", "nhwc", "s2d"), default="auto",
                    help="conv-stack layout (auto = the shipped width-resolved "
                         "default; resolves to nhwc at these widths — the "
                         "2026-08-20 A/B measured s2d 0.93x on this config)")
    args = ap.parse_args()
    model = MoPoEMRSSM(large_config(args.conv_layout))
    params = model.init(jax.random.PRNGKey(0))
    n_params = sum(p.size for p in jax.tree.leaves(params))
    opt = make_optimizer()
    opt_state = opt.init(params)
    from multimodal_mtrssm_tpu.utils.benchtools import (
        MIN_WARMUP_ITERS,
        best_window,
        synthetic_batch6,
    )

    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    batch = synthetic_batch6(jax.random.PRNGKey(1), B, T, hw=64)

    def step(p, st, key, i):
        k = jax.random.fold_in(key, i)
        loss, g = jax.value_and_grad(lambda q: model.shared_step(q, batch, k)["loss"])(p)
        u, st = opt.update(g, st, p)
        return jax.tree.map(lambda a, b: a + b, p, u), st, loss

    f = jax.jit(step, donate_argnums=(0, 1))
    # Analytic FLOPs from the compiled step (no donation: a second AOT
    # lowering, served by the compile cache) → MFU/roofline context
    # (VERDICT r2 item 7). v5e peak: 197 TFLOP/s bf16, 819 GB/s HBM.
    try:
        ca = jax.jit(step).lower(params, opt_state, ks[3], 0).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops_per_step = float(ca.get("flops", 0.0))
        bytes_per_step = float(ca.get("bytes accessed", 0.0))
    except Exception:
        flops_per_step = bytes_per_step = 0.0
    for i in range(MIN_WARMUP_ITERS):  # warmup >=30 iters (CLAUDE.md)
        params, opt_state, loss = f(params, opt_state, ks[3], i)
    float(loss)  # host-transfer fence (CLAUDE.md)
    times = []
    sn = 100
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(15):
            params, opt_state, loss = f(params, opt_state, ks[3], sn)
            sn += 1
        float(loss)  # host-transfer fence (CLAUDE.md)
        times.append((time.perf_counter() - t0) / 15)
    best = best_window(times)  # reject sub-0.25x-median anomaly windows
    V5E_PEAK_FLOPS = 197e12
    V5E_HBM_BPS = 819e9
    print(json.dumps({
        "metric": "mopoe_mrssm_large_train_seq_per_s",
        "value": round(B / best, 1),
        "unit": "seq/s",
        "params_m": round(n_params / 1e6, 1),
        "ms_per_step": round(best * 1e3, 2),
        "batch": B,
        "conv_layout": args.conv_layout,
        "resolved_layout": "s2d" if model._use_s2d else "nhwc",
        "gflop_per_step": round(flops_per_step / 1e9, 1),
        "mfu_pct": round(100.0 * flops_per_step / best / V5E_PEAK_FLOPS, 2),
        "nominal_bw_pct": round(100.0 * bytes_per_step / best / V5E_HBM_BPS, 1),
    }))


if __name__ == "__main__":
    main()
