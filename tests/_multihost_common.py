"""Shared problem construction for the 2-process multi-host test.

Deterministic: the subprocess workers and the in-process single-run both
build EXACTLY this model/batch, so losses are comparable across runs."""

from __future__ import annotations

import jax
import numpy as np

from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
from multimodal_mtrssm_tpu.nn.conv import EncoderConfig
from multimodal_mtrssm_tpu.train.optim import make_optimizer

B, T = 16, 4


def build_problem():
    enc = EncoderConfig(channels=(4, 8), kernel_sizes=(3, 3), strides=(2, 2),
                        paddings=(1, 1), num_residual_blocks=0, coord_conv=False,
                        linear_sizes=(64,))
    model = MoPoEMRSSM(MRSSMConfig(audio_encoder=enc, vision_encoder=enc, init_proj_cells=16))
    params = model.init(jax.random.PRNGKey(0))
    opt = make_optimizer(1e-3)
    rng = np.random.default_rng(7)
    act = rng.normal(size=(B, T, 6)).astype(np.float32)
    audio = rng.uniform(-1, 1, size=(B, T, 32, 32, 1)).astype(np.float32)
    vision = rng.uniform(-1, 1, size=(B, T, 32, 32, 1)).astype(np.float32)
    batch = (act, audio, vision, act, audio, vision)
    return model, params, opt, batch, jax.random.PRNGKey(3)
