"""Golden cross-framework test: MMTRSSM dual-KL ELBO vs torch.

MMTRSSM counterpart of test_torch_parity.py: syncs every weight into the
torch hierarchical reimplementation, replaces sampling with the expectation
in both frameworks, and asserts the full ELBO (recon + balanced KL on both
layers) agrees — pinning the MTRNN integrator math, the lower-layer fusion,
the [hd|ld] init split, and the dual-KL reduction.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))

from multimodal_mtrssm_tpu.models import MMTRSSMConfig, MoPoEMMTRSSM
from multimodal_mtrssm_tpu.ops.distributions import MultiOneHot
from torch_sync import (  # noqa: E402 — needs the benchmarks sys.path entry
    copy_decoder as _copy_decoder,
    copy_dense as _copy_dense,
    copy_encoder as _copy_encoder,
    copy_mlp as _copy_mlp,
)

B, T = 2, 30


def test_full_mmtrssm_elbo_matches_torch(monkeypatch):
    from torch_reference_bench import TorchMoPoEMMTRSSM

    model = MoPoEMMTRSSM(MMTRSSMConfig())
    params = model.init(jax.random.PRNGKey(0))

    tm = TorchMoPoEMMTRSSM()
    _copy_encoder(tm.audio_encoder, params["audio_encoder"])
    _copy_encoder(tm.vision_encoder, params["vision_encoder"])
    _copy_decoder(tm.audio_decoder, params["audio_decoder"])
    _copy_decoder(tm.vision_decoder, params["vision_decoder"])
    _copy_mlp(tm.l_prior, params["l_prior"])
    _copy_mlp(tm.h_prior, params["h_prior"])
    _copy_mlp(tm.h_posterior, params["h_posterior"])
    _copy_mlp(tm.audio_rep, params["audio_representation"])
    _copy_mlp(tm.vision_rep, params["vision_representation"])
    _copy_mlp(tm.init_proj, params["init_proj"])
    _copy_dense(tm.l_rnn.d2h, params["l_rnn"]["d2h"])
    _copy_dense(tm.l_rnn.in2h, params["l_rnn"]["input2h"])
    _copy_dense(tm.h_rnn.d2h, params["h_rnn"]["d2h"])
    _copy_dense(tm.h_rnn.in2h, params["h_rnn"]["input2h"])

    # Expectation-valued "sampling" in both frameworks.
    monkeypatch.setattr(MultiOneHot, "rsample", lambda self, key: self.probs())

    def torch_expectation(logits, classes, cats):
        b = logits.shape[:-1]
        probs = torch.softmax(logits.view(*b, classes, cats), dim=-1)
        return probs.reshape(*b, classes * cats)

    monkeypatch.setattr(TorchMoPoEMMTRSSM, "_rsample", staticmethod(torch_expectation))

    rng = np.random.default_rng(0)
    action = rng.normal(size=(B, T, 6)).astype(np.float32)
    audio = rng.uniform(-1, 1, (B, T, 32, 32, 1)).astype(np.float32)
    vision = rng.uniform(-1, 1, (B, T, 32, 32, 1)).astype(np.float32)

    batch_jax = (jnp.asarray(action), jnp.asarray(audio), jnp.asarray(vision),
                 jnp.asarray(action), jnp.asarray(audio), jnp.asarray(vision))
    loss_jax = model.shared_step(params, batch_jax, jax.random.PRNGKey(1))

    to_chw = lambda x: torch.tensor(x.transpose(0, 1, 4, 2, 3))  # noqa: E731
    batch_t = (torch.tensor(action), to_chw(audio), to_chw(vision),
               torch.tensor(action), to_chw(audio), to_chw(vision))
    with torch.no_grad():
        loss_t = tm(batch_t)

    np.testing.assert_allclose(float(loss_jax["loss"]), float(loss_t), rtol=1e-4)
