"""Golden cross-framework test: full MoPoE-MRSSM ELBO vs torch.

Syncs every weight from the JAX model into the architecture-faithful torch
reimplementation (benchmarks/torch_reference_bench.py), replaces categorical
sampling in BOTH frameworks with the distribution expectation (probs), and
asserts the end-to-end loss (recon + balanced KL over the full rollout)
agrees. This is the "ELBO parity" hard-part check from SURVEY §7: reduction
semantics, fusion math, KL balancing, GRU recurrence, conv stacks, and the
unnormalized-PoE quirk all have to line up for the totals to match.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))

from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
from multimodal_mtrssm_tpu.ops.distributions import MultiOneHot

B, T = 2, 30  # torch_reference_bench hard-codes T=30


from torch_sync import sync_mrssm  # noqa: E402 — needs the benchmarks sys.path entry


def test_full_elbo_matches_torch(monkeypatch):
    from torch_reference_bench import TorchMoPoEMRSSM

    # coord_conv input order must match the torch reimpl (input, yy, xx).
    model = MoPoEMRSSM(MRSSMConfig())
    params = model.init(jax.random.PRNGKey(0))

    tm = TorchMoPoEMRSSM()
    sync_mrssm(tm, params)

    # Replace sampling with the expectation in BOTH frameworks.
    monkeypatch.setattr(MultiOneHot, "rsample", lambda self, key: self.probs())

    def torch_expectation(logits):
        b = logits.shape[:-1]
        probs = torch.softmax(logits.view(*b, 4, 4), dim=-1)
        return probs.reshape(*b, 16)

    monkeypatch.setattr(TorchMoPoEMRSSM, "_rsample", staticmethod(torch_expectation))

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
