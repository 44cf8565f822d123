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


def _t(x):
    return torch.tensor(np.asarray(x))


def _copy_dense(lin, p):
    with torch.no_grad():
        lin.weight.copy_(_t(p["w"]).T)
        lin.bias.copy_(_t(p["b"]))


def _copy_mlp(seq, p):
    _copy_dense(seq[0], p["layers"][0])
    _copy_dense(seq[2], p["layers"][1])


def _copy_conv(conv, p):
    with torch.no_grad():
        conv.weight.copy_(_t(np.asarray(p["w"]).transpose(3, 2, 0, 1)))  # HWIO→OIHW
        conv.bias.copy_(_t(p["b"]))


def _copy_deconv(conv, p):
    with torch.no_grad():
        conv.weight.copy_(_t(np.asarray(p["w"]).transpose(2, 3, 0, 1)))  # HWIO→IOHW
        conv.bias.copy_(_t(p["b"]))


def _hwc_to_chw_perm(h, w, c):
    """Permutation mapping flatten(HWC) positions → flatten(CHW) positions."""
    idx = np.arange(h * w * c).reshape(h, w, c)
    return idx.transpose(2, 0, 1).reshape(-1)  # value at chw position = hwc index


def _copy_encoder(enc_t, p):
    for conv_t, conv_p in zip(enc_t.convs, p["convs"]):
        _copy_conv(conv_t, conv_p)
    _copy_conv(enc_t.res_proj, p["res_proj"])
    for (c1, c2), blk in zip(enc_t.res, p["res_blocks"]):
        _copy_conv(c1, blk["conv1"])
        _copy_conv(c2, blk["conv2"])
    # Head: jax flattens HWC, torch flattens CHW → permute input columns.
    w = np.asarray(p["linears"][0]["w"])  # [1024(HWC), 64]
    perm = _hwc_to_chw_perm(4, 4, 64)
    with torch.no_grad():
        enc_t.head.weight.copy_(_t(w[perm].T))
        enc_t.head.bias.copy_(_t(p["linears"][0]["b"]))


def _copy_decoder(dec_t, p):
    _copy_dense(dec_t.lin1, p["linears"][0])
    _copy_dense(dec_t.lin2, p["linears"][1])
    for (c1, c2), blk in zip(dec_t.res, p["res_blocks"]):
        _copy_conv(c1, blk["conv1"])
        _copy_conv(c2, blk["conv2"])
    for deconv_t, deconv_p in zip(dec_t.deconvs, p["deconvs"]):
        _copy_deconv(deconv_t, deconv_p)


def test_full_elbo_matches_torch(monkeypatch):
    from torch_reference_bench import TorchMoPoEMRSSM

    # coord_conv input order must match the torch reimpl (input, yy, xx).
    model = MoPoEMRSSM(MRSSMConfig())
    params = model.init(jax.random.PRNGKey(0))

    tm = TorchMoPoEMRSSM()
    _copy_encoder(tm.audio_encoder, params["audio_encoder"])
    _copy_encoder(tm.vision_encoder, params["vision_encoder"])
    _copy_decoder(tm.audio_decoder, params["audio_decoder"])
    _copy_decoder(tm.vision_decoder, params["vision_decoder"])
    _copy_mlp(tm.action_state_projector, params["transition"]["action_state_projector"])
    _copy_mlp(tm.rnn_to_prior, params["transition"]["rnn_to_prior_projector"])
    _copy_mlp(tm.audio_rep, params["audio_representation"])
    _copy_mlp(tm.vision_rep, params["vision_representation"])
    _copy_mlp(tm.init_proj, params["init_proj"])
    gru = params["transition"]["gru"]
    with torch.no_grad():
        tm.gru.weight_ih.copy_(_t(gru["w_ih"]).T)
        tm.gru.weight_hh.copy_(_t(gru["w_hh"]).T)
        tm.gru.bias_ih.copy_(_t(gru["b_ih"]))
        tm.gru.bias_hh.copy_(_t(gru["b_hh"]))

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
