"""Tests: reference-checkpoint importer (name-mapped nets + shape-matched convs).

The golden tests build a *real torch model* (the architecture-faithful
reimplementations from ``benchmarks/torch_reference_bench.py``, which flatten
conv outputs CHW exactly like the reference's cnn package), rename its
state_dict to the reference checkpoint key layout, import torch→jax, and
assert the imported jax model computes the same ELBO as the torch model —
end-to-end validation of every weight mapping including the CHW→HWC
encoder-head permutation.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))

from multimodal_mtrssm_tpu.models import (
    MMTRSSMConfig,
    MoPoEMMTRSSM,
    MoPoEMRSSM,
    MRSSMConfig,
)
from multimodal_mtrssm_tpu.ops.distributions import MultiOneHot
from multimodal_mtrssm_tpu.train.torch_import import (
    _hwc_to_chw_perm,
    import_reference_mmtrssm_state_dict,
    import_reference_state_dict,
)


def _reference_style_state_dict(params):
    """Build a state_dict with the reference's key layout whose tensors are
    the (torch-layout) counterparts of a given jax param tree."""
    sd = {}

    def dense(prefix, layer):
        sd[f"{prefix}.weight"] = torch.tensor(np.asarray(layer["w"]).T.copy())
        sd[f"{prefix}.bias"] = torch.tensor(np.asarray(layer["b"]).copy())

    def mlp(prefix, m):
        for i, layer in enumerate(m["layers"]):
            dense(f"{prefix}.{2 * i}", layer)

    gru = params["transition"]["gru"]
    sd["transition.rnn_cell.weight_ih"] = torch.tensor(np.asarray(gru["w_ih"]).T.copy())
    sd["transition.rnn_cell.weight_hh"] = torch.tensor(np.asarray(gru["w_hh"]).T.copy())
    sd["transition.rnn_cell.bias_ih"] = torch.tensor(np.asarray(gru["b_ih"]).copy())
    sd["transition.rnn_cell.bias_hh"] = torch.tensor(np.asarray(gru["b_hh"]).copy())
    mlp("transition.action_state_projector", params["transition"]["action_state_projector"])
    mlp("transition.rnn_to_prior_projector", params["transition"]["rnn_to_prior_projector"])
    mlp("audio_representation.rnn_to_post_projector", params["audio_representation"])
    mlp("vision_representation.rnn_to_post_projector", params["vision_representation"])
    mlp("init_proj", params["init_proj"])

    # Encoders/decoders with cnn-style anonymous keys, declaration order.
    def conv(prefix, p):  # HWIO → OIHW
        sd[f"{prefix}.weight"] = torch.tensor(np.asarray(p["w"]).transpose(3, 2, 0, 1).copy())
        sd[f"{prefix}.bias"] = torch.tensor(np.asarray(p["b"]).copy())

    def deconv(prefix, p):  # HWIO → IOHW
        sd[f"{prefix}.weight"] = torch.tensor(np.asarray(p["w"]).transpose(2, 3, 0, 1).copy())
        sd[f"{prefix}.bias"] = torch.tensor(np.asarray(p["b"]).copy())

    for comp in ("audio_encoder", "vision_encoder"):
        e = params[comp]
        i = 0
        for c in e["convs"]:
            conv(f"{comp}.convs.{i}", c)
            i += 1
        conv(f"{comp}.proj", e["res_proj"])
        for b in e["res_blocks"]:
            conv(f"{comp}.res.{i}.c1", b["conv1"])
            conv(f"{comp}.res.{i}.c2", b["conv2"])
            i += 1
        for j, lin in enumerate(e["linears"]):
            if j == 0:
                # Torch encoders flatten CHW; fabricate the head the way a
                # real checkpoint stores it (columns in CHW order).
                w = np.asarray(lin["w"])  # [1024(HWC), 64]
                perm = _hwc_to_chw_perm(4, 4, 64)
                sd[f"{comp}.head.{j}.weight"] = torch.tensor(w[perm].T.copy())
                sd[f"{comp}.head.{j}.bias"] = torch.tensor(np.asarray(lin["b"]).copy())
            else:
                dense(f"{comp}.head.{j}", lin)
    for comp in ("audio_decoder", "vision_decoder"):
        d = params[comp]
        for j, lin in enumerate(d["linears"]):
            dense(f"{comp}.lin.{j}", lin)
        for k, b in enumerate(d["res_blocks"]):
            conv(f"{comp}.res.{k}.c1", b["conv1"])
            conv(f"{comp}.res.{k}.c2", b["conv2"])
        for k, dc in enumerate(d["deconvs"]):
            deconv(f"{comp}.deconv.{k}", dc)
    return sd


def test_import_round_trips_full_model():
    model = MoPoEMRSSM(MRSSMConfig())
    src = model.init(jax.random.PRNGKey(0))
    sd = _reference_style_state_dict(src)
    fresh = model.init(jax.random.PRNGKey(42))  # different init
    imported, report = import_reference_state_dict(fresh, sd)
    assert not report["missing"], report["missing"]
    assert not report["unmatched"], report["unmatched"]
    # every leaf equals the source
    for a, b in zip(jax.tree.leaves(src), jax.tree.leaves(imported)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # and the imported model computes the same loss as the source
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    batch = (
        jax.random.normal(ks[0], (2, 4, 6)),
        jax.random.uniform(ks[1], (2, 4, 32, 32, 1), minval=-1, maxval=1),
        jax.random.uniform(ks[2], (2, 4, 32, 32, 1), minval=-1, maxval=1),
        jax.random.normal(ks[0], (2, 4, 6)),
        jax.random.uniform(ks[1], (2, 4, 32, 32, 1), minval=-1, maxval=1),
        jax.random.uniform(ks[2], (2, 4, 32, 32, 1), minval=-1, maxval=1),
    )
    l1 = float(model.shared_step(src, batch, jax.random.PRNGKey(2))["loss"])
    l2 = float(model.shared_step(imported, batch, jax.random.PRNGKey(2))["loss"])
    np.testing.assert_allclose(l1, l2, rtol=1e-6)


def test_import_reports_missing_and_unmatched():
    model = MoPoEMRSSM(MRSSMConfig())
    src = model.init(jax.random.PRNGKey(0))
    sd = _reference_style_state_dict(src)
    # drop a named net + add an alien-shaped encoder tensor
    del sd["init_proj.0.weight"]
    sd["audio_encoder.alien.weight"] = torch.zeros(7, 7, 5, 5)
    sd["audio_encoder.alien.bias"] = torch.zeros(7)
    fresh = model.init(jax.random.PRNGKey(42))
    _, report = import_reference_state_dict(fresh, sd)
    assert any("init_proj.0.weight" in m for m in report["missing"])
    assert any("alien" in u for u in report["unmatched"])


# ---------------------------------------------------------------------------
# Golden torch→jax import tests (real torch models, reference key layout)
# ---------------------------------------------------------------------------

B_G, T_G = 2, 30  # TorchMoPoEMRSSM.forward is compiled for T=30


def _rename(sd, mapping):
    """Rename torch-reimpl state_dict keys to the reference checkpoint layout."""
    out = {}
    for k, v in sd.items():
        for src, dst in mapping:
            if k.startswith(src):
                out[dst + k[len(src):]] = v
                break
        else:
            out[k] = v
    return out


def _golden_batches(rng):
    action = rng.normal(size=(B_G, T_G, 6)).astype(np.float32)
    audio = rng.uniform(-1, 1, (B_G, T_G, 32, 32, 1)).astype(np.float32)
    vision = rng.uniform(-1, 1, (B_G, T_G, 32, 32, 1)).astype(np.float32)
    batch_jax = (jnp.asarray(action), jnp.asarray(audio), jnp.asarray(vision),
                 jnp.asarray(action), jnp.asarray(audio), jnp.asarray(vision))
    to_chw = lambda x: torch.tensor(x.transpose(0, 1, 4, 2, 3))  # noqa: E731
    batch_t = (torch.tensor(action), to_chw(audio), to_chw(vision),
               torch.tensor(action), to_chw(audio), to_chw(vision))
    return batch_jax, batch_t


def test_golden_import_mrssm_elbo_matches_torch(monkeypatch):
    """torch weights → reference-layout sd → import → jax ELBO == torch ELBO."""
    from torch_reference_bench import TorchMoPoEMRSSM

    tm = TorchMoPoEMRSSM()
    sd = _rename(tm.state_dict(), [
        ("gru.", "transition.rnn_cell."),
        ("action_state_projector.", "transition.action_state_projector."),
        ("rnn_to_prior.", "transition.rnn_to_prior_projector."),
        ("audio_rep.", "audio_representation.rnn_to_post_projector."),
        ("vision_rep.", "vision_representation.rnn_to_post_projector."),
    ])
    model = MoPoEMRSSM(MRSSMConfig())
    imported, report = import_reference_state_dict(model.init(jax.random.PRNGKey(7)), sd)
    assert not report["missing"], report["missing"]
    assert not report["unmatched"], report["unmatched"]

    # Expectation-valued sampling on both sides (removes RNG from the compare).
    monkeypatch.setattr(MultiOneHot, "rsample", lambda self, key: self.probs())

    def torch_expectation(logits):
        b = logits.shape[:-1]
        probs = torch.softmax(logits.view(*b, 4, 4), dim=-1)
        return probs.reshape(*b, 16)

    monkeypatch.setattr(TorchMoPoEMRSSM, "_rsample", staticmethod(torch_expectation))

    batch_jax, batch_t = _golden_batches(np.random.default_rng(0))
    loss_jax = float(model.shared_step(imported, batch_jax, jax.random.PRNGKey(1))["loss"])
    with torch.no_grad():
        loss_t = float(tm(batch_t))
    np.testing.assert_allclose(loss_jax, loss_t, rtol=1e-4)


def test_golden_import_mmtrssm_elbo_matches_torch(monkeypatch):
    """MMTRSSM variant: validates MTRNN _d2h/_input2h, l/h prior + h_posterior
    heads, init_proj split, and that dummy transition/l_posterior are skipped."""
    from torch_reference_bench import TorchMoPoEMMTRSSM

    tm = TorchMoPoEMMTRSSM()
    sd = _rename(tm.state_dict(), [
        ("l_rnn.d2h.", "l_rnn._d2h."),
        ("l_rnn.in2h.", "l_rnn._input2h."),
        ("h_rnn.d2h.", "h_rnn._d2h."),
        ("h_rnn.in2h.", "h_rnn._input2h."),
        ("audio_rep.", "audio_representation.rnn_to_post_projector."),
        ("vision_rep.", "vision_representation.rnn_to_post_projector."),
    ])
    # Reference checkpoints also carry the dummy Transition and the dead
    # l_posterior (reference core.py:141-151 and the stored-but-never-called
    # l_posterior) — the importer must skip them, not mis-assign them.
    sd["transition.rnn_cell.weight_ih"] = torch.zeros(96, 32)
    sd["transition.rnn_cell.bias_ih"] = torch.zeros(96)
    sd["l_posterior.0.weight"] = torch.zeros(32, 96)
    sd["l_posterior.0.bias"] = torch.zeros(32)

    model = MoPoEMMTRSSM(MMTRSSMConfig())
    imported, report = import_reference_mmtrssm_state_dict(
        model.init(jax.random.PRNGKey(7)), sd
    )
    assert not report["missing"], report["missing"]
    assert not report["unmatched"], report["unmatched"]
    assert any(k.startswith("transition.") for k in report["skipped"])
    assert any(k.startswith("l_posterior.") for k in report["skipped"])

    monkeypatch.setattr(MultiOneHot, "rsample", lambda self, key: self.probs())

    def torch_expectation(logits, classes, cats):
        b = logits.shape[:-1]
        probs = torch.softmax(logits.view(*b, classes, cats), dim=-1)
        return probs.reshape(*b, classes * cats)

    monkeypatch.setattr(TorchMoPoEMMTRSSM, "_rsample", staticmethod(torch_expectation))

    batch_jax, batch_t = _golden_batches(np.random.default_rng(1))
    loss_jax = float(model.shared_step(imported, batch_jax, jax.random.PRNGKey(1))["loss"])
    with torch.no_grad():
        loss_t = float(tm(batch_t))
    np.testing.assert_allclose(loss_jax, loss_t, rtol=1e-4)
