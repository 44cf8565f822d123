"""Tests: reference-checkpoint importer (name-mapped nets + shape-matched convs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
from multimodal_mtrssm_tpu.train.torch_import import import_reference_state_dict


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
