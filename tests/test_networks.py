"""Unit tests: nn toolkit (MLP, GRU, MTRNN, encoder/decoder)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_mtrssm_tpu.nn import (
    DecoderConfig,
    EncoderConfig,
    decoder_apply,
    decoder_init,
    encoder_apply,
    encoder_init,
    gru_apply,
    gru_init,
    mlp_apply,
    mlp_init,
    mtrnn_apply,
    mtrnn_init,
)


def test_mlp_shapes_and_depth():
    key = jax.random.PRNGKey(0)
    params = mlp_init(key, 10, 4, num_cells=32, depth=1)
    # depth=1 ⇒ two linear layers (torchrl MLP contract).
    assert len(params["layers"]) == 2
    x = jnp.ones((3, 10))
    y = mlp_apply(params, x, "ELU")
    assert y.shape == (3, 4)


def test_gru_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    key = jax.random.PRNGKey(1)
    in_dim, hid = 5, 7
    params = gru_init(key, in_dim, hid)
    cell = torch.nn.GRUCell(in_dim, hid)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.tensor(np.asarray(params["w_ih"]).T))
        cell.weight_hh.copy_(torch.tensor(np.asarray(params["w_hh"]).T))
        cell.bias_ih.copy_(torch.tensor(np.asarray(params["b_ih"])))
        cell.bias_hh.copy_(torch.tensor(np.asarray(params["b_hh"])))
    x = np.random.default_rng(0).normal(size=(4, in_dim)).astype(np.float32)
    h = np.random.default_rng(1).normal(size=(4, hid)).astype(np.float32)
    ours = gru_apply(params, jnp.asarray(x), jnp.asarray(h))
    theirs = cell(torch.tensor(x), torch.tensor(h)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_mtrnn_leaky_integrator():
    key = jax.random.PRNGKey(2)
    params = mtrnn_init(key, 3, 4)
    x = jnp.ones((2, 3))
    prev_d = jnp.zeros((2, 4))
    hidden = jnp.zeros((2, 4))
    d, new_hidden = mtrnn_apply(params, x, prev_d, hidden, tau=2.0)
    # With zero hidden and zero prev_d: hidden' = input2h(x)/tau.
    w, b = params["input2h"]["w"], params["input2h"]["b"]
    expected_hidden = (x @ w + b + params["d2h"]["b"]) / 2.0
    np.testing.assert_allclose(np.asarray(new_hidden), np.asarray(expected_hidden), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d), np.tanh(np.asarray(expected_hidden)), atol=1e-6)
    with pytest.raises(ValueError):
        mtrnn_apply(params, x, prev_d, hidden, tau=1.0)


def test_encoder_default_config_shapes():
    cfg = EncoderConfig()
    params = encoder_init(jax.random.PRNGKey(3), cfg)
    x = jnp.zeros((2, 5, 32, 32, 1))  # [B, T, H, W, C]
    y = encoder_apply(params, cfg, x)
    assert y.shape == (2, 5, 64)


def test_decoder_default_config_shapes():
    cfg = DecoderConfig(in_features=48)
    params = decoder_init(jax.random.PRNGKey(4), cfg)
    x = jnp.zeros((2, 5, 48))
    y = decoder_apply(params, cfg, x)
    assert y.shape == (2, 5, 32, 32, 1)
    # Tanh output range
    assert float(jnp.max(jnp.abs(y))) <= 1.0


def test_decoder_lazy_width_96():
    # Same conv config serves MMTRSSM's 96-wide features (reference
    # mopoe_mmtrssm/core.py:556-557).
    cfg = DecoderConfig(in_features=96)
    params = decoder_init(jax.random.PRNGKey(5), cfg)
    y = decoder_apply(params, cfg, jnp.zeros((1, 96)))
    assert y.shape == (1, 32, 32, 1)


def test_conv_transpose_shape_math():
    # torch ConvTranspose2d(k=4, s=2, p=1): 4 → 8 → 16 → 32.
    from multimodal_mtrssm_tpu.nn.conv import conv_init, conv_transpose_apply

    p = conv_init(jax.random.PRNGKey(6), 8, 8, 4)
    x = jnp.zeros((1, 4, 4, 8))
    for expect in (8, 16, 32):
        x = conv_transpose_apply(p, x, stride=2, padding=1)
        assert x.shape[1] == expect and x.shape[2] == expect


def test_deconv_init_uses_transposed_fan():
    """torch ConvTranspose2d computes its init fan from weight.size(1)·k² =
    OUT_ch·k² (the transposed layout), not in_ch·k²: the decoder's output
    layers must start at the reference's scale."""
    import numpy as np

    from multimodal_mtrssm_tpu.nn.conv import conv_init, deconv_init

    in_ch, out_ch, k = 64, 16, 4
    d = deconv_init(jax.random.PRNGKey(0), in_ch, out_ch, k)
    bound = 1.0 / np.sqrt(out_ch * k * k)
    w = np.asarray(d["w"])
    assert w.shape == (k, k, in_ch, out_ch)
    assert np.max(np.abs(w)) <= bound + 1e-7
    assert np.max(np.abs(w)) > 0.9 * bound  # actually fills the range
    # Distinct from the Conv2d fan (in_ch·k² would give a 2x smaller bound).
    c = np.asarray(conv_init(jax.random.PRNGKey(0), in_ch, out_ch, k)["w"])
    assert np.max(np.abs(c)) <= 1.0 / np.sqrt(in_ch * k * k) + 1e-7
