"""Copy JAX params into the architecture-faithful torch twin.

One home for the cross-framework weight sync used by both the single-step
golden test (tests/test_torch_parity.py) and the training-curve parity
harness (benchmarks/curve_parity.py). Layout conversions mirror
``train/torch_export.py``: dense [in,out]→[out,in], conv HWIO→OIHW, deconv
HWIO→IOHW, and the encoder head's input columns permuted from our
HWC-flatten order to torch's CHW-flatten order.
"""

from __future__ import annotations

import numpy as np
import torch


def _t(x) -> torch.Tensor:
    return torch.tensor(np.asarray(x))


def copy_dense(lin, p) -> None:
    with torch.no_grad():
        lin.weight.copy_(_t(p["w"]).T)
        lin.bias.copy_(_t(p["b"]))


def copy_mlp(seq, p) -> None:
    copy_dense(seq[0], p["layers"][0])
    copy_dense(seq[2], p["layers"][1])


def copy_conv(conv, p) -> None:
    with torch.no_grad():
        conv.weight.copy_(_t(np.asarray(p["w"]).transpose(3, 2, 0, 1)))  # HWIO→OIHW
        conv.bias.copy_(_t(p["b"]))


def copy_deconv(conv, p) -> None:
    with torch.no_grad():
        conv.weight.copy_(_t(np.asarray(p["w"]).transpose(2, 3, 0, 1)))  # HWIO→IOHW
        conv.bias.copy_(_t(p["b"]))


def hwc_to_chw_perm(h: int, w: int, c: int) -> np.ndarray:
    """Permutation mapping flatten(HWC) positions → flatten(CHW) positions."""
    idx = np.arange(h * w * c).reshape(h, w, c)
    return idx.transpose(2, 0, 1).reshape(-1)  # value at chw position = hwc index


def copy_encoder(enc_t, p) -> None:
    for conv_t, conv_p in zip(enc_t.convs, p["convs"]):
        copy_conv(conv_t, conv_p)
    copy_conv(enc_t.res_proj, p["res_proj"])
    for (c1, c2), blk in zip(enc_t.res, p["res_blocks"]):
        copy_conv(c1, blk["conv1"])
        copy_conv(c2, blk["conv2"])
    # Head: jax flattens HWC, torch flattens CHW → permute input columns.
    w = np.asarray(p["linears"][0]["w"])  # [1024(HWC), 64]
    perm = hwc_to_chw_perm(4, 4, 64)
    with torch.no_grad():
        enc_t.head.weight.copy_(_t(w[perm].T))
        enc_t.head.bias.copy_(_t(p["linears"][0]["b"]))


def copy_decoder(dec_t, p) -> None:
    copy_dense(dec_t.lin1, p["linears"][0])
    copy_dense(dec_t.lin2, p["linears"][1])
    for (c1, c2), blk in zip(dec_t.res, p["res_blocks"]):
        copy_conv(c1, blk["conv1"])
        copy_conv(c2, blk["conv2"])
    for deconv_t, deconv_p in zip(dec_t.deconvs, p["deconvs"]):
        copy_deconv(deconv_t, deconv_p)


def sync_mrssm(tm, params) -> None:
    """Copy every weight of a JAX MoPoE-MRSSM param dict into a
    ``TorchMoPoEMRSSM`` twin (benchmarks/torch_reference_bench.py)."""
    copy_encoder(tm.audio_encoder, params["audio_encoder"])
    copy_encoder(tm.vision_encoder, params["vision_encoder"])
    copy_decoder(tm.audio_decoder, params["audio_decoder"])
    copy_decoder(tm.vision_decoder, params["vision_decoder"])
    copy_mlp(tm.action_state_projector, params["transition"]["action_state_projector"])
    copy_mlp(tm.rnn_to_prior, params["transition"]["rnn_to_prior_projector"])
    copy_mlp(tm.audio_rep, params["audio_representation"])
    copy_mlp(tm.vision_rep, params["vision_representation"])
    copy_mlp(tm.init_proj, params["init_proj"])
    gru = params["transition"]["gru"]
    with torch.no_grad():
        tm.gru.weight_ih.copy_(_t(gru["w_ih"]).T)
        tm.gru.weight_hh.copy_(_t(gru["w_hh"]).T)
        tm.gru.bias_ih.copy_(_t(gru["b_ih"]))
        tm.gru.bias_hh.copy_(_t(gru["b_hh"]))


def sync_mmtrssm(tm, params) -> None:
    """Copy every weight of a JAX MoPoE-MMTRSSM param dict into a
    ``TorchMoPoEMMTRSSM`` twin — the same wiring the single-step golden
    test uses (tests/test_torch_parity_mmtrssm.py)."""
    copy_encoder(tm.audio_encoder, params["audio_encoder"])
    copy_encoder(tm.vision_encoder, params["vision_encoder"])
    copy_decoder(tm.audio_decoder, params["audio_decoder"])
    copy_decoder(tm.vision_decoder, params["vision_decoder"])
    copy_mlp(tm.l_prior, params["l_prior"])
    copy_mlp(tm.h_prior, params["h_prior"])
    copy_mlp(tm.h_posterior, params["h_posterior"])
    copy_mlp(tm.audio_rep, params["audio_representation"])
    copy_mlp(tm.vision_rep, params["vision_representation"])
    copy_mlp(tm.init_proj, params["init_proj"])
    copy_dense(tm.l_rnn.d2h, params["l_rnn"]["d2h"])
    copy_dense(tm.l_rnn.in2h, params["l_rnn"]["input2h"])
    copy_dense(tm.h_rnn.d2h, params["h_rnn"]["d2h"])
    copy_dense(tm.h_rnn.in2h, params["h_rnn"]["input2h"])
