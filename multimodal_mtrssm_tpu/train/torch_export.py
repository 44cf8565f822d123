"""Export trained params as a reference-shaped torch/Lightning checkpoint.

The inverse of ``train/torch_import.py``: models trained in this framework
can be handed back to reference-side tooling (or re-imported here — the
round trip is exact, ``tests/test_torch_export.py``).

Key naming follows the reference module tree where the reference defines it
(reference ``evaluation/evaluate_word_transitions_mrssm.py:794-796`` load
path; GRU cell ``networks.py:126-129``; torchrl MLP Sequentials with
Linears at even indices ``networks.py:57-64,130-149``; MTRNN ``_d2h``/
``_input2h`` ``mopoe_mmtrssm/core.py:36-37``). Encoder/decoder internals
belong to the pinned ``nomutin/CNN`` package whose source is not in the
snapshot, so their tensors are exported under this framework's slot paths
(``audio_encoder.convs.0.weight`` …) in declaration order — exactly the
layout ``torch_import``'s shape matcher consumes.

Layout conversions are the exact inverses of the importer's: dense
[in,out]→[out,in], conv HWIO→OIHW, deconv HWIO→IOHW, and the encoder head's
input rows are permuted back from our HWC-flatten order to torch's
CHW-flatten order.
"""

from __future__ import annotations

import numpy as np

from multimodal_mtrssm_tpu.nn.core import Params
from multimodal_mtrssm_tpu.train.torch_import import _hwc_to_chw_perm, _leaf_slots

StateDict = dict[str, np.ndarray]


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _export_dense(sd: StateDict, prefix: str, leaf: Params) -> None:
    sd[f"{prefix}.weight"] = _np(leaf["w"]).T  # [in,out] → torch [out,in]
    sd[f"{prefix}.bias"] = _np(leaf["b"])


def _export_mlp(sd: StateDict, prefix: str, mlp: Params) -> None:
    """torchrl MLP = Sequential(Linear, act, Linear, …): Linears at 2i."""
    for i, layer in enumerate(mlp["layers"]):
        _export_dense(sd, f"{prefix}.{2 * i}", layer)


def _encoder_head_to_chw(encoder: Params, w: np.ndarray) -> np.ndarray:
    """Permute the encoder head's input rows HWC-flatten → CHW-flatten
    (inverse of ``torch_import._fix_encoder_head_layout``)."""
    if encoder.get("res_blocks"):
        c = _np(encoder["res_blocks"][-1]["conv2"]["w"]).shape[-1]
    elif "res_proj" in encoder:
        c = _np(encoder["res_proj"]["w"]).shape[-1]
    else:
        c = _np(encoder["convs"][-1]["w"]).shape[-1]
    hw = w.shape[0] // c
    side = int(round(hw ** 0.5))
    if side * side != hw:
        return w  # non-square conv output; leave as-is (import skips too)
    return w[_hwc_to_chw_perm(side, side, c)]


def _export_conv_component(sd: StateDict, prefix: str, component: Params,
                           encoder_head: bool = False) -> None:
    """Export a conv stack under its slot paths, in ``_leaf_slots`` order
    (the declaration order the importer's shape matcher walks)."""
    for path, leaf in _leaf_slots(component):
        name = f"{prefix}." + ".".join(map(str, path))
        w = _np(leaf["w"])
        if w.ndim == 4:
            if "deconv" in "/".join(map(str, path)):
                sd[f"{name}.weight"] = w.transpose(2, 3, 0, 1)  # HWIO → IOHW
            else:
                sd[f"{name}.weight"] = w.transpose(3, 2, 0, 1)  # HWIO → OIHW
        else:
            if encoder_head and path == ("linears", 0):
                w = _encoder_head_to_chw(component, w)
            sd[f"{name}.weight"] = w.T
        sd[f"{name}.bias"] = _np(leaf["b"])


def _export_convs(sd: StateDict, params: Params) -> None:
    for comp in ("audio_encoder", "vision_encoder"):
        _export_conv_component(sd, comp, params[comp], encoder_head=True)
    for comp in ("audio_decoder", "vision_decoder"):
        _export_conv_component(sd, comp, params[comp])


def export_reference_state_dict(params: Params) -> StateDict:
    """MoPoE-MRSSM params → reference-shaped state_dict (numpy values)."""
    sd: StateDict = {}
    gru = params["transition"]["gru"]
    sd["transition.rnn_cell.weight_ih"] = _np(gru["w_ih"]).T
    sd["transition.rnn_cell.weight_hh"] = _np(gru["w_hh"]).T
    sd["transition.rnn_cell.bias_ih"] = _np(gru["b_ih"])
    sd["transition.rnn_cell.bias_hh"] = _np(gru["b_hh"])
    _export_mlp(sd, "transition.action_state_projector",
                params["transition"]["action_state_projector"])
    _export_mlp(sd, "transition.rnn_to_prior_projector",
                params["transition"]["rnn_to_prior_projector"])
    _export_mlp(sd, "audio_representation.rnn_to_post_projector",
                params["audio_representation"])
    _export_mlp(sd, "vision_representation.rnn_to_post_projector",
                params["vision_representation"])
    _export_mlp(sd, "init_proj", params["init_proj"])
    _export_convs(sd, params)
    return sd


def export_reference_mmtrssm_state_dict(params: Params) -> StateDict:
    """MoPoE-MMTRSSM params → reference-shaped state_dict.

    The reference's vestigial dummy ``transition.*`` and dead
    ``l_posterior.*`` modules (never allocated here) are simply absent —
    the reference load path tolerates that only with ``strict=False``;
    ``torch_import`` ignores them symmetrically.
    """
    sd: StateDict = {}
    for cell in ("l_rnn", "h_rnn"):
        _export_dense(sd, f"{cell}._d2h", params[cell]["d2h"])
        _export_dense(sd, f"{cell}._input2h", params[cell]["input2h"])
    _export_mlp(sd, "l_prior", params["l_prior"])
    _export_mlp(sd, "h_prior", params["h_prior"])
    _export_mlp(sd, "h_posterior", params["h_posterior"])
    _export_mlp(sd, "audio_representation.rnn_to_post_projector",
                params["audio_representation"])
    _export_mlp(sd, "vision_representation.rnn_to_post_projector",
                params["vision_representation"])
    _export_mlp(sd, "init_proj", params["init_proj"])
    _export_convs(sd, params)
    return sd


def save_lightning_checkpoint(params: Params, path: str, model_type: str = "mrssm") -> dict:
    """Write a Lightning-style ``.ckpt`` (``{"state_dict": {...tensors}}``)
    loadable by ``torch.load`` and by ``torch_import.load_reference_checkpoint``.

    Returns a small manifest (key count, total params) for logging.
    """
    import torch

    sd = (export_reference_mmtrssm_state_dict(params) if model_type == "mmtrssm"
          else export_reference_state_dict(params))
    torch.save({"state_dict": {k: torch.from_numpy(v.copy()) for k, v in sd.items()}}, path)
    return {"keys": len(sd), "n_params": int(sum(v.size for v in sd.values()))}
