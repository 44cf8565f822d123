"""Import reference (torch/Lightning) MoPoE-MRSSM checkpoints.

Reference checkpoints are Lightning ``.ckpt`` files whose ``state_dict``
keys follow the reference module tree (reference ``evaluate_word_
transitions_mrssm.py:794-796`` loads them the same way):

- ``transition.rnn_cell.{weight_ih,weight_hh,bias_ih,bias_hh}`` (GRUCell,
  reference ``networks.py:126-129``),
- torchrl ``MLP``s are Sequentials with Linears at even indices:
  ``transition.action_state_projector.{0,2}.{weight,bias}``,
  ``transition.rnn_to_prior_projector.{0,2}...``,
  ``{audio,vision}_representation.rnn_to_post_projector.{0,2}...``,
  ``init_proj.{0,2}...`` (reference ``networks.py:57-64,130-149``),
- ``{audio,vision}_{encoder,decoder}.*`` — internals of the pinned
  ``nomutin/CNN`` package, whose source is not in the snapshot; these are
  imported by SHAPE MATCHING: each reference tensor is assigned to the
  unique same-shape slot in our conv/linear stacks, in declaration order.
  Shape matching is exact for weights whose shapes are unique within a
  component; ambiguous or unmatched tensors are listed in the report and
  left at our initialization (fine-tune to recover).

Returns ``(params, report)`` — check ``report["missing"]`` /
``report["unmatched"]`` before trusting a zero-shot import.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from multimodal_mtrssm_tpu.nn.core import Params


def _t(x) -> np.ndarray:
    try:
        return np.asarray(x.detach().cpu().numpy(), dtype=np.float32)
    except AttributeError:
        return np.asarray(x, dtype=np.float32)


def _set_dense(target: Params, weight, bias) -> None:
    target["w"] = jnp.asarray(_t(weight).T)  # torch [out,in] → [in,out]
    target["b"] = jnp.asarray(_t(bias))


def _import_mlp(target_mlp: Params, sd: dict, prefix: str, report: dict) -> None:
    for i, layer in enumerate(target_mlp["layers"]):
        wk, bk = f"{prefix}.{2 * i}.weight", f"{prefix}.{2 * i}.bias"
        if wk in sd and bk in sd:
            _set_dense(layer, sd[wk], sd[bk])
            report["imported"] += 2
        else:
            report["missing"].append(wk)


def _conv_to_hwio(w: np.ndarray) -> np.ndarray:
    return w.transpose(2, 3, 1, 0)  # OIHW → HWIO


def _deconv_to_hwio(w: np.ndarray) -> np.ndarray:
    return w.transpose(2, 3, 0, 1)  # IOHW → HWIO


def _leaf_slots(tree, path=()):  # yields (path tuple, leaf dict with w/b)
    if isinstance(tree, dict) and "w" in tree and "b" in tree:
        yield path, tree
        return
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaf_slots(v, (*path, k))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _leaf_slots(v, (*path, i))


def _import_by_shape(component: Params, sd: dict, prefix: str, report: dict,
                     transposed_conv: bool = False) -> set[tuple]:
    """Assign reference tensors to same-shape slots, in declaration order.

    Returns the set of slot paths that were filled from the state dict.
    """
    ref_pairs = []  # (name, weight, bias)
    names = [k for k in sd if k.startswith(prefix + ".") and k.endswith(".weight")]
    for wk in names:
        bk = wk[: -len("weight")] + "bias"
        if bk in sd:
            ref_pairs.append((wk, _t(sd[wk]), _t(sd[bk])))
        else:
            # Bias-free layer (e.g. conv followed by a norm): this build's
            # layers all carry biases, so the tensor cannot be placed —
            # record it instead of dropping it silently (the report is the
            # documented trust contract for zero-shot imports).
            report["unmatched"].append(wk + " (no bias sibling; bias-free layer unsupported)")
    slots = list(_leaf_slots(component))
    used = set()
    matched_paths: set[tuple] = set()
    for wk, w, b in ref_pairs:
        candidates = []
        for idx, (path, slot) in enumerate(slots):
            if idx in used:
                continue
            sw = np.asarray(slot["w"])
            if w.ndim == 2 and sw.ndim == 2 and sw.shape == (w.shape[1], w.shape[0]):
                candidates.append((idx, "dense"))
            elif w.ndim == 4 and sw.ndim == 4:
                is_dec = transposed_conv and "deconv" in "/".join(map(str, path))
                conv = _deconv_to_hwio(w) if is_dec else _conv_to_hwio(w)
                if conv.shape == sw.shape:
                    candidates.append((idx, "deconv" if is_dec else "conv"))
        if not candidates:
            report["unmatched"].append(wk)
            continue
        idx, kind = candidates[0]  # declaration order on both sides
        used.add(idx)
        path, slot = slots[idx]
        if kind == "dense":
            slot["w"] = jnp.asarray(w.T)
        elif kind == "conv":
            slot["w"] = jnp.asarray(_conv_to_hwio(w))
        else:
            slot["w"] = jnp.asarray(_deconv_to_hwio(w))
        slot["b"] = jnp.asarray(b)
        matched_paths.add(path)
        report["imported"] += 2
        if len(candidates) > 1:
            report["ambiguous"].append(wk)
    return matched_paths


def _hwc_to_chw_perm(h: int, w: int, c: int) -> np.ndarray:
    """Permutation: value at flatten(CHW) position = flatten(HWC) index."""
    idx = np.arange(h * w * c).reshape(h, w, c)
    return idx.transpose(2, 0, 1).reshape(-1)


def _fix_encoder_head_layout(encoder: Params, matched: set[tuple]) -> None:
    """Permute the encoder head's input columns from torch CHW-flatten order
    to our HWC-flatten order.

    Torch encoders flatten conv output as ``x.flatten(1)`` on NCHW (channel-
    major); our ``encoder_apply`` flattens NHWC. A head weight imported by
    plain transpose would therefore read scrambled pixels — this reorders its
    input rows so the imported encoder computes the same function
    (counterpart of the jax→torch sync in ``tests/test_torch_parity.py``).
    """
    if ("linears", 0) not in matched:
        return  # head was not imported; leave our init untouched
    head = encoder["linears"][0]
    w = np.asarray(head["w"])  # [flat_in(currently CHW order), out]
    # Infer (h, w, c) of the conv output feeding the flatten: channels from
    # the last conv before the head, spatial from the remaining factor.
    if encoder.get("res_blocks"):
        c = np.asarray(encoder["res_blocks"][-1]["conv2"]["w"]).shape[-1]
    elif "res_proj" in encoder:
        c = np.asarray(encoder["res_proj"]["w"]).shape[-1]
    else:
        c = np.asarray(encoder["convs"][-1]["w"]).shape[-1]
    hw = w.shape[0] // c
    side = int(round(hw ** 0.5))
    if side * side != hw:
        return  # non-square conv output; cannot infer layout — skip
    perm = _hwc_to_chw_perm(side, side, c)
    fixed = np.empty_like(w)
    fixed[perm] = w  # jax row (HWC index) ← torch row (CHW position)
    head["w"] = jnp.asarray(fixed)


def import_reference_state_dict(params: Params, state_dict: dict[str, Any]) -> tuple[Params, dict]:
    """Import a reference MoPoE-MRSSM ``state_dict`` into a param tree.

    ``params`` is mutated-by-copy (returns a new tree with imported leaves);
    pass ``model.init(key)`` output for the template.
    """
    import copy

    params = copy.deepcopy(params)
    sd = state_dict
    report = {"imported": 0, "missing": [], "unmatched": [], "ambiguous": []}

    # GRU cell (torch layout → ours).
    gru = params["transition"]["gru"]
    for ours, theirs in (("w_ih", "weight_ih"), ("w_hh", "weight_hh")):
        k = f"transition.rnn_cell.{theirs}"
        if k in sd:
            gru[ours] = jnp.asarray(_t(sd[k]).T)
            report["imported"] += 1
        else:
            report["missing"].append(k)
    for ours, theirs in (("b_ih", "bias_ih"), ("b_hh", "bias_hh")):
        k = f"transition.rnn_cell.{theirs}"
        if k in sd:
            gru[ours] = jnp.asarray(_t(sd[k]))
            report["imported"] += 1
        else:
            report["missing"].append(k)

    # Named MLPs.
    _import_mlp(params["transition"]["action_state_projector"], sd,
                "transition.action_state_projector", report)
    _import_mlp(params["transition"]["rnn_to_prior_projector"], sd,
                "transition.rnn_to_prior_projector", report)
    _import_mlp(params["audio_representation"], sd,
                "audio_representation.rnn_to_post_projector", report)
    _import_mlp(params["vision_representation"], sd,
                "vision_representation.rnn_to_post_projector", report)
    _import_mlp(params["init_proj"], sd, "init_proj", report)

    # Encoders / decoders: shape-matched (cnn-package internals unknown).
    for comp in ("audio_encoder", "vision_encoder"):
        matched = _import_by_shape(params[comp], sd, comp, report)
        _fix_encoder_head_layout(params[comp], matched)
    for comp in ("audio_decoder", "vision_decoder"):
        _import_by_shape(params[comp], sd, comp, report, transposed_conv=True)

    return params, report


def import_reference_mmtrssm_state_dict(
    params: Params, state_dict: dict[str, Any]
) -> tuple[Params, dict]:
    """Import a reference MoPoE-MMTRSSM ``state_dict`` into a param tree.

    Reference module tree (reference ``mopoe_mmtrssm/core.py:165-194``):
    MTRNN cells store their linears as ``_d2h``/``_input2h``
    (``core.py:36-37``), priors/posteriors are torchrl MLP Sequentials,
    and two module groups are intentionally dropped:

    - ``transition.*`` — the vestigial dummy ``Transition`` built only to
      satisfy the base ctor (reference ``core.py:141-151``),
    - ``l_posterior.*`` — stored but never called (the lower posterior is
      the MoPoE fusion of the modality heads, reference ``core.py:420-455``).

    Both are recorded in ``report["skipped"]``. Pass
    ``MoPoEMMTRSSM(...).init(key)`` output as the template.
    """
    import copy

    params = copy.deepcopy(params)
    sd = state_dict
    report = {"imported": 0, "missing": [], "unmatched": [], "ambiguous": [], "skipped": []}

    report["skipped"] = sorted(
        k for k in sd if k.startswith(("transition.", "l_posterior."))
    )

    # MTRNN cells: torch Linear [out,in] → ours [in,out].
    for cell in ("l_rnn", "h_rnn"):
        for ours, theirs in (("d2h", "_d2h"), ("input2h", "_input2h")):
            wk, bk = f"{cell}.{theirs}.weight", f"{cell}.{theirs}.bias"
            if wk in sd and bk in sd:
                _set_dense(params[cell][ours], sd[wk], sd[bk])
                report["imported"] += 2
            else:
                report["missing"].append(wk)

    # Named MLPs.
    _import_mlp(params["l_prior"], sd, "l_prior", report)
    _import_mlp(params["h_prior"], sd, "h_prior", report)
    _import_mlp(params["h_posterior"], sd, "h_posterior", report)
    _import_mlp(params["audio_representation"], sd,
                "audio_representation.rnn_to_post_projector", report)
    _import_mlp(params["vision_representation"], sd,
                "vision_representation.rnn_to_post_projector", report)
    _import_mlp(params["init_proj"], sd, "init_proj", report)

    # Encoders / decoders: shape-matched (cnn-package internals unknown).
    for comp in ("audio_encoder", "vision_encoder"):
        matched = _import_by_shape(params[comp], sd, comp, report)
        _fix_encoder_head_layout(params[comp], matched)
    for comp in ("audio_decoder", "vision_decoder"):
        _import_by_shape(params[comp], sd, comp, report, transposed_conv=True)

    return params, report


def load_reference_checkpoint(
    params: Params, ckpt_path: str, model_type: str = "mrssm"
) -> tuple[Params, dict]:
    """Load a Lightning ``.ckpt`` file and import its ``state_dict``
    (reference consumption path ``evaluate_word_transitions_mrssm.py:794-796``
    / ``evaluate_word_transitions_mtmrssm.py`` equivalent).

    ``model_type``: ``"mrssm"`` (MoPoE-MRSSM) or ``"mmtrssm"`` (MoPoE-MMTRSSM).
    """
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    if model_type == "mmtrssm":
        return import_reference_mmtrssm_state_dict(params, sd)
    return import_reference_state_dict(params, sd)
