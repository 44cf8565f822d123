"""Tests: torch checkpoint export is the exact inverse of the importer."""

import jax
import numpy as np

from multimodal_mtrssm_tpu.models import (
    MMTRSSMConfig,
    MoPoEMMTRSSM,
    MoPoEMRSSM,
    MRSSMConfig,
)
from multimodal_mtrssm_tpu.train.torch_export import (
    export_reference_mmtrssm_state_dict,
    export_reference_state_dict,
    save_lightning_checkpoint,
)
from multimodal_mtrssm_tpu.train.torch_import import (
    import_reference_mmtrssm_state_dict,
    import_reference_state_dict,
)


def _assert_trees_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_mrssm_export_import_roundtrip():
    """export(params) → import into a DIFFERENT init must reproduce params
    exactly (dense/conv/deconv transposes and the encoder-head CHW
    permutation are involutive)."""
    model = MoPoEMRSSM(MRSSMConfig())
    params = model.init(jax.random.PRNGKey(0))
    sd = export_reference_state_dict(params)
    template = model.init(jax.random.PRNGKey(1))
    restored, report = import_reference_state_dict(template, sd)
    assert not report["missing"] and not report["unmatched"], report
    _assert_trees_equal(params, restored)


def test_mmtrssm_export_import_roundtrip():
    model = MoPoEMMTRSSM(MMTRSSMConfig())
    params = model.init(jax.random.PRNGKey(0))
    sd = export_reference_mmtrssm_state_dict(params)
    template = model.init(jax.random.PRNGKey(1))
    restored, report = import_reference_mmtrssm_state_dict(template, sd)
    assert not report["missing"] and not report["unmatched"], report
    _assert_trees_equal(params, restored)


def test_lightning_ckpt_file_roundtrip(tmp_path):
    """save_lightning_checkpoint writes a torch-loadable .ckpt that
    load_reference_checkpoint restores exactly."""
    import torch

    from multimodal_mtrssm_tpu.train.torch_import import load_reference_checkpoint

    model = MoPoEMRSSM(MRSSMConfig())
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "exported.ckpt")
    manifest = save_lightning_checkpoint(params, path, "mrssm")
    assert manifest["keys"] > 0

    raw = torch.load(path, map_location="cpu", weights_only=False)
    assert "state_dict" in raw and all(
        isinstance(v, torch.Tensor) for v in raw["state_dict"].values()
    )
    restored, report = load_reference_checkpoint(model.init(jax.random.PRNGKey(1)), path)
    assert not report["missing"] and not report["unmatched"], report
    _assert_trees_equal(params, restored)
