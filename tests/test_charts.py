"""Tests: combined metric charts from metrics.jsonl."""

import json

from multimodal_mtrssm_tpu.viz import load_metrics, render_combined_charts


def test_render_combined_charts(tmp_path):
    path = tmp_path / "metrics.jsonl"
    with open(path, "w") as fh:
        for e in range(5):
            fh.write(json.dumps({
                "epoch": e,
                "train/loss": 10.0 - e, "val/loss": 11.0 - e,
                "train/recon": 8.0 - e, "val/recon": 9.0 - e,
                "train/kl": 0.5, "val/kl": 0.6,
            }) + "\n")
    rows = load_metrics(path)
    assert len(rows) == 5
    written = render_combined_charts(path)
    names = {p.name for p in written}
    assert {"loss.png", "recon.png", "kl.png"} <= names
    for p in written:
        assert p.stat().st_size > 0
    # kl_h absent from rows → no chart for it
    assert "kl_h.png" not in names
