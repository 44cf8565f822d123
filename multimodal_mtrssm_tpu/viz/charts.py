"""Combined train/val metric charts from the JSONL log.

Replaces the reference's ``WandBMetricOrganizer`` (reference
``src/multimodal_rssm/models/callback.py:18-123``): it grouped loss/recon/kl
per train/val on an epoch axis and emitted combined ``wandb.plot.line_series``
charts. This build's sink is the local ``metrics.jsonl``; this module renders
the same combined charts (one PNG per metric group, train+val series on a
shared epoch axis) without requiring W&B.
"""

from __future__ import annotations

import json
from pathlib import Path

# Metric groups mirrored from the reference's define_metric calls
# (callback.py:38-64).
GROUPS = ("loss", "recon", "recon/audio", "recon/vision", "kl", "kl_h")


def load_metrics(metrics_path: str | Path) -> list[dict]:
    """Read a metrics.jsonl file into a list of row dicts."""
    rows = []
    with open(metrics_path) as fh:
        for line in fh:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def render_combined_charts(metrics_path: str | Path, out_dir: str | Path | None = None) -> list[Path]:
    """One PNG per metric group with train/ and val/ series."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    metrics_path = Path(metrics_path)
    out_dir = Path(out_dir) if out_dir is not None else metrics_path.parent / "charts"
    out_dir.mkdir(parents=True, exist_ok=True)
    rows = load_metrics(metrics_path)
    if not rows:
        return []
    epochs = [r.get("epoch", i) for i, r in enumerate(rows)]
    written = []
    for group in GROUPS:
        series = {}
        for prefix in ("train", "val"):
            key = f"{prefix}/{group}"
            vals = [(e, r[key]) for e, r in zip(epochs, rows) if key in r]
            if vals:
                series[prefix] = vals
        if not series:
            continue
        fig, ax = plt.subplots(figsize=(6, 4))
        for prefix, vals in series.items():
            xs, ys = zip(*vals)
            ax.plot(xs, ys, label=prefix)
        ax.set_xlabel("epoch")
        ax.set_ylabel(group)
        ax.set_title(f"{group} (train/val)")
        ax.legend()
        fig.tight_layout()
        path = out_dir / f"{group.replace('/', '_')}.png"
        fig.savefig(path, dpi=100)
        plt.close(fig)
        written.append(path)
    return written
