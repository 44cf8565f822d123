"""Cross-modal (missing-modality) inference experiment, end-to-end.

Trains TWO MoPoE-MRSSM variants per seed on the same synthetic labeled
Audio-MNIST data (decisive learning-demo protocol, BASELINE.md):

- **standard** — ``configs/mopoe_mrssm.yaml`` (both modalities observed);
- **crossmodal** — ``configs/mopoe_mrssm_crossmodal.yaml`` (audio inputs
  ZeroOut-dropped at train time; targets stay clean, so the ELBO trains
  audio reconstruction THROUGH the vision-conditioned posterior).

Then evaluates each under three conditioning conditions (``condition`` in
``evaluate_word_transitions``): both / vision-only (audio zeroed at eval) /
audio-only (vision zeroed), plus a missing-modality reconstruction report
(``evaluation.crossmodal.reconstruction_report``) and the missing-modality
GIF the reference's viz is designed for (reference
``mrssm/callback.py:122-125``).

This is the measured counterpart of the MoPoE robustness claim: the
reference has the viz hook but no runnable transform or evaluation
(SURVEY §7); here both exist and the numbers land in --workdir/summary.json.

Usage: python scripts/crossmodal_e2e.py --workdir /tmp/crossmodal \
           --epochs 100 --seeds 3
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

VARIANTS = ("standard", "crossmodal", "random")
CONFIGS = {
    "standard": "mopoe_mrssm.yaml",
    "crossmodal": "mopoe_mrssm_crossmodal.yaml",
    # "random": standard config + per-sample modality dropout
    # (drop_modality="random") — ONE model robust to either direction.
    "random": "mopoe_mrssm.yaml",
}


def train_variant(args, work: Path, seed: int, variant: str, train_dir: Path):
    """Train one variant; returns (model, best_params)."""
    from multimodal_mtrssm_tpu.data import EpisodeDataModule
    from multimodal_mtrssm_tpu.train.config import load_experiment
    from multimodal_mtrssm_tpu.train.trainer import Trainer

    exp = load_experiment(REPO_ROOT / "configs" / CONFIGS[variant])
    exp.trainer.max_epochs = args.epochs
    exp.trainer.seed = seed
    exp.trainer.log_dir = str(work / f"run_{variant}")
    exp.data.data_dir = train_dir
    exp.data.device_resident = True
    if variant == "random":
        exp.data.drop_modality = "random"
    if hasattr(exp.model.cfg, "use_pallas_train"):
        # Short runs: the fused kernel's Mosaic compile costs minutes for a
        # ~0.2 ms/step win — net loss at demo scale (same as demo_e2e.py).
        exp.model = type(exp.model)(
            dataclasses.replace(exp.model.cfg, use_pallas_train=False)
        )
    dm = EpisodeDataModule(exp.data)
    trainer = Trainer(exp.model, dm, exp.trainer)
    out = trainer.fit()
    first, last = out["history"][0], out["history"][-1]
    print(f"[seed {seed}][{variant}] train/loss {first['train/loss']:.1f} -> "
          f"{last['train/loss']:.1f}; val/loss {first['val/loss']:.1f} -> "
          f"{last['val/loss']:.1f}", flush=True)
    return exp.model, trainer.load_best_params(out["params"])


def run_seed(args, work: Path, seed: int) -> dict:
    """One seed: shared data + classifier, both variants, all conditions."""
    import jax
    import numpy as np

    from multimodal_mtrssm_tpu.data import generate_synthetic_labeled_audio_mnist
    from multimodal_mtrssm_tpu.evaluation import (
        evaluate_word_transitions,
        load_test_data_with_labels,
        reconstruction_report,
        train_classifier,
        write_results,
    )
    from multimodal_mtrssm_tpu.evaluation.crossmodal import build_normalized_batch
    from multimodal_mtrssm_tpu.viz.rollout import log_rollout_gifs

    train_dir, eval_dir = work / "episodes", work / "eval_npz"
    print(f"[seed {seed}] generating synthetic labeled dataset ...", flush=True)
    generate_synthetic_labeled_audio_mnist(
        train_dir, eval_dir, n_episodes=args.episodes,
        frames_per_word=args.frames_per_word, seed=seed,
        n_successors=args.n_successors,
    )
    test_data = load_test_data_with_labels(eval_dir)
    imgs, labels = [], []
    for d in test_data:
        for t in range(0, d["image"].shape[0], 3):
            if int(d["label"][t]) >= 0:
                imgs.append(d["image"][t, 0] / 255.0)
                labels.append(int(d["label"][t]))
    clf = train_classifier(
        np.asarray(imgs, np.float32)[..., None], np.asarray(labels, np.int32),
        num_epochs=3,
    )

    seed_out: dict = {"seed": seed, "variants": {}}
    for variant in (args.variants.split(",") if args.variants else VARIANTS):
        model, params = train_variant(args, work, seed, variant, train_dir)
        v: dict = {"mr": {}, "recon": None}
        for condition in ("both", "vision", "audio"):
            results = evaluate_word_transitions(
                model, params, clf, test_data,
                n_intervals=6, query_length=args.query_length,
                n_predictions=args.n_predictions, n_frames=10,
                classify_frame=args.classify_frame, seed=seed,
                condition=condition,
            )
            write_results(results, work / f"results_{variant}",
                          name=f"word_transitions_{condition}")
            s = results["summary"]
            v["mr"][condition] = s["mean_matching_rate"]
            print(f"[seed {seed}][{variant}] condition={condition}: "
                  f"mean MR = {s['mean_matching_rate']:.3f} "
                  f"(uniform {s['mean_uniform']:.3f})", flush=True)
            v["uniform"] = s["mean_uniform"]
        v["recon"] = reconstruction_report(model, params, test_data, seed=seed)
        (work / f"results_{variant}" / "crossmodal_recon.json").write_text(
            json.dumps(v["recon"], indent=2))
        da = v["recon"]["conditions"]["drop_audio"]["posterior/audio"]
        both = v["recon"]["conditions"]["both"]["posterior/audio"]
        base = v["recon"]["baselines"]["mean_frame/audio"]
        print(f"[seed {seed}][{variant}] audio recon MSE: both={both:.4f} "
              f"vision-only={da:.4f} mean-frame-baseline={base:.4f}", flush=True)
        # Missing-modality GIF: audio input stream ZeroOut-dropped — the viz
        # labels the all-(-1) obs row "(missing)".
        gif_batch = build_normalized_batch(test_data, n_episodes=3, T=30, drop="audio")
        paths = log_rollout_gifs(
            model, params, gif_batch, work / f"results_{variant}",
            query_length=15, fps=10.0, key=jax.random.PRNGKey(seed), indices=(0,),
        )
        print(f"[seed {seed}][{variant}] missing-modality GIF: {paths[0]}", flush=True)
        seed_out["variants"][variant] = v
    return seed_out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--episodes", type=int, default=96)
    ap.add_argument("--frames-per-word", type=int, default=1)
    ap.add_argument("--query-length", type=int, default=1)
    ap.add_argument("--classify-frame", type=int, default=1)
    ap.add_argument("--n-successors", type=int, default=2)
    ap.add_argument("--n-predictions", type=int, default=10)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--variants", default=None,
                    help="comma-separated subset of standard,crossmodal,random "
                         "(default: all)")
    ap.add_argument("--seed-start", type=int, default=0)
    ap.add_argument("--platform", choices=("default", "cpu"), default="default")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    work = Path(args.workdir)
    per_seed = []
    for seed in range(args.seed_start, args.seed_start + args.seeds):
        per_seed.append(run_seed(args, work / f"seed{seed}", seed))

    summary: dict = {
        "protocol": {k: getattr(args, k) for k in
                     ("epochs", "episodes", "frames_per_word", "query_length",
                      "classify_frame", "n_successors", "n_predictions", "seeds")},
        "per_seed": per_seed,
        "aggregate": {},
    }
    for variant in (args.variants.split(",") if args.variants else VARIANTS):
        agg: dict = {}
        for condition in ("both", "vision", "audio"):
            mrs = [s["variants"][variant]["mr"][condition] for s in per_seed]
            agg[f"mr_{condition}"] = {"mean": float(np.mean(mrs)),
                                      "std": float(np.std(mrs)),
                                      "per_seed": mrs}
        for cell in ("both", "drop_audio", "drop_vision"):
            for mod in ("audio", "vision"):
                vals = [s["variants"][variant]["recon"]["conditions"][cell][f"posterior/{mod}"]
                        for s in per_seed]
                agg[f"recon_{cell}_{mod}"] = float(np.mean(vals))
        summary["aggregate"][variant] = agg
    # Range-named file for extension runs (seed_start != 0) so an
    # extension cannot clobber the original full-sweep summary (same
    # protection as demo_e2e.py).
    name = ("summary.json" if args.seed_start == 0 else
            f"summary_seeds{args.seed_start}-{args.seed_start + args.seeds - 1}.json")
    (work / name).write_text(json.dumps(summary, indent=2))
    for variant in (args.variants.split(",") if args.variants else VARIANTS):
        a = summary["aggregate"][variant]
        print(f"\n== {variant} ({args.seeds} seeds) ==", flush=True)
        for condition in ("both", "vision", "audio"):
            m = a[f"mr_{condition}"]
            print(f"  MR[{condition:6s}] = {m['mean']:.3f} ± {m['std']:.3f} "
                  f"{[round(x, 3) for x in m['per_seed']]}", flush=True)
        print(f"  audio recon MSE: both={a['recon_both_audio']:.4f} "
              f"vision-only={a['recon_drop_audio_audio']:.4f}", flush=True)
        print(f"  vision recon MSE: both={a['recon_both_vision']:.4f} "
              f"audio-only={a['recon_drop_vision_vision']:.4f}", flush=True)


if __name__ == "__main__":
    main()
