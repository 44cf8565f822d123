"""Full-pipeline demo on synthetic labeled Audio-MNIST: train → eval → report.

Offline stand-in for the reference's end-to-end flow (gdrive dataset →
train-mopoe-mrssm → evaluate_word_transitions): generates labeled synthetic
episodes, trains the model, trains the digit classifier on the same frame
distribution, runs the word-transition Matching-Rate evaluation, and writes
markdown/JSON results + metric charts + rollout GIFs under --workdir.

The DECISIVE configuration (BASELINE.md "learning demonstration"):
``--frames-per-word 1 --query-length 1 --classify-frame 1 --seeds 3``.
Why: with 1-frame words every training transition is a word transition, a
query of length 1 conditions the initial state on exactly the context word
wa, and frame 2 of the imagination is the one-word-ahead prediction — the
quantity p(w|wa) describes. (``--classify-frame 0`` is exact reference
parity, but the first imagined frame RE-PREDICTS the conditioning frame
under the reference's same-frame training alignment — measured in
scripts/probe_transitions.py: 68% self / 11% successors at frame 1 vs
14% / 52% at frame 2 — so the reference protocol scores near chance by
construction.)

Usage: python scripts/demo_e2e.py --workdir /tmp/demo --epochs 40
       [--model mrssm|mmtrssm] [--seeds 3] [--classify-frame 1]
       [--query-length 1]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def run_once(args, work: Path, seed: int) -> dict:
    """Generate data, train, evaluate; returns the results dict."""
    import numpy as np

    from multimodal_mtrssm_tpu.data import (
        EpisodeDataModule,
        generate_synthetic_labeled_audio_mnist,
    )
    from multimodal_mtrssm_tpu.evaluation import (
        evaluate_word_transitions,
        load_test_data_with_labels,
        recognize_digits,
        save_classifier,
        train_classifier,
        write_results,
    )
    from multimodal_mtrssm_tpu.train.config import load_experiment
    from multimodal_mtrssm_tpu.train.trainer import Trainer
    from multimodal_mtrssm_tpu.viz.callback import make_viz_callback

    train_dir, eval_dir = work / "episodes", work / "eval_npz"
    print(f"[seed {seed}] generating synthetic labeled dataset ...", flush=True)
    generate_synthetic_labeled_audio_mnist(
        train_dir, eval_dir, n_episodes=args.episodes,
        frames_per_word=args.frames_per_word, seed=seed,
        n_successors=args.n_successors,
    )

    cfg_path = REPO_ROOT / "configs" / f"mopoe_{args.model}.yaml"
    exp = load_experiment(cfg_path)
    exp.trainer.max_epochs = args.epochs
    exp.trainer.seed = seed
    exp.trainer.log_dir = str(work / "run")
    exp.data.data_dir = train_dir
    if args.seq_len is not None:
        # Full-length training (no TakeFirstN truncation — the reference
        # clips every stream to 30 of the dataset's 180 frames,
        # configs/default.yaml:180-220). remat trades recompute for
        # activation memory on the long scan (tests/test_long_sequence.py).
        import dataclasses as _dc

        exp.data.sequence_length = args.seq_len
        if args.seq_len > 60 and hasattr(exp.model.cfg, "remat"):
            exp.model = type(exp.model)(_dc.replace(exp.model.cfg, remat=True))
    if args.set_model:
        import dataclasses as _dc

        over = {}
        for item in args.set_model:
            field, _, raw = item.partition("=")
            cur = getattr(exp.model.cfg, field)  # AttributeError on a typo
            over[field] = type(cur)(raw) if not isinstance(cur, bool) else raw in ("1", "true", "True")
        exp.model = type(exp.model)(_dc.replace(exp.model.cfg, **over))
        print(f"[seed {seed}] model overrides: {over}", flush=True)
    # Device-resident dataset: the YAML demo configs serve noise-free host
    # batches (noise is on-device via input_noise_std), so this path is
    # BIT-equal to host streaming (tests/test_trainer.py equivalence) while
    # skipping the host chunk-assembly cost every epoch.
    exp.data.device_resident = not args.no_device_resident
    # Short demo runs: skip the fused training kernel (minutes of Mosaic
    # compile for a ~0.2 ms/step win — net loss at this scale).
    import dataclasses

    if hasattr(exp.model.cfg, "use_pallas_train"):
        exp.model = type(exp.model)(
            dataclasses.replace(exp.model.cfg, use_pallas_train=False)
        )

    dm = EpisodeDataModule(exp.data)
    trainer = Trainer(exp.model, dm, exp.trainer, callbacks=[make_viz_callback(exp)])
    out = trainer.fit()
    first, last = out["history"][0], out["history"][-1]
    print(f"[seed {seed}] train/loss: {first['train/loss']:.1f} -> {last['train/loss']:.1f}", flush=True)
    print(f"[seed {seed}] val/loss:   {first['val/loss']:.1f} -> {last['val/loss']:.1f}", flush=True)

    print(f"[seed {seed}] training digit classifier ...", flush=True)
    test_data = load_test_data_with_labels(eval_dir)
    imgs, labels = [], []
    for d in test_data:
        for t in range(0, d["image"].shape[0], 3):
            if int(d["label"][t]) < 0:
                continue
            imgs.append(d["image"][t, 0] / 255.0)
            labels.append(int(d["label"][t]))
    imgs = np.asarray(imgs, np.float32)[..., None]
    labels = np.asarray(labels, np.int32)
    clf = train_classifier(imgs, labels, num_epochs=3)
    save_classifier(clf, work / "classifier.npz")
    acc = float((np.asarray(recognize_digits(clf, imgs[:500])) == labels[:500]).mean())
    print(f"[seed {seed}] classifier accuracy on train frames: {acc:.3f}", flush=True)

    print(f"[seed {seed}] running word-transition evaluation ...", flush=True)
    params = trainer.load_best_params(out["params"])
    results = evaluate_word_transitions(
        exp.model, params, clf, test_data,
        n_intervals=6, query_length=args.query_length, n_predictions=args.n_predictions,
        n_frames=10, classify_frame=args.classify_frame, seed=seed,
    )
    md, _ = write_results(results, work / "results")
    s = results["summary"]
    print(
        f"[seed {seed}] mean MR = {s['mean_matching_rate']:.3f} "
        f"(uniform {s['mean_uniform']:.3f}, peak {s['mean_peak_onehot']:.3f}, "
        f"random {s['mean_random_onehot']:.3f})",
        flush=True,
    )
    print(f"[seed {seed}] wrote {md}", flush=True)
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--episodes", type=int, default=48)
    ap.add_argument("--frames-per-word", type=int, default=18,
                    help="1 makes every transition a word transition")
    ap.add_argument("--query-length", type=int, default=30,
                    help="1 conditions the initial state on exactly the context word")
    ap.add_argument("--classify-frame", type=int, default=0,
                    help="which imagined frame the classifier scores; 0 = reference "
                    "parity, 1 = the one-word-ahead prediction (see module docstring)")
    ap.add_argument("--n-successors", type=int, default=2,
                    help="branching factor of the synthetic word graph")
    ap.add_argument("--n-predictions", type=int, default=10)
    ap.add_argument("--seq-len", type=int, default=None,
                    help="override the training sequence length (e.g. 180 = "
                    "full episodes, no TakeFirstN; enables remat beyond 60)")
    ap.add_argument("--set-model", action="append", default=[],
                    metavar="FIELD=VALUE",
                    help="override a model-config field (repeatable), e.g. "
                    "--set-model l_tau=1.5 --set-model w_kl_h=0.3 — the "
                    "hyperparameter-sweep hook (values coerced to the "
                    "field's existing type)")
    ap.add_argument("--seeds", type=int, default=1,
                    help="run N seeds (seed-start..seed-start+N-1) and report "
                    "mean±std of mean MR")
    ap.add_argument("--seed-start", type=int, default=0,
                    help="first seed; the pipeline is deterministic per seed, so "
                    "extending an earlier sweep only needs the new seeds")
    ap.add_argument("--model", choices=("mrssm", "mmtrssm"), default="mrssm")
    ap.add_argument("--no-device-resident", action="store_true",
                    help="stream batches from host instead of the "
                         "HBM-resident dataset (bit-equal, slower epochs)")
    ap.add_argument("--platform", choices=("default", "cpu"), default="default",
                    help="'cpu' forces the CPU backend (jax.config after import "
                         "— env vars alone don't override the auto-registered "
                         "TPU backend); 'default' uses whatever jax resolves")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    work = Path(args.workdir)
    mrs, unis = [], []
    # Per-seed subdirs for any multi-seed sweep AND any extension run
    # (seed_start != 0) — an extension writing into the sweep root would
    # clobber the earlier seeds' datasets/checkpoints/results.
    per_seed_dirs = args.seeds > 1 or args.seed_start != 0
    for seed in range(args.seed_start, args.seed_start + args.seeds):
        results = run_once(args, work / (f"seed{seed}" if per_seed_dirs else "."), seed)
        mrs.append(results["summary"]["mean_matching_rate"])
        unis.append(results["summary"]["mean_uniform"])
    if args.seeds > 1:
        summary = {
            "model": args.model,
            "seeds": args.seeds,
            "seed_start": args.seed_start,
            "mean_mr": float(np.mean(mrs)),
            "std_mr": float(np.std(mrs)),
            "per_seed_mr": mrs,
            "mean_uniform": float(np.mean(unis)),
            "config": {k: getattr(args, k) for k in
                       ("epochs", "episodes", "frames_per_word", "query_length",
                        "classify_frame", "n_successors", "n_predictions")},
        }
        # An extension run aggregates only ITS seeds — write a range-named
        # file so the original full-sweep summary.json survives.
        name = ("summary.json" if args.seed_start == 0 else
                f"summary_seeds{args.seed_start}-{args.seed_start + args.seeds - 1}.json")
        (work / name).write_text(json.dumps(summary, indent=2))
        print(
            f"ACROSS {args.seeds} SEEDS: mean MR = {summary['mean_mr']:.3f} "
            f"± {summary['std_mr']:.3f} (uniform {summary['mean_uniform']:.3f}); "
            f"per-seed: {[round(m, 3) for m in mrs]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
