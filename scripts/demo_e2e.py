"""Full-pipeline demo on synthetic labeled Audio-MNIST: train → eval → report.

Offline stand-in for the reference's end-to-end flow (gdrive dataset →
train-mopoe-mrssm → evaluate_word_transitions): generates labeled synthetic
episodes, trains the model, trains the digit classifier on the same frame
distribution, runs the word-transition Matching-Rate evaluation, and writes
markdown/JSON results + metric charts + rollout GIFs under --workdir.

Usage: python scripts/demo_e2e.py --workdir /tmp/demo --epochs 40 [--model mrssm|mmtrssm]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--episodes", type=int, default=48)
    ap.add_argument("--frames-per-word", type=int, default=18,
                    help="1 puts every imagination step past a word boundary "
                    "(the MR eval classifies the FIRST imagined frame)")
    ap.add_argument("--model", choices=("mrssm", "mmtrssm"), default="mrssm")
    args = ap.parse_args()

    import numpy as np

    from multimodal_mtrssm_tpu.data import (
        EpisodeDataModule,
        generate_synthetic_labeled_audio_mnist,
    )
    from multimodal_mtrssm_tpu.evaluation import (
        evaluate_word_transitions,
        load_test_data_with_labels,
        save_classifier,
        train_classifier,
        write_results,
    )
    from multimodal_mtrssm_tpu.train.config import load_experiment
    from multimodal_mtrssm_tpu.train.trainer import Trainer
    from multimodal_mtrssm_tpu.viz.callback import make_viz_callback

    work = Path(args.workdir)
    train_dir, eval_dir = work / "episodes", work / "eval_npz"
    print("generating synthetic labeled dataset ...", flush=True)
    generate_synthetic_labeled_audio_mnist(
        train_dir, eval_dir, n_episodes=args.episodes, frames_per_word=args.frames_per_word
    )

    cfg_path = REPO_ROOT / "configs" / f"mopoe_{args.model}.yaml"
    exp = load_experiment(cfg_path)
    exp.trainer.max_epochs = args.epochs
    exp.trainer.log_dir = str(work / "run")
    exp.data.data_dir = train_dir

    dm = EpisodeDataModule(exp.data)
    trainer = Trainer(exp.model, dm, exp.trainer, callbacks=[make_viz_callback(exp)])
    out = trainer.fit()
    first, last = out["history"][0], out["history"][-1]
    print(f"train/loss: {first['train/loss']:.1f} -> {last['train/loss']:.1f}", flush=True)
    print(f"val/loss:   {first['val/loss']:.1f} -> {last['val/loss']:.1f}", flush=True)

    print("training digit classifier on synthetic stripe frames ...", flush=True)
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
    from multimodal_mtrssm_tpu.evaluation import recognize_digits

    acc = float((np.asarray(recognize_digits(clf, imgs[:500])) == labels[:500]).mean())
    print(f"classifier accuracy on train frames: {acc:.3f}", flush=True)

    print("running word-transition evaluation ...", flush=True)
    params = trainer.load_best_params(out["params"])
    results = evaluate_word_transitions(
        exp.model, params, clf, test_data,
        n_intervals=6, query_length=30, n_predictions=10, n_frames=10,
    )
    md, js = write_results(results, work / "results")
    s = results["summary"]
    print(
        f"mean MR = {s['mean_matching_rate']:.3f} "
        f"(uniform {s['mean_uniform']:.3f}, peak {s['mean_peak_onehot']:.3f}, "
        f"random {s['mean_random_onehot']:.3f})",
        flush=True,
    )
    print(f"wrote {md}", flush=True)


if __name__ == "__main__":
    main()
