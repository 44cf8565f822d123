"""Word-transition evaluation CLI (packaged; see ``scripts/`` for the
repo-checkout wrapper).

Replaces both reference eval CLIs (``evaluation/evaluate_word_transitions_
{mrssm,mtmrssm}.py:808-1020`` — near-copies of each other; one entry serves
both models here since the rollout API is shared).
"""

from __future__ import annotations

import argparse


def main() -> None:
    """Parse args, load the model/checkpoint, run the evaluation, write results."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True, help="checkpoint dir (uses 'best', falls back to 'last')")
    ap.add_argument("--test-data", required=True,
                    help="dir of labeled .npz test episodes, or of reference-"
                         "processed act_/audio_obs_/vision_obs_*.pt episodes")
    ap.add_argument("--use-pt-files", action="store_true", default=None,
                    help="force the .pt layout (auto-detected by default)")
    ap.add_argument("--npz-dir-for-labels", default=None,
                    help="dir of sample_*.npz label files (required with .pt episodes)")
    ap.add_argument("--classifier", default="ckpts/mnist_classifier.npz")
    ap.add_argument("--mnist-root", default=None)
    ap.add_argument("--out", default="evaluation_results")
    ap.add_argument("--n-intervals", type=int, default=6)
    ap.add_argument("--query-length", type=int, default=30)
    ap.add_argument("--n-predictions", type=int, default=10)
    ap.add_argument("--n-frames", type=int, default=10)
    ap.add_argument("--classify-frame", type=int, default=0,
                    help="which imagined frame the classifier scores; 0 = "
                         "reference parity (scores a self-prediction under the "
                         "reference's same-frame training alignment — near-"
                         "chance by construction, see BASELINE.md), 1 = the "
                         "one-word-ahead prediction")
    ap.add_argument("--condition", choices=("both", "vision", "audio"),
                    default="both",
                    help="which modality carries information at conditioning "
                         "time: 'vision'/'audio' zero out the OTHER stream "
                         "(ZeroOut fill -1) — the cross-modal inference "
                         "evaluation (results/crossmodal_r5)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    from multimodal_mtrssm_tpu.evaluation import (
        evaluate_word_transitions,
        load_or_train_classifier,
        load_test_data_with_labels,
        write_results,
    )
    from multimodal_mtrssm_tpu.train.checkpoint import CheckpointManager
    from multimodal_mtrssm_tpu.train.config import load_experiment

    exp = load_experiment(args.config)
    model = exp.model
    template = model.init(jax.random.PRNGKey(0))
    ckpt = CheckpointManager(args.checkpoint)
    name = "best" if ckpt.exists("best") else "last"
    if not ckpt.exists(name):
        raise SystemExit(
            f"no 'best' or 'last' checkpoint under {args.checkpoint} — "
            "point --checkpoint at a run's checkpoints directory"
        )
    # restore_params also serves full training-state checkpoints ('last'
    # from a run preempted before any validation epoch).
    params, _ = ckpt.restore_params(name, template)
    print(f"loaded {name} checkpoint from {args.checkpoint}")

    classifier_params = load_or_train_classifier(args.classifier, args.mnist_root)
    test_data = load_test_data_with_labels(
        args.test_data, use_pt_files=args.use_pt_files,
        npz_dir_for_labels=args.npz_dir_for_labels,
    )
    print(f"{len(test_data)} labeled test episodes")

    results = evaluate_word_transitions(
        model, params, classifier_params, test_data,
        n_intervals=args.n_intervals, query_length=args.query_length,
        n_predictions=args.n_predictions, n_frames=args.n_frames,
        audio_min=exp.data.audio_min, audio_max=exp.data.audio_max,
        classify_frame=args.classify_frame, seed=args.seed,
        condition=args.condition,
    )
    name_suffix = "" if args.condition == "both" else f"_{args.condition}"
    md, js = write_results(results, args.out,
                           name=f"word_transitions{name_suffix}")
    print(f"mean MR = {results['summary']['mean_matching_rate']:.3f}")
    print(f"wrote {md} and {js}")


if __name__ == "__main__":
    main()
