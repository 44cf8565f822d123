"""Probe: what does one imagination step from an initial_state predict?

Diagnostic behind the word-transition Matching Rate (VERDICT r2 item 2).
The eval protocol (reference ``evaluate_word_transitions_mrssm.py:336-370``)
builds ``initial_state`` from ONE observation frame and classifies the FIRST
imagined frame. Two hypotheses about a trained model:

- "self": the first imagined frame re-predicts the conditioning frame
  (training's t=0 step pairs ``transition(initial_state(obs_0))`` with
  frame 0's own posterior, so init-state transitions learn identity);
- "advance": the first imagined frame is the SUCCESSOR word (29 of 30
  training transitions advance one frame; with frames_per_word=1 each is a
  word transition).

This script trains on synthetic data, then for each digit d conditions on a
frame of d and reports where the mass of imagined frames 1..3 lands:
self / the data graph's successors / elsewhere. The answer determines how
the MR demo must be configured to reward real learning.

Usage: python scripts/probe_transitions.py --workdir /tmp/probe --epochs 60
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import Counter
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--episodes", type=int, default=96)
    ap.add_argument("--n-successors", type=int, default=2)
    ap.add_argument("--model", choices=("mrssm", "mmtrssm"), default="mrssm")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import numpy as np

    from multimodal_mtrssm_tpu.data import (
        EpisodeDataModule,
        generate_synthetic_labeled_audio_mnist,
    )
    from multimodal_mtrssm_tpu.data.transforms import (
        NormalizeAudioMelSpectrogram,
        NormalizeVisionImage,
    )
    from multimodal_mtrssm_tpu.evaluation import (
        load_test_data_with_labels,
        recognize_digits,
        save_classifier,
        train_classifier,
    )
    from multimodal_mtrssm_tpu.train.config import load_experiment
    from multimodal_mtrssm_tpu.train.trainer import Trainer

    work = Path(args.workdir)
    train_dir, eval_dir = work / "episodes", work / "eval_npz"
    generate_synthetic_labeled_audio_mnist(
        train_dir, eval_dir, n_episodes=args.episodes, frames_per_word=1,
        n_successors=args.n_successors, seed=args.seed,
    )

    exp = load_experiment(REPO_ROOT / "configs" / f"mopoe_{args.model}.yaml")
    exp.trainer.max_epochs = args.epochs
    exp.trainer.log_dir = str(work / "run")
    exp.data.data_dir = train_dir
    # Short diagnostic runs: the fused training kernel saves ~0.2 ms/step
    # but costs minutes of Mosaic compile — net loss here, keep XLA.
    import dataclasses

    if hasattr(exp.model.cfg, "use_pallas_train"):
        exp.model = type(exp.model)(
            dataclasses.replace(exp.model.cfg, use_pallas_train=False)
        )
    dm = EpisodeDataModule(exp.data)
    trainer = Trainer(exp.model, dm, exp.trainer)
    out = trainer.fit()
    print(f"train/loss {out['history'][0]['train/loss']:.1f} -> {out['history'][-1]['train/loss']:.1f}")
    params = trainer.load_best_params(out["params"])
    model = exp.model

    # Classifier on labeled eval frames.
    test_data = load_test_data_with_labels(eval_dir)
    imgs, labels = [], []
    for d in test_data:
        for t in range(d["image"].shape[0]):
            if int(d["label"][t]) >= 0:
                imgs.append(d["image"][t, 0] / 255.0)
                labels.append(int(d["label"][t]))
    imgs = np.asarray(imgs, np.float32)[..., None]
    labels = np.asarray(labels, np.int32)
    clf = train_classifier(imgs, labels, num_epochs=3)
    save_classifier(clf, work / "classifier.npz")
    acc = float((np.asarray(recognize_digits(clf, imgs[:500])) == labels[:500]).mean())
    print(f"classifier acc: {acc:.3f}")

    at = NormalizeAudioMelSpectrogram(-80.0, 0.0)
    vt = NormalizeVisionImage()
    # Mirrors generate_synthetic_labeled_audio_mnist's graph construction
    # (data/episodes.py: odd offsets (1,3,5,7,9)[:n_successors]).
    _offsets = (1, 3, 5, 7, 9)
    successors = {
        d: tuple((d + off) % 10 for off in _offsets[: args.n_successors]) for d in range(10)
    }

    # For each digit: find a frame of that digit, condition, imagine 3
    # frames × 64 samples, classify each imagined frame.
    import jax.numpy as jnp

    P, F = 64, 3
    report = {}
    for d in range(10):
        frame = None
        for ep in test_data:
            pos = np.where(ep["label"] == d)[0]
            if len(pos):
                t = int(pos[0])
                frame = (ep["audio"][t], ep["image"][t], ep["speaker"][t])
                break
        if frame is None:
            continue
        audio0 = at(frame[0][None, ..., None])[0]
        vision0 = vt(np.moveaxis(frame[1], 0, -1)[None])[0]
        action = frame[2]
        k1, k2 = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(42), d))
        init = model.initial_state(params, jnp.asarray(audio0)[None], jnp.asarray(vision0)[None], k1)
        init = jax.tree.map(lambda x: jnp.repeat(x, P, axis=0), init)
        actions = jnp.broadcast_to(jnp.asarray(action), (P, F, action.shape[-1]))
        states = model.rollout_transition(params, actions, init, k2)
        recon = model.decode_state(params, states)["recon/vision"]
        frames = np.asarray(jnp.clip((recon + 1.0) / 2.0, 0.0, 1.0))  # [P, F, H, W, C]
        row = {}
        for f in range(F):
            digits = np.asarray(recognize_digits(clf, frames[:, f]))
            c = Counter(int(x) for x in digits)
            succ = successors[d]
            row[f"frame{f + 1}"] = {
                "self": c.get(d, 0) / P,
                "successors": sum(c.get(s, 0) for s in succ) / P,
                "top": c.most_common(3),
            }
        report[d] = row
        print(f"d={d} succ={successors[d]} " + " | ".join(
            f"f{f + 1}: self={row[f'frame{f + 1}']['self']:.2f} succ={row[f'frame{f + 1}']['successors']:.2f}"
            for f in range(F)))

    means = {
        f"frame{f + 1}": {
            "self": float(np.mean([report[d][f"frame{f + 1}"]["self"] for d in report])),
            "successors": float(np.mean([report[d][f"frame{f + 1}"]["successors"] for d in report])),
        }
        for f in range(F)
    }
    print("MEANS:", json.dumps(means))
    payload = {"means": means, "per_digit": {str(k): v for k, v in report.items()}}
    (work / "probe.json").write_text(json.dumps(payload, default=str))


if __name__ == "__main__":
    main()
