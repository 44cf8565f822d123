"""Word-transition evaluation: Matching Rate of imagined digit transitions.

Replaces the reference's ``evaluate_word_transitions_{mrssm,mtmrssm}.py``
(reference ``evaluation/evaluate_word_transitions_mrssm.py:163-600``; the
MMTRSSM variant is a near-copy — here one module serves both models since
they share the rollout API).

Pipeline parity:
- interval selection: for each word 0-9, ≤6 intervals, one per speaker,
  window of ``query_length`` ending at the word's first occurrence
  (reference ``:163-233``);
- predictions: ``initial_state`` from frame 0 only, repeat the last speaker
  action for ``n_frames``, prior-only ``rollout_transition``, decode vision,
  denormalize, classify the FIRST predicted frame; ``n_predictions``
  stochastic samples (reference ``:286-372``);
- q(w|wa) with failure bucket "wf" (reference ``:375-401``); p(w|wa) from
  deduped label sequences skipping -1 silence, p("wf")=0 (reference
  ``:404-458``);
- MR = Σ_w min(q,p) + min(q_wf,p_wf) (reference ``:461-489``); baselines
  uniform / peak-one-hot / random-one-hot ×100 trials (reference
  ``:492-538``); markdown + JSON output (reference ``:541-600``).

TPU-first: the reference loops ``n_predictions`` times with one Python
rollout each; here the samples are one batched rollout (batch axis =
prediction samples) and the classifier scores all first-frames in one
device call (SURVEY §7 host/device split).
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_mtrssm_tpu.data.transforms import (
    NormalizeAudioMelSpectrogram,
    NormalizeVisionImage,
)
# Layout normalization shared with the data pipeline (one home: it also
# validates ndim, which this module's former local copy silently skipped).
from multimodal_mtrssm_tpu.data.episodes import _to_nhwc
from multimodal_mtrssm_tpu.evaluation.classifier import recognize_digits
from multimodal_mtrssm_tpu.nn.core import Params

WORD_SET = list(range(10))

# Conditioning conditions for cross-modal evaluation: which modality carries
# information when the initial state is inferred. "both" = reference
# protocol; "vision"/"audio" replace the OTHER modality's conditioning frame
# with the ZeroOut fill (-1, the reference's missing-modality marker,
# reference ``mrssm/callback.py:122-125``) so the MoPoE posterior must infer
# the word from one modality alone.
CONDITIONS = ("both", "vision", "audio")


def _apply_condition(a0: np.ndarray, v0: np.ndarray, condition: str) -> tuple[np.ndarray, np.ndarray]:
    """Zero out (to -1) the modality NOT carrying information under ``condition``."""
    if condition not in CONDITIONS:
        raise ValueError(f"condition={condition!r} not in {CONDITIONS}")
    if condition == "vision":
        a0 = np.full_like(a0, -1.0)
    elif condition == "audio":
        v0 = np.full_like(v0, -1.0)
    return a0, v0


# ---------------------------------------------------------------------------
# Data loading (reference :22-148)
# ---------------------------------------------------------------------------


def load_test_data_with_labels(
    test_data_dir: str | Path,
    use_pt_files: bool | None = None,
    npz_dir_for_labels: str | Path | None = None,
) -> list[dict]:
    """Load labeled test episodes (reference ``:22-148``, both layouts).

    Two directory layouts, matching the reference loader:

    - ``.npz`` episodes with keys ``audio`` (180,32,32), ``image``
      (180,1,32,32) or NHWC, ``label`` (180,), ``speaker`` (180,6);
    - reference-processed ``.pt`` episodes (``act_*.pt`` /
      ``audio_obs_*.pt`` / ``vision_obs_*.pt``) plus per-episode label
      ``.npz`` files (``sample_%04d.npz``) in ``npz_dir_for_labels`` — or
      its sibling ``train/`` directory, mirroring the reference's
      train-then-test episode numbering (reference ``:100-113``).

    ``use_pt_files=None`` auto-detects: the ``.pt`` layout is used when the
    directory contains ``act_*.pt`` files and no ``.npz`` files.
    """
    test_data_dir = Path(test_data_dir)
    if not test_data_dir.exists():
        print(f"Warning: test data directory does not exist: {test_data_dir}")
        return []
    if use_pt_files is None:
        use_pt_files = (
            any(test_data_dir.glob("act_*.pt")) and not any(test_data_dir.glob("*.npz"))
        )
    if use_pt_files:
        return _load_pt_episodes_with_labels(test_data_dir, npz_dir_for_labels)

    test_data = []
    for p in sorted(test_data_dir.glob("*.npz")):
        try:
            with np.load(p) as z:
                test_data.append({
                    "audio": np.asarray(z["audio"], dtype=np.float32),
                    "image": np.asarray(z["image"], dtype=np.float32),
                    "label": np.asarray(z["label"]),
                    "speaker": np.asarray(z["speaker"], dtype=np.float32),
                    "file_path": str(p),
                })
        except Exception as e:  # noqa: BLE001 — skip unreadable files like the reference
            print(f"Warning: failed to load {p}: {e}")
    return test_data


def _load_pt_episodes_with_labels(
    test_data_dir: Path, npz_dir_for_labels: str | Path | None
) -> list[dict]:
    """Reference-processed ``.pt`` layout (reference ``:51-126``)."""
    try:
        import torch
    except ImportError:
        print("Warning: .pt test-data layout requires torch, which is not "
              "installed; convert the directory with "
              "scripts/convert_audio_mnist_data.py or provide .npz episodes.")
        return []

    act_files = sorted(test_data_dir.glob("act_*.pt"))
    if not act_files:
        print(f"Warning: no act_*.pt files found in {test_data_dir}")
        return []
    if npz_dir_for_labels is None:
        print("Warning: .pt episodes carry no labels; pass npz_dir_for_labels "
              "pointing at the original sample_*.npz directory.")
        return []
    npz_dir = Path(npz_dir_for_labels)

    test_data = []
    for act_path in act_files:
        try:
            file_idx = int(act_path.stem.split("_")[1])
            audio_path = test_data_dir / f"audio_obs_{file_idx:04d}.pt"
            vision_path = test_data_dir / f"vision_obs_{file_idx:04d}.pt"
            if not audio_path.exists() or not vision_path.exists():
                continue
            audio = torch.load(audio_path, weights_only=False).numpy()
            if audio.ndim == 4 and audio.shape[1] == 1:
                audio = audio[:, 0]  # (180, 1, 32, 32) → (180, 32, 32)
            image = torch.load(vision_path, weights_only=False).numpy()
            speaker = torch.load(act_path, weights_only=False).numpy()

            # Train episodes are numbered before test ones (reference
            # :100-104): look in the sibling train/ dir first, then here —
            # replicating the reference's preference order. This assumes
            # CONTINUED numbering across splits; warn when both candidates
            # exist (per-split numbering would bind the wrong labels).
            label = None
            candidates = []
            if (npz_dir.parent / "train").exists():
                candidates.append(npz_dir.parent / "train" / f"sample_{file_idx:04d}.npz")
            candidates.append(npz_dir / f"sample_{file_idx:04d}.npz")
            existing = [p for p in candidates if p.exists()]
            if len(existing) > 1:
                print(
                    f"Warning: labels for index {file_idx} exist in BOTH "
                    f"{existing[0].parent.name}/ and {existing[1].parent.name}/; "
                    f"using {existing[0]} (reference preference order — assumes "
                    "train-then-test continued numbering)"
                )
            if existing:
                with np.load(existing[0]) as z:
                    label = np.asarray(z["label"])
            if label is None:
                continue
            test_data.append({
                "audio": np.asarray(audio, dtype=np.float32),
                "image": np.asarray(image, dtype=np.float32),
                "label": label,
                "speaker": np.asarray(speaker, dtype=np.float32),
                "file_path": str(act_path),
            })
        except Exception as e:  # noqa: BLE001 — skip unreadable files like the reference
            print(f"Warning: failed to load {act_path}: {e}")
    return test_data


def _speaker_index(speaker: np.ndarray) -> int:
    """Speaker id from the episode's first one-hot row (reference :151-160)."""
    return int(np.argmax(speaker[0]))


def select_intervals_for_word(
    word: int,
    test_data: list[dict],
    n_intervals: int = 6,
    query_length: int = 30,
) -> list[dict]:
    """≤n intervals containing ``word``, one per speaker (reference :163-233)."""
    selected, speakers_used = [], set()
    for file_idx, data in enumerate(test_data):
        labels = data["label"]
        positions = np.where(labels == word)[0]
        if len(positions) == 0:
            continue
        speaker_idx = _speaker_index(data["speaker"])
        if speaker_idx in speakers_used:
            continue
        word_pos = int(positions[0])
        start = max(0, word_pos - query_length + 1)
        end = start + query_length
        if end > len(labels):
            start, end = 0, query_length
        selected.append({
            "audio": data["audio"][start:end],
            "image": data["image"][start:end],
            "speaker": data["speaker"][start:end],
            "label": labels[start:end],
            "speaker_idx": speaker_idx,
            "file_idx": file_idx,
        })
        speakers_used.add(speaker_idx)
        if len(selected) >= n_intervals:
            break
    return selected


# ---------------------------------------------------------------------------
# Prediction (reference :286-372, batched over samples)
# ---------------------------------------------------------------------------


def generate_predictions_with_classifier(
    model: object,
    params: Params,
    classifier_params: Params,
    interval: dict,
    key: jax.Array,
    n_predictions: int = 10,
    n_frames: int = 10,
    audio_transform: NormalizeAudioMelSpectrogram | None = None,
    vision_transform: NormalizeVisionImage | None = None,
    classify_frame: int = 0,
    condition: str = "both",
) -> list[int]:
    """Predicted digits for one interval: n_predictions batched rollouts."""
    audio_transform = audio_transform or NormalizeAudioMelSpectrogram(-80.0, 0.0)
    vision_transform = vision_transform or NormalizeVisionImage()
    audio0 = audio_transform(_to_nhwc(interval["audio"]))[0]  # frame 0, [H, W, C]
    vision0 = vision_transform(_to_nhwc(interval["image"]))[0]
    audio0, vision0 = _apply_condition(audio0, vision0, condition)
    last_action = interval["speaker"][-1]  # [A]

    n = n_predictions
    audio0_b = jnp.asarray(audio0)[None]  # [1, H, W, C]
    vision0_b = jnp.asarray(vision0)[None]
    actions = jnp.broadcast_to(jnp.asarray(last_action), (n, n_frames, last_action.shape[-1]))

    digits = _predict_digits_jit(model, params, classifier_params, audio0_b, vision0_b,
                                 actions, key, n, classify_frame)
    return [int(d) for d in np.asarray(digits)]


def _predict_digits(model, params, classifier_params, audio0, vision0, actions, key,
                    n_predictions, classify_frame=0):
    """``audio0``/``vision0`` are per-interval [I, H, W, C]; ``actions`` is
    [I * n_predictions, n_frames, A]. The initial state is sampled ONCE per
    interval and reused across all its prediction rollouts, matching the
    reference protocol (reference ``:336-370`` samples ``initial_state`` a
    single time before the ``n_predictions`` loop)."""
    k1, k2 = jax.random.split(key)
    init = model.initial_state(params, audio0, vision0, k1)  # [I, ...]
    init = jax.tree.map(lambda x: jnp.repeat(x, n_predictions, axis=0), init)
    states = model.rollout_transition(params, actions, init, k2)
    # Only ONE predicted frame is classified (frame 0 in the reference
    # protocol, :336-370; ``classify_frame`` generalizes — see
    # ``evaluate_word_transitions``): slice the state before decoding —
    # decoding all n_frames and keeping one would run the conv-transpose
    # stack at n_frames× the needed cost.
    states = states[:, classify_frame : classify_frame + 1]
    recon = model.decode_state(params, states)["recon/vision"]  # [I*P, 1, H, W, C]
    first = jnp.clip((recon[:, 0] + 1.0) / 2.0, 0.0, 1.0)
    return recognize_digits(classifier_params, first)


_predict_digits_jit = jax.jit(_predict_digits, static_argnums=(0, 7, 8))


def _predict_digits_pallas(model, params, classifier_params, audio0, vision0, actions, key,
                           n_predictions, classify_frame=0):
    """Fused-Pallas fast path for both model families (wins at the
    batched-interval sizes, benchmarks/bench_pallas.py). Initial state is
    sampled once per interval, like ``_predict_digits``."""
    from multimodal_mtrssm_tpu.nn.conv import cast_conv_in, cast_conv_out, decoder_apply

    k1, k2 = jax.random.split(key)
    init = model.initial_state(params, audio0, vision0, k1)  # [I, ...]
    init = jax.tree.map(lambda x: jnp.repeat(x, n_predictions, axis=0), init)
    seed = jax.random.randint(k2, (), 0, 2**31 - 1)
    cfg = model.cfg
    if hasattr(init, "deter_h"):  # hierarchical MTState
        from multimodal_mtrssm_tpu.ops.pallas import (
            fused_mt_rollout_transition,
            pack_mt_params,
        )

        h_deter, l_deter, _, _, h_stoch, l_stoch, _, _ = fused_mt_rollout_transition(
            pack_mt_params(params), actions,
            (init.deter_h, init.deter_l, init.stoch_h, init.stoch_l,
             init.hidden_h, init.hidden_l),
            seed, l_tau=cfg.l_tau, h_tau=cfg.h_tau,
            ls_class=cfg.ls_class, ls_category=cfg.ls_category,
            hs_class=cfg.hs_class, hs_category=cfg.hs_category,
        )
        cf = classify_frame
        feature0 = jnp.concatenate(
            [h_deter[:, cf], h_stoch[:, cf], l_deter[:, cf], l_stoch[:, cf]], axis=-1
        )
        dec_cfg = cfg.decoder_cfg("vision")
    else:
        from multimodal_mtrssm_tpu.ops.pallas import fused_rollout_transition, pack_params

        deters, _, stochs = fused_rollout_transition(
            pack_params(params), actions, init.deter, init.stoch, seed,
            class_size=cfg.class_size, category_size=cfg.category_size,
        )
        feature0 = jnp.concatenate([deters[:, classify_frame], stochs[:, classify_frame]], axis=-1)
        dec_cfg = model.decoder_cfg("vision")
    # Route through the shared mixed-precision cast pair (nn/conv.py) so a
    # conv_dtype=bfloat16 model decodes identically on the Pallas and XLA
    # dispatch paths.
    recon = cast_conv_out(
        cfg, decoder_apply(params["vision_decoder"], dec_cfg, cast_conv_in(cfg, feature0))
    )
    first = jnp.clip((recon + 1.0) / 2.0, 0.0, 1.0)
    return recognize_digits(classifier_params, first)


_predict_digits_pallas_jit = jax.jit(_predict_digits_pallas, static_argnums=(0, 7, 8))


def generate_predictions_batched(
    model: object,
    params: Params,
    classifier_params: Params,
    intervals: list[dict],
    key: jax.Array,
    n_predictions: int = 10,
    n_frames: int = 10,
    audio_transform: NormalizeAudioMelSpectrogram | None = None,
    vision_transform: NormalizeVisionImage | None = None,
    use_pallas: bool | str = "auto",
    classify_frame: int = 0,
    condition: str = "both",
) -> list[int]:
    """All intervals × samples of one word as ONE batched rollout.

    Semantics match per-interval ``generate_predictions_with_classifier``
    (each interval contributes ``n_predictions`` digits); batching the
    whole word keeps the device busy (the reference loops Python-side per
    interval AND per sample, reference ``:941-1007``/``:333-370``).
    """
    if not 0 <= classify_frame < n_frames:
        raise ValueError(
            f"classify_frame={classify_frame} out of range for n_frames={n_frames}"
        )
    audio_transform = audio_transform or NormalizeAudioMelSpectrogram(-80.0, 0.0)
    vision_transform = vision_transform or NormalizeVisionImage()
    a0 = np.stack([audio_transform(_to_nhwc(iv["audio"]))[0] for iv in intervals])
    v0 = np.stack([vision_transform(_to_nhwc(iv["image"]))[0] for iv in intervals])
    a0, v0 = _apply_condition(a0, v0, condition)
    last = np.stack([iv["speaker"][-1] for iv in intervals])  # [I, A]
    P = n_predictions
    actions = jnp.broadcast_to(
        jnp.asarray(np.repeat(last, P, axis=0))[:, None, :],
        (len(intervals) * P, n_frames, last.shape[-1]),
    )
    from multimodal_mtrssm_tpu.ops.pallas import resolve_use_pallas

    kind = "mt" if hasattr(model.cfg, "l_tau") else "mrssm"
    pallas = resolve_use_pallas(use_pallas, kind, len(intervals) * P, n_frames,
                                activation=getattr(model.cfg, "activation_name", "ELU"))
    fn = _predict_digits_pallas_jit if pallas else _predict_digits_jit
    digits = fn(model, params, classifier_params, jnp.asarray(a0), jnp.asarray(v0),
                actions, key, P, classify_frame)
    return [int(d) for d in np.asarray(digits)]


# ---------------------------------------------------------------------------
# Distributions + Matching Rate (reference :375-538)
# ---------------------------------------------------------------------------


def compute_prediction_distribution(predicted_words: list[int],
                                    word_set: list[int] = WORD_SET) -> dict:
    """q(w|wa) over classified samples, failure mass in "wf" (reference :375-401)."""
    total = len(predicted_words)
    if total == 0:
        return {w: 0.0 for w in word_set} | {"wf": 0.0}
    counts = defaultdict(int)
    for w in predicted_words:
        if w in word_set:
            counts[w] += 1
    dist = {w: counts.get(w, 0) / total for w in word_set}
    dist["wf"] = (total - sum(counts.values())) / total
    return dist


def compute_true_distribution(word: int, test_data: list[dict],
                              word_set: list[int] = WORD_SET) -> dict:
    """p(w|wa) from deduped label sequences, skipping -1 silence (reference :404-458)."""
    next_counts: dict[int, int] = defaultdict(int)
    total = 0
    for data in test_data:
        seq, prev = [], None
        for label in data["label"]:
            d = int(label)
            if d == -1:
                continue
            if d != prev:
                seq.append(d)
                prev = d
        for i in range(len(seq) - 1):
            if seq[i] == word:
                if seq[i + 1] in word_set:
                    next_counts[seq[i + 1]] += 1
                total += 1
    if total == 0:
        return {w: 0.0 for w in word_set} | {"wf": 0.0}
    dist = {w: next_counts.get(w, 0) / total for w in word_set}
    dist["wf"] = 0.0
    return dist


def compute_matching_rate(q_dist: dict, p_dist: dict,
                          word_set: list[int] = WORD_SET) -> float:
    """MR = sum_w min(q, p) + min(q_wf, p_wf) (reference :461-489)."""
    mr = sum(min(q_dist.get(w, 0.0), p_dist.get(w, 0.0)) for w in word_set)
    return mr + min(q_dist.get("wf", 0.0), p_dist.get("wf", 0.0))


def compute_baselines(p_dist: dict, word_set: list[int] = WORD_SET,
                      n_random_trials: int = 100, seed: int = 0) -> dict:
    """Uniform / peak-one-hot / random-one-hot MR baselines (reference :492-538)."""
    n = len(word_set)
    uniform = {w: 1.0 / n for w in word_set} | {"wf": 0.0}
    peak_word = max(word_set, key=lambda w: p_dist.get(w, 0.0))
    peak = {w: (1.0 if w == peak_word else 0.0) for w in word_set} | {"wf": 0.0}
    rng = np.random.default_rng(seed)
    random_mrs = []
    for _ in range(n_random_trials):
        rw = int(rng.choice(word_set))
        rdist = {w: (1.0 if w == rw else 0.0) for w in word_set} | {"wf": 0.0}
        random_mrs.append(compute_matching_rate(rdist, p_dist, word_set))
    return {
        "uniform": compute_matching_rate(uniform, p_dist, word_set),
        "peak_onehot": compute_matching_rate(peak, p_dist, word_set),
        "random_onehot": float(np.mean(random_mrs)),
    }


# ---------------------------------------------------------------------------
# Full evaluation (reference :808-1020)
# ---------------------------------------------------------------------------


def evaluate_word_transitions(
    model: object,
    params: Params,
    classifier_params: Params,
    test_data: list[dict],
    *,
    n_intervals: int = 6,
    query_length: int = 30,
    n_predictions: int = 10,
    n_frames: int = 10,
    audio_min: float = -80.0,
    audio_max: float = 0.0,
    seed: int = 0,
    word_set: list[int] = WORD_SET,
    batched: bool = True,
    use_pallas: bool | str = "auto",
    classify_frame: int = 0,
    condition: str = "both",
) -> dict:
    """Run the full MR evaluation; returns the results dict (JSON-ready).

    ``condition`` selects WHICH modality carries information when the
    initial state is inferred: "both" (reference protocol), "vision"
    (audio conditioning frame replaced by the ZeroOut fill −1), or "audio"
    (vision frame zeroed) — the cross-modal inference evaluation the
    reference's missing-modality viz is designed around (reference
    ``mrssm/callback.py:122-125``), with the Matching Rate as the metric.

    ``batched=True`` runs each word's intervals × samples as one rollout;
    ``use_pallas`` routes the rollout through the fused kernel — True,
    False, or "auto" (shape-based dispatch from the measured crossovers,
    ``ops.pallas.default_use_pallas``; XLA everywhere off-TPU).

    ``classify_frame`` selects WHICH imagined frame is classified.
    0 (default) = exact reference parity (reference ``:336-370`` classifies
    the first imagined frame). NOTE the measured caveat
    (scripts/probe_transitions.py, BASELINE.md): under the reference's
    same-frame training alignment, one transition step from an
    ``initial_state`` RE-PREDICTS the conditioning frame (probe: 68% self,
    11% successors), while the SECOND imagined frame carries the word
    transition (probe: 14% self, 52% successors). ``classify_frame=1``
    therefore scores the one-word-ahead prediction that the Matching-Rate
    metric's p(w|wa) actually describes.
    """
    if not 0 <= classify_frame < n_frames:
        # Validate up front: past the rollout horizon the XLA path would
        # trace an empty slice (crash) while the Pallas path's jnp indexing
        # would silently clamp to the last frame — same args, divergent
        # behavior.
        raise ValueError(
            f"classify_frame={classify_frame} out of range for n_frames={n_frames}"
        )
    audio_t = NormalizeAudioMelSpectrogram(audio_min, audio_max)
    vision_t = NormalizeVisionImage()
    key = jax.random.PRNGKey(seed)
    results = {}
    for word in word_set:
        intervals = select_intervals_for_word(word, test_data, n_intervals, query_length)
        if not intervals:
            continue
        predicted: list[int] = []
        if batched:
            key, sub = jax.random.split(key)
            predicted = generate_predictions_batched(
                model, params, classifier_params, intervals, sub,
                n_predictions, n_frames, audio_t, vision_t, use_pallas=use_pallas,
                classify_frame=classify_frame, condition=condition,
            )
        else:
            for interval in intervals:
                key, sub = jax.random.split(key)
                predicted.extend(
                    generate_predictions_with_classifier(
                        model, params, classifier_params, interval, sub,
                        n_predictions, n_frames, audio_t, vision_t,
                        classify_frame=classify_frame, condition=condition,
                    )
                )
        q_dist = compute_prediction_distribution(predicted, word_set)
        p_dist = compute_true_distribution(word, test_data, word_set)
        mr = compute_matching_rate(q_dist, p_dist, word_set)
        baselines = compute_baselines(p_dist, word_set)
        results[str(word)] = {
            "n_intervals": len(intervals),
            "n_predictions": len(predicted),
            "q_dist": {str(k): v for k, v in q_dist.items()},
            "p_dist": {str(k): v for k, v in p_dist.items()},
            "matching_rate": mr,
            "baselines": baselines,
        }
    valid = [r["matching_rate"] for r in results.values()]
    def _mean_baseline(name: str) -> float:
        return float(np.mean([r["baselines"][name] for r in results.values()])) if valid else 0.0

    summary = {
        "condition": condition,
        "mean_matching_rate": float(np.mean(valid)) if valid else 0.0,
        "mean_uniform": _mean_baseline("uniform"),
        "mean_peak_onehot": _mean_baseline("peak_onehot"),
        "mean_random_onehot": _mean_baseline("random_onehot"),
    }
    return {"per_word": results, "summary": summary}


def write_results(results: dict, out_dir: str | Path, name: str = "word_transitions") -> tuple[Path, Path]:
    """Markdown + JSON output (reference :541-600)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    json_path = out_dir / f"{name}.json"
    json_path.write_text(json.dumps(results, indent=2))
    s = results["summary"]
    lines = [
        "# Word-transition Matching Rate",
        "",
        "| word | MR | uniform | peak | random | n_pred |",
        "|---|---|---|---|---|---|",
    ]
    for word, r in sorted(results["per_word"].items(), key=lambda kv: int(kv[0])):
        b = r["baselines"]
        lines.append(
            f"| {word} | {r['matching_rate']:.3f} | {b['uniform']:.3f} | "
            f"{b['peak_onehot']:.3f} | {b['random_onehot']:.3f} | {r['n_predictions']} |"
        )
    lines += [
        "",
        f"**mean MR = {s['mean_matching_rate']:.3f}** "
        f"(uniform {s['mean_uniform']:.3f}, peak {s['mean_peak_onehot']:.3f}, "
        f"random {s['mean_random_onehot']:.3f})",
    ]
    md_path = out_dir / f"{name}.md"
    md_path.write_text("\n".join(lines) + "\n")
    return md_path, json_path
