"""Cross-modal (missing-modality) inference evaluation.

The headline claim of MoPoE fusion is robustness when a modality drops out:
the posterior is a mixture over modality subsets, so zeroing one input
stream should still yield a usable joint state — and the model should be
able to RECONSTRUCT the missing modality from the other one. The reference
designs its visualization around exactly this case (reference
``src/multimodal_rssm/models/mrssm/callback.py:122-125`` detects an
all-(-1) stream and renders the "missing modality" layout) but ships no
evaluation of it; this module provides the measured counterpart:

- :func:`build_normalized_batch` — eval episodes → a normalized model batch
  with an optional modality dropped (ZeroOut fill −1) on the INPUT side
  while targets stay clean;
- :func:`reconstruction_report` — per-condition (both / audio dropped /
  vision dropped) posterior+prior reconstruction MSE of EACH modality
  against the clean targets, with constant(−1) and dataset-mean-frame
  predictor baselines for scale.

The Matching-Rate side of cross-modal inference (conditioning the
word-transition evaluation on one modality) lives in
:func:`multimodal_mtrssm_tpu.evaluation.word_transitions.evaluate_word_transitions`
via its ``condition`` argument.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_mtrssm_tpu.data.episodes import _to_nhwc
from multimodal_mtrssm_tpu.data.transforms import (
    NormalizeAudioMelSpectrogram,
    NormalizeVisionImage,
)

DROPS = (None, "audio", "vision")


def build_normalized_batch(
    test_data: list[dict],
    *,
    n_episodes: int = 8,
    T: int = 30,
    audio_min: float = -80.0,
    audio_max: float = 0.0,
    drop: str | None = None,
) -> tuple[jnp.ndarray, ...]:
    """Normalized ``(act_in, aud_in, vis_in, act, aud, vis)`` batch from eval
    episodes (the loader's dict layout, ``word_transitions.load_test_data_with_labels``).

    ``drop`` ∈ {None, "audio", "vision"}: replaces that INPUT stream with the
    ZeroOut fill (−1); the clean targets are untouched, so reconstruction
    error of the dropped modality measures cross-modal inference.
    """
    if drop not in DROPS:
        raise ValueError(f"drop={drop!r} not in {DROPS}")
    if not test_data:
        raise ValueError("no eval episodes")
    audio_t = NormalizeAudioMelSpectrogram(audio_min, audio_max)
    vision_t = NormalizeVisionImage()
    eps = test_data[:n_episodes]
    act = np.stack([e["speaker"][:T] for e in eps]).astype(np.float32)
    aud = np.stack([audio_t(_to_nhwc(e["audio"][:T])) for e in eps])
    vis = np.stack([vision_t(_to_nhwc(e["image"][:T])) for e in eps])
    aud_in = np.full_like(aud, -1.0) if drop == "audio" else aud
    vis_in = np.full_like(vis, -1.0) if drop == "vision" else vis
    return tuple(jnp.asarray(x) for x in (act, aud_in, vis_in, act, aud, vis))


def _mse(pred: jnp.ndarray, target: jnp.ndarray) -> float:
    return float(jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2))


def reconstruction_report(
    model: Any,
    params: Any,
    test_data: list[dict],
    *,
    query_length: int = 15,
    n_episodes: int = 8,
    T: int = 30,
    audio_min: float = -80.0,
    audio_max: float = 0.0,
    seed: int = 0,
) -> dict:
    """Reconstruction MSE (normalized [−1, 1] scale) of both modalities under
    each input condition, JSON-ready.

    Structure::

        {"conditions": {"both"|"drop_audio"|"drop_vision":
             {"posterior/audio": mse, "posterior/vision": mse,
              "prior/audio": mse, "prior/vision": mse}},
         "baselines": {"constant_-1/audio": ..., "mean_frame/audio": ..., ...},
         "config": {...}}

    The decisive cells are ``drop_audio → posterior/audio`` (audio inferred
    from vision alone) and ``drop_vision → posterior/vision`` — cross-modal
    inference is demonstrated when they beat both baselines and sit near
    the both-modality MSE.
    """
    from multimodal_mtrssm_tpu.viz.rollout import compute_reconstructions

    key = jax.random.PRNGKey(seed)
    conditions: dict[str, dict[str, float]] = {}
    clean = build_normalized_batch(
        test_data, n_episodes=n_episodes, T=T,
        audio_min=audio_min, audio_max=audio_max, drop=None,
    )
    targets = {"audio": clean[4], "vision": clean[5]}
    for drop in DROPS:
        batch = clean if drop is None else build_normalized_batch(
            test_data, n_episodes=n_episodes, T=T,
            audio_min=audio_min, audio_max=audio_max, drop=drop,
        )
        # Same key for every condition: identical sampling noise, so the MSE
        # deltas isolate the effect of the dropped input.
        recons = compute_reconstructions(model, params, batch, query_length, key)
        conditions["both" if drop is None else f"drop_{drop}"] = {
            k: _mse(v, targets[k.split("/")[1]]) for k, v in recons.items()
        }
    baselines: dict[str, float] = {}
    for mod, tgt in targets.items():
        baselines[f"constant_-1/{mod}"] = _mse(jnp.full_like(tgt, -1.0), tgt)
        mean_frame = jnp.mean(tgt, axis=(0, 1), keepdims=True)
        baselines[f"mean_frame/{mod}"] = _mse(jnp.broadcast_to(mean_frame, tgt.shape), tgt)
    return {
        "conditions": conditions,
        "baselines": baselines,
        "config": {
            "n_episodes": min(n_episodes, len(test_data)), "T": T,
            "query_length": query_length, "seed": seed,
        },
    }
