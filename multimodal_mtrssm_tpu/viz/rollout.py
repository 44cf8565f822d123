"""Rollout visualization: prior/observation/posterior GIF grids.

Replaces the reference's W&B viz callbacks (reference
``src/multimodal_rssm/models/callback.py:126-502`` and
``mrssm/callback.py:28-905``): every N epochs, reconstruct episodes with
the posterior over the full sequence and with the prior =
``posterior[:, :q]`` ⊕ imagination (``rollout_transition`` from
``posterior[:, q-1]``), decode both modalities, and render a 2×3 grid GIF
(rows = vision/audio, columns = prior/observation/posterior) with timestep
labels; audio is rendered through the magma colormap over the dB scale
(reference ``mrssm/callback.py:689-905``).

Device/host split (SURVEY §7 "host/device split"): all model compute
(rollouts + decoding) runs jitted on device for the whole episode batch;
only uint8 frame assembly and GIF encoding run on host.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np

from multimodal_mtrssm_tpu.models.state import cat_states

# Rendering caps (reference callback.py:14,178-210).
MAX_EPISODES = 7


def compute_reconstructions(model: Any, params: Any, batch: tuple,
                            query_length: int, key: jax.Array) -> dict[str, jax.Array]:
    """Posterior + prior reconstructions for a batch (reference
    ``mrssm/callback.py:156-233``).

    Returns dict of [B, T, H, W, C] arrays:
    ``{audio,vision} × {prior,posterior}`` reconstructions.
    """
    action, audio_in, vision_in = batch[0], batch[1], batch[2]
    # q < 1 would make posterior[:, q-1] wrap to the LAST timestep and seed
    # "imagination" from the end of the episode — clamp to [1, T-1] (floor
    # wins on a T=1 batch: prior == posterior frame 0, empty imagination).
    q = max(1, min(query_length, action.shape[1] - 1))
    k1, k2, k3 = jax.random.split(key, 3)
    init = model.initial_state(params, audio_in[:, 0], vision_in[:, 0], k1)
    posterior, _ = model.rollout_representation(params, action, audio_in, vision_in, init, k2)
    # Prior: first q steps teacher-forced from the posterior, then imagination.
    imag = model.rollout_transition(params, action[:, q:], posterior[:, q - 1], k3)
    prior = cat_states([posterior[:, :q], imag], axis=1)
    post_recon = model.decode_state(params, posterior)
    prior_recon = model.decode_state(params, prior)
    return {
        "posterior/audio": post_recon["recon/audio"],
        "posterior/vision": post_recon["recon/vision"],
        "prior/audio": prior_recon["recon/audio"],
        "prior/vision": prior_recon["recon/vision"],
    }


# ---------------------------------------------------------------------------
# Host-side rendering
# ---------------------------------------------------------------------------


def _to_uint8_vision(x: np.ndarray) -> np.ndarray:
    """[-1, 1] → uint8 grayscale → RGB."""
    g = np.clip((x + 1.0) / 2.0, 0.0, 1.0)
    g = (g[..., 0] * 255).astype(np.uint8)  # drop channel dim
    return np.stack([g, g, g], axis=-1)


def _to_uint8_audio(x: np.ndarray) -> np.ndarray:
    """[-1, 1] (normalized dB) → magma RGB (reference ``callback.py:426-502``)."""
    from matplotlib import colormaps

    g = np.clip((x[..., 0] + 1.0) / 2.0, 0.0, 1.0)
    rgba = colormaps["magma"](g)
    return (rgba[..., :3] * 255).astype(np.uint8)


def render_episode_gif(
    out_path: Path | str,
    observations: dict[str, np.ndarray],
    reconstructions: dict[str, np.ndarray],
    query_length: int,
    fps: float = 10.0,
    scale: int = 3,
) -> Path:
    """Render one episode's 2×3 grid GIF.

    ``observations``: {"audio": [T,H,W,C], "vision": [T,H,W,C]} (normalized);
    ``reconstructions``: the 4 keys from :func:`compute_reconstructions`,
    sliced to one episode.
    """
    from PIL import Image, ImageDraw

    T = observations["vision"].shape[0]
    rows, row_labels = [], []
    for mod, to_rgb in (("vision", _to_uint8_vision), ("audio", _to_uint8_audio)):
        prior = to_rgb(np.asarray(reconstructions[f"prior/{mod}"]))
        obs = to_rgb(np.asarray(observations[mod]))
        post = to_rgb(np.asarray(reconstructions[f"posterior/{mod}"]))
        rows.append((prior, obs, post))
        # Missing-modality detection: an all-(-1) input stream marks a
        # ZeroOut-dropped modality (reference ``mrssm/callback.py:122-125``).
        missing = bool(np.allclose(np.asarray(observations[mod]), -1.0))
        row_labels.append(f"{mod}{' (missing)' if missing else ''}")

    h, w = rows[0][0].shape[1:3]
    pad, label_h, side_w = 2, 12, 52
    col_labels = ("prior", "obs", "posterior")
    frame_w = side_w + 3 * (w * scale + pad) + pad
    frame_h = 2 * (h * scale + pad) + pad + 2 * label_h
    frames = []
    for t in range(T):
        canvas = np.zeros((frame_h, frame_w, 3), dtype=np.uint8)
        for r, (prior, obs, post) in enumerate(rows):
            for c, img in enumerate((prior[t], obs[t], post[t])):
                big = np.kron(img, np.ones((scale, scale, 1), dtype=np.uint8))
                y0 = 2 * label_h + pad + r * (h * scale + pad)
                x0 = side_w + pad + c * (w * scale + pad)
                canvas[y0 : y0 + h * scale, x0 : x0 + w * scale] = big
        im = Image.fromarray(canvas)
        draw = ImageDraw.Draw(im)
        phase = "recon" if t < query_length else "imagine"
        draw.text((2, 0), f"t={t:03d} {phase}", fill=(255, 255, 255))
        for c, label in enumerate(col_labels):
            draw.text((side_w + pad + c * (w * scale + pad) + 2, label_h), label, fill=(255, 255, 255))
        for r, label in enumerate(row_labels):
            draw.text((2, 2 * label_h + pad + r * (h * scale + pad) + 2), label, fill=(255, 255, 255))
        frames.append(im)

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    frames[0].save(
        out_path,
        save_all=True,
        append_images=frames[1:],
        duration=int(1000 / fps),
        loop=0,
    )
    return out_path


def log_rollout_gifs(
    model: Any,
    params: Any,
    batch: tuple,
    out_dir: Path | str,
    query_length: int,
    fps: float,
    key: jax.Array,
    indices: tuple[int, ...] = (0, 1, 2),
) -> list[Path]:
    """Render GIFs for selected episodes of a batch (≤7, reference cap)."""
    recons = jax.device_get(compute_reconstructions(model, params, batch, query_length, key))
    audio_in, vision_in = np.asarray(batch[1]), np.asarray(batch[2])
    paths = []
    for i in indices[:MAX_EPISODES]:
        if i >= vision_in.shape[0]:
            continue
        obs = {"audio": audio_in[i], "vision": vision_in[i]}
        rec = {k: v[i] for k, v in recons.items()}
        paths.append(
            render_episode_gif(
                Path(out_dir) / f"episode_{i}.gif", obs, rec, query_length, fps
            )
        )
    return paths
