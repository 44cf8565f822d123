"""Host-side data transforms (numpy).

Replaces the reference's torch transforms
(``src/multimodal_rssm/models/transform.py:8-132``). These run on the host
CPU during batch assembly — pure numpy, no torch — and are vectorized over
whole batches (the reference applies them per-episode inside DataLoader
workers).

Also adds ``ZeroOut``, the modality-dropout transform the reference's
missing-modality visualization expects but never ships (reference
``mrssm/callback.py:122-125`` detects a missing modality by all-(-1) input;
SURVEY §7 "known reference bugs").
"""

from __future__ import annotations

import numpy as np


class Compose:
    """Apply transforms in order (torchvision ``Compose`` contract)."""

    def __init__(self, transforms: list) -> None:
        self.transforms = list(transforms)

    def __call__(self, data: np.ndarray, rng: np.random.Generator | None = None) -> np.ndarray:
        for t in self.transforms:
            data = t(data, rng) if _wants_rng(t) else t(data)
        return data


def _wants_rng(t) -> bool:
    return getattr(t, "needs_rng", False)


class Identity:
    """No-op transform (the default when a stream has no transform configured)."""

    def __call__(self, data: np.ndarray) -> np.ndarray:
        return data


class RemoveDim:
    """Drop indices along an axis (reference ``transform.py:8-28``)."""

    def __init__(self, axis: int, indices_to_remove: list[int]) -> None:
        self.axis = axis
        self.remove = set(indices_to_remove)

    def __call__(self, data: np.ndarray) -> np.ndarray:
        keep = [i for i in range(data.shape[self.axis]) if i not in self.remove]
        return np.take(data, keep, axis=self.axis)


class TakeFirstN:
    """Truncate the time axis to the first N steps (reference ``transform.py:31-52``).

    The reference applies this per-episode where time is axis 0; batched data
    puts time on ``axis`` (default 0).
    """

    def __init__(self, n: int, axis: int = 0) -> None:
        self.n = n
        self.axis = axis

    def __call__(self, data: np.ndarray) -> np.ndarray:
        sl = [slice(None)] * data.ndim
        sl[self.axis] = slice(0, self.n)
        return data[tuple(sl)]


class GaussianNoise:
    """Additive Gaussian noise, std 0.1 (reference ``transform.py:55-72``)."""

    needs_rng = True

    def __init__(self, std: float = 0.1) -> None:
        self.std = std

    def __call__(self, data: np.ndarray, rng: np.random.Generator | None = None) -> np.ndarray:
        if rng is None:
            rng = np.random.default_rng()
        return data + rng.normal(0.0, self.std, size=data.shape).astype(data.dtype, copy=False)


class NormalizeVisionImage:
    """[0, 255] → [-1, 1] (reference ``transform.py:75-97``)."""

    def __call__(self, data: np.ndarray) -> np.ndarray:
        return (data.astype(np.float32) / 255.0) * 2.0 - 1.0


class NormalizeAudioMelSpectrogram:
    """Min-max [min, max] → [-1, 1] (reference ``transform.py:100-132``)."""

    def __init__(self, min_value: float = -80.0, max_value: float = 0.1) -> None:
        self.min_value = min_value
        self.max_value = max_value
        self.range = max_value - min_value

    def __call__(self, data: np.ndarray) -> np.ndarray:
        return ((data.astype(np.float32) - self.min_value) / self.range) * 2.0 - 1.0

    def denormalize(self, data: np.ndarray) -> np.ndarray:
        """[-1, 1] → [min, max] (used by audio viz/eval rendering)."""
        return (data.astype(np.float32) + 1.0) / 2.0 * self.range + self.min_value


class ZeroOut:
    """Replace the whole stream with a constant (default -1): modality dropout.

    The reference's multimodal viz callback looks for an all-(-1) stream to
    render the "missing modality" case (reference ``mrssm/callback.py:122-125``)
    but the transform itself is absent from the reference snapshot; this makes
    the cross-modal-inference configuration runnable.
    """

    def __init__(self, fill_value: float = -1.0) -> None:
        self.fill_value = fill_value

    def __call__(self, data: np.ndarray) -> np.ndarray:
        return np.full_like(data, self.fill_value)


TRANSFORMS = {
    "Identity": Identity,
    "RemoveDim": RemoveDim,
    "TakeFirstN": TakeFirstN,
    "GaussianNoise": GaussianNoise,
    "NormalizeVisionImage": NormalizeVisionImage,
    "NormalizeAudioMelSpectrogram": NormalizeAudioMelSpectrogram,
    "ZeroOut": ZeroOut,
    "Compose": Compose,
}
