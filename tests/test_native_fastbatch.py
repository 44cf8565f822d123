"""Tests: native fastbatch kernel (builds with g++; skips if unavailable)."""

import numpy as np
import pytest

from multimodal_mtrssm_tpu.data import native


def test_gather_matches_numpy_when_noiseless():
    src = np.random.default_rng(0).normal(size=(5, 8, 4, 4, 1)).astype(np.float32)
    idx = np.array([3, 1, 4])
    out = native.gather_noise(src, idx, seq_len=6, noise_std=0.0, seed=0)
    np.testing.assert_array_equal(out, src[idx, :6])


@pytest.mark.skipif(not native.available(), reason="native toolchain unavailable")
def test_native_noise_statistics_and_determinism():
    src = np.zeros((4, 10, 32, 32, 1), np.float32)
    idx = np.arange(4)
    out1 = native.gather_noise(src, idx, 10, noise_std=0.1, seed=42)
    out2 = native.gather_noise(src, idx, 10, noise_std=0.1, seed=42)
    out3 = native.gather_noise(src, idx, 10, noise_std=0.1, seed=43)
    np.testing.assert_array_equal(out1, out2)  # same seed → identical
    assert not np.array_equal(out1, out3)  # different seed → different
    assert abs(float(out1.mean())) < 5e-3
    assert 0.095 < float(out1.std()) < 0.105
    # thread-count invariance (per-row RNG)
    out_t1 = native.gather_noise(src, idx, 10, noise_std=0.1, seed=42, n_threads=1)
    out_t4 = native.gather_noise(src, idx, 10, noise_std=0.1, seed=42, n_threads=4)
    np.testing.assert_array_equal(out_t1, out_t4)


def test_numpy_fallback_paths(monkeypatch):
    """With the native lib unavailable, both entry points fall back to numpy."""
    monkeypatch.setattr(native, "_load", lambda: None)
    src = np.random.default_rng(3).normal(size=(4, 6, 8)).astype(np.float32)
    idx = np.array([1, 3])
    out = native.gather_noise(src, idx, 5, noise_std=0.0, seed=0)
    np.testing.assert_array_equal(out, src[idx, :5])
    out2 = native.gather_noise(src, idx, 5, noise_std=0.1, seed=7)
    assert not np.array_equal(out2, src[idx, :5])
    out3 = native.gather_affine_noise(src, idx, 5, 2.0, -1.0, 0.0, 0)
    np.testing.assert_allclose(out3, src[idx, :5] * 2.0 - 1.0, atol=1e-6)


def test_affine_of_known_transforms():
    from multimodal_mtrssm_tpu.data.transforms import (
        Identity,
        NormalizeAudioMelSpectrogram,
        NormalizeVisionImage,
        TakeFirstN,
    )

    assert native.affine_of(Identity()) == (1.0, 0.0)
    s, b = native.affine_of(NormalizeVisionImage())
    np.testing.assert_allclose(np.array([0.0, 255.0]) * s + b, [-1.0, 1.0])
    s, b = native.affine_of(NormalizeAudioMelSpectrogram(-80.0, 0.0))
    np.testing.assert_allclose(np.array([-80.0, 0.0]) * s + b, [-1.0, 1.0])
    assert native.affine_of(TakeFirstN(3)) is None


def test_gather_affine_noise_matches_numpy():
    src = np.random.default_rng(2).uniform(0, 255, (4, 6, 8, 8, 1)).astype(np.float32)
    idx = np.array([2, 0])
    out = native.gather_affine_noise(src, idx, 5, 2.0 / 255.0, -1.0, 0.0, 0)
    np.testing.assert_allclose(out, src[idx, :5] * (2.0 / 255.0) - 1.0, atol=1e-6)


@pytest.mark.skipif(not native.available(), reason="native toolchain unavailable")
def test_native_gather_correct_with_noise():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(6, 12, 8)).astype(np.float32)
    idx = np.array([5, 0, 2])
    out = native.gather_noise(src, idx, 7, noise_std=0.05, seed=7)
    # noise is small: values must be near the gathered source
    np.testing.assert_allclose(out, src[idx, :7], atol=0.4)
    assert not np.array_equal(out, src[idx, :7])


def test_gather_edge_cases_empty_batch_and_long_seq():
    """b=0 must not SIGFPE the process; seq_len past the episode length
    clamps exactly like numpy's :seq_len slice (no out-of-row reads)."""
    src = np.random.default_rng(3).normal(size=(4, 5, 6)).astype(np.float32)
    for fn, extra in ((native.gather_noise, ()), (native.gather_affine_noise, (2.0, -1.0))):
        empty = fn(src, np.empty((0,), np.int64), 3, *extra, 0.0, 0)
        assert empty.shape == (0, 3, 6)
        idx = np.array([3, 1])
        long = fn(src, idx, 99, *extra, 0.0, 0)
        want = src[idx]  # full episode: the clamp bound
        if extra:
            want = want * extra[0] + extra[1]
        assert long.shape == (2, 5, 6)
        np.testing.assert_allclose(long, want, atol=1e-6)
