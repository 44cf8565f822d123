"""Tests: dataset converters + MNIST idx ingestion."""

import gzip
import struct

import numpy as np

from multimodal_mtrssm_tpu.data import (
    convert_audio_mnist_npz,
    convert_reference_processed_dir,
    list_episodes,
    load_episode,
)


def _write_source_npz(path, T=12, seed=0):
    rng = np.random.default_rng(seed)
    np.savez(
        path,
        audio=rng.uniform(-80, 0, (T, 32, 32)).astype(np.float32),
        image=rng.uniform(0, 255, (T, 1, 32, 32)).astype(np.float32),
        speaker=np.eye(6, dtype=np.float32)[rng.integers(0, 6, T)],
        label=rng.integers(0, 10, T),
    )


def test_convert_audio_mnist_npz_continued_numbering(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        _write_source_npz(src / f"sample_{i:04d}.npz", seed=i)
    out = tmp_path / "episodes"
    n = convert_audio_mnist_npz(sorted(src.glob("*.npz")), out, start_index=0)
    assert n == 3
    # test files continue numbering (reference convert_audio_mnist_data.py:83-88)
    n2 = convert_audio_mnist_npz(sorted(src.glob("*.npz"))[:1], out, start_index=n)
    assert n2 == 4
    eps = list_episodes(out)
    assert len(eps) == 4
    e = load_episode(eps[0])
    assert e.audio.shape == (12, 32, 32, 1)  # CHW-less audio got channel dim
    assert e.vision.shape == (12, 32, 32, 1)  # CHW converted to NHWC
    assert e.action.shape == (12, 6)


def test_convert_reference_processed_dir(tmp_path):
    """Round-trip the reference's processed .pt triplet layout."""
    import torch

    src = tmp_path / "processed"
    src.mkdir()
    rng = np.random.default_rng(1)
    for i in range(2):
        torch.save(torch.tensor(np.eye(6, dtype=np.float32)[rng.integers(0, 6, 8)]),
                   src / f"act_{i:03d}.pt")
        torch.save(torch.tensor(rng.uniform(-1, 1, (8, 1, 32, 32)).astype(np.float32)),
                   src / f"audio_obs_{i:03d}.pt")
        torch.save(torch.tensor(rng.uniform(-1, 1, (8, 1, 32, 32)).astype(np.float32)),
                   src / f"vision_obs_{i:03d}.pt")
    out = tmp_path / "episodes"
    n = convert_reference_processed_dir(src, out)
    assert n == 2
    e = load_episode(list_episodes(out)[0])
    assert e.audio.shape == (8, 32, 32, 1)  # [T,C,H,W] → NHWC
    assert e.action.shape == (8, 6)


def test_load_mnist_idx_files(tmp_path):
    from multimodal_mtrssm_tpu.evaluation import load_mnist_arrays

    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    n = 5
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (n, 28, 28), dtype=np.uint8)
    labels = rng.integers(0, 10, (n,), dtype=np.uint8)
    with gzip.open(raw / "train-images-idx3-ubyte.gz", "wb") as f:
        f.write(struct.pack(">HBB", 0, 8, 3) + struct.pack(">3I", n, 28, 28) + images.tobytes())
    with gzip.open(raw / "train-labels-idx1-ubyte.gz", "wb") as f:
        f.write(struct.pack(">HBB", 0, 8, 1) + struct.pack(">I", n) + labels.tobytes())
    imgs, labs = load_mnist_arrays(tmp_path)
    assert imgs.shape == (n, 32, 32, 1)  # bilinear-resized to 32 (torchvision parity)
    assert imgs.max() <= 1.0 and imgs.min() >= 0.0
    np.testing.assert_array_equal(labs, labels.astype(np.int32))
    # bilinear interpolation preserves the local mean (no padding border)
    assert abs(float(imgs.mean()) - float(images.mean()) / 255.0) < 0.02
    assert float(imgs[:, :2, :, 0].mean()) > 0.1  # edges carry image content, not zeros
