"""ctypes bridge to the native batch-assembly kernel (native/fastbatch.cc).

Builds ``libfastbatch.so`` on first use with the in-image toolchain (g++) and
falls back to pure numpy when the toolchain or build is unavailable — the
pipeline works identically either way, the native path is just faster on
large batches (one parallel fused gather+noise pass instead of numpy's
gather → RNG alloc → add).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "fastbatch.cc"
_LIB_PATH = _SRC.parent / "libfastbatch.so"
_lib = None
_build_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    try:
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-pthread", str(_SRC), "-o", str(_LIB_PATH)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.fastbatch_gather_noise.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_float, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.fastbatch_gather_noise.restype = None
        lib.fastbatch_gather_affine_noise.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.fastbatch_gather_affine_noise.restype = None
        _lib = lib
        return _lib
    except Exception:
        _build_failed = True
        return None


def available() -> bool:
    """Whether the native fastbatch shared library compiled and loaded in this image."""
    return _load() is not None


def affine_of(transform: object) -> tuple[float, float] | None:
    """(scale, shift) if ``transform`` is one of the framework's affine
    normalizers (y = x*scale + shift), else None."""
    from multimodal_mtrssm_tpu.data.transforms import (
        Identity,
        NormalizeAudioMelSpectrogram,
        NormalizeVisionImage,
    )

    if isinstance(transform, Identity):
        return 1.0, 0.0
    if isinstance(transform, NormalizeVisionImage):
        return 2.0 / 255.0, -1.0
    if isinstance(transform, NormalizeAudioMelSpectrogram):
        scale = 2.0 / transform.range
        return scale, -transform.min_value * scale - 1.0
    return None


def gather_affine_noise(
    src: np.ndarray,
    idx: np.ndarray,
    seq_len: int,
    scale: float,
    shift: float,
    noise_std: float,
    seed: int,
    n_threads: int = 0,
) -> np.ndarray:
    """``src[idx, :seq_len] * scale + shift (+ noise)`` fused; numpy fallback."""
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    # numpy's :seq_len slice clamps to the episode length; the kernel must
    # see the same bound or it would read past the episode row.
    seq_len = min(int(seq_len), int(src.shape[1]))
    B = idx.shape[0]
    frame_shape = src.shape[2:]
    frame_elems = int(np.prod(frame_shape)) if frame_shape else 1
    lib = _load()
    if lib is None or not isinstance(src, np.ndarray) or src.dtype != np.float32:
        out = np.asarray(src[idx, :seq_len], dtype=np.float32) * scale + shift
        if noise_std > 0:
            rng = np.random.default_rng(seed)
            out += rng.normal(0.0, noise_std, out.shape).astype(np.float32)
        return out
    # memmaps are fine: ctypes reads through the mapping.
    src_c = src if src.flags["C_CONTIGUOUS"] else np.ascontiguousarray(src)
    out = np.empty((B, seq_len, *frame_shape), dtype=np.float32)
    lib.fastbatch_gather_affine_noise(
        src_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        src_c.shape[0], src_c.shape[1], frame_elems,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        B, seq_len, ctypes.c_float(scale), ctypes.c_float(shift),
        ctypes.c_float(noise_std), ctypes.c_uint64(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    return out


def gather_noise(
    src: np.ndarray,
    idx: np.ndarray,
    seq_len: int,
    noise_std: float,
    seed: int,
    n_threads: int = 0,
) -> np.ndarray:
    """``src[idx, :seq_len] (+ noise)`` via the native kernel; numpy fallback.

    ``src``: float32 [N, T, ...]; ``idx``: int [B]. Deterministic for a given
    seed (native and numpy paths use different RNGs but both are seeded).
    """
    src = np.ascontiguousarray(src, dtype=np.float32)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    # Match numpy's clamping :seq_len slice (no out-of-row reads in the kernel).
    seq_len = min(int(seq_len), int(src.shape[1]))
    B = idx.shape[0]
    frame_shape = src.shape[2:]
    frame_elems = int(np.prod(frame_shape)) if frame_shape else 1
    lib = _load()
    if lib is None:
        out = src[idx, :seq_len].copy()
        if noise_std > 0:
            rng = np.random.default_rng(seed)
            out += rng.normal(0.0, noise_std, out.shape).astype(np.float32)
        return out
    out = np.empty((B, seq_len, *frame_shape), dtype=np.float32)
    lib.fastbatch_gather_noise(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        src.shape[0], src.shape[1], frame_elems,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        B, seq_len, ctypes.c_float(noise_std), ctypes.c_uint64(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    return out
