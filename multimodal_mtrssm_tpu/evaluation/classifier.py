"""MNIST digit classifier (JAX) for scoring imagination rollouts.

Replaces the reference's torch ``SimpleMNISTClassifier``
(reference ``evaluation/mnist_classifier.py:9-156``): same architecture —
conv 1→32 (3×3, pad 1) → ReLU → maxpool 2, conv 32→64 → ReLU → maxpool 2,
fc 4096→128 → ReLU → dropout 0.5 → fc 128→10 — trained 5 epochs with Adam
1e-3 on 32×32-resized MNIST, plus ``recognize_digit`` argmax inference with
the reference's shape/clamp guards (``:104-135``) and checkpoint
save/load (``:138-156``).

MNIST ingestion: this image has no egress, so ``load_mnist_arrays`` reads a
local copy (torchvision layout, raw idx files, or an ``.npz``); tests train
on synthetic separable digits instead.
"""

from __future__ import annotations

import gzip
import struct
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_mtrssm_tpu.nn.conv import conv_init, conv_apply
from multimodal_mtrssm_tpu.nn.core import Params, dense_apply, dense_init


def classifier_init(key: jax.Array) -> Params:
    """Init the 2-conv MNIST classifier params (reference mnist_classifier.py:9-38)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "conv1": conv_init(k1, 1, 32, 3),
        "conv2": conv_init(k2, 32, 64, 3),
        "fc1": dense_init(k3, 64 * 8 * 8, 128),
        "fc2": dense_init(k4, 128, 10),
    }


def classifier_apply(
    params: Params, x: jax.Array, *, train: bool = False, dropout_key: jax.Array | None = None
) -> jax.Array:
    """Logits for ``x`` [N, 32, 32, 1] (NHWC)."""
    x = jax.nn.relu(conv_apply(params["conv1"], x, stride=1, padding=1))
    x = _maxpool2(x)
    x = jax.nn.relu(conv_apply(params["conv2"], x, stride=1, padding=1))
    x = _maxpool2(x)
    # Flatten in torch's CHW unit order for layout-stable fc1.
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape((x.shape[0], -1))
    x = jax.nn.relu(dense_apply(params["fc1"], x))
    if train:
        keep = 0.5
        mask = jax.random.bernoulli(dropout_key, keep, x.shape)
        x = jnp.where(mask, x / keep, 0.0)
    return dense_apply(params["fc2"], x)


def _maxpool2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def train_classifier(
    images: np.ndarray,
    labels: np.ndarray,
    *,
    num_epochs: int = 5,
    batch_size: int = 128,
    learning_rate: float = 1e-3,
    seed: int = 0,
) -> Params:
    """Train on [N, 32, 32, 1] float images in [0, 1] (reference ``:41-101``:
    5 epochs Adam 1e-3, cross-entropy)."""
    import optax

    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    params = classifier_init(k_init)
    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb, k):
        def loss_fn(p):
            logits = classifier_apply(p, xb, train=True, dropout_key=k)
            return optax.softmax_cross_entropy_with_integer_labels(logits, yb).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    n = len(images)
    rng = np.random.default_rng(seed)
    # Clamp the batch to the dataset so small datasets still take full
    # optimizer steps (a fixed 128 with n<128 would skip EVERY batch below
    # and silently return untrained params).
    batch_size = min(batch_size, n)
    n_batches = max(n // batch_size, 1)
    for epoch in range(num_epochs):
        perm = rng.permutation(n)
        for i in range(n_batches):
            idx = perm[i * batch_size : (i + 1) * batch_size]
            if len(idx) < batch_size:
                continue  # ragged tail: keep jit shapes static
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(images[idx]), jnp.asarray(labels[idx]), sub
            )
    return params


def recognize_digits(params: Params, images: jax.Array) -> jax.Array:
    """Batched argmax inference for [N, 32, 32, 1] images in [0, 1]
    (the reference classifies frames one at a time, ``:104-135``; the
    classifier feedback loop is batched on device here — SURVEY §7)."""
    images = jnp.clip(images, 0.0, 1.0)
    logits = classifier_apply(params, images, train=False)
    return jnp.argmax(logits, axis=-1)


def recognize_digit(params: Params, image: np.ndarray) -> int:
    """Single-image inference with the reference's shape guards: accepts
    (32, 32), (1, 32, 32), (32, 32, 1)."""
    img = np.asarray(image, dtype=np.float32)
    if img.ndim == 3 and img.shape[0] == 1:  # CHW
        img = img[0]
    if img.ndim == 3 and img.shape[-1] == 1:  # HWC
        img = img[..., 0]
    if img.shape != (32, 32):
        raise ValueError(f"expected 32x32 image, got {img.shape}")
    return int(recognize_digits(params, jnp.asarray(img)[None, :, :, None])[0])


# ---------------------------------------------------------------------------
# Persistence (reference load_pretrained_classifier, :138-156)
# ---------------------------------------------------------------------------


def _npz_path(path: str | Path) -> Path:
    """np.savez appends ``.npz`` to other suffixes; normalize up front so
    save/exists/load all agree on the on-disk name."""
    p = Path(path)
    return p if p.suffix == ".npz" else p.with_suffix(p.suffix + ".npz")


def save_classifier(params: Params, path: str | Path) -> None:
    """Save classifier params as a flat `.npz` (slash-joined key paths)."""
    flat = {"/".join(map(str, k)): np.asarray(v) for k, v in _flatten(params)}
    np.savez(_npz_path(path), **flat)


def load_classifier(path: str | Path) -> Params:
    """Load params saved by `save_classifier`, rebuilding the nested dict tree."""
    with np.load(path) as z:
        out: Params = {}
        for key, arr in z.items():
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(arr)
    return out


def load_or_train_classifier(
    ckpt_path: str | Path,
    mnist_root: str | Path | None = None,
    **train_kwargs: object,
) -> Params:
    """Load ``ckpt_path`` if present; otherwise train on local MNIST and save."""
    ckpt_path = _npz_path(ckpt_path)
    if ckpt_path.exists():
        return load_classifier(ckpt_path)
    if mnist_root is None:
        raise FileNotFoundError(
            f"no classifier checkpoint at {ckpt_path} and no --mnist-root given "
            "(this image has no egress; provide a local MNIST copy)"
        )
    images, labels = load_mnist_arrays(mnist_root)
    params = train_classifier(images, labels, **train_kwargs)
    save_classifier(params, ckpt_path)
    return params


def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, (*prefix, k))
        else:
            yield (*prefix, k), v


# ---------------------------------------------------------------------------
# MNIST loading (local only)
# ---------------------------------------------------------------------------


def load_mnist_arrays(root: str | Path) -> tuple[np.ndarray, np.ndarray]:
    """Load MNIST train images/labels from a local copy and resize to 32×32.

    Accepts: a dir with raw idx files (``train-images-idx3-ubyte[.gz]``, as
    torchvision's ``MNIST/raw`` lays out), or an ``.npz`` with
    ``images``/``labels``.
    """
    root = Path(root)
    if root.suffix == ".npz":
        with np.load(root) as z:
            images, labels = z["images"], z["labels"]
    else:
        candidates = [root, root / "MNIST" / "raw", root / "raw"]
        base = next((c for c in candidates if list(c.glob("train-images-idx3-ubyte*"))), None)
        if base is None:
            raise FileNotFoundError(f"no MNIST idx files under {root}")
        images = _read_idx(next(iter(base.glob("train-images-idx3-ubyte*"))))
        labels = _read_idx(next(iter(base.glob("train-labels-idx1-ubyte*"))))
    images = images.astype(np.float32) / 255.0
    if images.shape[-1] != 32:
        images = _resize_28_to_32(images)
    return images[..., None], labels.astype(np.int32)


def _read_idx(path: Path) -> np.ndarray:
    opener = gzip.open if path.suffix == ".gz" else open
    with opener(path, "rb") as f:
        magic, = struct.unpack(">H", f.read(4)[2:])
        dtype_code, ndim = magic >> 8, magic & 0xFF
        dims = struct.unpack(f">{ndim}I", f.read(4 * ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(dims)


def _resize_28_to_32(images: np.ndarray) -> np.ndarray:
    """Bilinear 28×28 → 32×32 upscale, matching the reference's
    ``transforms.Resize((32, 32))`` (``mnist_classifier.py:89``, PIL
    bilinear). The scored frames come from 32×32 episodes whose digits
    fill the frame, so the classifier must train on full-scale digits —
    center-padding would introduce a scale domain shift (CNNs are not
    scale invariant)."""
    n, h, w = images.shape
    ys = (np.arange(32) + 0.5) * (h / 32.0) - 0.5
    xs = (np.arange(32) + 0.5) * (w / 32.0) - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[None, :, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, None, :]
    top = images[:, y0][:, :, x0] * (1 - wx) + images[:, y0][:, :, x1] * wx
    bot = images[:, y1][:, :, x0] * (1 - wx) + images[:, y1][:, :, x1] * wx
    return (top * (1 - wy) + bot * wy).astype(images.dtype)
