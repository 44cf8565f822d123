"""Input pipeline: episode store → preprocessed arrays → device batches.

Replaces the reference's Lightning DataModule + torch DataLoader stack
(reference ``src/multimodal_rssm/models/dataset.py:190-365`` and
``mrssm/dataset.py:21-183``). TPU-first design:

- The full Audio-MNIST dataset is small (a few hundred 180-frame episodes);
  after one-time preprocessing it is held as contiguous host numpy arrays —
  no worker processes, no per-item file IO (the reference runs 4 torch
  DataLoader workers with persistent_workers, ``dataset.py:321-342``).
- Batch assembly = array slicing + one vectorized noise draw; batches are
  moved to device asynchronously (``jax.device_put`` double-buffering
  replaces pinned-memory prefetch).
- Batch tuple order preserves the reference's 6-way StackDataset contract
  (reference ``mrssm/dataset.py:168-183``): (action_input, audio_input,
  vision_input, action_target, audio_target, vision_target).
- The 0.8 sorted-path train/val split matches reference ``dataset.py:69-81``.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from pathlib import Path
from typing import Callable, Iterator

import jax
import numpy as np

# device_put / sharding target for host->device staging: a jax.Device, a
# Sharding, or None (default device).
Placement = jax.Device | jax.sharding.Sharding | None

from multimodal_mtrssm_tpu.data import episodes as ep
from multimodal_mtrssm_tpu.data.transforms import (
    Identity,
    NormalizeAudioMelSpectrogram,
    NormalizeVisionImage,
)

Batch = tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]


@dataclasses.dataclass
class DataModuleConfig:
    """Mirror of the reference's ``EpisodeDataModuleConfig`` surface
    (reference ``mrssm/dataset.py:21-52`` + ``dataset.py:114-187``)."""

    data_dir: str | Path = "data/audio_mnist"
    batch_size: int = 8
    sequence_length: int = 30  # TakeFirstN n (configs :180-220)
    noise_std: float = 0.1  # GaussianNoise on inputs only
    train_ratio: float = 0.8
    audio_min: float = -80.0
    audio_max: float = 0.0
    seed: int = 42
    # None | "audio" | "vision" (ZeroOut that input stream) | "random"
    # (per-sample: each episode keeps both / drops audio / drops vision,
    # 1/3 each — trains one model robust to either missing modality).
    drop_modality: str | None = None
    # Reference DataLoader default is drop_last=False: the ragged tail batch
    # trains/validates too. The tail is served as a separate smaller batch
    # (one extra jit compile per distinct tail size, cached afterwards);
    # True restores strict static-shape-only batching.
    drop_last: bool = False
    # "multimodal" → 6-tuple batches (reference StackDataset order);
    # "audio"/"vision" → 4-tuple unimodal batches (action_in, obs_in,
    # action_tgt, obs_tgt) for the unimodal RSSM family.
    modality: str = "multimodal"
    # Common processed-data override dir (reference
    # get_effective_processed_data_dir, dataset.py:136-161): when this
    # directory holds a full episode set it takes precedence over data_dir.
    common_processed_dir: str | Path = Path("data") / "processed_data"
    # Full per-stream transform overrides (None ⇒ reference defaults above).
    action_preprocess: Callable | None = None
    audio_preprocess: Callable | None = None
    vision_preprocess: Callable | None = None
    # Device-resident dataset (TPU-native fast path): upload the normalized,
    # T-sliced episode streams to device HBM once and assemble every
    # [K,B,...] scan chunk ON DEVICE (gather + on-device input noise), so
    # steady-state training moves one small int32 index array per chunk
    # instead of ~1 GB of stacked batches over the host link. Host-side
    # assembly caps e2e training at ~0.7-2k seq/s at the reference config
    # (BASELINE.md e2e section) vs the ~7.4k seq/s device capability.
    # Opt-in: the dataset must fit in HBM next to the model and one chunk.
    # Noise parity is distributional, not bit-wise (jax RNG, not numpy).
    # Multi-device meshes replicate the dataset and pin chunks to the batch
    # sharding (single process). Unsupported (falls back to host streaming
    # with a warning): memmapped pack mode, multi-host runs, and datasets
    # over device_resident_max_bytes; the accumulate_grad_batches per-step
    # path stays host-streamed.
    device_resident: bool = False
    # HBM budget for the resident streams (default 8 GB — leaves room for
    # the model, one [K,B,...] chunk and XLA scratch on a 16 GB v5e).
    device_resident_max_bytes: int = 8 << 30


def effective_data_dir(cfg: "DataModuleConfig") -> Path:
    """Reference ``get_effective_processed_data_dir`` (``dataset.py:136-161``):
    a common processed-data directory overrides the per-dataset dir when it
    contains a full episode set in any layout this pipeline loads —
    ``.npz`` episodes, a memmapped pack, or a reference-format
    ``act_*/audio_obs_*/vision_obs_*`` ``.pt``/``.npy`` dump (converted
    once automatically in ``setup``).
    """
    common = Path(cfg.common_processed_dir)
    if common.exists():
        from multimodal_mtrssm_tpu.data import pack as packmod

        if (packmod.has_pack(common) or ep.list_episodes(common)
                or _is_reference_pt_layout(common)):  # auto-converted in setup
            return common
    return Path(cfg.data_dir)


def _is_reference_pt_layout(d: Path) -> bool:
    """True for a reference-format processed dir: ``act_*`` files WITH their
    matching observation streams (a lone ``act``-prefixed stray must not
    hijack an explicitly configured data_dir)."""
    return bool(sorted(d.glob("act_*")) and sorted(d.glob("audio_obs_*"))
                and sorted(d.glob("vision_obs_*")))


class EpisodeDataModule:
    """Loads episodes, preprocesses once, serves device-ready batches."""

    def __init__(self, config: DataModuleConfig):
        self.cfg = config
        self._arrays: dict[str, np.ndarray] | None = None
        self._split: tuple[np.ndarray, np.ndarray] | None = None
        self._raw = False
        self._preprocess: dict | None = None
        self._dev_data: dict | None = None  # device-resident streams (cached)
        self._dev_data_key: object = None  # placement the cache was made for
        self._gather_fns: dict = {}  # jitted chunk assemblers, per out-sharding
        self._dev_warned = False

    # ---- preparation -------------------------------------------------------
    def setup(self) -> None:
        cfg = self.cfg
        self._preprocess = {
            "action": cfg.action_preprocess or Identity(),
            "audio": cfg.audio_preprocess or NormalizeAudioMelSpectrogram(cfg.audio_min, cfg.audio_max),
            "vision": cfg.vision_preprocess or NormalizeVisionImage(),
        }
        from multimodal_mtrssm_tpu.data import pack as packmod

        data_dir = effective_data_dir(cfg)
        pack_dir = Path(data_dir) / "pack"
        if packmod.has_pack(data_dir):
            pack_dir = Path(data_dir)
        if packmod.has_pack(pack_dir):
            # Memory-mapped pack: raw streams on disk; preprocessing is
            # applied per gathered batch (only the touched pages load).
            self._arrays = packmod.open_pack(pack_dir)
            self._raw = True
            n = self._arrays["action"].shape[0]
        else:
            paths = ep.list_episodes(data_dir)
            if not paths and _is_reference_pt_layout(Path(data_dir)):
                # Reference-layout processed dir (act_*/audio_obs_*/vision_obs_*
                # .pt/.npy triplets): convert once in place, like the
                # reference's one-time prepare_data (``dataset.py:264-315``).
                # A completion marker guards against accepting a partial
                # earlier conversion (crash mid-convert) as the dataset.
                converted = Path(data_dir) / "converted_episodes"
                marker = converted / "_converted_ok.json"
                if not marker.exists():
                    if ep.list_episodes(converted):
                        print(f"incomplete earlier conversion in {converted}; reconverting")
                    n = ep.convert_reference_processed_dir(data_dir, converted)
                    import json

                    marker.write_text(json.dumps({"n_episodes": n}))
                    print(f"converted {n} reference-format episodes into {converted}")
                paths = ep.list_episodes(converted)
            if not paths:
                raise FileNotFoundError(
                    f"no episodes under {data_dir}; generate with "
                    "multimodal_mtrssm_tpu.data.episodes.generate_synthetic_audio_mnist, "
                    "convert with convert_audio_mnist_npz/convert_reference_processed_dir, "
                    "or pack with data.pack.pack_episodes"
                )
            actions, audios, visions = [], [], []
            for p in paths:
                e = ep.load_episode(p)
                actions.append(self._preprocess["action"](e.action))
                audios.append(self._preprocess["audio"](e.audio))
                visions.append(self._preprocess["vision"](e.vision))
            self._arrays = {
                "action": np.stack(actions).astype(np.float32),
                "audio": np.stack(audios).astype(np.float32),
                "vision": np.stack(visions).astype(np.float32),
            }
            self._raw = False
            n = len(paths)
        split = int(n * cfg.train_ratio)
        self._split = (np.arange(split), np.arange(split, n))

    def _require_setup(self):
        if self._arrays is None:
            self.setup()

    @property
    def n_train(self) -> int:
        self._require_setup()
        return len(self._split[0])

    @property
    def n_val(self) -> int:
        self._require_setup()
        return len(self._split[1])

    @property
    def train_batch_size(self) -> int:
        """Effective train batch: clamped so small datasets still train."""
        return max(1, min(self.cfg.batch_size, self.n_train))

    @property
    def val_batch_size(self) -> int:
        return max(1, min(self.cfg.batch_size, self.n_val)) if self.n_val else 0

    def _streams(self) -> tuple[str, ...]:
        """The streams the configured modality serves — the single source of
        truth for batch assembly, sizing, the HBM budget guard, and the
        device-resident upload."""
        return {
            "audio": ("action", "audio"),
            "vision": ("action", "vision"),
        }.get(self.cfg.modality, ("action", "audio", "vision"))

    def batch_nbytes(self, bs: int) -> int:
        """Approximate f32 bytes of one assembled batch (inputs + targets) —
        the sizing input for the auto steps-per-dispatch heuristic. Counts
        only the streams the configured modality actually serves."""
        self._require_setup()
        T = self.cfg.sequence_length
        per_frame = sum(int(np.prod(self._arrays[s].shape[2:])) for s in self._streams())
        return 2 * bs * T * per_frame * 4

    # ---- batch assembly ------------------------------------------------------
    def _make_batch(self, idx: np.ndarray, rng: np.random.Generator | None) -> Batch:
        """6-tuple batch; inputs get Gaussian noise, targets don't
        (reference configs :157-220)."""
        from multimodal_mtrssm_tpu.data import native

        cfg = self.cfg
        T = cfg.sequence_length
        # Only assemble the streams the configured modality serves — a
        # unimodal run must not pay the gather/normalize/noise cost (and,
        # in pack mode, the disk pages) of the dropped stream.
        streams = self._streams()
        stream_k = {"action": 0, "audio": 1, "vision": 2}
        outs: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        if self._raw:
            # Pack mode: gather raw pages, then preprocess the small batch
            # (noise must follow normalization — reference transform order).
            # Known-affine normalizers take the fused native path.
            std = cfg.noise_std if rng is not None else 0.0
            seed = int(rng.integers(0, 2**62)) if rng is not None else 0
            for stream in streams:
                k = stream_k[stream]
                pre = self._preprocess[stream]
                affine = native.affine_of(pre)
                if affine is not None:
                    clean = native.gather_affine_noise(
                        self._arrays[stream], idx, T, affine[0], affine[1], 0.0, 0
                    ) if std > 0 else None
                    noised = native.gather_affine_noise(
                        self._arrays[stream], idx, T, affine[0], affine[1], std, seed ^ (k + 1)
                    )
                    outs[stream] = (noised, clean if clean is not None else noised)
                else:
                    clean = pre(np.asarray(self._arrays[stream][idx, :T]))
                    if std > 0:
                        noised = clean + rng.normal(0, std, clean.shape).astype(np.float32)
                    else:
                        noised = clean
                    outs[stream] = (noised, clean)
        else:
            noise = rng is not None and cfg.noise_std > 0
            seed = int(rng.integers(0, 2**62)) if noise else 0
            for stream in streams:
                clean = self._arrays[stream][idx, :T]
                if noise:
                    # Fused parallel gather+noise (native/fastbatch.cc;
                    # numpy fallback).
                    noised = native.gather_noise(
                        self._arrays[stream], idx, T, cfg.noise_std,
                        seed ^ (stream_k[stream] + 1),
                    )
                else:
                    noised = clean
                outs[stream] = (noised, clean)
        a_in, a = outs["action"]
        if cfg.drop_modality == "audio" and "audio" in outs:
            outs["audio"] = (np.full_like(outs["audio"][0], -1.0), outs["audio"][1])
        elif cfg.drop_modality == "vision" and "vision" in outs:
            outs["vision"] = (np.full_like(outs["vision"][0], -1.0), outs["vision"][1])
        elif cfg.drop_modality == "random" and "audio" in outs and "vision" in outs:
            # Per-SAMPLE modality dropout: each episode independently keeps
            # both streams, drops audio, or drops vision (⅓ each) — trains
            # ONE model robust to either missing modality (the production
            # extension of the static crossmodal config; validation batches
            # have rng=None and stay clean, so val/loss compares across
            # configs). Targets stay clean either way.
            if rng is not None:
                choice = rng.integers(0, 3, size=len(idx))
                a_sel = choice.reshape((-1,) + (1,) * (outs["audio"][0].ndim - 1)) == 1
                v_sel = choice.reshape((-1,) + (1,) * (outs["vision"][0].ndim - 1)) == 2
                outs["audio"] = (np.where(a_sel, -1.0, outs["audio"][0]).astype(np.float32),
                                 outs["audio"][1])
                outs["vision"] = (np.where(v_sel, -1.0, outs["vision"][0]).astype(np.float32),
                                  outs["vision"][1])
        if cfg.modality == "audio":
            au_in, au = outs["audio"]
            return (a_in, au_in, a, au)
        if cfg.modality == "vision":
            vi_in, vi = outs["vision"]
            return (a_in, vi_in, a, vi)
        au_in, au = outs["audio"]
        vi_in, vi = outs["vision"]
        return (a_in, au_in, vi_in, a, au, vi)

    def _batch_consumes_rng(self, rng: np.random.Generator | None) -> bool:
        """Whether ``_make_batch(idx, rng)`` advances the host RNG — the
        predicate the mid-epoch cheap skip keys off (skipping at the index
        level is only bit-exact when no per-batch RNG is consumed).

        MUST mirror ``_make_batch``'s draw sites exactly: pack mode draws
        the noise seed whenever ``rng`` is given, even at ``noise_std == 0``
        (the ``rng.integers`` at the top of the raw branch); array mode
        draws only when noise is actually applied. Any new ``rng.*`` call
        in ``_make_batch`` must update this predicate in the same change."""
        if rng is None:
            return False
        if self._raw:
            return True
        return self.cfg.noise_std > 0

    def _batched_indices(self, idx: np.ndarray, bs: int) -> list[np.ndarray]:
        """Split indices into full batches plus (unless drop_last) the ragged
        tail as a smaller final batch (reference DataLoader drop_last=False:
        every episode contributes each epoch)."""
        if bs <= 0:
            return []
        n_full = len(idx) // bs
        out = [idx[i * bs : (i + 1) * bs] for i in range(n_full)]
        if not self.cfg.drop_last and len(idx) % bs:
            out.append(idx[n_full * bs :])
        return out

    def train_batches(self, epoch: int, device: Placement = None, skip: int = 0) -> Iterator[Batch]:
        """Shuffled train batches for one epoch.

        ``skip``: drop the first N batches AFTER generating them (the RNG
        stream stays identical to a full epoch) — mid-epoch preemption
        resume continues exactly where the interrupted epoch stopped.
        """
        self._require_setup()
        cfg = self.cfg
        bs = self.train_batch_size
        rng = np.random.default_rng((cfg.seed, epoch))
        idx = rng.permutation(self._split[0])
        groups = self._batched_indices(idx, bs)
        if skip and not self._batch_consumes_rng(rng):
            # No per-batch host RNG: skip at the index level (bit-identical
            # stream, no wasted assembly of already-trained batches).
            groups = groups[skip:]
            skip = 0
        batches = (self._make_batch(b, rng) for b in groups)
        if skip:
            batches = (b for i, b in enumerate(batches) if i >= skip)
        return _device_prefetch(batches, device)

    def train_batches_chunked(
        self, epoch: int, k: int, device: Placement = None,
        stacked_device: Placement = None, skip: int = 0
    ) -> Iterator[tuple[str, Batch]]:
        """Shuffled train batches grouped for the multi-step-scan train path.

        Yields ``("scan", stacked)`` items where ``stacked`` is k full-size
        batches stacked on a new leading axis ([k, B, ...] per stream), then
        ``("step", batch)`` for the remaining batches (fewer than k full
        ones, plus the ragged tail). Batch contents and order are IDENTICAL
        to ``train_batches(epoch)`` — same permutation, same noise draws —
        so the scan path trains the exact same steps with K× fewer host
        dispatches (each one a tunnel/PCIe round trip on this backend).

        ``skip``: drop the first N yielded ITEMS after generating them
        (RNG stream unchanged) — mid-epoch preemption resume.
        """
        self._require_setup()
        cfg = self.cfg
        bs = self.train_batch_size
        rng = np.random.default_rng((cfg.seed, epoch))
        idx = rng.permutation(self._split[0])
        groups = self._batched_indices(idx, bs)
        if self._device_resident_active():
            base = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), epoch)
            return self._device_chunked_stream(groups, bs, k, base, skip,
                                               scan_sharding=stacked_device,
                                               step_sharding=device)
        return self._chunked_stream(groups, bs, rng, k, device, stacked_device, skip)

    def val_batches_chunked(
        self, k: int, device: Placement = None, stacked_device: Placement = None
    ) -> Iterator[tuple[str, Batch]]:
        """Validation counterpart of ``train_batches_chunked``: same batches
        as ``val_batches`` (identical noise draws and order), grouped into
        [k, B, ...] stacks for the scan val step.

        ``k`` is clamped to the number of FULL val batches: the val split is
        typically far smaller than the train split that sized ``k``, and an
        unclamped ``k`` would leave every val batch on the per-step path
        (one ~30 ms tunnel round trip each) — the val epoch would then cost
        more than the train epoch it follows."""
        self._require_setup()
        cfg = self.cfg
        bs = self.val_batch_size
        rng = np.random.default_rng((cfg.seed, 987654321))
        groups = self._batched_indices(self._split[1], bs)
        n_full = sum(1 for g in groups if len(g) == bs)
        k = max(1, min(k, n_full))
        if self._device_resident_active():
            base = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), 987654321)
            return self._device_chunked_stream(groups, bs, k, base,
                                               scan_sharding=stacked_device,
                                               step_sharding=device)
        return self._chunked_stream(groups, bs, rng, k, device, stacked_device)

    @staticmethod
    def _grouped_indices(groups, bs, k):
        """Group index batches for the chunked streams: full batches
        accumulate into ``("scan", [k, B] index matrix)`` items; a ragged
        batch flushes the buffer as ``("step", [B'] indices)`` items first so
        the step ORDER matches the unchunked stream exactly. Shared by the
        host and device chunk streams — their item order (and therefore the
        mid-epoch-resume skip counting) cannot diverge."""
        pending: list[np.ndarray] = []
        for g in groups:
            if len(g) == bs and k > 1:
                pending.append(g)
                if len(pending) == k:
                    yield ("scan", np.stack(pending))
                    pending = []
            else:
                for pb in pending:
                    yield ("step", pb)
                pending = []
                yield ("step", g)
        for pb in pending:
            yield ("step", pb)

    def _chunked_stream(self, groups, bs, rng, k, device, stacked_device, skip: int = 0):
        # Mid-epoch resume: when no host RNG is drawn per batch
        # (``_batch_consumes_rng``), skipped items need not be assembled at
        # all; dropping them at the index level leaves the served stream
        # bit-identical. With per-batch RNG the skipped batches ARE
        # assembled so the draw sequence matches the interrupted epoch.
        cheap_skip = bool(skip) and not self._batch_consumes_rng(rng)

        def gen():
            for i, (kind, idx) in enumerate(self._grouped_indices(groups, bs, k)):
                if cheap_skip and i < skip:
                    yield (kind, None)  # place() drops it before assembly
                elif kind == "scan":
                    # Per-batch assembly in group order keeps the noise-RNG
                    # draw sequence identical to the unchunked stream.
                    batches = [self._make_batch(g, rng) for g in idx]
                    yield ("scan", tuple(np.stack(xs) for xs in zip(*batches)))
                else:
                    yield ("step", self._make_batch(idx, rng))

        def place(items):
            for i, (kind, b) in enumerate(items):
                if i < skip:  # mid-epoch resume: already trained, never placed
                    continue
                yield (kind, _place_batch(b, stacked_device if kind == "scan" else device))

        return _prefetch_iter(place(gen()))

    # ---- device-resident fast path -----------------------------------------
    def _device_resident_active(self) -> bool:
        """True when the device-resident chunk path should serve this stream."""
        if not self.cfg.device_resident:
            return False
        reason = None
        if self._raw:
            reason = "memmapped pack mode keeps raw pages on disk"
        elif jax.process_count() > 1:
            reason = "multi-host runs stream per-host shards"
        else:
            T = self.cfg.sequence_length
            nbytes = sum(self._arrays[s][:, :T].nbytes for s in self._streams())
            if nbytes > self.cfg.device_resident_max_bytes:
                reason = (f"dataset needs {nbytes >> 20} MB resident, over the "
                          f"{self.cfg.device_resident_max_bytes >> 20} MB budget "
                          "(device_resident_max_bytes)")
        if reason is not None:
            if not self._dev_warned:
                import warnings

                warnings.warn(
                    f"device_resident dataset disabled ({reason}); "
                    "falling back to host streaming", stacklevel=3)
                self._dev_warned = True
            return False
        return True

    @staticmethod
    def _as_sharding(device):
        """Normalize a batch-placement target to a Sharding (or None). The
        host path's ``jax.device_put`` accepts plain ``jax.Device``s, so the
        device-resident path must too."""
        if device is not None and not isinstance(device, jax.sharding.Sharding):
            return jax.sharding.SingleDeviceSharding(device)
        return device

    def _device_dataset(self, sharding=None) -> dict:
        """Upload the normalized, T-sliced streams once (cached jnp arrays).

        On a multi-device batch sharding the dataset is placed fully
        REPLICATED over the sharding's mesh (the standard replicated-data /
        sharded-batch DP input recipe) so each device gathers its own batch
        rows locally. A single-device target (Sharding or plain Device) pins
        the dataset to THAT device — not the default one — so the gather jit
        compiled against the target never round-trips through another chip.
        The cache is keyed on the placement: a stream later served with a
        different mesh re-uploads instead of handing the jits wrongly-placed
        data."""
        sharding = self._as_sharding(sharding)
        if sharding is not None and len(sharding.device_set) > 1:
            from multimodal_mtrssm_tpu.parallel.mesh import replicated

            rep = replicated(sharding.mesh)
            place_key: object = rep
            place = lambda a: jax.device_put(a, rep)  # noqa: E731
        elif sharding is not None:
            (dev,) = sharding.device_set
            sds = jax.sharding.SingleDeviceSharding(dev)
            place_key = sds
            place = lambda a: jax.device_put(a, sds)  # noqa: E731
        else:
            place_key = None
            place = jax.device_put
        if self._dev_data is None or self._dev_data_key != place_key:
            T = self.cfg.sequence_length
            self._dev_data = {
                s: place(np.ascontiguousarray(self._arrays[s][:, :T]))
                for s in self._streams()
            }
            self._dev_data_key = place_key
        return self._dev_data

    def _gather_jit(self, out_sharding=None):
        """Jitted on-device chunk assembler: (data, idx, key, item) → batch.

        ``idx`` is [k, B] (scan chunk) or [B] (single batch); the output
        mirrors ``_make_batch``'s tuple contract exactly — inputs get
        Gaussian noise (std = ``cfg.noise_std``) and ``drop_modality``
        zero-out, targets stay clean. Noise keys fold (key, item, stream),
        so every chunk item and stream draws an independent stream.
        ``out_sharding`` (optional NamedSharding) pins the output batch
        placement on a mesh; the compiled fn is cached per sharding.
        """
        if out_sharding in self._gather_fns:
            return self._gather_fns[out_sharding]
        import jax.numpy as jnp

        cfg = self.cfg
        std = float(cfg.noise_std)
        drop = cfg.drop_modality
        modality = cfg.modality

        def gather(data, idx, key, item):
            key = jax.random.fold_in(key, item)

            def g(name):
                return jnp.take(data[name], idx, axis=0)

            def noisy(x, s):
                if std <= 0:
                    return x
                return x + std * jax.random.normal(
                    jax.random.fold_in(key, s), x.shape, x.dtype)

            a = g("action")
            a_in = noisy(a, 0)
            if modality == "audio":
                au = g("audio")
                au_in = jnp.full_like(au, -1.0) if drop == "audio" else noisy(au, 1)
                return (a_in, au_in, a, au)
            if modality == "vision":
                vi = g("vision")
                vi_in = jnp.full_like(vi, -1.0) if drop == "vision" else noisy(vi, 2)
                return (a_in, vi_in, a, vi)
            au = g("audio")
            vi = g("vision")
            au_in = jnp.full_like(au, -1.0) if drop == "audio" else noisy(au, 1)
            vi_in = jnp.full_like(vi, -1.0) if drop == "vision" else noisy(vi, 2)
            if drop == "random":
                # Per-sample modality dropout (⅓ none / ⅓ audio / ⅓ vision)
                # — device-side mirror of the host path; draws its own
                # folded stream, so host vs device runs differ in WHICH
                # samples drop, same as the noise draws.
                choice = jax.random.randint(
                    jax.random.fold_in(key, 3), (idx.shape[0],), 0, 3)
                a_mask = jnp.reshape(choice == 1, (-1,) + (1,) * (au_in.ndim - 1))
                v_mask = jnp.reshape(choice == 2, (-1,) + (1,) * (vi_in.ndim - 1))
                au_in = jnp.where(a_mask, -1.0, au_in)
                vi_in = jnp.where(v_mask, -1.0, vi_in)
            return (a_in, au_in, vi_in, a, au, vi)

        fn = (jax.jit(gather) if out_sharding is None
              else jax.jit(gather, out_shardings=out_sharding))
        self._gather_fns[out_sharding] = fn
        return fn

    def _device_chunked_stream(self, groups, bs, k, base_key, skip: int = 0,
                               scan_sharding=None, step_sharding=None):
        """Device-side counterpart of ``_chunked_stream``: same grouping and
        yield order, but each item is assembled ON DEVICE by ``_gather_jit``
        from the device-resident dataset — the host moves only the int32
        index array. The noise-key schedule advances with the item counter
        even across ``skip``, so mid-epoch resume draws identical noise.
        On a multi-device mesh the dataset is replicated and chunk outputs
        are pinned to the batch sharding (a ragged item whose rows don't
        divide the mesh goes out unsharded and jit reshards, mirroring
        ``_place_batch``)."""
        scan_sharding = self._as_sharding(scan_sharding)
        step_sharding = self._as_sharding(step_sharding)
        data = self._device_dataset(step_sharding or scan_sharding)
        import jax.numpy as jnp

        def shard_for(kind, n_rows):
            sh = scan_sharding if kind == "scan" else step_sharding
            if sh is not None and n_rows % max(1, len(sh.device_set)):
                return None  # ragged item: go out unsharded, jit reshards
            return sh

        def gen():
            for item, (kind, idx) in enumerate(self._grouped_indices(groups, bs, k)):
                if item < skip:  # noise-key schedule still advances with item
                    continue
                idx_np = np.asarray(idx, dtype=np.int32)
                gather = self._gather_jit(shard_for(kind, idx_np.shape[-1]))
                yield (kind, gather(data, jnp.asarray(idx_np), base_key, item))

        return gen()

    def val_batches(self, device: Placement = None) -> Iterator[Batch]:
        """Deterministic validation batches (noise still applied to inputs,
        matching the reference's val DataLoader which reuses the same
        input transforms, ``mrssm/dataset.py:168-183``)."""
        self._require_setup()
        cfg = self.cfg
        rng = np.random.default_rng((cfg.seed, 987654321))
        batches = (
            self._make_batch(b, rng)
            for b in self._batched_indices(self._split[1], self.val_batch_size)
        )
        return _device_prefetch(batches, device)

    def host_batches(self, stage: str, epoch: int = 0) -> Iterator[Batch]:
        """Un-placed host batches (numpy) for consumers that post-process on
        the host anyway (viz frame assembly): skips the device staging that
        ``train_batches``/``val_batches`` perform."""
        self._require_setup()
        cfg = self.cfg
        if stage == "train":
            rng = np.random.default_rng((cfg.seed, epoch))
            idx = rng.permutation(self._split[0])
            bs = self.train_batch_size
        else:
            rng = np.random.default_rng((cfg.seed, 987654321))
            idx = self._split[1]
            bs = self.val_batch_size
        return (self._make_batch(g, rng) for g in self._batched_indices(idx, bs))


def _place_batch(b: Batch, sharding) -> Batch:
    """Stage one batch tuple on device with multi-host-safe placement: each
    process materializes only its local shard rows
    (``parallel.mesh.put_sharded``). A ragged tail not divisible by the mesh
    falls back to unsharded placement and lets jit reshard (one extra
    compile, exact math) — multi-host runs must avoid that path (pick a
    global batch divisible by the device count, or ``drop_last``)."""
    if sharding is None:
        return jax.device_put(b)
    from multimodal_mtrssm_tpu.parallel.mesh import put_sharded

    try:
        return tuple(put_sharded(x, sharding) for x in b)
    except ValueError:
        return jax.device_put(b)


def _device_prefetch(batches: Iterator[Batch], device: Placement,
                     depth: int = 2) -> Iterator[Batch]:
    """Host→device double buffering: a daemon thread stages `depth` batches
    ahead so transfers overlap compute."""
    return _prefetch_iter((_place_batch(b, device) for b in batches), depth)


def _prefetch_iter(items: Iterator, depth: int = 2) -> Iterator:
    """Run an iterator on a daemon thread, `depth` items ahead.

    If the consumer abandons the generator early (e.g. viz takes one batch),
    closing it sets ``stop`` so the worker thread exits instead of blocking
    on a full queue forever.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _SENTINEL = object()

    def _put(item) -> bool:
        """Put, retrying until delivered or the consumer is gone."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in items:
                if not _put(item):
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised on the consumer
            # Propagate assembly/staging errors to the consumer: swallowing
            # them would end the epoch early and train silently on a
            # truncated batch set.
            _put(_Raise(e))
        finally:
            _put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, _Raise):
                raise item.exc
            yield item
    finally:
        stop.set()


class _Raise:
    """Envelope carrying a worker-thread exception to the consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc
