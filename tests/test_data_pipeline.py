"""Tests: transforms, episode store, data module batching."""

import numpy as np

from multimodal_mtrssm_tpu.data import (
    DataModuleConfig,
    EpisodeDataModule,
    GaussianNoise,
    NormalizeAudioMelSpectrogram,
    NormalizeVisionImage,
    RemoveDim,
    TakeFirstN,
    ZeroOut,
    generate_synthetic_audio_mnist,
    list_episodes,
    load_episode,
    split_paths,
)


def test_transforms_reference_semantics():
    vis = np.array([[0.0, 127.5, 255.0]])
    np.testing.assert_allclose(NormalizeVisionImage()(vis), [[-1.0, 0.0, 1.0]], atol=1e-6)
    aud = np.array([[-80.0, -40.0, 0.0]])
    np.testing.assert_allclose(
        NormalizeAudioMelSpectrogram(-80.0, 0.0)(aud), [[-1.0, 0.0, 1.0]], atol=1e-6
    )
    x = np.arange(12.0).reshape(6, 2)
    assert TakeFirstN(3)(x).shape == (3, 2)
    y = RemoveDim(axis=1, indices_to_remove=[0])(x)
    np.testing.assert_array_equal(y, x[:, 1:])
    z = ZeroOut()(x)
    assert (z == -1.0).all()
    rng = np.random.default_rng(0)
    noised = GaussianNoise(0.1)(np.zeros((1000,), np.float32), rng)
    assert 0.05 < noised.std() < 0.15


def test_episode_store_roundtrip(tmp_path):
    paths = generate_synthetic_audio_mnist(tmp_path, n_episodes=3, episode_length=8)
    assert len(list_episodes(tmp_path)) == 3
    e = load_episode(paths[0])
    assert e.action.shape == (8, 6)
    assert e.audio.shape == (8, 32, 32, 1)
    assert e.vision.shape == (8, 32, 32, 1)
    assert e.audio.min() >= -80.0 and e.audio.max() <= 0.0
    assert e.vision.min() >= 0.0 and e.vision.max() <= 255.0
    # one-hot actions
    np.testing.assert_allclose(e.action.sum(-1), 1.0)
    train, val = split_paths(paths, 0.8)
    assert len(train) == 2 and len(val) == 1


def test_datamodule_batches(tmp_path):
    generate_synthetic_audio_mnist(tmp_path, n_episodes=10, episode_length=12)
    dm = EpisodeDataModule(DataModuleConfig(data_dir=tmp_path, batch_size=4, sequence_length=6))
    dm.setup()
    assert dm.n_train == 8 and dm.n_val == 2
    batches = list(dm.train_batches(epoch=0))
    assert len(batches) == 2  # 8 episodes / batch 4
    b = batches[0]
    assert len(b) == 6
    a_in, au_in, vi_in, a_tg, au_tg, vi_tg = (np.asarray(x) for x in b)
    assert a_in.shape == (4, 6, 6)
    assert au_in.shape == (4, 6, 32, 32, 1)
    assert vi_tg.shape == (4, 6, 32, 32, 1)
    # targets normalized to [-1, 1] and noise-free; inputs = targets + noise
    assert au_tg.min() >= -1.0 - 1e-5 and au_tg.max() <= 1.0 + 1e-5
    assert not np.allclose(au_in, au_tg)
    assert np.abs(au_in - au_tg).mean() < 0.5
    np.testing.assert_array_equal(a_tg, np.asarray(batches[0][3]))


def test_pack_mode_matches_ram_mode(tmp_path):
    """Memmapped-pack batches must equal in-RAM batches (noise off)."""
    from multimodal_mtrssm_tpu.data.pack import has_pack, pack_episodes

    generate_synthetic_audio_mnist(tmp_path, n_episodes=6, episode_length=10)
    cfg = DataModuleConfig(data_dir=tmp_path, batch_size=2, sequence_length=5, noise_std=0.0)
    dm_ram = EpisodeDataModule(cfg)
    dm_ram.setup()  # before the pack exists → RAM mode
    assert not dm_ram._raw

    meta = pack_episodes(tmp_path, tmp_path / "pack")
    assert meta["n_episodes"] == 6
    assert has_pack(tmp_path / "pack")
    dm_pack = EpisodeDataModule(cfg)
    dm_pack.setup()  # pack now present → memmap mode
    assert dm_pack._raw
    b_ram = [np.asarray(x) for x in next(iter(dm_ram.train_batches(epoch=0)))]
    b_pack = [np.asarray(x) for x in next(iter(dm_pack.train_batches(epoch=0)))]
    for x, y in zip(b_ram, b_pack):
        np.testing.assert_allclose(x, y, atol=1e-6)


def test_datamodule_determinism_and_modality_drop(tmp_path):
    generate_synthetic_audio_mnist(tmp_path, n_episodes=8, episode_length=10)
    cfg = DataModuleConfig(data_dir=tmp_path, batch_size=4, sequence_length=5, seed=7)
    b1 = [np.asarray(x) for x in next(iter(EpisodeDataModule(cfg).train_batches(epoch=0)))]
    b2 = [np.asarray(x) for x in next(iter(EpisodeDataModule(cfg).train_batches(epoch=0)))]
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x, y)
    cfg_drop = DataModuleConfig(
        data_dir=tmp_path, batch_size=4, sequence_length=5, seed=7, drop_modality="audio"
    )
    b3 = next(iter(EpisodeDataModule(cfg_drop).train_batches(epoch=0)))
    assert (np.asarray(b3[1]) == -1.0).all()  # audio input zeroed-out
    assert not (np.asarray(b3[4]) == -1.0).all()  # audio target untouched


def test_ragged_tail_batches_served(tmp_path):
    """drop_last=False (reference DataLoader default): the ragged tail is a
    smaller final batch in both loaders; drop_last=True restores the old
    static-only behavior."""
    from multimodal_mtrssm_tpu.data import (
        DataModuleConfig,
        EpisodeDataModule,
        generate_synthetic_audio_mnist,
    )

    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=11, episode_length=5)
    dm = EpisodeDataModule(DataModuleConfig(data_dir=data_dir, batch_size=4, sequence_length=3))
    dm.setup()
    # 11 episodes → 8 train (4+4), 3 val (3)
    train_sizes = [b[0].shape[0] for b in dm.train_batches(0)]
    val_sizes = [b[0].shape[0] for b in dm.val_batches()]
    assert sum(train_sizes) == dm.n_train
    assert sum(val_sizes) == dm.n_val
    assert val_sizes[-1] == dm.n_val % 4 or dm.n_val % 4 == 0

    dm2 = EpisodeDataModule(DataModuleConfig(data_dir=data_dir, batch_size=3, sequence_length=3,
                                             drop_last=True))
    dm2.setup()  # 8 train → 3+3, tail 2 dropped
    assert [b[0].shape[0] for b in dm2.train_batches(0)] == [3, 3]


def test_reference_pt_dir_trains_directly(tmp_path):
    """Pointing the datamodule at a reference-layout processed dir
    (act_*/audio_obs_*/vision_obs_* .pt triplets, reference
    mrssm/dataset.py:105-153) converts once automatically and serves
    batches — no manual conversion step."""
    import torch

    rng = np.random.default_rng(0)
    for i in range(4):
        torch.save(torch.from_numpy(rng.normal(size=(6, 6)).astype(np.float32)),
                   tmp_path / f"act_{i:04d}.pt")
        torch.save(torch.from_numpy(rng.uniform(-80, 0, (6, 1, 32, 32)).astype(np.float32)),
                   tmp_path / f"audio_obs_{i:04d}.pt")
        torch.save(torch.from_numpy(rng.uniform(0, 255, (6, 1, 32, 32)).astype(np.float32)),
                   tmp_path / f"vision_obs_{i:04d}.pt")

    dm = EpisodeDataModule(DataModuleConfig(data_dir=tmp_path, batch_size=2, sequence_length=3))
    dm.setup()
    assert dm.n_train == 3 and dm.n_val == 1
    b = next(iter(dm.train_batches(epoch=0)))
    assert np.asarray(b[1]).shape == (2, 3, 32, 32, 1)  # CHW → NHWC on convert
    # second setup reuses the converted store (no re-conversion)
    dm2 = EpisodeDataModule(DataModuleConfig(data_dir=tmp_path, batch_size=2, sequence_length=3))
    dm2.setup()
    assert dm2.n_train == 3


def test_prefetch_propagates_worker_errors():
    """Batch-assembly errors must surface to the training loop, not end the
    epoch early as a silent truncation."""
    import pytest

    from multimodal_mtrssm_tpu.data.pipeline import _prefetch_iter

    def gen():
        yield 1
        raise RuntimeError("corrupt episode")

    it = _prefetch_iter(gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="corrupt episode"):
        next(it)


def test_synthetic_labeled_generator_non_divisible_length(tmp_path):
    """episode_length not divisible by frames_per_word labels every frame
    (last word truncated) instead of crashing."""
    from multimodal_mtrssm_tpu.data.episodes import generate_synthetic_labeled_audio_mnist

    generate_synthetic_labeled_audio_mnist(
        tmp_path / "ep", tmp_path / "ev", n_episodes=2, episode_length=25, frames_per_word=18
    )
    import numpy as np

    npz = sorted((tmp_path / "ev").glob("sample_*.npz"))
    assert npz
    with np.load(npz[0]) as z:
        assert z["label"].shape[0] == 25


def test_val_chunked_clamps_k_to_full_batches(tmp_path):
    """A train-sized k (e.g. 256) must not push every val batch onto the
    per-step path: k is clamped to the val split's full-batch count so the
    val epoch still runs as one scan chunk (+ ragged tail)."""
    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=23, episode_length=5)
    dm = EpisodeDataModule(DataModuleConfig(data_dir=data_dir, batch_size=2, sequence_length=3))
    dm.setup()
    # 23 episodes -> 18 train, 5 val -> 2 full val batches of 2 + tail of 1
    items = list(dm.val_batches_chunked(256))
    kinds = [kind for kind, _ in items]
    assert kinds == ["scan", "step"]
    scan_stack = items[0][1]
    assert scan_stack[0].shape[:2] == (2, 2)  # [k=2 full batches, B=2, ...]
    assert items[1][1][0].shape[0] == 1  # ragged tail batch
    # Contents identical to the unchunked stream (same noise draws/order).
    unchunked = list(dm.val_batches())
    for j in range(2):
        for s in range(len(scan_stack)):
            np.testing.assert_array_equal(np.asarray(scan_stack[s][j]),
                                          np.asarray(unchunked[j][s]))
    for s in range(len(scan_stack)):
        np.testing.assert_array_equal(np.asarray(items[1][1][s]),
                                      np.asarray(unchunked[2][s]))


def test_device_resident_stream_matches_host_stream(tmp_path):
    """device_resident=True assembles chunks on device; with noise off the
    items must be BIT-equal to the host-assembled stream (same permutation,
    same grouping, same values)."""
    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=11, episode_length=6)
    mk = lambda dev: EpisodeDataModule(DataModuleConfig(
        data_dir=data_dir, batch_size=2, sequence_length=3, noise_std=0.0,
        device_resident=dev))
    for stream in ("train", "val"):
        host_dm, dev_dm = mk(False), mk(True)
        if stream == "train":
            host = list(host_dm.train_batches_chunked(0, 3))
            dev = list(dev_dm.train_batches_chunked(0, 3))
        else:
            host = list(host_dm.val_batches_chunked(3))
            dev = list(dev_dm.val_batches_chunked(3))
        assert [k for k, _ in host] == [k for k, _ in dev]
        for (_, hb), (_, db) in zip(host, dev):
            for hx, dx in zip(hb, db):
                np.testing.assert_array_equal(np.asarray(hx), np.asarray(dx))


def test_mid_epoch_skip_equivalence_and_cheapness(tmp_path):
    """skip=N serves exactly the tail of the full stream on both host paths.
    With no per-batch host RNG (noise off, non-pack) the skipped items are
    never assembled; with host noise on they ARE assembled so the RNG draw
    sequence matches the interrupted epoch — either way the values match."""
    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=11, episode_length=6)
    for noise in (0.0, 0.1):
        dm = EpisodeDataModule(DataModuleConfig(
            data_dir=data_dir, batch_size=2, sequence_length=3, noise_std=noise,
            device_resident=False))
        dm2 = EpisodeDataModule(DataModuleConfig(
            data_dir=data_dir, batch_size=2, sequence_length=3, noise_std=noise,
            device_resident=False))
        calls = [0]
        orig = type(dm2)._make_batch

        def counting(self, idx, rng, _o=orig, _c=calls):
            _c[0] += 1
            return _o(self, idx, rng)

        type(dm2)._make_batch = counting
        try:
            full = list(dm.train_batches_chunked(0, 2))
            skip = 2
            calls[0] = 0
            tail = list(dm2.train_batches_chunked(0, 2, skip=skip))
            n_assembled = calls[0]
            full_pb = list(dm.train_batches(1))
            calls[0] = 0
            tail_pb = list(dm2.train_batches(1, skip=1))
            n_assembled_pb = calls[0]
        finally:
            type(dm2)._make_batch = orig
        assert [k for k, _ in tail] == [k for k, _ in full[skip:]]
        for (_, a), (_, b) in zip(tail, full[skip:]):
            for xa, xb in zip(a, b):
                np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
        for a, b in zip(tail_pb, full_pb[1:]):
            for xa, xb in zip(a, b):
                np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
        # Cheapness: noise-off skips at the index level (no assembly of
        # skipped items); noise-on must assemble every batch for RNG parity.
        full_calls = sum((b[0].shape[0] if k == "scan" else 1) for k, b in full)
        skipped_calls = sum((b[0].shape[0] if k == "scan" else 1)
                            for k, b in full[:skip])
        if noise == 0.0:
            assert n_assembled == full_calls - skipped_calls
            assert n_assembled_pb == len(full_pb) - 1
        else:
            assert n_assembled == full_calls
            assert n_assembled_pb == len(full_pb)


def test_device_resident_noise_and_drop_semantics(tmp_path):
    """On-device noise hits inputs only; drop_modality zeroes the input to
    -1; the val stream is deterministic across iterations (fixed key)."""
    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=8, episode_length=6)
    dm = EpisodeDataModule(DataModuleConfig(
        data_dir=data_dir, batch_size=2, sequence_length=3, noise_std=0.1,
        device_resident=True, drop_modality="audio"))
    kind, b = next(iter(dm.train_batches_chunked(0, 2)))
    assert kind == "scan"
    a_in, au_in, vi_in, a, au, vi = (np.asarray(x) for x in b)
    assert (au_in == -1.0).all()  # dropped input
    assert not (au == -1.0).all()  # target untouched
    assert not np.array_equal(vi_in, vi)  # noised input
    assert np.abs(vi_in - vi).mean() < 0.5  # ...but only by the 0.1 std
    assert not np.array_equal(a_in, a)
    # Epochs draw different noise; val draws are fixed across iterations.
    _, b2 = next(iter(dm.train_batches_chunked(1, 2)))
    assert not np.array_equal(np.asarray(b2[2]), vi_in)
    dm2 = EpisodeDataModule(DataModuleConfig(
        data_dir=data_dir, batch_size=2, sequence_length=3, noise_std=0.1,
        device_resident=True))
    v1 = [np.asarray(x) for _, bb in dm2.val_batches_chunked(4) for x in bb]
    v2 = [np.asarray(x) for _, bb in dm2.val_batches_chunked(4) for x in bb]
    for x, y in zip(v1, v2):
        np.testing.assert_array_equal(x, y)


def test_device_resident_pack_mode_falls_back(tmp_path):
    """Pack (memmap) mode cannot be device-resident: warn once, stream host."""
    import warnings as _w

    from multimodal_mtrssm_tpu.data.pack import pack_episodes

    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=6, episode_length=6)
    pack_episodes(data_dir, data_dir / "pack")
    dm = EpisodeDataModule(DataModuleConfig(
        data_dir=data_dir, batch_size=2, sequence_length=3, device_resident=True))
    dm.setup()
    assert dm._raw
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        items = list(dm.train_batches_chunked(0, 2))
    assert any("device_resident" in str(r.message) for r in rec)
    assert items and dm._dev_data is None  # served from host, nothing uploaded


def test_device_resident_hbm_budget_falls_back(tmp_path):
    """Datasets over device_resident_max_bytes warn and stream from host
    instead of OOMing the device."""
    import warnings as _w

    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=6, episode_length=6)
    dm = EpisodeDataModule(DataModuleConfig(
        data_dir=data_dir, batch_size=2, sequence_length=3,
        device_resident=True, device_resident_max_bytes=1024))
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        items = list(dm.train_batches_chunked(0, 2))
    assert any("budget" in str(r.message) for r in rec)
    assert items and dm._dev_data is None


def test_device_resident_multihost_falls_back(tmp_path, monkeypatch):
    """Multi-process runs must stream from host (put_sharded per-shard
    callbacks), not upload per-process copies."""
    import warnings as _w

    import jax as _jax

    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=6, episode_length=6)
    dm = EpisodeDataModule(DataModuleConfig(
        data_dir=data_dir, batch_size=2, sequence_length=3, device_resident=True))
    dm.setup()
    monkeypatch.setattr(_jax, "process_count", lambda: 2)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        items = list(dm.train_batches_chunked(0, 2))
    assert any("multi-host" in str(r.message) for r in rec)
    assert items and dm._dev_data is None


def test_device_resident_accepts_plain_device_and_honors_placement(tmp_path):
    """The host path's ``device=`` accepts a plain jax.Device, so the
    device-resident path must too — and a single-device target that is NOT
    the default device must get the dataset (and every yielded chunk)
    committed to THAT device, not silently round-tripped through device 0."""
    import jax

    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=11, episode_length=6)
    mk = lambda dev: EpisodeDataModule(DataModuleConfig(
        data_dir=data_dir, batch_size=2, sequence_length=3, noise_std=0.0,
        device_resident=dev))
    target = jax.devices("cpu")[1]  # non-default device
    host = list(mk(False).train_batches_chunked(0, 3, device=target,
                                                stacked_device=target))
    dev = list(mk(True).train_batches_chunked(0, 3, device=target,
                                              stacked_device=target))
    assert [k for k, _ in host] == [k for k, _ in dev]
    for (_, hb), (_, db) in zip(host, dev):
        for hx, dx in zip(hb, db):
            np.testing.assert_array_equal(np.asarray(hx), np.asarray(dx))
            assert dx.devices() == {target}


def test_random_modality_dropout_per_sample(tmp_path):
    """drop_modality='random': per-sample each episode keeps both streams,
    drops audio, or drops vision; targets stay clean; val batches (no rng)
    are undropped."""
    generate_synthetic_audio_mnist(tmp_path, n_episodes=40, episode_length=6)
    cfg = DataModuleConfig(data_dir=tmp_path, batch_size=32, sequence_length=4,
                           seed=3, drop_modality="random")
    dm = EpisodeDataModule(cfg)
    dm.setup()
    b = next(iter(dm.train_batches(epoch=0)))
    aud_in, vis_in = np.asarray(b[1]), np.asarray(b[2])
    a_dropped = np.array([(aud_in[i] == -1.0).all() for i in range(aud_in.shape[0])])
    v_dropped = np.array([(vis_in[i] == -1.0).all() for i in range(vis_in.shape[0])])
    # No sample loses BOTH; with 32 samples each outcome appears w.h.p.
    assert not (a_dropped & v_dropped).any()
    assert a_dropped.any() and v_dropped.any() and (~a_dropped & ~v_dropped).any()
    # Targets untouched.
    assert not (np.asarray(b[4]) == -1.0).all()
    assert not (np.asarray(b[5]) == -1.0).all()
    # Validation batches are clean (rng=None path).
    vb = next(iter(dm.val_batches()))
    assert not (np.asarray(vb[1]) == -1.0).all()


def test_random_modality_dropout_device_resident(tmp_path):
    """Device-resident gather applies the same per-sample random dropout."""
    generate_synthetic_audio_mnist(tmp_path, n_episodes=40, episode_length=6)
    cfg = DataModuleConfig(data_dir=tmp_path, batch_size=32, sequence_length=4,
                           seed=3, drop_modality="random", device_resident=True)
    dm = EpisodeDataModule(cfg)
    dm.setup()
    b = next(iter(dm.train_batches(epoch=0)))
    aud_in, vis_in = np.asarray(b[1]), np.asarray(b[2])
    a_dropped = np.array([(aud_in[i] == -1.0).all() for i in range(aud_in.shape[0])])
    v_dropped = np.array([(vis_in[i] == -1.0).all() for i in range(vis_in.shape[0])])
    assert not (a_dropped & v_dropped).any()
    assert a_dropped.any() and v_dropped.any() and (~a_dropped & ~v_dropped).any()
    assert not (np.asarray(b[4]) == -1.0).all()
