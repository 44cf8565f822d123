"""Tests: MNIST classifier (JAX) + word-transition MR pipeline."""

import jax
import numpy as np
import pytest

from multimodal_mtrssm_tpu.evaluation import (
    compute_baselines,
    compute_matching_rate,
    compute_prediction_distribution,
    compute_true_distribution,
    evaluate_word_transitions,
    load_classifier,
    recognize_digit,
    recognize_digits,
    save_classifier,
    select_intervals_for_word,
    train_classifier,
)


def synthetic_digit_images(n_per_class: int, seed: int = 0):
    """Trivially separable 'digits': digit d = bright vertical stripe at column d*3."""
    rng = np.random.default_rng(seed)
    images, labels = [], []
    for d in range(10):
        for _ in range(n_per_class):
            img = rng.uniform(0, 0.15, (32, 32)).astype(np.float32)
            img[:, d * 3 : d * 3 + 3] = 1.0
            images.append(img)
            labels.append(d)
    order = rng.permutation(len(images))
    return np.asarray(images)[order][..., None], np.asarray(labels, np.int32)[order]


@pytest.fixture(scope="module")
def trained_classifier():
    images, labels = synthetic_digit_images(30)
    return train_classifier(images, labels, num_epochs=3, batch_size=50), (images, labels)


def test_classifier_learns_separable_digits(trained_classifier, tmp_path_factory):
    params, (images, labels) = trained_classifier
    preds = np.asarray(recognize_digits(params, images[:100]))
    acc = (preds == labels[:100]).mean()
    assert acc > 0.9, f"classifier accuracy {acc}"
    # single-image API with shape guards
    assert recognize_digit(params, images[0]) == int(labels[0])
    assert recognize_digit(params, images[0].transpose(2, 0, 1)) == int(labels[0])  # CHW
    with pytest.raises(ValueError):
        recognize_digit(params, np.zeros((16, 16)))
    # save/load round trip
    p = tmp_path_factory.mktemp("clf") / "clf.npz"
    save_classifier(params, p)
    params2 = load_classifier(p)
    preds2 = np.asarray(recognize_digits(params2, images[:10]))
    np.testing.assert_array_equal(preds[:10], preds2)


def make_labeled_episode(label_seq, speaker_idx, frames_per_word=20, seed=0):
    rng = np.random.default_rng(seed)
    T = len(label_seq) * frames_per_word
    labels = np.repeat(np.asarray(label_seq), frames_per_word)
    speaker = np.zeros((T, 6), np.float32)
    speaker[:, speaker_idx] = 1.0
    audio = rng.uniform(-80, 0, (T, 32, 32)).astype(np.float32)
    image = rng.uniform(0, 255, (T, 1, 32, 32)).astype(np.float32)
    return {"audio": audio, "image": image, "label": labels, "speaker": speaker, "file_path": "mem"}


def test_interval_selection_one_per_speaker():
    data = [
        make_labeled_episode([1, 2, 3], speaker_idx=0),
        make_labeled_episode([1, 4, 5], speaker_idx=0),  # same speaker → skipped
        make_labeled_episode([0, 1, 2], speaker_idx=1),
        make_labeled_episode([7, 8, 9], speaker_idx=2),  # no word 1
    ]
    intervals = select_intervals_for_word(1, data, n_intervals=6, query_length=30)
    assert len(intervals) == 2
    assert {iv["speaker_idx"] for iv in intervals} == {0, 1}
    for iv in intervals:
        assert iv["audio"].shape[0] == 30
        assert iv["label"][-1] == 1 or 1 in iv["label"]


def test_distributions_and_matching_rate():
    q = compute_prediction_distribution([1, 1, 2, 7, 99])  # 99 → failure
    assert q[1] == 0.4 and q[2] == 0.2 and q["wf"] == 0.2
    data = [
        make_labeled_episode([1, 2, 1, 3], speaker_idx=0),
        make_labeled_episode([-1, 1, 2], speaker_idx=1),
    ]
    p = compute_true_distribution(1, data)
    # transitions from 1: →2, →3, →2 ⇒ p(2)=2/3, p(3)=1/3
    np.testing.assert_allclose(p[2], 2 / 3, atol=1e-9)
    np.testing.assert_allclose(p[3], 1 / 3, atol=1e-9)
    assert p["wf"] == 0.0
    mr_perfect = compute_matching_rate(p, p)
    np.testing.assert_allclose(mr_perfect, 1.0, atol=1e-9)
    b = compute_baselines(p)
    np.testing.assert_allclose(b["peak_onehot"], 2 / 3, atol=1e-9)
    assert 0 < b["uniform"] < 1
    assert 0 <= b["random_onehot"] <= 1
    assert mr_perfect >= b["peak_onehot"]


def test_batched_predictions_shape_and_pallas_parity(trained_classifier):
    """Batched path returns I*P digits; pallas path returns valid digits too."""
    import jax.numpy as jnp

    from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
    from multimodal_mtrssm_tpu.nn.conv import EncoderConfig
    from multimodal_mtrssm_tpu.evaluation import generate_predictions_batched

    params_clf, _ = trained_classifier
    enc = EncoderConfig(channels=(4, 8), kernel_sizes=(3, 3), strides=(2, 2), paddings=(1, 1),
                        num_residual_blocks=0, coord_conv=False)
    model = MoPoEMRSSM(MRSSMConfig(audio_encoder=enc, vision_encoder=enc, init_proj_cells=16))
    params = model.init(jax.random.PRNGKey(0))
    intervals = [
        {k: v for k, v in make_labeled_episode([1, 2], 0, 8).items() if k != "file_path"},
        {k: v for k, v in make_labeled_episode([2, 3], 1, 8).items() if k != "file_path"},
    ]
    digits = generate_predictions_batched(
        model, params, params_clf, intervals, jax.random.PRNGKey(1),
        n_predictions=4, n_frames=3,
    )
    assert len(digits) == 8
    assert all(0 <= d <= 9 for d in digits)
    # pallas path (interpret mode kicks in only on TPU; here it compiles the
    # kernel through the CPU interpreter via the public flag)
    import functools

    import multimodal_mtrssm_tpu.ops.pallas as P

    orig = P.fused_rollout_transition
    try:
        P.fused_rollout_transition = functools.partial(orig, interpret=True)
        import multimodal_mtrssm_tpu.evaluation.word_transitions as W

        digits_p = W.generate_predictions_batched(
            model, params, params_clf, intervals, jax.random.PRNGKey(1),
            n_predictions=4, n_frames=3, use_pallas=True,
        )
    finally:
        P.fused_rollout_transition = orig
    assert len(digits_p) == 8
    assert all(0 <= d <= 9 for d in digits_p)


def test_batched_predictions_pallas_mmtrssm(trained_classifier):
    """The pallas eval fast path also serves the hierarchical family."""
    import functools

    from multimodal_mtrssm_tpu.models import MMTRSSMConfig, MoPoEMMTRSSM
    from multimodal_mtrssm_tpu.nn.conv import EncoderConfig
    import multimodal_mtrssm_tpu.ops.pallas as P
    import multimodal_mtrssm_tpu.evaluation.word_transitions as W

    params_clf, _ = trained_classifier
    enc = EncoderConfig(channels=(4, 8), kernel_sizes=(3, 3), strides=(2, 2), paddings=(1, 1),
                        num_residual_blocks=0, coord_conv=False)
    model = MoPoEMMTRSSM(MMTRSSMConfig(audio_encoder=enc, vision_encoder=enc, init_proj_cells=16))
    params = model.init(jax.random.PRNGKey(0))
    intervals = [
        {k: v for k, v in make_labeled_episode([1, 2], 0, 8).items() if k != "file_path"},
    ]
    orig = P.fused_mt_rollout_transition
    try:
        P.fused_mt_rollout_transition = functools.partial(orig, interpret=True)
        digits = W.generate_predictions_batched(
            model, params, params_clf, intervals, jax.random.PRNGKey(1),
            n_predictions=3, n_frames=2, use_pallas=True,
        )
    finally:
        P.fused_mt_rollout_transition = orig
    assert len(digits) == 3
    assert all(0 <= d <= 9 for d in digits)


def test_end_to_end_eval_with_model(trained_classifier, tmp_path):
    from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
    from multimodal_mtrssm_tpu.nn.conv import EncoderConfig
    from multimodal_mtrssm_tpu.evaluation import write_results

    params_clf, _ = trained_classifier
    enc = EncoderConfig(channels=(4, 8), kernel_sizes=(3, 3), strides=(2, 2), paddings=(1, 1),
                        num_residual_blocks=0, coord_conv=False)
    model = MoPoEMRSSM(MRSSMConfig(audio_encoder=enc, vision_encoder=enc, init_proj_cells=16))
    params = model.init(jax.random.PRNGKey(0))
    data = [
        make_labeled_episode([0, 1, 2], speaker_idx=0, frames_per_word=12),
        make_labeled_episode([1, 2, 0], speaker_idx=1, frames_per_word=12),
    ]
    results = evaluate_word_transitions(
        model, params, params_clf, data,
        n_intervals=2, query_length=10, n_predictions=4, n_frames=3,
        word_set=list(range(10)),
    )
    assert "summary" in results
    assert 0.0 <= results["summary"]["mean_matching_rate"] <= 1.0
    for word, r in results["per_word"].items():
        total_q = sum(r["q_dist"].values())
        np.testing.assert_allclose(total_q, 1.0, atol=1e-6)
    md, js = write_results(results, tmp_path)
    assert md.exists() and js.exists()
    assert "mean MR" in md.read_text()


def test_load_pt_episodes_with_labels(tmp_path):
    """Reference-processed .pt layout + sample_*.npz labels loads directly
    (reference evaluate_word_transitions_mrssm.py:51-126)."""
    torch = pytest.importorskip("torch")
    from multimodal_mtrssm_tpu.evaluation import load_test_data_with_labels

    pt_dir = tmp_path / "processed"
    npz_dir = tmp_path / "npz" / "test"
    pt_dir.mkdir()
    npz_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    T = 12
    for idx in (0, 1):
        torch.save(torch.tensor(rng.uniform(-80, 0, (T, 1, 32, 32)).astype(np.float32)),
                   pt_dir / f"audio_obs_{idx:04d}.pt")
        torch.save(torch.tensor(rng.uniform(0, 255, (T, 1, 32, 32)).astype(np.float32)),
                   pt_dir / f"vision_obs_{idx:04d}.pt")
        speaker = np.zeros((T, 6), np.float32)
        speaker[:, idx] = 1.0
        torch.save(torch.tensor(speaker), pt_dir / f"act_{idx:04d}.pt")
        np.savez(npz_dir / f"sample_{idx:04d}.npz",
                 label=np.full((T,), idx, np.int64))
    # one orphan .pt without a label npz → skipped
    torch.save(torch.tensor(np.zeros((T, 6), np.float32)), pt_dir / "act_0007.pt")
    torch.save(torch.tensor(np.zeros((T, 1, 32, 32), np.float32)), pt_dir / "audio_obs_0007.pt")
    torch.save(torch.tensor(np.zeros((T, 1, 32, 32), np.float32)), pt_dir / "vision_obs_0007.pt")

    data = load_test_data_with_labels(pt_dir, npz_dir_for_labels=npz_dir)  # auto-detects .pt
    assert len(data) == 2
    for i, ep in enumerate(data):
        assert ep["audio"].shape == (T, 32, 32)  # channel dim squeezed like the reference
        assert ep["image"].shape == (T, 1, 32, 32)
        assert ep["speaker"].shape == (T, 6)
        assert (ep["label"] == i).all()

    # without a label dir → empty with a warning, not a crash
    assert load_test_data_with_labels(pt_dir) == []


def test_batched_predictions_sample_initial_state_once_per_interval(trained_classifier):
    """The reference samples initial_state once per interval and reuses it
    across all n_predictions rollouts (reference :336-370); the batched path
    must therefore call initial_state with batch I, not I*P."""
    from multimodal_mtrssm_tpu.evaluation import generate_predictions_batched
    from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
    from multimodal_mtrssm_tpu.nn.conv import EncoderConfig

    params_clf, _ = trained_classifier
    enc = EncoderConfig(channels=(4, 8), kernel_sizes=(3, 3), strides=(2, 2), paddings=(1, 1),
                        num_residual_blocks=0, coord_conv=False)
    model = MoPoEMRSSM(MRSSMConfig(audio_encoder=enc, vision_encoder=enc, init_proj_cells=16))
    params = model.init(jax.random.PRNGKey(0))

    seen = []
    orig = MoPoEMRSSM.initial_state

    def spy(self, params, audio0, vision0, key):
        seen.append(audio0.shape[0])
        return orig(self, params, audio0, vision0, key)

    MoPoEMRSSM.initial_state = spy
    try:
        intervals = [
            {k: v for k, v in make_labeled_episode([1, 2], 0, 8).items() if k != "file_path"},
            {k: v for k, v in make_labeled_episode([2, 3], 1, 8).items() if k != "file_path"},
            {k: v for k, v in make_labeled_episode([3, 4], 2, 8).items() if k != "file_path"},
        ]
        digits = generate_predictions_batched(
            model, params, params_clf, intervals, jax.random.PRNGKey(1),
            n_predictions=5, n_frames=3,
        )
    finally:
        MoPoEMRSSM.initial_state = orig
    assert len(digits) == 15
    assert seen == [3]  # one call, batch = n_intervals (not intervals*predictions)


def test_classifier_small_dataset_actually_trains(tmp_path):
    """A dataset smaller than the default batch size must still take
    optimizer steps (regression: the full-batch skip used to turn training
    into a no-op for n < batch_size)."""
    import numpy as np

    from multimodal_mtrssm_tpu.evaluation.classifier import (
        classifier_init,
        recognize_digits,
        train_classifier,
    )

    rng = np.random.default_rng(0)
    # 40 trivially separable images: class 0 dark, class 1 bright.
    labels = np.tile(np.array([0, 1], dtype=np.int32), 20)
    images = np.where(labels[:, None, None, None] == 0, 0.1, 0.9) + rng.normal(
        0, 0.02, (40, 32, 32, 1)
    ).astype(np.float32)
    params = train_classifier(images, labels, num_epochs=3, batch_size=128, seed=0)
    preds = np.asarray(recognize_digits(params, images))
    acc = float((preds == labels).mean())
    untrained = np.asarray(recognize_digits(classifier_init(jax.random.PRNGKey(0)), images))
    assert acc >= 0.9, f"classifier did not train on a small dataset (acc={acc})"
    assert not np.array_equal(preds, untrained) or acc >= 0.9


def test_classifier_checkpoint_suffix_normalized(tmp_path):
    """save/load agree on the on-disk name even for non-.npz paths
    (np.savez appends .npz; the loader used to miss it and retrain)."""
    from multimodal_mtrssm_tpu.evaluation.classifier import (
        classifier_init,
        load_or_train_classifier,
        save_classifier,
    )

    params = classifier_init(jax.random.PRNGKey(0))
    target = tmp_path / "clf"  # no suffix
    save_classifier(params, target)
    loaded = load_or_train_classifier(target)  # must NOT raise / retrain
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mnist_resize_is_bilinear_upscale():
    """28→32 uses bilinear interpolation like the reference's torchvision
    Resize((32,32)) (mnist_classifier.py:89), not center padding."""
    from multimodal_mtrssm_tpu.evaluation.classifier import _resize_28_to_32

    img = np.zeros((1, 28, 28), dtype=np.float32)
    img[0, 10:18, 10:18] = 1.0
    out = _resize_28_to_32(img)
    assert out.shape == (1, 32, 32)
    # padding would keep corners of the block exactly 1.0 at shifted
    # coordinates and leave rows 0-1 zero; bilinear spreads mass and
    # scales coordinates by 32/28
    assert out.max() == 1.0 and 0 < out[0, 12, 12] <= 1.0
    assert abs(float(out.sum()) - 64.0 * (32 / 28) ** 2) / (64.0 * (32 / 28) ** 2) < 0.1


def test_classify_frame_out_of_range_raises():
    """classify_frame past the rollout horizon must fail loudly on BOTH
    dispatch paths (the Pallas path's jnp indexing would otherwise silently
    clamp to the last frame while the XLA path crashed at trace time)."""
    from multimodal_mtrssm_tpu.evaluation.word_transitions import (
        evaluate_word_transitions,
        generate_predictions_batched,
    )

    with pytest.raises(ValueError, match="classify_frame"):
        generate_predictions_batched(None, None, None, [], None,
                                     n_predictions=2, n_frames=5, classify_frame=5)
    with pytest.raises(ValueError, match="classify_frame"):
        evaluate_word_transitions(None, None, None, [], n_frames=5, classify_frame=-1)


def test_pallas_eval_respects_conv_dtype(trained_classifier):
    """The Pallas eval fast path must decode through the shared conv_dtype
    cast pair (nn/conv.py) — a 16-mixed model decodes in bf16 on BOTH
    dispatch paths, not only via model.decode_state."""
    import functools

    import jax.numpy as jnp

    import multimodal_mtrssm_tpu.evaluation.word_transitions as W
    import multimodal_mtrssm_tpu.nn.conv as C
    import multimodal_mtrssm_tpu.ops.pallas as P
    from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
    from multimodal_mtrssm_tpu.nn.conv import EncoderConfig

    params_clf, _ = trained_classifier
    enc = EncoderConfig(channels=(4, 8), kernel_sizes=(3, 3), strides=(2, 2), paddings=(1, 1),
                        num_residual_blocks=0, coord_conv=False)
    model = MoPoEMRSSM(MRSSMConfig(audio_encoder=enc, vision_encoder=enc,
                                   init_proj_cells=16, conv_dtype=jnp.bfloat16))
    params = model.init(jax.random.PRNGKey(0))
    seen = []
    orig_dec, orig_roll = C.decoder_apply, P.fused_rollout_transition

    def recording(p, cfg, x):
        seen.append(x.dtype)
        return orig_dec(p, cfg, x)

    try:
        C.decoder_apply = recording
        P.fused_rollout_transition = functools.partial(orig_roll, interpret=True)
        a0 = jnp.zeros((2, 32, 32, 1))
        v0 = jnp.zeros((2, 32, 32, 1))
        actions = jnp.zeros((2 * 3, 2, 6))
        digits = W._predict_digits_pallas(model, params, params_clf, a0, v0,
                                          actions, jax.random.PRNGKey(1), 3)
    finally:
        C.decoder_apply, P.fused_rollout_transition = orig_dec, orig_roll
    assert seen and all(d == jnp.bfloat16 for d in seen)
    assert len(np.asarray(digits)) == 6


def test_eval_cli_end_to_end(trained_classifier, tmp_path, monkeypatch):
    """The packaged eval CLI (evaluation/cli.py — also the installed
    `evaluate-word-transitions` console script) runs end-to-end: tiny
    config + params-only checkpoint + labeled npz episodes + classifier
    checkpoint on disk → markdown/JSON results."""
    import sys

    import yaml

    from multimodal_mtrssm_tpu.data import generate_synthetic_labeled_audio_mnist
    from multimodal_mtrssm_tpu.evaluation.classifier import save_classifier
    from multimodal_mtrssm_tpu.evaluation.cli import main
    from multimodal_mtrssm_tpu.train.checkpoint import CheckpointManager
    from multimodal_mtrssm_tpu.train.config import load_experiment

    params_clf, _ = trained_classifier
    save_classifier(params_clf, tmp_path / "clf.npz")
    generate_synthetic_labeled_audio_mnist(
        tmp_path / "train", tmp_path / "eval", n_episodes=4, frames_per_word=3, seed=0
    )

    from pathlib import Path as _P

    repo = _P(__file__).resolve().parent.parent
    cfg = yaml.safe_load(open(repo / "configs" / "mopoe_mrssm.yaml"))
    enc = dict(channels=[4, 8], kernel_sizes=[3, 3], strides=[2, 2], paddings=[1, 1],
               num_residual_blocks=0, coord_conv=False, linear_sizes=[64])
    cfg["model"]["init_args"]["audio_encoder"] = enc
    cfg["model"]["init_args"]["vision_encoder"] = dict(enc)
    cfg["model"]["init_args"]["init_proj_cells"] = 32
    cfg_path = tmp_path / "tiny.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    exp = load_experiment(cfg_path)
    params = exp.model.init(jax.random.PRNGKey(0))
    ck = tmp_path / "checkpoints"
    CheckpointManager(ck).save("best", {"params": params})

    monkeypatch.setattr(sys, "argv", [
        "evaluate-word-transitions", "--config", str(cfg_path),
        "--checkpoint", str(ck), "--test-data", str(tmp_path / "eval"),
        "--classifier", str(tmp_path / "clf.npz"), "--out", str(tmp_path / "results"),
        "--n-intervals", "2", "--query-length", "2", "--n-predictions", "2",
        "--n-frames", "2", "--classify-frame", "1",
    ])
    main()
    out_md = list((tmp_path / "results").glob("*.md")) or [p for p in (tmp_path / "results").iterdir()]
    assert (tmp_path / "results").exists() and out_md


def test_condition_zeroes_the_right_stream():
    """`condition` replaces the NON-informative modality's conditioning
    frame with the ZeroOut fill (-1) and validates its value."""
    import numpy as np
    import pytest as _pytest

    from multimodal_mtrssm_tpu.evaluation.word_transitions import (
        CONDITIONS,
        _apply_condition,
    )

    a = np.full((2, 4, 4, 1), 0.5, np.float32)
    v = np.full((2, 4, 4, 1), 0.25, np.float32)
    assert CONDITIONS == ("both", "vision", "audio")
    a2, v2 = _apply_condition(a, v, "both")
    assert (a2 == a).all() and (v2 == v).all()
    a2, v2 = _apply_condition(a, v, "vision")
    assert (a2 == -1.0).all() and (v2 == v).all()
    a2, v2 = _apply_condition(a, v, "audio")
    assert (a2 == a).all() and (v2 == -1.0).all()
    with _pytest.raises(ValueError, match="condition"):
        _apply_condition(a, v, "video")


def test_crossmodal_reconstruction_report(trained_classifier):
    """reconstruction_report: structure, baselines, and the drop actually
    changing the posterior reconstruction for an (untrained) model."""
    from multimodal_mtrssm_tpu.evaluation import reconstruction_report
    from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
    from multimodal_mtrssm_tpu.nn.conv import EncoderConfig

    enc = EncoderConfig(channels=(4, 8), kernel_sizes=(3, 3), strides=(2, 2),
                        paddings=(1, 1), num_residual_blocks=0, coord_conv=False)
    model = MoPoEMRSSM(MRSSMConfig(audio_encoder=enc, vision_encoder=enc,
                                   init_proj_cells=16))
    params = model.init(jax.random.PRNGKey(0))
    eps = [
        make_labeled_episode([1, 2, 3], 0, 12),
        make_labeled_episode([2, 3, 4], 1, 12),
    ]
    rep = reconstruction_report(model, params, eps, n_episodes=2, T=8,
                                query_length=4, seed=0)
    assert set(rep["conditions"]) == {"both", "drop_audio", "drop_vision"}
    for cell in rep["conditions"].values():
        assert set(cell) == {"posterior/audio", "posterior/vision",
                             "prior/audio", "prior/vision"}
        assert all(v >= 0 for v in cell.values())
    assert rep["baselines"]["constant_-1/vision"] > 0
    # Dropping audio must change the audio reconstruction (same RNG used
    # across conditions, so any difference comes from the zeroed input).
    assert (rep["conditions"]["both"]["posterior/audio"]
            != rep["conditions"]["drop_audio"]["posterior/audio"])
