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
