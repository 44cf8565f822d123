"""Evaluation: MNIST classifier + word-transition Matching Rate."""

from multimodal_mtrssm_tpu.evaluation.classifier import (
    classifier_apply,
    classifier_init,
    load_classifier,
    load_mnist_arrays,
    load_or_train_classifier,
    recognize_digit,
    recognize_digits,
    save_classifier,
    train_classifier,
)
from multimodal_mtrssm_tpu.evaluation.crossmodal import (
    build_normalized_batch,
    reconstruction_report,
)
from multimodal_mtrssm_tpu.evaluation.word_transitions import (
    CONDITIONS,
    WORD_SET,
    compute_baselines,
    compute_matching_rate,
    compute_prediction_distribution,
    compute_true_distribution,
    evaluate_word_transitions,
    generate_predictions_batched,
    generate_predictions_with_classifier,
    load_test_data_with_labels,
    select_intervals_for_word,
    write_results,
)

__all__ = [
    "CONDITIONS",
    "WORD_SET",
    "build_normalized_batch",
    "reconstruction_report",
    "classifier_apply",
    "classifier_init",
    "compute_baselines",
    "compute_matching_rate",
    "compute_prediction_distribution",
    "compute_true_distribution",
    "evaluate_word_transitions",
    "generate_predictions_batched",
    "generate_predictions_with_classifier",
    "load_classifier",
    "load_mnist_arrays",
    "load_or_train_classifier",
    "load_test_data_with_labels",
    "recognize_digit",
    "recognize_digits",
    "save_classifier",
    "select_intervals_for_word",
    "train_classifier",
    "write_results",
]
