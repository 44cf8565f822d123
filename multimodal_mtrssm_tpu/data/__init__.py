"""Data pipeline: episode store, transforms, device input pipeline."""

from multimodal_mtrssm_tpu.data.episodes import (
    Episode,
    convert_audio_mnist_npz,
    convert_reference_processed_dir,
    generate_synthetic_audio_mnist,
    generate_synthetic_labeled_audio_mnist,
    list_episodes,
    load_episode,
    save_episode,
    split_paths,
)
from multimodal_mtrssm_tpu.data.pipeline import DataModuleConfig, EpisodeDataModule
from multimodal_mtrssm_tpu.data.transforms import (
    TRANSFORMS,
    Compose,
    GaussianNoise,
    Identity,
    NormalizeAudioMelSpectrogram,
    NormalizeVisionImage,
    RemoveDim,
    TakeFirstN,
    ZeroOut,
)

__all__ = [
    "TRANSFORMS",
    "Compose",
    "DataModuleConfig",
    "Episode",
    "EpisodeDataModule",
    "GaussianNoise",
    "Identity",
    "NormalizeAudioMelSpectrogram",
    "NormalizeVisionImage",
    "RemoveDim",
    "TakeFirstN",
    "ZeroOut",
    "convert_audio_mnist_npz",
    "convert_reference_processed_dir",
    "generate_synthetic_audio_mnist",
    "generate_synthetic_labeled_audio_mnist",
    "list_episodes",
    "load_episode",
    "save_episode",
    "split_paths",
]
