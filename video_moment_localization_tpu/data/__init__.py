"""Host-side data layer: tokenization, embeddings, sampling, labels, datasets."""

from video_moment_localization_tpu.data.tokenizer import get_tokens
from video_moment_localization_tpu.data.glove import WordEmbedding
from video_moment_localization_tpu.data.sampler import sample_fixed_length_features
from video_moment_localization_tpu.data.labels import (
    iou_target_map,
    boundary_penalties,
    snippet_labels,
    build_masks,
)
from video_moment_localization_tpu.data.datasets import (
    CharadesSTA,
    ActivityNet,
    TACoS,
    get_dataset_class,
)
from video_moment_localization_tpu.data.pipeline import BatchLoader

__all__ = [
    "get_tokens",
    "WordEmbedding",
    "sample_fixed_length_features",
    "iou_target_map",
    "boundary_penalties",
    "snippet_labels",
    "build_masks",
    "CharadesSTA",
    "ActivityNet",
    "TACoS",
    "get_dataset_class",
    "BatchLoader",
]
