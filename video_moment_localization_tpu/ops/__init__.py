"""TPU compute kernels: proposal-map generation, scoring, soft-NMS."""

from video_moment_localization_tpu.ops.content_matrix import (
    ContentSegments,
    content_matrix,
    content_segments,
)
from video_moment_localization_tpu.ops.proposal import proposal_features

__all__ = [
    "ContentSegments",
    "content_matrix",
    "content_segments",
    "proposal_features",
]
