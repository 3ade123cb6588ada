"""TPU compute kernels: proposal-map generation, packing, scoring, soft-NMS."""

from video_moment_localization_tpu.ops.content_matrix import (
    ContentSegments,
    content_matrix,
    content_segments,
)
from video_moment_localization_tpu.ops.nms import soft_nms_topk
from video_moment_localization_tpu.ops.packing import (
    pack_map,
    packed_valid_mask,
    triu_packing,
    unpack_map,
)
from video_moment_localization_tpu.ops.proposal import (
    proposal_features,
    proposal_features_packed,
)

__all__ = [
    "ContentSegments",
    "content_matrix",
    "content_segments",
    "soft_nms_topk",
    "pack_map",
    "unpack_map",
    "packed_valid_mask",
    "triu_packing",
    "proposal_features",
    "proposal_features_packed",
]
