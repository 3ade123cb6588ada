"""Training stack: loss, metrics, trainer, checkpointing."""

from video_moment_localization_tpu.train.loss import scaled_bce, smin_loss
from video_moment_localization_tpu.train.metrics import (
    METRIC_NS,
    METRIC_MS,
    metric_names,
    recall_counts,
)

__all__ = [
    "scaled_bce",
    "smin_loss",
    "recall_counts",
    "metric_names",
    "METRIC_NS",
    "METRIC_MS",
]
