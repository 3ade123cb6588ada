"""Utilities: checkpointing, profiling/throughput meters."""

from video_moment_localization_tpu.utils.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)
from video_moment_localization_tpu.utils.profiling import StepTimer, trace_context

__all__ = ["save_checkpoint", "restore_checkpoint", "StepTimer", "trace_context"]
