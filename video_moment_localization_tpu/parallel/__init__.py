"""Parallelism layer: device meshes, shardings, and SPMD train/eval steps."""

from video_moment_localization_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    put_batch,
    put_replicated,
    replicated_sharding,
)
from video_moment_localization_tpu.parallel.steps import (
    make_eval_step,
    make_train_step,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "put_batch",
    "put_replicated",
    "make_train_step",
    "make_eval_step",
]
