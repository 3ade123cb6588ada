"""Device mesh + sharding utilities.

The reference is strictly single-process/single-device (reference
main.py:287; SURVEY.md §2.10). Here data parallelism is first-class and
TPU-native: a 1-D ``data`` mesh over the slice, batches sharded along axis 0
across ICI, parameters/optimizer state replicated. Gradients are averaged by
the all-reduce XLA inserts when a jitted step consumes a data-sharded batch
against replicated parameters — no hand-written communication backend
(SURVEY.md §5.8 disposition).

Scaling beyond one slice: the same mesh can span DCN-connected slices; keep
the ``data`` axis innermost over ICI so the gradient psum rides ICI links.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_moment_localization_tpu.data.datasets import TENSOR_KEYS

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = num_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, only {len(devices)} available")
    return Mesh(np.asarray(devices[:n]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_BATCH_ARRAY_KEYS = TENSOR_KEYS + ("sample_mask",)


def device_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Strip host-only metadata, keeping the fixed-shape arrays."""
    return {k: batch[k] for k in _BATCH_ARRAY_KEYS if k in batch}


def put_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Host batch -> device arrays sharded along the batch axis."""
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(v, sharding) for k, v in device_batch(batch).items()}


def put_replicated(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(tree, sharding)
