"""Static proposal-map geometry: which frames average into which moment clip.

The reference materializes a dense sparse-averaging tensor ``Wc (L, L, C, T)``
with a Python triple loop at model init and contracts it against features
with an einsum every step (reference models.py:88-98, 117). On TPU that
contraction wastes MXU FLOPs on a tensor that is ~2/C·L sparse and wastes HBM
on the (L·L·C·T) constant.

Here the same geometry is captured as three small **static** integer arrays
(clip start, clip size, reciprocal weight) from which both compute paths
derive:

* the XLA path computes clip means as differences of a prefix sum (O(B·T·D)
  reads + O(B·L²·C·D) writes, zero matmul FLOPs) — see ops/proposal.py;
* the Pallas kernel DMAs features once and streams the (L, L, C, D) map out
  of VMEM — see ops/proposal_pallas.py;
* `content_matrix` still reconstructs the dense Wc for tests/parity.

Geometry (matching models.py:88-98 exactly): moment (i, j) covers frames
[i·T/L, (j+1)·T/L); its ``num_frames`` are split into C clips of
``clip_size = max(1, num_frames // C)``; only ``min(C, num_frames)`` clips
exist — trailing clips of very short moments are identically zero; leftover
frames beyond ``C·clip_size`` are unused.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import numpy as np


@dataclasses.dataclass(frozen=True)
class ContentSegments:
    """Static clip geometry for an (T, L, C) proposal map."""

    T: int
    L: int
    C: int
    starts: np.ndarray   # (L, L, C) int32: first frame of each clip
    sizes: np.ndarray    # (L, L, C) int32: frames per clip (0 = invalid clip)
    weights: np.ndarray  # (L, L, C) float32: 1/size for valid clips else 0


@lru_cache(maxsize=None)
def content_segments(T: int, L: int, C: int) -> ContentSegments:
    if T % L != 0:
        raise ValueError(f"T ({T}) must be a multiple of L ({L})")
    tl = T // L
    starts = np.zeros((L, L, C), dtype=np.int32)
    sizes = np.zeros((L, L, C), dtype=np.int32)
    ii, jj = np.meshgrid(np.arange(L), np.arange(L), indexing="ij")
    num_frames = (jj - ii + 1) * tl                      # (L, L)
    clip_size = np.maximum(1, num_frames // C)           # (L, L)
    valid_clips = np.minimum(C, num_frames)              # (L, L)
    for c in range(C):
        sel = (jj >= ii) & (c < valid_clips)
        starts[..., c] = np.where(sel, ii * tl + c * clip_size, 0)
        sizes[..., c] = np.where(sel, clip_size, 0)
    weights = np.where(sizes > 0, 1.0 / np.maximum(sizes, 1), 0.0).astype(np.float32)
    return ContentSegments(T, L, C, starts, sizes, weights)


def content_matrix(T: int, L: int, C: int) -> np.ndarray:
    """Dense Wc (L, L, C, T) — reference-equivalent, for tests and fallback."""
    seg = content_segments(T, L, C)
    Wc = np.zeros((L, L, C, T), dtype=np.float32)
    frame = np.arange(T)
    in_clip = (frame >= seg.starts[..., None]) & (
        frame < (seg.starts + seg.sizes)[..., None]
    )
    Wc = in_clip * seg.weights[..., None]
    return Wc.astype(np.float32)
