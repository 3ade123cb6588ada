"""Soft-NMS proposal selection (jit-compiled, static shapes).

The reference leaves NMS unimplemented ("FIX - NMS NOT IMPLEMENTED YET",
reference utils.py:14) and takes a plain top-k. This module adds Gaussian
soft-NMS as an opt-in eval mode (BASELINE.json config #4): after each
selection, remaining proposal scores decay by exp(-IoU^2 / sigma) against
the selected span, suppressing near-duplicate moments.

Shapes are static: spans of the L x L map are precomputed per L; selection
runs as a fixed-trip-count `lax.fori_loop` of k steps, fully on-device.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _proposal_spans(L: int, packed: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Normalized [start, end) spans per score column: the flattened L*L
    grid (dense) or the N = L(L+1)/2 upper-triangular pairs (packed)."""
    if packed:
        i, j = np.triu_indices(L)
        i, j = i.astype(np.float32), j.astype(np.float32)
    else:
        i = np.repeat(np.arange(L), L).astype(np.float32)   # start snippet
        j = np.tile(np.arange(L), L).astype(np.float32)     # end snippet
    return i / L, (j + 1.0) / L


def _pairwise_iou_with(starts, ends, s0, e0):
    """IoU of every span against one span (hull union, matching targets)."""
    inter = jnp.maximum(0.0, jnp.minimum(ends, e0) - jnp.maximum(starts, s0))
    union = jnp.maximum(0.0, jnp.maximum(ends, e0) - jnp.minimum(starts, s0))
    return jnp.where(union > 0, inter / union, 0.0)


def soft_nms_topk(
    scores: jnp.ndarray, L: int, k: int, sigma: float = 0.5,
    packed: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select k proposals per batch row with Gaussian score decay.

    scores: (B, L*L) dense-flat or (B, N) packed masked proposal scores.
    Returns (values (B, k), indices (B, k)) in selection order; indices
    address the given score columns (packed indices in packed mode).
    """
    starts_np, ends_np = _proposal_spans(L, packed)
    starts, ends = jnp.asarray(starts_np), jnp.asarray(ends_np)
    B, N = scores.shape

    def step(t, carry):
        s, vals, idxs = carry
        top_idx = jnp.argmax(s, axis=1)                     # (B,)
        top_val = jnp.take_along_axis(s, top_idx[:, None], axis=1)[:, 0]
        vals = vals.at[:, t].set(top_val)
        idxs = idxs.at[:, t].set(top_idx)
        s0 = starts[top_idx][:, None]                       # (B, 1)
        e0 = ends[top_idx][:, None]
        iou = _pairwise_iou_with(starts[None, :], ends[None, :], s0, e0)
        s = s * jnp.exp(-(iou * iou) / sigma)
        # remove the selected proposal outright
        s = s.at[jnp.arange(B), top_idx].set(-jnp.inf)
        return s, vals, idxs

    vals = jnp.zeros((B, k), scores.dtype)
    idxs = jnp.zeros((B, k), jnp.int32)
    _, vals, idxs = jax.lax.fori_loop(0, k, step, (scores, vals, idxs))
    return vals, idxs
