"""Proposal-map feature generation (the model's hottest op).

Computes, from fused clip features ``f (B, T, D)``:

* ``fc (B, L, L, C, D)`` — per-moment clip content features: each clip is the
  mean of a contiguous frame window (geometry in ops/content_matrix.py).
  Replaces the reference's dense einsum against Wc (reference models.py:117)
  with **prefix-sum differences**: clip_mean = (P[start+size] - P[start])/size
  where P is the inclusive cumsum of f over time. This is exact (up to fp
  summation order), does zero matmul FLOPs, and reads f once instead of
  T-times — HBM traffic is dominated by the unavoidable fc write.
* ``fm (B, L, L, D)`` — moment features: mean over the C clips (including
  zero rows of invalid clips, matching models.py:119).
* ``fb (B, L, D)``   — boundary features: non-overlapping window average
  of f with window T/L (the reference's AvgPool1d, models.py:113,121-125).

Autodiff works out of the box: the VJP of gather is scatter-add and the VJP
of cumsum is a reverse cumsum — XLA emits an efficient backward without a
custom VJP. A fused Pallas forward kernel lives in ops/proposal_pallas.py;
this module is the portable XLA path and the numerical ground truth the
kernel is tested against.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from video_moment_localization_tpu.ops.content_matrix import content_segments


def proposal_features(
    f: jnp.ndarray,
    moment_mask: jnp.ndarray,
    L: int,
    C: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(fc, fm, fb) from fused features f (B, T, D) and moment_mask (B, L, L)."""
    B, T, D = f.shape
    seg = content_segments(T, L, C)
    dtype = f.dtype

    # Prefix sums in f32 for accuracy regardless of compute dtype.
    P = jnp.cumsum(f.astype(jnp.float32), axis=1)
    P = jnp.concatenate([jnp.zeros((B, 1, D), jnp.float32), P], axis=1)  # (B, T+1, D)

    idx_s = jnp.asarray(seg.starts.reshape(-1))                  # (L*L*C,)
    idx_e = jnp.asarray((seg.starts + seg.sizes).reshape(-1))
    w = jnp.asarray(seg.weights.reshape(1, -1, 1))

    fc = (P[:, idx_e, :] - P[:, idx_s, :]) * w                   # (B, L*L*C, D)
    fc = fc.reshape(B, L, L, C, D).astype(dtype)
    fc = fc * moment_mask[..., None, None].astype(dtype)

    fm = jnp.mean(fc, axis=3)
    fb = jnp.mean(f.reshape(B, L, T // L, D), axis=2)
    return fc, fm, fb


def proposal_features_packed(
    f: jnp.ndarray,
    length_mask: jnp.ndarray,
    L: int,
    C: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Triangular-packed (fc, fm, fb): fc (B, N, C, D), fm (B, N, D).

    Only the N = L(L+1)/2 valid moments are computed — no masked-garbage
    FLOPs or HBM traffic (see ops/packing.py). Same prefix-sum construction
    as `proposal_features`.
    """
    from video_moment_localization_tpu.ops.packing import (
        packed_valid_mask,
        triu_packing,
    )

    B, T, D = f.shape
    seg = content_segments(T, L, C)
    p = triu_packing(L)
    dtype = f.dtype

    starts = seg.starts[p.i_idx, p.j_idx]        # (N, C)
    sizes = seg.sizes[p.i_idx, p.j_idx]
    weights = seg.weights[p.i_idx, p.j_idx]

    P = jnp.cumsum(f.astype(jnp.float32), axis=1)
    P = jnp.concatenate([jnp.zeros((B, 1, D), jnp.float32), P], axis=1)

    idx_s = jnp.asarray(starts.reshape(-1))
    idx_e = jnp.asarray((starts + sizes).reshape(-1))
    w = jnp.asarray(weights.reshape(1, -1, 1))

    fc = (P[:, idx_e, :] - P[:, idx_s, :]) * w   # (B, N*C, D)
    fc = fc.reshape(B, p.N, C, D).astype(dtype)
    vmask = packed_valid_mask(length_mask).astype(dtype)  # (B, N)
    fc = fc * vmask[..., None, None]

    fm = jnp.mean(fc, axis=2)
    fb = jnp.mean(f.reshape(B, L, T // L, D), axis=2)
    return fc, fm, fb


def _on_tpu() -> bool:
    import jax

    return jax.default_backend().startswith(("tpu", "axon"))


def proposal_features_auto(
    f: jnp.ndarray, moment_mask: jnp.ndarray, L: int, C: int, use_pallas: bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dispatch to the fused Pallas kernel on TPU, XLA prefix-sums elsewhere."""
    from video_moment_localization_tpu.ops import limits

    if use_pallas and _on_tpu() and not limits.kernel_disabled("proposal_pallas"):
        from video_moment_localization_tpu.ops.proposal_pallas import (
            proposal_features_pallas,
        )

        return proposal_features_pallas(f, moment_mask, L, C)
    return proposal_features(f, moment_mask, L, C)


def proposal_features_packed_auto(
    f: jnp.ndarray, length_mask: jnp.ndarray, L: int, C: int, use_pallas: bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Packed-layout dispatch: fused Pallas kernel on TPU, XLA elsewhere."""
    from video_moment_localization_tpu.ops import limits

    if use_pallas and _on_tpu() and not limits.kernel_disabled("proposal_pallas"):
        from video_moment_localization_tpu.ops.proposal_pallas import (
            proposal_features_packed_pallas,
        )

        return proposal_features_packed_pallas(f, length_mask, L, C)
    return proposal_features_packed(f, length_mask, L, C)
