"""Sequence-parallel proposal pooling: shard the clip/time axis over ICI.

The reference bounds video length by downsampling to T <= 128 host-side
(reference dataset.py:40-74) — there is no sequence parallelism anywhere in
it (SURVEY.md §5.7). This module is the scale path for long-video stress
(e.g. raising T for TACoS): the T axis of the segment-mean pooling is
sharded across a ``seq`` mesh axis, because segment means decompose exactly
into per-shard partial sums.

Pattern (shard_map over a 1-D ``seq`` mesh axis):
1. each device holds a contiguous (B, T/n, D) feature shard and computes
   its partial sum for every clip via local prefix-sum differences with
   shard-clipped bounds;
2. one ``psum_scatter`` over ICI both reduces the partial sums and leaves
   each device with its own block of L/n proposal-map rows (reduce-scatter,
   not all-reduce: memory for the (L, L, C, D) map also scales 1/n);
3. clip weights / masks are applied on the local row block; boundary
   features come from the local shard alone (snippet windows align with
   shards when n | L).

Outputs are row-sharded: fc (B, L/n, L, C, D), fm (B, L/n, L, D),
fb (B, L/n, D) per device.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from video_moment_localization_tpu.ops.content_matrix import content_segments

SEQ_AXIS = "seq"


def _local_pool(f_loc, mask_rows, starts, ends, weights, *, L: int, C: int, n: int):
    """Per-device body. f_loc (B, T/n, D); mask_rows (B, L/n, L) row block."""
    B, T_loc, D = f_loc.shape
    k = jax.lax.axis_index(SEQ_AXIS)
    off = k * T_loc

    P_loc = jnp.cumsum(f_loc.astype(jnp.float32), axis=1)
    P_loc = jnp.concatenate([jnp.zeros((B, 1, D), jnp.float32), P_loc], axis=1)

    cs = jnp.clip(starts - off, 0, T_loc)            # (L*L*C,) shard-clipped
    ce = jnp.clip(ends - off, 0, T_loc)
    part = jnp.take(P_loc, ce, axis=1) - jnp.take(P_loc, cs, axis=1)  # (B, LLC, D)

    # Reduce partial sums across shards AND scatter map rows: each device
    # keeps rows [k*L/n, (k+1)*L/n).
    part = part.reshape(B, L, (L * C) * 1, D).reshape(B, L, L * C * D)
    rows = jax.lax.psum_scatter(part, SEQ_AXIS, scatter_dimension=1, tiled=True)
    rows = rows.reshape(B, L // n, L, C, D)          # (B, L/n, L, C, D) sums

    w_rows = jax.lax.dynamic_slice_in_dim(weights, k * (L // n), L // n, axis=0)
    fc = rows * w_rows[None, ..., None]              # segment means
    fc = fc * mask_rows[..., None, None]
    fm = jnp.mean(fc, axis=3)

    # Boundary features: this shard's T/n frames are exactly L/n snippets.
    fb = jnp.mean(f_loc.reshape(B, L // n, T_loc // (L // n), D), axis=2)
    return fc.astype(f_loc.dtype), fm.astype(f_loc.dtype), fb.astype(f_loc.dtype)


def proposal_features_seq_sharded(
    f: jnp.ndarray,
    moment_mask: jnp.ndarray,
    L: int,
    C: int,
    mesh: Mesh,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sequence-sharded (fc, fm, fb); row-sharded over the ``seq`` axis.

    f (B, T, D) sharded on T; moment_mask (B, L, L) sharded on its row axis.
    Requires n | L and T % L == 0.
    """
    B, T, D = f.shape
    n = mesh.shape[SEQ_AXIS]
    if L % n != 0 or T % n != 0:
        raise ValueError(f"seq mesh size {n} must divide L ({L}) and T ({T})")
    seg = content_segments(T, L, C)
    starts = jnp.asarray(seg.starts.reshape(-1))
    ends = jnp.asarray((seg.starts + seg.sizes).reshape(-1))
    weights = jnp.asarray(seg.weights)               # (L, L, C)

    body = partial(_local_pool, L=L, C=C, n=n)
    fn = shard_map(
        lambda f_, m_: body(f_, m_, starts, ends, weights),
        mesh=mesh,
        in_specs=(P(None, SEQ_AXIS, None), P(None, SEQ_AXIS, None)),
        out_specs=(P(None, SEQ_AXIS, None, None, None),
                   P(None, SEQ_AXIS, None, None),
                   P(None, SEQ_AXIS, None)),
    )
    return fn(f, moment_mask)
