"""R@n, IoU=m evaluation metrics, computed on-device.

Reference semantics (reference utils.py:10-31): the final proposal score is
``pm * sqrt(ps)[:, :, None] * sqrt(pe)[:, None, :]`` masked to valid
moments; take the top-k = max(n) scores; gather the *ground-truth IoU*
values at those indices; R@n,IoU=m counts samples where any of the top-n
gathered IoUs exceeds m. Counts are un-normalized (the caller divides by the
number of samples), matching the reference's stats aggregation.

Additions over the reference: a padded-batch `sample_mask`, and an opt-in
soft-NMS selection mode (ops/nms.py) instead of plain top-k.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from video_moment_localization_tpu.ops.nms import soft_nms_topk

METRIC_NS: Tuple[int, ...] = (1, 5)
METRIC_MS: Tuple[float, ...] = (0.1, 0.3, 0.5, 0.7)


def metric_names(n: Sequence[int] = METRIC_NS, m: Sequence[float] = METRIC_MS):
    """Exact reference metric-name strings (utils.py:29)."""
    return [f"R@{n_}, IoU={m_}" for n_ in n for m_ in m]


def proposal_scores(pm, ps, pe, moment_mask) -> jnp.ndarray:
    """(B, L, L) final moment scores (reference utils.py:17-19)."""
    score = pm * jnp.sqrt(ps)[:, :, None] * jnp.sqrt(pe)[:, None, :]
    return score * moment_mask


def proposal_scores_packed(pm, ps, pe, length_mask, L: int) -> jnp.ndarray:
    """(B, N) packed final moment scores: same math as `proposal_scores`
    restricted to the valid upper-triangular pairs (static index gathers
    replace the dense broadcasts)."""
    from video_moment_localization_tpu.ops.packing import (
        packed_valid_mask,
        triu_packing,
    )

    p = triu_packing(L)
    s_i = jnp.take(jnp.sqrt(ps), jnp.asarray(p.i_idx), axis=1)   # (B, N)
    e_j = jnp.take(jnp.sqrt(pe), jnp.asarray(p.j_idx), axis=1)
    vmask = packed_valid_mask(length_mask.astype(jnp.float32))
    return pm * s_i * e_j * vmask


def _counts_from_topk(score, sm_flat, sample_mask, n, m, L, use_nms,
                      nms_sigma, packed):
    """Shared top-k -> gather-GT-IoU -> threshold-count tail."""
    B = score.shape[0]
    k = max(n)
    if use_nms:
        _, top_idx = soft_nms_topk(score, L, k, nms_sigma, packed=packed)
    else:
        _, top_idx = jax.lax.top_k(score, k)
    top_ious = jnp.take_along_axis(sm_flat, top_idx, axis=1)            # (B, k)
    if sample_mask is None:
        sample_mask = jnp.ones(B, jnp.float32)

    counts = []
    for n_ in n:
        hit_any = [(top_ious[:, :n_] > m_).any(axis=1) for m_ in m]     # len(m) x (B,)
        counts.append(jnp.stack([(h * sample_mask).sum() for h in hit_any]))
    return jnp.stack(counts)                                             # (|n|, |m|)


def recall_counts(
    pm, ps, pe, moment_mask, sm, sample_mask=None,
    n: Sequence[int] = METRIC_NS,
    m: Sequence[float] = METRIC_MS,
    use_nms: bool = False,
    nms_sigma: float = 0.5,
) -> jnp.ndarray:
    """Un-normalized hit counts, shape (len(n), len(m)) — dense layout,
    reproducing the reference's top-k tie behavior exactly (PARITY.md #16)."""
    B = pm.shape[0]
    L = pm.shape[1]
    score = proposal_scores(pm, ps, pe, moment_mask).reshape(B, -1)
    return _counts_from_topk(score, sm.reshape(B, -1), sample_mask, n, m, L,
                             use_nms, nms_sigma, packed=False)


def recall_counts_packed(
    pm, ps, pe, length_mask, sm, sample_mask=None,
    n: Sequence[int] = METRIC_NS,
    m: Sequence[float] = METRIC_MS,
    use_nms: bool = False,
    nms_sigma: float = 0.5,
) -> jnp.ndarray:
    """`recall_counts` over the packed layout: pm/sm are (B, N); the top-k
    runs over the N valid pairs only and never materializes an (L, L) map.

    Deviation from the reference quirk (PARITY.md #16, deliberate): with
    fewer than k positive-scoring valid pairs, dense top-k could select
    masked/lower-triangle zero-score slots whose dense `sm` entries are real
    IoUs; here ties select among packed slots only. Identical whenever a
    sample has >= k scored proposals (always, past early training). The
    compat_head mode keeps the bit-exact reference behavior.
    """
    B, N = pm.shape
    L = ps.shape[1]
    score = proposal_scores_packed(pm, ps, pe, length_mask, L)
    return _counts_from_topk(score, sm, sample_mask, n, m, L,
                             use_nms, nms_sigma, packed=True)


def counts_to_dict(counts, n=METRIC_NS, m=METRIC_MS) -> Dict[str, float]:
    out = {}
    for i, n_ in enumerate(n):
        for j, m_ in enumerate(m):
            out[f"R@{n_}, IoU={m_}"] = float(counts[i, j])
    return out
