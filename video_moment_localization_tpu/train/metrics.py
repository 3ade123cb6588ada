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


def recall_counts(
    pm, ps, pe, moment_mask, sm, sample_mask=None,
    n: Sequence[int] = METRIC_NS,
    m: Sequence[float] = METRIC_MS,
    use_nms: bool = False,
    nms_sigma: float = 0.5,
) -> jnp.ndarray:
    """Un-normalized hit counts, shape (len(n), len(m))."""
    B = pm.shape[0]
    L = pm.shape[1]
    score = proposal_scores(pm, ps, pe, moment_mask).reshape(B, -1)
    k = max(n)
    if use_nms:
        _, top_idx = soft_nms_topk(score, L, k, nms_sigma)
    else:
        _, top_idx = jax.lax.top_k(score, k)
    top_ious = jnp.take_along_axis(sm.reshape(B, -1), top_idx, axis=1)  # (B, k)
    if sample_mask is None:
        sample_mask = jnp.ones(B, jnp.float32)

    counts = []
    for n_ in n:
        hit_any = [(top_ious[:, :n_] > m_).any(axis=1) for m_ in m]     # len(m) x (B,)
        counts.append(jnp.stack([(h * sample_mask).sum() for h in hit_any]))
    return jnp.stack(counts)                                             # (|n|, |m|)


def counts_to_dict(counts, n=METRIC_NS, m=METRIC_MS) -> Dict[str, float]:
    out = {}
    for i, n_ in enumerate(n):
        for j, m_ in enumerate(m):
            out[f"R@{n_}, IoU={m_}"] = float(counts[i, j])
    return out
