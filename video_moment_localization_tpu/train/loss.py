"""Scaled-IoU BCE losses.

Implements the *intended* semantics of the reference loss (reference
main.py:89-116): per element, with score weight s and binary label y,

    loss = -[ s·y·log(p) + (1-s)·(1-y)·log(1-p) ]

(the reference's two weighted-BCELoss construction reduces to exactly this;
its committed `reduction=None` typo crashes on torch>=2.0 — SURVEY.md §2.4 —
so the rebuilt math, not the crashing code, is the parity target). The
unweighted variant is plain BCE. Per sample: masked mean over valid
positions; per batch: mean over *valid* samples (the batch may be padded to
a fixed size — see data/pipeline.py).

Total (reference main.py:110-116):
    L = L_m + L_s + L_e + 0.5 * L_a
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

_EPS = 1e-7  # probability clamp; keeps masked-out p==0 entries finite


def scaled_bce(p, y, s, mask) -> jnp.ndarray:
    """Per-sample masked scaled BCE.

    p, y, mask: (B, ...) with identical trailing dims; s: same or None.
    Returns (B,) per-sample losses (0 for all-masked rows).
    """
    p = jnp.clip(p.astype(jnp.float32), _EPS, 1.0 - _EPS)
    y = y.astype(jnp.float32)
    log_p, log_1p = jnp.log(p), jnp.log1p(-p)
    if s is None:
        per = -(y * log_p + (1.0 - y) * log_1p)
    else:
        s = s.astype(jnp.float32)
        per = -(s * y * log_p + (1.0 - s) * (1.0 - y) * log_1p)
    per = per * mask
    axes = tuple(range(1, per.ndim))
    denom = mask.sum(axis=axes)
    return jnp.where(denom > 0, per.sum(axis=axes) / jnp.maximum(denom, 1.0), 0.0)


def smin_loss(
    outputs: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total SMIN loss averaged over valid samples.

    Returns (scalar loss, {"per_sample": (B,), "num_valid": scalar}).
    """
    pm, ps, pe, pa = outputs
    if pm.ndim == 2:
        # Packed layout: pm/ym/sm are (B, N); the moment-validity mask is
        # derived from length_mask (the dense moment_mask never exists).
        # Identical value to the dense masked mean: both average the same
        # per-element terms over the same valid-count denominator.
        from video_moment_localization_tpu.ops.packing import packed_valid_mask

        mask_m = packed_valid_mask(batch["length_mask"].astype(jnp.float32))
    else:
        mask_m = batch["moment_mask"]
    per_sample = (
        scaled_bce(pm, batch["ym"], batch["sm"], mask_m)
        + scaled_bce(ps, batch["ys"], batch["ss"], batch["length_mask"])
        + scaled_bce(pe, batch["ye"], batch["se"], batch["length_mask"])
        + 0.5 * scaled_bce(pa, batch["ya"], None, batch["length_mask"])
    )
    sample_mask = batch.get("sample_mask")
    if sample_mask is None:
        sample_mask = jnp.ones(per_sample.shape[0], jnp.float32)
    num_valid = sample_mask.sum()
    loss = (per_sample * sample_mask).sum() / jnp.maximum(num_valid, 1.0)
    return loss, {"per_sample": per_sample, "num_valid": num_valid}
