"""SPMD train/eval steps: one jit-compiled executable each.

Each step fuses forward + loss (+ backward + Adam update for training) +
on-device R@n,IoU@m metric counts (reference spreads these across
main.py:135-211 with per-batch host sync; here a step returns only a few
scalars/small arrays, so host<->device traffic per step is O(batch) in and
O(1) out).

Under a multi-device mesh the batch arrives sharded on the ``data`` axis and
params replicated; XLA all-reduces the gradients over ICI automatically.
Params/opt-state buffers are donated — Adam runs in place in HBM.
"""

from __future__ import annotations


from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from video_moment_localization_tpu.config import ModelConfig
from video_moment_localization_tpu.models import smin_forward
from video_moment_localization_tpu.models.smin import smin_forward_inference
from video_moment_localization_tpu.ops import limits
from video_moment_localization_tpu.train.loss import smin_loss
from video_moment_localization_tpu.train.metrics import (
    recall_counts,
    recall_counts_packed,
)

Batch = Dict[str, jnp.ndarray]

_FORWARD_KEYS = ("video_features", "video_mask", "query_features",
                 "query_mask", "length_mask", "moment_mask")


def _forward(params, cfg: ModelConfig, batch: Batch):
    # Packed batches carry no dense moment_mask (the packed forward derives
    # pair validity from length_mask on device).
    return smin_forward(params, cfg, *(batch.get(k) for k in _FORWARD_KEYS))


def _step_metrics(outputs, loss, aux, batch: Batch, use_nms: bool, nms_sigma: float):
    """Per-step device outputs: the loss scalar and recall counts only —
    the trainer derives valid-sample counts host-side from sample_mask."""
    del aux
    pm, ps, pe, _ = outputs
    if pm.ndim == 2:  # packed (B, N) scoring — no (B, L, L) materialization
        counts = recall_counts_packed(
            pm, ps, pe, batch["length_mask"], batch["sm"],
            batch.get("sample_mask"), use_nms=use_nms, nms_sigma=nms_sigma,
        )
    else:
        counts = recall_counts(
            pm, ps, pe, batch["moment_mask"], batch["sm"],
            batch.get("sample_mask"), use_nms=use_nms, nms_sigma=nms_sigma,
        )
    return {"loss": loss, "counts": counts}


def make_train_step(
    cfg: ModelConfig, optimizer: optax.GradientTransformation
) -> Callable[[Any, Any, Batch], Tuple[Any, Any, Dict[str, jnp.ndarray]]]:
    """Returns jitted (params, opt_state, batch) -> (params, opt_state, metrics)."""

    def train_step(params, opt_state, batch: Batch):
        def loss_fn(p):
            outputs = _forward(p, cfg, batch)
            loss, aux = smin_loss(outputs, batch)
            return loss, (outputs, aux)

        (loss, (outputs, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = _step_metrics(outputs, loss, aux, batch, False, 0.0)
        return params, opt_state, metrics

    # A Mosaic compile failure (other TPU generation, exotic geometry)
    # disables the fused train kernels and re-traces onto the XLA path
    # instead of crashing the job. Compile errors occur strictly before
    # execution, so the donated (params, opt_state) buffers survive the
    # failed attempt and the retry is safe.
    return limits.with_kernel_fallback(
        lambda: jax.jit(train_step, donate_argnums=(0, 1)),
        ("smin_train_pallas", "content_train_pallas", "proposal_pallas",
         "lstm_pallas"),
        label="train step",
    )


def make_eval_step(
    cfg: ModelConfig, use_nms: bool = False, nms_sigma: float = 0.5
) -> Callable[[Any, Batch], Dict[str, jnp.ndarray]]:
    """Returns jitted (params, batch) -> metrics (loss + recall counts)."""

    def eval_step(params, batch: Batch):
        # Grad-free: route through the fused SMI-stack kernel when supported.
        outputs = smin_forward_inference(
            params, cfg, *(batch.get(k) for k in _FORWARD_KEYS))
        loss, aux = smin_loss(outputs, batch)
        return _step_metrics(outputs, loss, aux, batch, use_nms, nms_sigma)

    return limits.with_kernel_fallback(
        lambda: jax.jit(eval_step),
        ("smin_pallas", "content_pallas", "proposal_pallas", "lstm_pallas"),
        label="eval step",
    )
