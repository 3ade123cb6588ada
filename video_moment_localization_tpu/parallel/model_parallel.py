"""Sequence-parallel SMIN forward: clip axis T and proposal-map rows
sharded over a ``seq`` mesh axis.

Extends ops in parallel/sequence.py to the full model: for videos too long
for one chip (raise T beyond the reference's 128 cap), each device holds a
contiguous T/n clip shard and the L/n proposal-map row block derived from
it. Communication is minimal and rides ICI:

* one ``psum_scatter`` reduces the pooling partial sums and leaves each
  device its own row block (see parallel/sequence.py);
* one tiny ``all_gather`` of the (B, L/n, D) boundary features per step
  plus one of the (B, L/n, D) moment->boundary messages per SMI layer —
  everything else (content unit, moment unit, heads) is pair-parallel and
  runs without communication.

The SMI units themselves are the *dense* row-sharded variants: the map-row
axis splits equally (L/n rows per device), so the existing dense unit
functions apply unchanged to each shard with row-sliced masks. Queries are
small and replicated (the biLSTM runs redundantly per device).

Outputs: pm row-sharded (B, L/n, L) per device -> a global (B, L, L) sharded
array; ps/pe/pa replicated.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from video_moment_localization_tpu.config import ModelConfig
from video_moment_localization_tpu.models.smin import (
    Params,
    _linear,
    content_unit,
    localization,
    moment_unit,
    query_encoder,
    word_attention,
)
from video_moment_localization_tpu.parallel.sequence import SEQ_AXIS, _local_pool
from video_moment_localization_tpu.ops.content_matrix import content_segments

import math

_NEG_INF = -1e9


def _boundary_unit_rows(p: Params, f_b, f_w, f_s, f_m_rows, query_mask,
                        length_mask, n: int):
    """BoundaryUnit with full boundary features but row-sharded f_m.

    Same math as models.smin.boundary_unit; the moment->boundary message is
    computed for the local row block and all-gathered (it is the only term
    needing the (L, L, D) moment map).
    """
    D = f_b.shape[-1]
    dtype = f_b.dtype
    L = f_b.shape[1]
    f_b_mask = length_mask[..., None].astype(dtype)

    f_baq = word_attention(p, f_b, f_w, f_w, query_mask) * f_b_mask
    f_bq = f_b * (f_baq + f_s[:, None, :])
    logits = jnp.einsum("bid,bjd->bij", f_bq, f_bq) / math.sqrt(D)
    key_m = length_mask[:, None, :].astype(dtype)
    logits = jnp.where(key_m > 0, logits, _NEG_INF)
    A_b = jax.nn.softmax(logits, axis=-1) * f_b_mask            # (B, L, L) full

    f_bb = jnp.einsum("bij,bjd->bid", A_b, f_b) * f_b_mask

    k = jax.lax.axis_index(SEQ_AXIS)
    rows = L // n
    A_b_rows = jax.lax.dynamic_slice_in_dim(A_b, k * rows, rows, axis=1)
    g_m = jax.nn.sigmoid(f_m_rows * f_s[:, None, None, :])
    f_bm_rows = jnp.einsum("bij,bijd->bid", A_b_rows, g_m * f_m_rows)
    f_bm = jax.lax.all_gather(f_bm_rows, SEQ_AXIS, axis=1, tiled=True)
    return f_bb + f_b + f_bm


def _body(cfg: ModelConfig, n: int, starts, ends, weights,
          params, vf_loc, vm_loc, qf, qm, lm, mm_rows):
    dtype = jnp.dtype(cfg.compute_dtype)
    vf_loc = vf_loc.astype(dtype)
    qf = qf.astype(dtype)

    # Video encoder on the local clip shard (local slice of the PE table).
    k = jax.lax.axis_index(SEQ_AXIS)
    t_loc = vf_loc.shape[1]
    pe_rows = jax.lax.dynamic_slice_in_dim(
        params["video_encoder"]["pe"], k * t_loc, t_loc, axis=0)
    vmask = vm_loc.astype(dtype)
    fv_loc = (_linear(params["video_encoder"]["ve"], vf_loc)
              + pe_rows.astype(dtype)[None]) * vmask
    fs, fw = query_encoder(params["query_encoder"], qf, qm, cfg.lstm_hidden_size)
    f_loc = fv_loc * fs[:, None, :]

    # Row-sharded proposal pooling (psum_scatter inside).
    fc, fm, fb_loc = _local_pool(f_loc, mm_rows.astype(dtype), starts, ends,
                                 weights, L=cfg.L, C=cfg.C, n=n)
    fb = jax.lax.all_gather(fb_loc, SEQ_AXIS, axis=1, tiled=True)  # (B, L, D)

    for p_layer in params["smi"]:
        cu = content_unit(p_layer["content"], fc, fw, fs, fm, qm, mm_rows)
        bu = _boundary_unit_rows(p_layer["boundary"], fb, fw, fs, fm, qm, lm, n)
        # MomentUnit on local rows: start-boundary features are the local
        # row block, end-boundary features the full set.
        k = jax.lax.axis_index(SEQ_AXIS)
        rows = cfg.L // n
        bu_rows = jax.lax.dynamic_slice_in_dim(bu, k * rows, rows, axis=1)
        mu = _moment_unit_rows(p_layer["moment"], cu, fm, bu_rows, bu, mm_rows)
        fc, fm, fb = cu, mu, bu

    return localization(params["localization"], fm,
                        fb, lm, mm_rows)


def _moment_unit_rows(p: Params, f_c, f_m, f_b_rows, f_b_full, mm_rows):
    """models.smin.moment_unit with a row-sharded start-boundary axis."""
    dtype = f_m.dtype
    f_m_mask = mm_rows[..., None].astype(dtype)
    outer = f_b_rows[:, :, None, :] * f_b_full[:, None, :, :]
    conv_fb = _linear(p["conv_fb"], outer) * f_m_mask
    conv_fc = _linear(p["conv_fc"], jnp.mean(f_c, axis=3)) * f_m_mask
    return conv_fb + conv_fc + f_m


def smin_forward_seq_sharded(
    params: Params,
    cfg: ModelConfig,
    video_features: jnp.ndarray,   # (B, T, dv) sharded on T
    video_mask: jnp.ndarray,       # (B, T, 1) sharded on T
    query_features: jnp.ndarray,   # (B, Nq, word_dim) replicated
    query_mask: jnp.ndarray,       # (B, Nq, 1) replicated
    length_mask: jnp.ndarray,      # (B, L) replicated
    moment_mask: jnp.ndarray,      # (B, L, L) sharded on rows
    mesh: Mesh,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full forward with T and map rows sharded over the ``seq`` axis.

    Returns (pm row-sharded (B, L, L), ps, pe, pa replicated (B, L)).
    """
    n = mesh.shape[SEQ_AXIS]
    if cfg.L % n != 0 or cfg.T % n != 0:
        raise ValueError(f"seq mesh size {n} must divide L ({cfg.L}) and T ({cfg.T})")
    seg = content_segments(cfg.T, cfg.L, cfg.C)
    starts = jnp.asarray(seg.starts.reshape(-1))
    ends = jnp.asarray((seg.starts + seg.sizes).reshape(-1))
    weights = jnp.asarray(seg.weights)

    # On a 2-D (data, seq) mesh the batch axis is data-parallel as well.
    d = "data" if "data" in mesh.axis_names else None

    body = partial(_body, cfg, n, starts, ends, weights)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(),                    # params (replicated pytree)
            P(d, SEQ_AXIS, None),   # video features
            P(d, SEQ_AXIS, None),   # video mask
            P(d, None, None),       # query features
            P(d, None, None),       # query mask
            P(d, None),             # length mask
            P(d, SEQ_AXIS, None),   # moment-mask rows
        ),
        out_specs=(
            P(d, SEQ_AXIS, None),   # pm row-sharded
            P(d, None),
            P(d, None),
            P(d, None),
        ),
        check_vma=False,
    )
    return fn(params, video_features, video_mask,
              query_features, query_mask, length_mask, moment_mask)


# --------------------------------------------------------------------- #
# 2-D (data x seq) training
# --------------------------------------------------------------------- #
def make_train_step_2d(cfg: ModelConfig, optimizer, mesh: Mesh):
    """Fused train step on a 2-D (data, seq) mesh.

    The forward runs through the shard_mapped sequence-parallel model; loss,
    backward, Adam, and metrics are expressed at the jit level on the
    sharded outputs — GSPMD inserts the cross-axis collectives (gradient
    all-reduce over both axes, row-gathers for the global top-k) and
    differentiates through the shard_map. Params/opt-state are replicated
    and donated.
    """
    import optax

    from video_moment_localization_tpu.parallel.steps import _step_metrics
    from video_moment_localization_tpu.train.loss import smin_loss

    def train_step(params, opt_state, batch):
        def loss_fn(p):
            outputs = smin_forward_seq_sharded(
                p, cfg,
                batch["video_features"], batch["video_mask"],
                batch["query_features"], batch["query_mask"],
                batch["length_mask"], batch["moment_mask"],
                mesh=mesh,
            )
            loss, aux = smin_loss(outputs, batch)
            return loss, (outputs, aux)

        (loss, (outputs, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state_new = optimizer.update(grads, opt_state, params)
        params_new = optax.apply_updates(params, updates)
        metrics = _step_metrics(outputs, loss, aux, batch, False, 0.0)
        return params_new, opt_state_new, metrics

    return jax.jit(train_step, donate_argnums=(0, 1))


def make_eval_step_2d(cfg: ModelConfig, mesh: Mesh, use_nms: bool = False,
                      nms_sigma: float = 0.5):
    """Eval counterpart of make_train_step_2d (forward + loss + counts)."""
    from video_moment_localization_tpu.parallel.steps import _step_metrics
    from video_moment_localization_tpu.train.loss import smin_loss

    def eval_step(params, batch):
        outputs = smin_forward_seq_sharded(
            params, cfg,
            batch["video_features"], batch["video_mask"],
            batch["query_features"], batch["query_mask"],
            batch["length_mask"], batch["moment_mask"],
            mesh=mesh,
        )
        loss, aux = smin_loss(outputs, batch)
        return _step_metrics(outputs, loss, aux, batch, use_nms, nms_sigma)

    return jax.jit(eval_step)


def put_batch_2d(batch, mesh: Mesh):
    """Shard a host batch for the 2-D step: batch axis on ``data``; the
    clip axis / map rows on ``seq``; per-snippet labels data-sharded only."""
    from jax.sharding import NamedSharding

    from video_moment_localization_tpu.parallel.mesh import device_batch

    specs = {
        "video_features": P("data", SEQ_AXIS, None),
        "video_mask": P("data", SEQ_AXIS, None),
        "query_features": P("data", None, None),
        "query_mask": P("data", None, None),
        "length_mask": P("data", None),
        "moment_mask": P("data", SEQ_AXIS, None),
        "sm": P("data", SEQ_AXIS, None),
        "ym": P("data", SEQ_AXIS, None),
        "ss": P("data", None),
        "ys": P("data", None),
        "se": P("data", None),
        "ye": P("data", None),
        "ya": P("data", None),
        "start_pos": P("data"),
        "end_pos": P("data"),
        "sample_mask": P("data"),
    }
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in device_batch(batch).items()
    }
