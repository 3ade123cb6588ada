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
    moment_gate,
    moment_unit,
    query_encoder,
    word_attention,
)
from video_moment_localization_tpu.parallel.sequence import SEQ_AXIS, _local_pool
from video_moment_localization_tpu.ops.content_matrix import content_segments

import math

_NEG_INF = -1e9


def _boundary_unit_rows(p: Params, f_b, f_w, f_s, f_m_rows, query_mask,
                        length_mask, n: int, fbar_rows=None):
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
    if fbar_rows is None:
        fbar_rows = moment_gate(f_m_rows, f_s)
    f_bm_rows = jnp.einsum("bij,bijd->bid", A_b_rows, fbar_rows)
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
        fbar_rows = moment_gate(fm, fs)   # shared content/boundary gate
        cu = content_unit(p_layer["content"], fc, fw, fs, fm, qm, mm_rows,
                          fbar=fbar_rows)
        bu = _boundary_unit_rows(p_layer["boundary"], fb, fw, fs, fm, qm, lm,
                                 n, fbar_rows=fbar_rows)
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
# Packed sequence-parallel forward (default layout under a seq mesh)
#
# Pair-chunk sharding: the packed pair axis N is padded to N_pad = n*ceil
# and split into n equal contiguous chunks (pairs, not map rows — row
# sharding would be unbalanced: row i carries L-i pairs). Everything
# pair-parallel (content unit, moment unit, pm head) runs locally on the
# chunk; the only cross-chunk terms are
#   * the pooling reduce-scatter (partial clip sums -> own pair chunk),
#   * one psum of the (B, L, D) moment->boundary row aggregation per SMI
#     layer (each device row-sums its local pairs, psum completes rows),
#   * one all_gather of the (B, L/n, D) boundary features after pooling.
# --------------------------------------------------------------------- #
from functools import lru_cache


@lru_cache(maxsize=None)
def _packed_seq_constants(T: int, L: int, C: int, n: int):
    """Static packed pooling geometry padded to n equal pair chunks.

    Returns (starts, ends, weights) of shape (N_pad*C,) / (N_pad, C), pair
    index arrays i_idx/j_idx (N_pad,), and (N, N_pad). Padding rows have
    start=end=0 (zero-length segments -> zero partial sums) and weight 0.
    """
    import numpy as np

    from video_moment_localization_tpu.ops.content_matrix import content_segments
    from video_moment_localization_tpu.ops.packing import triu_packing

    seg = content_segments(T, L, C)
    p = triu_packing(L)
    N = p.N
    N_pad = ((N + n - 1) // n) * n
    starts = seg.starts[p.i_idx, p.j_idx]            # (N, C)
    sizes = seg.sizes[p.i_idx, p.j_idx]
    weights = seg.weights[p.i_idx, p.j_idx]
    pad = N_pad - N
    if pad:
        starts = np.concatenate([starts, np.zeros((pad, C), starts.dtype)])
        sizes = np.concatenate([sizes, np.zeros((pad, C), sizes.dtype)])
        weights = np.concatenate([weights, np.zeros((pad, C), weights.dtype)])
    i_idx = np.concatenate([p.i_idx, np.zeros(pad, p.i_idx.dtype)])
    j_idx = np.concatenate([p.j_idx, np.zeros(pad, p.j_idx.dtype)])
    return (starts.reshape(-1), (starts + sizes).reshape(-1), weights,
            i_idx, j_idx, N, N_pad)


def _local_pool_packed(f_loc, vmask_loc, starts, ends, weights_loc,
                       *, L: int, C: int, n: int, N_pad: int):
    """Per-device packed pooling. f_loc (B, T/n, D); vmask_loc (B, N_pad/n).

    Each device forms partial prefix-sum differences for ALL pair-clips
    (shard-clipped bounds), then one psum_scatter both reduces across
    shards and leaves this device its contiguous pair chunk.
    """
    B, T_loc, D = f_loc.shape
    k = jax.lax.axis_index(SEQ_AXIS)
    off = k * T_loc

    P_loc = jnp.cumsum(f_loc.astype(jnp.float32), axis=1)
    P_loc = jnp.concatenate([jnp.zeros((B, 1, D), jnp.float32), P_loc], axis=1)
    cs = jnp.clip(starts - off, 0, T_loc)            # (N_pad*C,)
    ce = jnp.clip(ends - off, 0, T_loc)
    part = jnp.take(P_loc, ce, axis=1) - jnp.take(P_loc, cs, axis=1)

    part = part.reshape(B, n, (N_pad // n) * C * D)
    chunk = jax.lax.psum_scatter(part, SEQ_AXIS, scatter_dimension=1,
                                 tiled=True)
    chunk = chunk.reshape(B, N_pad // n, C, D)       # local pair-clip sums

    fc = chunk * weights_loc[None, ..., None]        # segment means
    fc = fc * vmask_loc[..., None, None]
    fm = jnp.mean(fc, axis=2)

    fb = jnp.mean(f_loc.reshape(B, L // n, T_loc // (L // n), D), axis=2)
    return fc.astype(f_loc.dtype), fm.astype(f_loc.dtype), fb.astype(f_loc.dtype)


def _boundary_unit_packed_chunk(p: Params, f_b, f_w, f_s, f_m_loc, query_mask,
                                length_mask, flat_idx_loc, i_idx_loc, L: int,
                                fbar_loc=None):
    """boundary_unit_packed with the moment message from a local pair chunk.

    f_bm[i] = sum over pairs with start row i of A_b[pair] * (g*f_m)[pair]:
    each device row-sums its local pairs (one-hot matmul against the local
    start rows), a psum over the seq axis completes every row.
    """
    D = f_b.shape[-1]
    dtype = f_b.dtype
    f_b_mask = length_mask[..., None].astype(dtype)

    f_baq = word_attention(p, f_b, f_w, f_w, query_mask) * f_b_mask
    f_bq = f_b * (f_baq + f_s[:, None, :])
    logits = jnp.einsum("bid,bjd->bij", f_bq, f_bq) / math.sqrt(D)
    key_m = length_mask[:, None, :].astype(dtype)
    logits = jnp.where(key_m > 0, logits, _NEG_INF)
    A_b = jax.nn.softmax(logits, axis=-1) * f_b_mask            # (B, L, L)

    f_bb = jnp.einsum("bij,bjd->bid", A_b, f_b) * f_b_mask

    B = A_b.shape[0]
    A_b_loc = jnp.take(A_b.reshape(B, L * L), flat_idx_loc, axis=1)  # (B, Nl)
    if fbar_loc is None:
        fbar_loc = moment_gate(f_m_loc, f_s)
    msg = A_b_loc[..., None] * fbar_loc                         # (B, Nl, D)
    row_onehot = jax.nn.one_hot(i_idx_loc, L, dtype=msg.dtype)  # (Nl, L)
    f_bm_part = jnp.einsum("nl,bnd->bld", row_onehot, msg)
    f_bm = jax.lax.psum(f_bm_part, SEQ_AXIS)
    return f_bb + f_b + f_bm


def _moment_unit_packed_chunk(p: Params, f_c, f_m, f_b, vmask_loc,
                              i_idx_loc, j_idx_loc):
    """moment_unit_packed with traced per-chunk pair indices."""
    dtype = f_m.dtype
    f_m_mask = vmask_loc[..., None].astype(dtype)
    outer = (jnp.take(f_b, i_idx_loc, axis=1)
             * jnp.take(f_b, j_idx_loc, axis=1))                # (B, Nl, D)
    conv_fb = _linear(p["conv_fb"], outer) * f_m_mask
    conv_fc = _linear(p["conv_fc"], jnp.mean(f_c, axis=2)) * f_m_mask
    return conv_fb + conv_fc + f_m


def _body_packed(cfg: ModelConfig, n: int, consts,
                 params, vf_loc, vm_loc, qf, qm, lm):
    from video_moment_localization_tpu.models.smin import content_unit_packed
    from video_moment_localization_tpu.ops.packing import packed_valid_mask

    starts, ends, weights, i_idx, j_idx, N, N_pad = consts
    dtype = jnp.dtype(cfg.compute_dtype)
    vf_loc = vf_loc.astype(dtype)
    qf = qf.astype(dtype)
    L = cfg.L
    N_loc = N_pad // n

    k = jax.lax.axis_index(SEQ_AXIS)
    t_loc = vf_loc.shape[1]
    pe_rows = jax.lax.dynamic_slice_in_dim(
        params["video_encoder"]["pe"], k * t_loc, t_loc, axis=0)
    vmask = vm_loc.astype(dtype)
    fv_loc = (_linear(params["video_encoder"]["ve"], vf_loc)
              + pe_rows.astype(dtype)[None]) * vmask
    fs, fw = query_encoder(params["query_encoder"], qf, qm, cfg.lstm_hidden_size)
    f_loc = fv_loc * fs[:, None, :]

    # Local slices of the static pair geometry / validity.
    vmask_full = packed_valid_mask(lm.astype(jnp.float32))       # (B, N)
    vmask_full = jnp.pad(vmask_full, ((0, 0), (0, N_pad - N)))
    vmask_loc = jax.lax.dynamic_slice_in_dim(
        vmask_full, k * N_loc, N_loc, axis=1).astype(dtype)
    w_loc = jax.lax.dynamic_slice_in_dim(weights, k * N_loc, N_loc, axis=0)
    fi_loc = jax.lax.dynamic_slice_in_dim(
        jnp.asarray(i_idx) * L + jnp.asarray(j_idx), k * N_loc, N_loc, axis=0)
    i_loc = jax.lax.dynamic_slice_in_dim(jnp.asarray(i_idx), k * N_loc,
                                         N_loc, axis=0)
    j_loc = jax.lax.dynamic_slice_in_dim(jnp.asarray(j_idx), k * N_loc,
                                         N_loc, axis=0)

    fc, fm, fb_loc = _local_pool_packed(
        f_loc, vmask_loc, starts, ends, w_loc, L=L, C=cfg.C, n=n, N_pad=N_pad)
    fb = jax.lax.all_gather(fb_loc, SEQ_AXIS, axis=1, tiled=True)  # (B, L, D)

    for p_layer in params["smi"]:
        fbar_loc = moment_gate(fm, fs)    # shared content/boundary gate
        cu = content_unit_packed(p_layer["content"], fc, fw, fs, fm, qm,
                                 vmask_loc, fbar=fbar_loc)
        bu = _boundary_unit_packed_chunk(p_layer["boundary"], fb, fw, fs, fm,
                                         qm, lm, fi_loc, i_loc, L,
                                         fbar_loc=fbar_loc)
        mu = _moment_unit_packed_chunk(p_layer["moment"], cu, fm, bu,
                                       vmask_loc, i_loc, j_loc)
        fc, fm, fb = cu, mu, bu

    from video_moment_localization_tpu.models.smin import localization_packed

    # Heads on the local chunk; pm comes back pair-sharded (B, N_pad).
    pm, ps, pe, pa = localization_packed(params["localization"], fm, fb,
                                         lm, vmask_loc, L, dense_out=False)
    return pm, ps, pe, pa


def smin_forward_seq_sharded_packed(
    params: Params,
    cfg: ModelConfig,
    video_features: jnp.ndarray,   # (B, T, dv) sharded on T
    video_mask: jnp.ndarray,       # (B, T, 1) sharded on T
    query_features: jnp.ndarray,   # (B, Nq, word_dim) replicated
    query_mask: jnp.ndarray,       # (B, Nq, 1) replicated
    length_mask: jnp.ndarray,      # (B, L) replicated
    mesh: Mesh,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Packed sequence-parallel forward: clip axis and packed pair chunks
    sharded over ``seq``. Returns (pm (B, N) — padded tail sliced off,
    ps/pe/pa replicated), matching the single-device packed contract.
    """
    n = mesh.shape[SEQ_AXIS]
    if cfg.L % n != 0 or cfg.T % n != 0:
        raise ValueError(f"seq mesh size {n} must divide L ({cfg.L}) and T ({cfg.T})")
    consts_np = _packed_seq_constants(cfg.T, cfg.L, cfg.C, n)
    starts, ends, weights, i_idx, j_idx, N, N_pad = consts_np
    consts = (jnp.asarray(starts), jnp.asarray(ends), jnp.asarray(weights),
              i_idx, j_idx, N, N_pad)

    d = "data" if "data" in mesh.axis_names else None
    body = partial(_body_packed, cfg, n, consts)
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
        ),
        out_specs=(
            P(d, SEQ_AXIS),         # pm pair-sharded (B, N_pad)
            P(d, None),
            P(d, None),
            P(d, None),
        ),
        check_vma=False,
    )
    pm, ps, pe, pa = fn(params, video_features, video_mask,
                        query_features, query_mask, length_mask)
    return pm[:, :N], ps, pe, pa


# --------------------------------------------------------------------- #
# 2-D (data x seq) training
# --------------------------------------------------------------------- #
def _seq_forward(cfg: ModelConfig, mesh: Mesh, p, batch):
    """Dispatch the sequence-parallel forward by layout: packed pair-chunk
    sharding by default, the dense row-sharded path in compat/dense mode."""
    if cfg.packed and not cfg.compat_head:
        return smin_forward_seq_sharded_packed(
            p, cfg,
            batch["video_features"], batch["video_mask"],
            batch["query_features"], batch["query_mask"],
            batch["length_mask"], mesh=mesh,
        )
    return smin_forward_seq_sharded(
        p, cfg,
        batch["video_features"], batch["video_mask"],
        batch["query_features"], batch["query_mask"],
        batch["length_mask"], batch["moment_mask"], mesh=mesh,
    )


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
            outputs = _seq_forward(cfg, mesh, p, batch)
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
        outputs = _seq_forward(cfg, mesh, params, batch)
        loss, aux = smin_loss(outputs, batch)
        return _step_metrics(outputs, loss, aux, batch, use_nms, nms_sigma)

    return jax.jit(eval_step)


def put_batch_2d(batch, mesh: Mesh):
    """Shard a host batch for the 2-D step: batch axis on ``data``; the
    clip axis / map rows on ``seq``; per-snippet labels data-sharded only.
    Packed batches carry (B, N) sm/ym (data-sharded, replicated over seq —
    tiny next to the feature tensors) and no moment_mask."""
    from jax.sharding import NamedSharding

    from video_moment_localization_tpu.parallel.mesh import device_batch

    packed = batch["sm"].ndim == 2
    specs = {
        "video_features": P("data", SEQ_AXIS, None),
        "video_mask": P("data", SEQ_AXIS, None),
        "query_features": P("data", None, None),
        "query_mask": P("data", None, None),
        "length_mask": P("data", None),
        "moment_mask": P("data", SEQ_AXIS, None),
        "sm": P("data", None) if packed else P("data", SEQ_AXIS, None),
        "ym": P("data", None) if packed else P("data", SEQ_AXIS, None),
        "ss": P("data", None),
        "ys": P("data", None),
        "se": P("data", None),
        "ye": P("data", None),
        "ya": P("data", None),
        "start_pos": P("data"),
        "end_pos": P("data"),
        "sample_mask": P("data"),
    }
    if jax.process_count() > 1:
        # Multi-host: each process holds its contiguous data-axis slice
        # (BatchLoader shard) but the FULL seq axis; make_array assembles
        # the global array from per-process local data without host copies.
        import numpy as np

        return {
            k: jax.make_array_from_process_local_data(
                NamedSharding(mesh, specs[k]), np.asarray(v))
            for k, v in device_batch(batch).items()
        }
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k]))
        for k, v in device_batch(batch).items()
    }
