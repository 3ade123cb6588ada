"""Fused Pallas TPU kernel for the ContentUnit interior (packed layout), v2.

The ContentUnit (reference models.py:228-276) is the SMI stack's dominant
cost: per moment-clip row it runs a D->dl projection, query-guided word
attention, gating, an intra-moment clip self-attention, and a dl->D output
projection. XLA materializes ~6 HBM round trips of (B, N*C, dl/D)
intermediates per layer; this kernel runs the whole interior out of VMEM,
touching HBM once in (fc) and once out.

**Status: OFF by default — measured slower than XLA; retirement justified
by on-chip data (VERDICT r1 item 3).** Honest device timings (K=64 in-jit
chained iterations, one RTT amortized; see scripts/bench_ops.py), v5e,
bf16, Charades scale:

    B=63   XLA 0.65 ms   fused 1.44 ms   (0.45x)
    B=512  XLA 3.26 ms   fused 6.29 ms   (0.52x)
    ActivityNet B=64: XLA 6.03 ms, fused 14.09 ms (0.43x)

Why XLA wins here (probe-kernel breakdown, /tmp-probe reproduced in
ROADMAP r2 notes): per-grid-cell pipeline/DMA overhead is ~9 us even for a
2-matmul body, and the whole per-cell MXU work is only ~1.7 us — while
XLA's extra HBM traffic is modest because every intermediate is dl=128
wide (4x narrower than D): XLA floor ~4.2 us/elem vs fused floor ~2.3
us/elem. The structural fusion upside (~2 us/elem) is smaller than the
per-cell overhead at any VMEM-feasible cell size. The round-1 theory that
the (NC, NC) dense-trick FLOPs caused the loss was wrong: v2 removed them
(the C x C attention costs +1.7 us/cell on the VPU) and still loses.
Kept as a tested building block; revisit only if a future Mosaic reduces
per-cell overheads or D/dl ratios change.

v2 design (replaces the round-1 single-block kernel):

* **row-block grid**: each grid cell processes R = r_pairs*C packed
  moment-clip rows of one batch element — (num_blocks, B) with the batch
  innermost, so the weight blocks stay resident and ActivityNet-scale maps
  (N*C = 8,320 rows) tile instead of falling back;
* **the C x C intra-moment attention runs on the VPU** via static
  per-offset reductions: sim[(n,c), e] = <f_cq[n,c], f_cq[n,e]> is C
  elementwise-multiply+lane-reduce passes over (R, dl) — 2*R*C*dl FLOPs.
  The round-1 kernel evaluated it as one dense (NC, NC) MXU matmul with a
  block-diagonal mask: 2*NC^2*dl FLOPs, a ~NC/C = 136x FLOP blow-up at
  Charades scale that made the kernel slower than XLA. v2 does no wasted
  matmul work;
* all projections stay single MXU matmuls per block: (R,D)@(D,dl),
  (R,dl)@(dl,dl), (R,dl)@(dl,Nq'), (R,Nq')@(Nq',dl), (R,dl)@(dl,D);
* the moment-gate message fbar_m needs no expansion operator: the (R/C, C,
  D) sublane-split view broadcasts fbar (R/C, D) over the C clip rows.

Backward = custom VJP through the XLA packed ContentUnit (exact recompute;
tested against autodiff of the XLA path).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_moment_localization_tpu.ops import limits
from video_moment_localization_tpu.ops.packing import triu_packing

_NEG_INF = -1e9
_ROW_BLOCK = 512          # rows per grid cell for multi-block maps
_SINGLE_BLOCK_MAX = 1024  # below this, run the whole map as one block


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _row_block(N: int, C: int) -> int:
    """Rows per grid cell: whole map when small, _ROW_BLOCK tiles otherwise."""
    NC = N * C
    if NC <= _SINGLE_BLOCK_MAX:
        return _round_up(NC, 8 * C)
    return _ROW_BLOCK


def supports(L: int, C: int) -> bool:
    """v2 tiles arbitrarily large maps; only require the row-block split to
    preserve whole C-groups (R % C == 0, true by construction). The limits
    registry can disable 'content_pallas' after a Mosaic compile failure."""
    if limits.kernel_disabled("content_pallas"):
        return False
    return _ROW_BLOCK % C == 0 or triu_packing(L).N * C <= _SINGLE_BLOCK_MAX


def _kernel(x_ref, fm_ref, khat_ref, val_ref, qmask_ref, fshat_ref, fs_ref,
            mcol_ref, w1_ref, b1_ref, wq_ref, bq_ref, w2_ref, b2_ref,
            out_ref, *, C: int, dl: int, precision):
    """One (row-block nb, batch-block bb) cell over BB batch elements.

    Matmuls run in the input dtype (bf16 MXU passes for bf16 activations —
    upcasting to fp32 costs ~8x MXU throughput and made v2.0 lose to XLA)
    with fp32 accumulation; softmax/gating run in fp32 on the VPU.
    """
    f32 = jnp.float32
    w = x_ref.dtype                                       # compute dtype
    x = x_ref[:]                                          # (BB, R, D)
    BB, R, D = x.shape
    G = R // C                                            # pairs per element
    xr = x.reshape(BB * R, D)
    mcol = mcol_ref[:].reshape(BB * R, 1).astype(f32)

    # D -> dl projection (f_c_hat): one merged (BB*R, D) @ (D, dl) matmul
    h32 = (jnp.dot(xr, w1_ref[:], preferred_element_type=f32,
                   precision=precision) + b1_ref[:].astype(f32)) * mcol
    h = h32.astype(w)                                     # (BB*R, dl)

    # query-guided word attention: keys/values are per batch element, so
    # the small (R, dl) @ (dl, Nq) contractions loop over the BB elements.
    q = (jnp.dot(h, wq_ref[:], preferred_element_type=f32,
                 precision=precision) + bq_ref[:].astype(f32)).astype(w)
    qm = qmask_ref[:].astype(f32)                         # (BB, 1, Nq)
    f_caq_parts = []
    for b in range(BB):
        # khat arrives pre-transposed (dl, Nq): a standard [1],[0] matmul
        # (Mosaic rejects the rhs-contracting-dim-1 form for mixed layouts).
        logits = jnp.dot(
            q[b * R : (b + 1) * R], khat_ref[b],
            preferred_element_type=f32, precision=precision,
        ) / math.sqrt(dl)                                 # (R, Nq)
        logits = jnp.where(qm[b] > 0, logits, _NEG_INF)
        attn = jax.nn.softmax(logits, axis=-1).astype(w)
        f_caq_parts.append(
            jnp.dot(attn, val_ref[b], preferred_element_type=f32,
                    precision=precision)
        )
    f_caq = jnp.concatenate(f_caq_parts, axis=0) * mcol   # (BB*R, dl) f32

    # gated query fusion (fshat broadcast per element)
    fshat = fshat_ref[:].astype(f32)                      # (BB, 1, dl)
    f_cq32 = h32 * (f_caq.reshape(BB, R, dl) + fshat).reshape(BB * R, dl)

    # intra-moment C x C clip attention on the VPU: per clip offset e,
    # sim[(n,c), e] = <f_cq[n,c], f_cq[n,e]> / sqrt(dl)
    g = f_cq32.reshape(BB * G, C, dl)                     # sublane split
    hh = h32.reshape(BB * G, C, dl)
    sim_cols = [
        jnp.sum(g * g[:, e : e + 1, :], axis=-1).reshape(BB * R, 1)
        for e in range(C)
    ]
    sim = jnp.concatenate(sim_cols, axis=1) / math.sqrt(dl)     # (BB*R, C)
    # NB post-softmax mask, matching the reference ordering
    # (models.py:262-263 / content_unit_packed).
    a = jax.nn.softmax(sim, axis=-1) * mcol               # (BB*R, C)
    acc = jnp.zeros((BB * G, C, dl), f32)
    for e in range(C):
        a_e = a[:, e : e + 1].reshape(BB * G, C, 1)
        acc = acc + a_e * hh[:, e : e + 1, :]
    f_cc_hat = acc.reshape(BB * R, dl).astype(w)

    # dl -> D output projection
    f_cc = (jnp.dot(f_cc_hat, w2_ref[:], preferred_element_type=f32,
                    precision=precision) + b2_ref[:].astype(f32)) * mcol

    # moment-gate message: fbar (BB*G, D) broadcast over the C clip rows.
    # Residual adds run in the compute dtype, matching the XLA packed path
    # (content_unit_packed adds f_cc + f_c + fbar in `dtype`).
    fm = fm_ref[:].astype(f32)                            # (BB, G, D)
    fbar = (jax.nn.sigmoid(fm * fs_ref[:].astype(f32)) * fm).astype(w)
    out = (f_cc.astype(w).reshape(BB * G, C, D) + xr.reshape(BB * G, C, D)
           + fbar.reshape(BB * G, D)[:, None, :])
    out_ref[:] = out.reshape(BB, R, D).astype(out_ref.dtype)


def _content_unit_fused(p: Dict[str, Any], f_c, f_w, f_s, f_m, query_mask,
                        vmask, interpret: bool):
    B, N, C, D = f_c.shape
    dl = p["c_hat"]["w"].shape[1]
    Nq = f_w.shape[1]
    NC = N * C
    f32 = jnp.float32

    R = _row_block(N, C)
    NC_pad = _round_up(NC, R)
    N_pad = NC_pad // C
    num_blocks = NC_pad // R
    # Batch elements per grid cell: merge small row blocks into ~4k-row
    # matmuls (MXU-efficient) while keeping VMEM residency modest.
    # VMEM budget: ~8.2 KB/row live (bf16 in/out double-buffered + the f32
    # working copies) — cap the merged block at ~1.1k rows to stay inside
    # the 16 MB scoped limit with margin.
    BB = 1
    for cand in (8, 4, 2):
        if B % cand == 0 and cand * R <= 1152:
            BB = cand
            break

    # Small word-side tensors precomputed on the XLA side (tiny GEMMs).
    q_mask = query_mask.astype(f_w.dtype)
    f_w_hat = (f_w @ p["w_hat"]["w"].astype(f_w.dtype)
               + p["w_hat"]["b"].astype(f_w.dtype)) * q_mask       # (B, Nq, dl)
    khat = (f_w_hat @ p["attn_k"]["w"].astype(f_w.dtype)
            + p["attn_k"]["b"].astype(f_w.dtype))                  # (B, Nq, dl)
    khat = jnp.swapaxes(khat, 1, 2)                                # (B, dl, Nq)
    f_s_hat = (f_s @ p["s_hat"]["w"].astype(f_s.dtype)
               + p["s_hat"]["b"].astype(f_s.dtype))[:, None, :]    # (B, 1, dl)
    mask_col = jnp.repeat(vmask.astype(f32), C, axis=1)            # (B, NC)
    mask_col = jnp.pad(mask_col, ((0, 0), (0, NC_pad - NC)))[..., None]

    x_rows = f_c.reshape(B, NC, D)
    fm_rows = f_m
    if NC_pad != NC:
        x_rows = jnp.pad(x_rows, ((0, 0), (0, NC_pad - NC), (0, 0)))
        fm_rows = jnp.pad(f_m, ((0, 0), (0, N_pad - N), (0, 0)))

    precision = (jax.lax.Precision.HIGHEST if f_c.dtype == f32
                 else jax.lax.Precision.DEFAULT)
    kernel = functools.partial(_kernel, C=C, dl=dl, precision=precision)

    per_b = lambda nb, b: (b, 0, 0)      # noqa: E731
    const = lambda nb, b: (0, 0)         # noqa: E731
    rows_ix = lambda nb, b: (b, nb, 0)   # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(num_blocks, B // BB),  # batch fastest: weights stay resident
        in_specs=[
            pl.BlockSpec((BB, R, D), rows_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, R // C, D), rows_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, dl, Nq), per_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, Nq, dl), per_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1, Nq), per_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1, dl), per_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1, D), per_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, R, 1), rows_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, dl), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dl), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((dl, dl), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dl), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((dl, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, R, D), rows_ix, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, NC_pad, D), f_c.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * NC_pad * (2 * D * dl + dl * dl + 2 * Nq * dl
                                    + 2 * C * dl),
            bytes_accessed=2 * B * NC_pad * D * f_c.dtype.itemsize,
            transcendentals=B * NC_pad * (C + Nq),
        ),
        interpret=interpret,
    )(
        x_rows, fm_rows, khat, f_w_hat,
        query_mask[..., 0][:, None, :], f_s_hat, f_s[:, None, :], mask_col,
        # Weights in the compute dtype (matmul operand dtypes must match on
        # the MXU; bf16 passes are ~8x f32); biases in f32 (accumulator add).
        p["c_hat"]["w"].astype(f_c.dtype), p["c_hat"]["b"].astype(f32)[None],
        p["attn_q"]["w"].astype(f_c.dtype), p["attn_q"]["b"].astype(f32)[None],
        p["c_out"]["w"].astype(f_c.dtype), p["c_out"]["b"].astype(f32)[None],
    )
    return out[:, :NC, :].reshape(B, N, C, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def content_unit_fused(p, f_c, f_w, f_s, f_m, query_mask, vmask,
                       interpret: bool = False):
    """Fused packed ContentUnit forward; same contract as
    models.smin.content_unit_packed."""
    return _content_unit_fused(p, f_c, f_w, f_s, f_m, query_mask, vmask, interpret)


def _cu_fwd(p, f_c, f_w, f_s, f_m, query_mask, vmask, interpret):
    out = _content_unit_fused(p, f_c, f_w, f_s, f_m, query_mask, vmask, interpret)
    return out, (p, f_c, f_w, f_s, f_m, query_mask, vmask)


def _cu_bwd(interpret, residuals, g):
    from video_moment_localization_tpu.models.smin import content_unit_packed

    p, f_c, f_w, f_s, f_m, query_mask, vmask = residuals
    _, vjp = jax.vjp(
        lambda p_, fc_, fw_, fs_, fm_: content_unit_packed(
            p_, fc_, fw_, fs_, fm_, query_mask, vmask
        ),
        p, f_c, f_w, f_s, f_m,
    )
    dp, dfc, dfw, dfs, dfm = vjp(g)
    return (dp, dfc, dfw, dfs, dfm,
            jnp.zeros_like(query_mask), jnp.zeros_like(vmask))


content_unit_fused.defvjp(_cu_fwd, _cu_bwd)
