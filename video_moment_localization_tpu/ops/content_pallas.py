"""Fused Pallas TPU kernel for the ContentUnit interior (packed layout).

The ContentUnit (reference models.py:228-276) is the SMI stack's dominant
cost: per moment-clip it runs a D->dl projection, query-guided word
attention, gating, an intra-moment clip self-attention, and a dl->D output
projection — in XLA that's ~6 HBM round trips of (B, N, C, dl/D)
intermediates per layer. This kernel keeps one batch element's whole packed
clip tensor resident in VMEM and runs the entire interior as a chain of MXU
matmuls, touching HBM once in (fc) and once out.

Scope: single-block maps (N*C rows fitting one VMEM block, e.g. Charades
L=16 -> 544 rows; the tests' L=8 -> 144). Larger maps fall back to the XLA
packed path.

**Status: OFF by default** (ModelConfig.fused_content). Measured on the
v5e (B=512, Charades scale, bf16, scalar-fetch timing): XLA 30.7 ms vs
fused 33.6 ms per call — XLA's batched GEMMs across the whole batch beat
one grid cell per batch element (per-cell dispatch overhead + the
block-diagonal dense trick's extra FLOPs). Kept as a tested building block;
a multi-row-per-cell batched variant is the round-2 follow-up.

Design notes:
* the intra-moment clip attention (C x C per pair) is evaluated as ONE
  (NC, NC) matmul plus a static block-diagonal -1e9 additive mask — a full
  softmax row then equals the per-block softmax exactly, and the extra
  FLOPs are free on the MXU at bf16;
* the moment-gate broadcast fbar_m (N, D) -> (NC, D) is an MXU matmul
  against a static 0/1 expansion operator (no sublane<->lane reshapes);
* backward = custom VJP through the XLA packed ContentUnit (exact).
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

from video_moment_localization_tpu.ops.packing import triu_packing

_NEG_INF = -1e9
# Single-block VMEM budget: N*C rows of D lanes (fp32 work copy) plus the
# (NC, NC) attention square must fit comfortably.
MAX_SINGLE_BLOCK_ROWS = 1024


def supports(L: int, C: int) -> bool:
    return triu_packing(L).N * C <= MAX_SINGLE_BLOCK_ROWS


@functools.lru_cache(maxsize=None)
def _static_operators(N: int, C: int):
    """(block-diagonal additive mask (NC, NC), expansion E (NC, N)) fp32."""
    NC = N * C
    groups = np.arange(NC) // C
    blockmask = np.where(groups[:, None] == groups[None, :], 0.0, _NEG_INF)
    E = (groups[:, None] == np.arange(N)[None, :]).astype(np.float32)
    return blockmask.astype(np.float32), E


def _kernel(x_ref, fm_ref, khat_ref, val_ref, qmask_ref, fshat_ref, fs_ref,
            mcol_ref, bmask_ref, expand_ref,
            w1_ref, b1_ref, wq_ref, bq_ref, w2_ref, b2_ref,
            out_ref, *, dl: int, precision):
    f32 = jnp.float32
    x = x_ref[0].astype(f32)                              # (NC, D)
    mcol = mcol_ref[0].astype(f32)                        # (NC, 1)

    # D -> dl projection (f_c_hat)
    h = jnp.dot(x, w1_ref[:], preferred_element_type=f32,
                precision=precision) + b1_ref[:]
    h = h * mcol

    # query-guided word attention over Nq keys
    q = jnp.dot(h, wq_ref[:], preferred_element_type=f32,
                precision=precision) + bq_ref[:]
    logits = jax.lax.dot_general(
        q, khat_ref[0].astype(f32), (((1,), (1,)), ((), ())),
        preferred_element_type=f32, precision=precision,
    ) / math.sqrt(dl)                                     # (NC, Nq)
    qm = qmask_ref[0].astype(f32)                         # (1, Nq)
    logits = jnp.where(qm > 0, logits, _NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1)
    f_caq = jnp.dot(attn, val_ref[0].astype(f32), preferred_element_type=f32,
                    precision=precision) * mcol

    # gated query fusion
    f_cq = h * (f_caq + fshat_ref[0].astype(f32))         # (NC, dl)

    # intra-moment clip self-attention via block-diagonal dense trick
    sim = jax.lax.dot_general(
        f_cq, f_cq, (((1,), (1,)), ((), ())),
        preferred_element_type=f32, precision=precision,
    ) / math.sqrt(dl)                                     # (NC, NC)
    a = jax.nn.softmax(sim + bmask_ref[:], axis=-1) * mcol
    f_cc_hat = jnp.dot(a, h, preferred_element_type=f32, precision=precision)

    # dl -> D output projection
    f_cc = (jnp.dot(f_cc_hat, w2_ref[:], preferred_element_type=f32,
                    precision=precision) + b2_ref[:]) * mcol

    # moment gate message, expanded N -> NC rows on the MXU
    fm = fm_ref[0].astype(f32)                            # (N, D)
    fbar = jax.nn.sigmoid(fm * fs_ref[0].astype(f32)) * fm
    fbar_rows = jnp.dot(expand_ref[:], fbar, preferred_element_type=f32,
                        precision=precision)              # (NC, D)

    out_ref[0] = (f_cc + x + fbar_rows).astype(out_ref.dtype)


def _content_unit_fused(p: Dict[str, Any], f_c, f_w, f_s, f_m, query_mask,
                        vmask, interpret: bool):
    B, N, C, D = f_c.shape
    dl = p["c_hat"]["w"].shape[1]
    Nq = f_w.shape[1]
    NC = N * C
    f32 = jnp.float32

    # Host-side (XLA) precomputation of the small word-side tensors.
    q_mask = query_mask.astype(f_w.dtype)
    f_w_hat = (f_w @ p["w_hat"]["w"].astype(f_w.dtype)
               + p["w_hat"]["b"].astype(f_w.dtype)) * q_mask       # (B, Nq, dl)
    khat = (f_w_hat @ p["attn_k"]["w"].astype(f_w.dtype)
            + p["attn_k"]["b"].astype(f_w.dtype))                  # (B, Nq, dl)
    f_s_hat = (f_s @ p["s_hat"]["w"].astype(f_s.dtype)
               + p["s_hat"]["b"].astype(f_s.dtype))[:, None, :]    # (B, 1, dl)
    mask_col = jnp.repeat(vmask.astype(f32), C, axis=1)[..., None]  # (B, NC, 1)

    blockmask, expand = _static_operators(N, C)
    precision = (jax.lax.Precision.HIGHEST if f_c.dtype == f32
                 else jax.lax.Precision.DEFAULT)
    kernel = functools.partial(_kernel, dl=dl, precision=precision)

    const = lambda b: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, NC, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nq, dl), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nq, dl), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nq), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dl), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NC, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, NC), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((NC, N), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, dl), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dl), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((dl, dl), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dl), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((dl, D), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NC, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, NC, D), f_c.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * NC * (2 * D * dl + dl * dl + 2 * NC * dl + Nq * dl + N),
            bytes_accessed=2 * B * NC * D * f_c.dtype.itemsize,
            transcendentals=B * NC * (NC + Nq),
        ),
        interpret=interpret,
    )(
        f_c.reshape(B, NC, D), f_m, khat, f_w_hat,
        query_mask[..., 0][:, None, :], f_s_hat, f_s[:, None, :], mask_col,
        jnp.asarray(blockmask), jnp.asarray(expand),
        p["c_hat"]["w"].astype(f32), p["c_hat"]["b"].astype(f32)[None],
        p["attn_q"]["w"].astype(f32), p["attn_q"]["b"].astype(f32)[None],
        p["c_out"]["w"].astype(f32), p["c_out"]["b"].astype(f32)[None],
    )
    return out.reshape(B, N, C, D)


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
