"""Row-blocked differentiable fused ContentUnit for ActivityNet-scale maps.

The L=64 flagship (NC = N*C = 8320 rows per batch element) is served by the
VMEM-resident fused SMI stack (ops/smin_pallas.py) but cannot TRAIN through
the per-layer fused kernels (ops/smin_train_pallas.py): the backward's
in-VMEM jax.vjp residual set (~68 bytes per fc element at bf16) needs
~145 MB for a whole element. This module fuses only the CONTENT unit —
the NC-row bulk of the layer (reference models.py:228-276) — over a grid
of (batch element, pair block) cells, with the same
recompute-plus-in-kernel-``jax.vjp`` backward as the full train kernel.
The boundary unit (L-row tensors, tiny at L=64) stays on XLA; the moment
unit's conv_fc half is folded INTO the kernel — it maps the in-VMEM
mean-over-C straight to the masked conv_fc rows (reference
models.py:297,301), so neither the NC rows nor the (B, N, D) cmean ever
round-trip HBM for the moment update.

Layout: the layer carries fc in **c-major (B, C, N, D)** between layers
(clip c of every pair is one contiguous (N, D) block — the same trick as
the serving kernel's c-major rows, here realized as a leading axis so a
pair block is a plain (1, C, BN, D) BlockSpec slice). `smin_forward`
transposes the proposal output once; cu stays c-major for the next layer
and only `cmean` (B, N, D) leaves the kernel for the moment unit.

Numerics match `models/smin.py content_unit_packed` at valid pairs
(invalid pairs are masked once at `cu` — equivalent, they are masked
downstream in both paths). Gradient parity is tested in interpret mode
(tests/test_content_train_pallas.py) and compiled on chip
(scripts/verify_kernels.py).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_moment_localization_tpu.ops import limits

_F32 = jnp.float32
_NEG_INF = -1e9

# Backward-cell VMEM bound: content-only vjp residuals measured well below
# the full-layer ~68 B/elem; 2080-row cells (BN=520, C=4) compile and fit.
# BN sweep at ActivityNet B=128 (v5e, bf16): 520 -> 711, 416 -> 692,
# 208 -> 674 samples/s — the largest fitting divisor wins; keep auto-pick.
_MAX_BWD_ROWS = 2176


def _pick_bn(N: int, C: int, D: int, itemsize: int = 2) -> int:
    """Pair-block size: the largest divisor of N whose C*BN-row backward
    cell fits VMEM (~50 B per fc element per activation byte / 2)."""
    force = os.environ.get("VML_CONTENT_TRAIN_BN")
    if force:
        bn = int(force)
        if bn < 1 or N % bn != 0 or bn % 8 != 0:
            raise ValueError(
                f"VML_CONTENT_TRAIN_BN={bn} must divide N={N} and be a "
                "multiple of 8 (sublane alignment — BN=130/260 at "
                "ActivityNet fail Mosaic BlockSpec verification)")
        return bn
    best = 0
    for bn in range(8, N + 1, 8):
        if N % bn:
            continue
        if (C * bn <= _MAX_BWD_ROWS
                and 25 * C * bn * D * itemsize <= 60_000_000):
            best = bn
    if best:
        return best
    # No sublane-aligned divisor (tiny test geometries, interpret mode):
    # largest fitting divisor, aligned or not.
    for bn in range(N, 0, -1):
        if N % bn == 0 and C * bn <= _MAX_BWD_ROWS:
            return bn
    return 1


@functools.lru_cache(maxsize=None)
def _msel_pairs(L: int) -> np.ndarray:
    """(N, L) pair-validity selector: row n holds 1 at columns i_n and j_n
    (a single 2 where i == j), so max(msel @ lmask_col - 1, 0) equals
    lmask[i]*lmask[j] exactly for {0,1} masks — i.e.
    `packing.packed_valid_mask`. Lets the kernels derive the per-pair
    mask IN VMEM from the tiny (L, 1) length column instead of a
    (B, N, 1) operand whose trailing unit lane axis HBM-tiles to 128
    lanes (128x DMA inflation: ~136 MB/call at ActivityNet B=128 f32).

    Measured trade (ActivityNet B=128 bf16, v5e): +15% train throughput
    (206.2 -> 174.3 ms/step, 621 -> 734 samples/s) for a one-time cold
    Mosaic compile of ~10 min vs ~1.5 min with the operand — worth it
    for production training runs (the remote compile cache amortizes
    re-runs); the SERVING kernel rejects the same trade (see
    ops/smin_pallas._msel_bb)."""
    from video_moment_localization_tpu.ops.packing import triu_packing

    p = triu_packing(L)
    sel = np.zeros((p.N, L), np.float32)
    sel[np.arange(p.N), p.i_idx] += 1.0
    sel[np.arange(p.N), p.j_idx] += 1.0
    return sel


def supports(cfg) -> bool:
    """True when the row-blocked content train kernel admits the geometry
    (it always does for the flagship maps; the gate exists for tiny test
    configs whose N has no usable divisor and for lane alignment). The
    limits registry can disable 'content_train_pallas' after a Mosaic
    compile failure (ops/limits.py)."""
    if limits.kernel_disabled("content_train_pallas"):
        return False
    N = cfg.L * (cfg.L + 1) // 2
    return cfg.D % 128 == 0 and cfg.dl % 128 == 0 and N >= 8


def _content_rows(fc, fbar, fw, fs, cw, cb, mw, mb, qvalid, mask, pmask,
                  *, BN: int, C: int, Nq: int, D: int, dl: int, prec):
    """Content-unit math over one (C*BN, D) block — pure jnp on VMEM
    values, differentiated in the backward kernel via jax.vjp.

    Weight layout matches ops/smin_pallas._stack_weights: cw rows =
    [c_hat(D) | w_hat(D) | s_hat(D) | attn_q(dl) | attn_k(dl) |
    c_out(dl)], biases cb rows = [c_hat, w_hat, s_hat, attn_q, attn_k,
    c_out], width max(D, dl). All broadcasts are ones/one-hot matmuls
    (Mosaic cannot transpose a sublane-axis broadcast — same rule as the
    train kernel's xpose_safe mode).

    The moment unit's conv_fc (reference models.py:297,301) is folded in:
    mw (D, D) / mb (1, D) map the block's mean-over-C straight to the
    masked conv_fc rows, so the (B, N, D) cmean never round-trips HBM and
    the moment unit's NC-free half runs on the kernel's idle MXU.
    Returns (cu rows, conv_fc rows (BN, D)).
    """
    w = fc.dtype
    rows = C * BN
    inv_sdl = 1.0 / jnp.sqrt(jnp.float32(dl))
    cb = cb.astype(_F32)

    c_hat_w = cw[0:D, 0:dl]
    w_hat_w = cw[D : 2 * D, 0:dl]
    s_hat_w = cw[2 * D : 3 * D, 0:dl]
    attn_q_w = cw[3 * D : 3 * D + dl, 0:dl]
    attn_k_w = cw[3 * D + dl : 3 * D + 2 * dl, 0:dl]
    c_out_w = cw[3 * D + 2 * dl : 3 * D + 3 * dl, 0:D]
    c_hat_b, w_hat_b, s_hat_b = cb[0:1, 0:dl], cb[1:2, 0:dl], cb[2:3, 0:dl]
    attn_q_b, attn_k_b, c_out_b = cb[3:4, 0:dl], cb[4:5, 0:dl], cb[5:6, 0:D]

    def badd(x, b):
        ones = jnp.ones((x.shape[0], 1), _F32)
        return x + jnp.dot(ones, b, preferred_element_type=_F32)

    h32 = badd(jnp.dot(fc, c_hat_w, preferred_element_type=_F32,
                       precision=prec), c_hat_b)        # (rows, dl) f32
    h = h32.astype(w)
    fwh32 = badd(jnp.dot(fw, w_hat_w, preferred_element_type=_F32,
                         precision=prec), w_hat_b)      # (Nq, dl)
    fwh = fwh32.astype(w)
    khat = badd(jnp.dot(fwh, attn_k_w, preferred_element_type=_F32,
                        precision=prec), attn_k_b).astype(w)
    fsh = badd(jnp.dot(fs, s_hat_w, preferred_element_type=_F32,
                       precision=prec), s_hat_b)        # (1, dl) f32

    q = badd(jnp.dot(h, attn_q_w, preferred_element_type=_F32,
                     precision=prec), attn_q_b).astype(w)
    logits = jax.lax.dot_general(
        q, khat, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=_F32, precision=prec) * inv_sdl
    logits = jnp.where(qvalid > 0, logits, _NEG_INF)    # (rows, Nq)
    attn = jax.nn.softmax(logits, axis=-1).astype(w)
    f_caq = jnp.dot(attn, fwh, preferred_element_type=_F32, precision=prec)

    ones_r = jnp.ones((rows, 1), _F32)
    f_cq32 = h32 * (f_caq + jnp.dot(ones_r, fsh,
                                    preferred_element_type=_F32))

    # C x C intra-pair clip attention: clip c is rows [c*BN, (c+1)*BN) —
    # leading-axis blocks, lane reductions only (no sublane strides).
    g4 = f_cq32.reshape(C, BN, dl)
    h4 = h32.reshape(C, BN, dl)
    gl = [g4[e] for e in range(C)]
    hl = [h4[e] for e in range(C)]
    sim = [[(gl[i] * gl[j]).sum(-1, keepdims=True) * inv_sdl
            for j in range(C)] for i in range(C)]       # (BN, 1) f32
    outs = []
    for i in range(C):
        m = sim[i][0]
        for j in range(1, C):
            m = jnp.maximum(m, sim[i][j])
        e = [jnp.exp(sim[i][j] - m) for j in range(C)]
        s = e[0]
        for j in range(1, C):
            s = s + e[j]
        inv_s = 1.0 / s
        acc = (e[0] * inv_s) * hl[0]
        for j in range(1, C):
            acc = acc + (e[j] * inv_s) * hl[j]
        outs.append(acc)
    f_cc_hat = jnp.stack(outs, axis=0).reshape(rows, dl).astype(w)

    f_cc = badd(jnp.dot(f_cc_hat, c_out_w, preferred_element_type=_F32,
                        precision=prec), c_out_b)       # (rows, D) f32
    fbar_rows = jnp.broadcast_to(fbar.astype(_F32)[None], (C, BN, D)
                                 ).reshape(rows, D)
    cu32 = (f_cc + fc.astype(_F32) + fbar_rows) * mask  # (rows, D)
    cu = cu32.astype(w)
    c4 = cu32.reshape(C, BN, D)
    acc = c4[0]
    for e_ in range(1, C):
        acc = acc + c4[e_]
    cmean = (acc * (1.0 / C)).astype(w)                 # (BN, D)
    convfc = badd(jnp.dot(cmean, mw, preferred_element_type=_F32,
                          precision=prec), mb.astype(_F32)) * pmask
    return cu, convfc.astype(w)


def _pair_mask(msel_ref, lrow_ref, BN: int, L: int):
    """Derive the (BN, 1) pair-validity mask IN VMEM from the (L, 1)
    length column: lmask[i]*lmask[j] == max(lmask[i]+lmask[j]-1, 0) for
    {0,1} masks, i/j selection by the `_msel_pairs` block (see its
    docstring for the DMA-inflation rationale)."""
    lrow = lrow_ref[:].reshape(L, 1).astype(_F32)
    return jnp.maximum(
        jax.lax.dot(msel_ref[:].astype(_F32), lrow,
                    preferred_element_type=_F32) - 1.0, 0.0)


def _fwd_kernel(fc_ref, fbar_ref, fw_ref, fs_ref, qflat_ref, msel_ref,
                lrow_ref, cw_ref, cb_ref, mw_ref, mb_ref, cu_ref, cfc_ref,
                *, BN: int, C: int, Nq: int, D: int, dl: int, L: int):
    w = fc_ref.dtype
    prec = jax.lax.Precision.HIGHEST if w == _F32 else None
    rows = C * BN
    qvalid = jnp.broadcast_to(
        qflat_ref[:].reshape(1, Nq).astype(_F32), (rows, Nq))
    pmask = _pair_mask(msel_ref, lrow_ref, BN, L)
    mask = jnp.broadcast_to(pmask[None], (C, BN, 1)).reshape(rows, 1)
    cu, convfc = _content_rows(
        fc_ref[:].reshape(rows, D), fbar_ref[:].reshape(BN, D),
        fw_ref[:].reshape(Nq, D), fs_ref[:].reshape(1, D),
        cw_ref[:], cb_ref[:], mw_ref[:], mb_ref[:], qvalid, mask, pmask,
        BN=BN, C=C, Nq=Nq, D=D, dl=dl, prec=prec)
    cu_ref[:] = cu.reshape(1, C, BN, D)
    cfc_ref[:] = convfc.reshape(1, BN, D)


def _bwd_kernel(fc_ref, fbar_ref, fw_ref, fs_ref, qflat_ref, msel_ref,
                lrow_ref, cw_ref, cb_ref, mw_ref, mb_ref, dcu_ref, dcfc_ref,
                dfc_ref, dfbar_ref, dfw_ref, dfs_ref, dcw_ref, dcb_ref,
                dmw_ref, dmb_ref,
                *, BN: int, C: int, Nq: int, D: int, dl: int, L: int):
    """Re-run the block forward in VMEM and pull gradients through
    jax.vjp. dfw/dfs accumulate over the pair-block grid axis (output
    block revisited per batch element); dcw/dcb/dmw/dmb accumulate over
    the whole grid in fp32."""
    w = fc_ref.dtype
    prec = jax.lax.Precision.HIGHEST if w == _F32 else None
    rows = C * BN
    qvalid = jnp.broadcast_to(
        qflat_ref[:].reshape(1, Nq).astype(_F32), (rows, Nq))
    pmask = _pair_mask(msel_ref, lrow_ref, BN, L)
    mask = jnp.broadcast_to(pmask[None], (C, BN, 1)).reshape(rows, 1)

    def fn(fc, fbar, fw, fs, cw, cb, mw, mb):
        return _content_rows(fc, fbar, fw, fs, cw, cb, mw, mb, qvalid,
                             mask, pmask,
                             BN=BN, C=C, Nq=Nq, D=D, dl=dl, prec=prec)

    _, vjp = jax.vjp(
        fn,
        fc_ref[:].reshape(rows, D), fbar_ref[:].reshape(BN, D),
        fw_ref[:].reshape(Nq, D), fs_ref[:].reshape(1, D),
        cw_ref[:], cb_ref[:], mw_ref[:], mb_ref[:])
    dfc, dfbar, dfw, dfs, dcw, dcb, dmw, dmb = vjp(
        (dcu_ref[:].reshape(rows, D), dcfc_ref[:].reshape(BN, D)))

    dfc_ref[:] = dfc.reshape(1, C, BN, D)
    dfbar_ref[:] = dfbar.reshape(1, BN, D)

    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        dfw_ref[:] = dfw.reshape(1, Nq, D)
        dfs_ref[:] = dfs.reshape(1, 1, D)

    @pl.when(n != 0)
    def _():
        dfw_ref[:] = dfw_ref[:] + dfw.reshape(1, Nq, D)
        dfs_ref[:] = dfs_ref[:] + dfs.reshape(1, 1, D)

    first = jnp.logical_and(pl.program_id(0) == 0, n == 0)

    @pl.when(first)
    def _():
        dcw_ref[:] = dcw.astype(_F32)
        dcb_ref[:] = dcb.astype(_F32)
        dmw_ref[:] = dmw.astype(_F32)
        dmb_ref[:] = dmb.astype(_F32)

    @pl.when(jnp.logical_not(first))
    def _():
        dcw_ref[:] = dcw_ref[:] + dcw.astype(_F32)
        dcb_ref[:] = dcb_ref[:] + dcb.astype(_F32)
        dmw_ref[:] = dmw_ref[:] + dmw.astype(_F32)
        dmb_ref[:] = dmb_ref[:] + dmb.astype(_F32)


def _specs(B, BN, C, N, Nq, D, dl, L):
    W = max(dl, D)
    per_bn = lambda b, n: (b, 0, n, 0)    # noqa: E731
    per_bn3 = lambda b, n: (b, n, 0)      # noqa: E731
    per_b3 = lambda b, n: (b, 0, 0)       # noqa: E731
    per_n2 = lambda b, n: (n, 0)          # noqa: E731
    const2 = lambda b, n: (0, 0)          # noqa: E731
    ins = [
        pl.BlockSpec((1, C, BN, D), per_bn, memory_space=pltpu.VMEM),  # fc
        pl.BlockSpec((1, BN, D), per_bn3, memory_space=pltpu.VMEM),    # fbar
        pl.BlockSpec((1, Nq, D), per_b3, memory_space=pltpu.VMEM),     # fw
        pl.BlockSpec((1, 1, D), per_b3, memory_space=pltpu.VMEM),      # fs
        pl.BlockSpec((1, 1, Nq), per_b3, memory_space=pltpu.VMEM),     # qflat
        pl.BlockSpec((BN, L), per_n2, memory_space=pltpu.VMEM),        # msel
        pl.BlockSpec((1, L, 1), per_b3, memory_space=pltpu.VMEM),      # lrow
        pl.BlockSpec((3 * D + 3 * dl, W), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((6, W), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((D, D), const2, memory_space=pltpu.VMEM),         # mw
        pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),         # mb
    ]
    return ins, per_bn, per_bn3, per_b3, const2, W


def _flops(N, C, Nq, D, dl):
    NC = N * C
    return (2 * NC * (2 * D * dl + dl * dl + 2 * Nq * dl + 2 * C * dl
                      + dl * D)
            + 2 * N * D * D)  # folded moment conv_fc


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def content_rows_train(static, cw, cb, mw, mb, fc_cm, fbar, fw, fs, qflat,
                       lrow):
    """Fused row-blocked ContentUnit + moment conv_fc (fwd) on c-major fc.

    static = (BN, C, N, Nq, D, dl, L, interpret); mw (D, D) / mb (1, D)
    the moment unit's conv_fc weights (folded — see _content_rows); fc_cm
    (B, C, N, D); fbar (B, N, D); fw (B, Nq, D); fs (B, 1, D); qflat
    (B, 1, Nq) fp32; lrow (B, L, 1) fp32 length-mask column (pair
    validity is re-derived in VMEM — see `_msel_pairs`). Returns
    (cu_cm (B, C, N, D), convfc (B, N, D) — the masked conv_fc term of
    the moment update).
    """
    return _fwd_call(static, cw, cb, mw, mb, fc_cm, fbar, fw, fs, qflat,
                     lrow)


def _fwd_call(static, cw, cb, mw, mb, fc_cm, fbar, fw, fs, qflat, lrow):
    BN, C, N, Nq, D, dl, L, interpret = static
    B = fc_cm.shape[0]
    dtype = fc_cm.dtype
    ins, per_bn, per_bn3, per_b3, const2, W = _specs(B, BN, C, N, Nq, D,
                                                     dl, L)
    msel = jnp.asarray(_msel_pairs(L))
    kern = functools.partial(_fwd_kernel, BN=BN, C=C, Nq=Nq, D=D, dl=dl,
                             L=L)
    cu, cm = pl.pallas_call(
        kern,
        grid=(B, N // BN),
        in_specs=ins,
        out_specs=[
            pl.BlockSpec((1, C, BN, D), per_bn, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN, D), per_bn3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, C, N, D), dtype),
            jax.ShapeDtypeStruct((B, N, D), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=limits.kernel_vmem_limit(),
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * _flops(N, C, Nq, D, dl),
            bytes_accessed=2 * B * N * C * D * dtype.itemsize,
            transcendentals=B * N * C * (Nq + C),
        ),
        interpret=interpret,
    )(fc_cm, fbar, fw, fs, qflat, msel, lrow, cw, cb, mw, mb)
    return cu, cm


def _fwd_vjp(static, cw, cb, mw, mb, fc_cm, fbar, fw, fs, qflat, lrow):
    out = _fwd_call(static, cw, cb, mw, mb, fc_cm, fbar, fw, fs, qflat,
                    lrow)
    return out, (cw, cb, mw, mb, fc_cm, fbar, fw, fs, qflat, lrow)


def _bwd_vjp(static, res, cots):
    BN, C, N, Nq, D, dl, L, interpret = static
    cw, cb, mw, mb, fc_cm, fbar, fw, fs, qflat, lrow = res
    dcu, dcm = cots
    B = fc_cm.shape[0]
    dtype = fc_cm.dtype
    dcu = dcu.astype(dtype)
    dcm = dcm.astype(dtype)
    ins, per_bn, per_bn3, per_b3, const2, W = _specs(B, BN, C, N, Nq, D,
                                                     dl, L)
    msel = jnp.asarray(_msel_pairs(L))
    ins = ins + [
        pl.BlockSpec((1, C, BN, D), per_bn, memory_space=pltpu.VMEM),  # dcu
        pl.BlockSpec((1, BN, D), per_bn3, memory_space=pltpu.VMEM),    # dcm
    ]
    kern = functools.partial(_bwd_kernel, BN=BN, C=C, Nq=Nq, D=D, dl=dl,
                             L=L)
    outs = pl.pallas_call(
        kern,
        grid=(B, N // BN),
        in_specs=ins,
        out_specs=[
            pl.BlockSpec((1, C, BN, D), per_bn, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN, D), per_bn3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nq, D), per_b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), per_b3, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * D + 3 * dl, W), const2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, W), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((D, D), const2, memory_space=pltpu.VMEM),   # dmw
            pl.BlockSpec((1, D), const2, memory_space=pltpu.VMEM),   # dmb
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, C, N, D), dtype),
            jax.ShapeDtypeStruct((B, N, D), dtype),
            jax.ShapeDtypeStruct((B, Nq, D), dtype),
            jax.ShapeDtypeStruct((B, 1, D), dtype),
            jax.ShapeDtypeStruct((3 * D + 3 * dl, W), _F32),
            jax.ShapeDtypeStruct((6, W), _F32),
            jax.ShapeDtypeStruct((D, D), _F32),
            jax.ShapeDtypeStruct((1, D), _F32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=limits.kernel_vmem_limit(),
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * B * _flops(N, C, Nq, D, dl),
            bytes_accessed=4 * B * N * C * D * dtype.itemsize,
            transcendentals=2 * B * N * C * (Nq + C),
        ),
        interpret=interpret,
    )(fc_cm, fbar, fw, fs, qflat, msel, lrow, cw, cb, mw, mb, dcu, dcm)
    dfc, dfbar, dfw, dfs, dcw, dcb, dmw, dmb = outs
    return (dcw, dcb, dmw, dmb, dfc, dfbar, dfw, dfs,
            jnp.zeros_like(qflat), jnp.zeros_like(lrow))


content_rows_train.defvjp(_fwd_vjp, _bwd_vjp)


def smi_stack_content_train(params, cfg, fc, fm, fb, fw, fs, query_mask,
                            length_mask, vmask, interpret: bool = False
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SMI stack with the content unit fused per layer (training path for
    maps too large for the full fused train kernel, e.g. ActivityNet).

    Drop-in for the `smi_block_packed` loop in `smin_forward`: fc is
    carried c-major between layers; the boundary unit and the moment
    unit's boundary half run on XLA, while the moment unit's conv_fc is
    folded INTO the kernel (it consumes the in-VMEM mean-over-C, so the
    (B, N, D) cmean never round-trips HBM — reference models.py:297,301).
    Returns (fm_out (B, N, D), fb_out (B, L, D)).
    """
    from video_moment_localization_tpu.models.smin import (
        _linear,
        boundary_unit_packed,
        moment_gate,
    )
    from video_moment_localization_tpu.ops.smin_pallas import _stack_weights

    B = fc.shape[0]
    L, C, dl, D, Nq = cfg.L, cfg.C, cfg.dl, cfg.D, fw.shape[1]
    N = L * (L + 1) // 2
    dtype = fc.dtype
    fm, fb, fw = fm.astype(dtype), fb.astype(dtype), fw.astype(dtype)
    fs = fs.astype(dtype)
    BN = _pick_bn(N, C, D, jnp.dtype(dtype).itemsize)
    static = (BN, C, N, Nq, D, dl, L, interpret)

    cw, cb, *_ = _stack_weights(params, D, dl, _F32)

    fc_cm = fc.transpose(0, 2, 1, 3)                    # (B, C, N, D)
    qflat = query_mask[..., 0].astype(_F32)[:, None, :]  # (B, 1, Nq)
    # Pair validity is re-derived in VMEM from the length column (see
    # `_msel_pairs`) — a (B, N, 1) vmask operand would HBM-tile its unit
    # lane axis to 128 lanes (128x DMA inflation).
    lrow = length_mask.astype(_F32)[..., None]          # (B, L, 1)
    fs3 = fs[:, None, :]
    m_mask = vmask.astype(dtype)[..., None]

    for i, p_layer in enumerate(params["smi"]):
        fbar = moment_gate(fm, fs)                      # (B, N, D) XLA
        mfc = p_layer["moment"]["conv_fc"]
        cu_cm, conv_fc = content_rows_train(
            static, cw[i].astype(dtype), cb[i], mfc["w"].astype(dtype),
            mfc["b"][None, :], fc_cm, fbar, fw, fs3, qflat, lrow)
        bu = boundary_unit_packed(p_layer["boundary"], fb, fw, fs, fm,
                                  query_mask, length_mask, L, fbar=fbar)
        # moment unit's boundary half on XLA; the conv_fc half came out
        # of the kernel already masked (models.py:288-303).
        from video_moment_localization_tpu.ops.packing import (
            gather_rows,
            triu_packing,
        )

        pk = triu_packing(L)
        outer = gather_rows(bu, pk.i_idx) * gather_rows(bu, pk.j_idx)
        conv_fb = _linear(p_layer["moment"]["conv_fb"], outer) * m_mask
        fm = conv_fb + conv_fc.astype(dtype) + fm
        fb = bu
        fc_cm = cu_cm
    return fm, fb
