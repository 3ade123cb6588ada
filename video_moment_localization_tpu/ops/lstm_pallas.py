"""Fused 2-layer biLSTM serving kernel: the whole recurrence in VMEM.

The XLA biLSTM (models/lstm.py) is step-dispatch-bound at serving batch:
52 sequential `lax.scan` steps (2 layers x 2 directions x Nq=13), each a
small (B, H)@(H, 4H) matmul whose operands round-trip HBM — measured
7.9 ms of the 93 ms serving batch at B=6144 (scripts/bench_ablate.py
--variants lstm) against a ~1.5 ms compute+bandwidth floor.

This kernel runs the entire 2-layer bidirectional recurrence for a block
of BB batch rows without leaving VMEM:

* inputs are the layer-1 input projections ``xp1 = x @ w_ih1 + b1`` for
  both directions (one big MXU matmul outside the kernel — word_dim=300
  is not lane-aligned and the projection is per-step, so it commutes
  with time reversal and needs no flip);
* a single ``fori_loop`` over the Nq steps advances BOTH directions of
  layer 1 per iteration — the backward direction simply indexes time
  ``S-1-t`` (no flipped copies anywhere);
* the layer-2 input projection is ONE (S*BB, 2H)@(2H, 4H) matmul per
  direction over the VMEM-resident layer-1 outputs (the (S, BB, 2H)
  scratch reshapes to (S*BB, 2H) for free — S is the untiled leading
  axis);
* a second fori_loop advances layer 2 and writes the masked outputs.

Gate math runs in f32 (Mosaic cannot lower bf16 `logistic`; the XLA path
computes gates in bf16, so the kernel is slightly MORE precise — parity
tested at bf16 tolerance in tests/test_lstm_pallas.py, and exactly-ish
at fp32). Masked-carry semantics match models/lstm.py bit-for-bit in
structure: carries only advance where the step is valid, outputs at
padded steps are zero.

Time-major (S, B, .) layout throughout: S is the untiled leading axis,
so the per-step dynamic index is a cheap page select, never a sublane
gather. The consumer-side (B, S, 2H) transpose fuses into the fw
matmuls downstream.

Reference: models.py:38-64 (QueryEncoder's nn.LSTM(num_layers=2,
bidirectional=True)); replaces only the serving/eval forward — training
differentiates the XLA scan path.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_moment_localization_tpu.ops import limits


def supports(layers: List[Dict[str, Any]], S: int, B: int) -> bool:
    """Fused-path admission: exactly the SMIN shape family.

    2 layers; H a lane multiple (the out block's fwd/bwd halves are
    static lane slices at offset H); layer-2 input = 2H (bidirectional
    stacking); some BB in the sweep divides B. The limits registry can
    disable 'lstm_pallas' after a Mosaic compile failure (ops/limits.py).
    """
    if limits.kernel_disabled("lstm_pallas"):
        return False
    if len(layers) != 2:
        return False
    H = layers[0]["fwd"]["w_hh"].shape[1]
    if H % 128 != 0:
        return False
    if layers[1]["fwd"]["w_ih"].shape[1] != 2 * H:
        return False
    return any(B % bb == 0 for bb in _BB_SWEEP)


# BB sweep: 256 fits the full working set in ~45 MB VMEM (xp1/xp2/h1/out
# scratches dominate at Nq=13, 4H=1024), leaving room for input
# double-buffering; 512 is admitted for small-S configs.
_BB_SWEEP = (256, 128, 64, 32, 16, 8, 4, 2, 1)


def _pick_bb(B: int) -> int:
    for bb in _BB_SWEEP:
        if B % bb == 0:
            return bb
    return 1


def _step(xp, m, h, c, w_hh):
    """One masked LSTM cell step in f32: xp (BB, 4H) pre-projected input,
    m (BB, 1) validity, carries (BB, H). Torch gate order (i, f, g, o)."""
    f32 = jnp.float32
    H = h.shape[1]
    gates = xp.astype(f32) + jnp.dot(
        h.astype(w_hh.dtype), w_hh, preferred_element_type=f32
    )
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    h = m * h_new + (1.0 - m) * h
    c = m * c_new + (1.0 - m) * c
    return h, c


def _kernel(xp1f_ref, xp1b_ref, mask_ref,
            whh1f_ref, whh1b_ref,
            wih2f_ref, wih2b_ref, b2_ref,
            whh2f_ref, whh2b_ref,
            out_ref,
            h1_scr, xp2f_scr, xp2b_scr,
            *, S: int, BB: int, H: int):
    f32 = jnp.float32
    w = xp1f_ref.dtype

    def mask_at(t):
        return mask_ref[t].astype(f32)                      # (BB, 1)

    # ---- layer 1: both directions per iteration ---------------------- #
    def l1_body(t, carry):
        hf, cf, hb, cb = carry
        hf, cf = _step(xp1f_ref[t], mask_at(t), hf, cf, whh1f_ref[...])
        tb = S - 1 - t
        hb, cb = _step(xp1b_ref[tb], mask_at(tb), hb, cb, whh1b_ref[...])
        h1_scr[pl.ds(t, 1), :, 0:H] = (hf * mask_at(t)).astype(w)[None]
        h1_scr[pl.ds(tb, 1), :, H : 2 * H] = (
            hb * mask_at(tb)).astype(w)[None]
        return hf, cf, hb, cb

    z = jnp.zeros((BB, H), f32)
    jax.lax.fori_loop(0, S, l1_body, (z, z, z, z))

    # ---- layer 2 input projection: one MXU matmul per direction ------ #
    h1 = h1_scr[...].reshape(S * BB, 2 * H)                 # free: S leads
    b2f = b2_ref[0:1].astype(f32)
    b2b = b2_ref[1:2].astype(f32)
    xp2f_scr[...] = (
        jnp.dot(h1, wih2f_ref[...], preferred_element_type=f32) + b2f
    ).astype(w).reshape(S, BB, 4 * H)
    xp2b_scr[...] = (
        jnp.dot(h1, wih2b_ref[...], preferred_element_type=f32) + b2b
    ).astype(w).reshape(S, BB, 4 * H)

    # ---- layer 2: masked steps, masked outputs ----------------------- #
    def l2_body(t, carry):
        hf, cf, hb, cb = carry
        hf, cf = _step(xp2f_scr[t], mask_at(t), hf, cf, whh2f_ref[...])
        tb = S - 1 - t
        hb, cb = _step(xp2b_scr[tb], mask_at(tb), hb, cb, whh2b_ref[...])
        out_ref[pl.ds(t, 1), :, 0:H] = (hf * mask_at(t)).astype(w)[None]
        out_ref[pl.ds(tb, 1), :, H : 2 * H] = (
            hb * mask_at(tb)).astype(w)[None]
        return hf, cf, hb, cb

    jax.lax.fori_loop(0, S, l2_body, (z, z, z, z))


def bilstm_fused(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    layers: List[Dict[str, Any]],
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused 2-layer biLSTM forward: (B, S, in), mask (B, S) -> (B, S, 2H).

    Drop-in for models/lstm.py `bilstm` on the grad-free path when
    `supports()` holds. Grad-free only (no custom VJP — training keeps
    the XLA scan).
    """
    B, S, _ = x.shape
    dtype = x.dtype
    H = layers[0]["fwd"]["w_hh"].shape[1]
    BB = _pick_bb(B)

    # Layer-1 input projections, time-major: (S, B, 4H). The projection
    # is per-step, so no time flip is needed for the backward direction
    # (the kernel indexes S-1-t).
    xt = jnp.swapaxes(x, 0, 1)
    p1f, p1b = layers[0]["fwd"], layers[0]["bwd"]
    xp1f = xt @ p1f["w_ih"].T.astype(dtype) + (
        p1f["b_ih"] + p1f["b_hh"]).astype(dtype)
    xp1b = xt @ p1b["w_ih"].T.astype(dtype) + (
        p1b["b_ih"] + p1b["b_hh"]).astype(dtype)
    mask_t = jnp.swapaxes(mask, 0, 1)[..., None].astype(jnp.float32)

    p2f, p2b = layers[1]["fwd"], layers[1]["bwd"]
    b2 = jnp.stack([
        (p2f["b_ih"] + p2f["b_hh"]),
        (p2b["b_ih"] + p2b["b_hh"]),
    ]).astype(dtype)                                        # (2, 4H)

    time_b = lambda i: (0, i, 0)  # noqa: E731
    const2 = lambda i: (0, 0)     # noqa: E731

    flops = B * S * 2 * 2 * (H * 4 * H) * 2 + B * S * 2 * (2 * H) * 4 * H * 2

    out = pl.pallas_call(
        functools.partial(_kernel, S=S, BB=BB, H=H),
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec((S, BB, 4 * H), time_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, BB, 4 * H), time_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, BB, 1), time_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * H, 4 * H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * H, 4 * H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 4 * H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, BB, 2 * H), time_b,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, B, 2 * H), dtype),
        scratch_shapes=[
            pltpu.VMEM((S, BB, 2 * H), dtype),
            pltpu.VMEM((S, BB, 4 * H), dtype),
            pltpu.VMEM((S, BB, 4 * H), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=limits.kernel_vmem_limit(),
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=B * S * (8 * H + 2 * H + 1) * dtype.itemsize,
            transcendentals=B * S * 2 * 2 * 5 * H,
        ),
        interpret=interpret,
    )(
        xp1f, xp1b, mask_t,
        p1f["w_hh"].T.astype(dtype), p1b["w_hh"].T.astype(dtype),
        p2f["w_ih"].T.astype(dtype), p2b["w_ih"].T.astype(dtype), b2,
        p2f["w_hh"].T.astype(dtype), p2b["w_hh"].T.astype(dtype),
    )
    return jnp.swapaxes(out, 0, 1)
