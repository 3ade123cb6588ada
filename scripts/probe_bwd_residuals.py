"""Exact vjp residual census for the fused SMI-layer backward.

VERDICT r3 item 5 / ROADMAP round-4 candidate #6 ("HBM-resident
residuals"): the backward kernel (ops/smin_train_pallas.py `_bwd_kernel`)
re-runs the layer forward in VMEM so `jax.vjp` can rebuild its residuals,
paying ~1x forward of recompute per layer. The alternative design writes
the residuals to HBM in the forward kernel and reads them back in the
backward. Whether that pays is pure arithmetic once the residual set is
known — and the set is exactly enumerable: trace `jax.vjp` of the SAME
`smi_layer_rows` the kernel differentiates, at the kernel's admitted
geometry, and flatten the returned vjp closure (its pytree leaves ARE the
saved residuals).

Prints, per SMI layer at the given dims: residual count/bytes per grid
cell and per full batch, the added HBM DMA time (write in fwd + read in
bwd at the device's HBM bandwidth), and the measured recompute time it
would replace (the forward kernel's per-layer device time from the
jax.profiler trace — pass --recompute-ms). CPU-only; runs in seconds.

Usage:
  python scripts/probe_bwd_residuals.py [--bb 4] [--batch 1024]
      [--dims charades|activitynet|tacos] [--recompute-ms 4.1]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from video_moment_localization_tpu.ops.smin_pallas import (
    _block_keep,
    _geometry_bb,
    smi_layer_rows,
)

DIMS = {
    # T, L, C, D, dl, Nq  (config/*.yml — reference config shapes)
    "charades": (64, 16, 4, 512, 128, 13),
    "activitynet": (128, 64, 4, 512, 128, 20),
    "tacos": (128, 32, 4, 512, 128, 14),
}

# v5e HBM bandwidth (bytes/s); override for other generations.
HBM_BW = float(os.environ.get("VML_HBM_BW", 819e9))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", choices=sorted(DIMS), default="charades")
    ap.add_argument("--bb", type=int, default=4)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--recompute-ms", type=float, default=None,
                    help="measured per-layer fwd device time (ms/step) "
                         "from scripts/profile_train.py, for the verdict")
    args = ap.parse_args()

    T, L, C, D, dl, Nq = DIMS[args.dims]
    BB = args.bb
    N = L * (L + 1) // 2
    NC = N * C
    w = jnp.dtype(args.dtype)

    _, _, sel_i, sel_j, rsum = _geometry_bb(T, L, C, BB)
    sel_i = jnp.asarray(sel_i, w)
    sel_j = jnp.asarray(sel_j, w)
    rsum = jnp.asarray(rsum, w)

    f32 = jnp.float32
    qflat = jnp.ones((1, BB * Nq), f32)
    lflat = jnp.ones((1, BB * L), f32)
    mcol = jnp.ones((BB * NC, 1), f32)
    mrow = jnp.ones((BB * N, 1), f32)
    lrow = jnp.ones((BB * L, 1), f32)
    qkeep_nc = _block_keep(BB * NC, NC, BB * Nq, Nq, qflat)
    qkeep_l = _block_keep(BB * L, L, BB * Nq, Nq, qflat)
    lkeep = _block_keep(BB * L, L, BB * L, L, lflat)

    def fn(fc, fm, fb, fw, fs, cw, cb, bw, bb_, mw, mb):
        return smi_layer_rows(
            fc, fm, fb, fw, fs, cw, cb, bw, bb_, mw, mb,
            sel_i=sel_i, sel_j=sel_j, rsum=rsum,
            qkeep_nc=qkeep_nc, qkeep_l=qkeep_l, lkeep=lkeep,
            mcol=mcol, mrow=mrow, lrow=lrow,
            BB=BB, N=N, L=L, C=C, Nq=Nq, D=D, dl=dl, prec=None,
            xpose_safe=True)

    W = max(2 * D, D + dl)  # stacked-weight lane width (see _stack_weights)
    prim = (
        jnp.zeros((BB * NC, D), w), jnp.zeros((BB * N, D), w),
        jnp.zeros((BB * L, D), w), jnp.zeros((BB * Nq, D), w),
        jnp.zeros((BB, D), w),
        jnp.zeros((3 * D + 3 * dl, W), w), jnp.zeros((6, W), f32),
        jnp.zeros((2 * D, D), w), jnp.zeros((2, D), f32),
        jnp.zeros((2 * D, D), w), jnp.zeros((2, D), f32),
    )

    _, f_vjp = jax.vjp(fn, *prim)
    leaves = [x for x in jax.tree_util.tree_leaves(f_vjp)
              if hasattr(x, "dtype")]
    res_bytes = sum(int(x.size) * x.dtype.itemsize for x in leaves)
    # Residuals that are primal INPUTS (activations/weights the kernel
    # already holds in VMEM) cost nothing extra to "save"; only computed
    # intermediates would need the HBM round-trip. Upper-bound the input
    # overlap by matching (shape, dtype) — conservative in the right
    # direction (may subtract a computed value that merely shadows an
    # input's shape, understating the DMA, so a negative verdict at this
    # optimistic bound is conclusive).
    prim_sigs = [(p.shape, jnp.dtype(p.dtype)) for p in prim]
    extra = 0
    for x in leaves:
        sig = (x.shape, jnp.dtype(x.dtype))
        if sig in prim_sigs:
            prim_sigs.remove(sig)
            continue
        extra += int(x.size) * x.dtype.itemsize

    cells = args.batch // BB
    per_layer_step = extra * cells          # bytes written by fwd, per layer
    dma_s = 2 * per_layer_step / HBM_BW     # write (fwd) + read (bwd)
    print(f"dims={args.dims} BB={BB} B={args.batch} dtype={w.name}  "
          f"NC={NC}")
    print(f"residual leaves: {len(leaves)}  "
          f"bytes/cell total: {res_bytes / 1e6:.1f} MB  "
          f"computed-only (excl. primal inputs): {extra / 1e6:.1f} MB")
    print(f"per layer per step: {per_layer_step / 1e9:.2f} GB -> "
          f"{1e3 * dma_s:.2f} ms DMA (write+read @ {HBM_BW / 1e9:.0f} GB/s)")
    print(f"x{args.layers} layers: {args.layers * 1e3 * dma_s:.2f} ms/step "
          f"of added HBM traffic")
    if args.recompute_ms is not None:
        save = args.recompute_ms * args.layers
        add = args.layers * 1e3 * dma_s
        print(f"vs measured recompute {save:.2f} ms/step -> "
              f"net {'SAVES' if add < save else 'LOSES'} "
              f"{abs(save - add):.2f} ms/step")


if __name__ == "__main__":
    main()
