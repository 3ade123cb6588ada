"""Probe the fused SMI-stack kernel at larger map scales (round-3 item 3).

The round-2 kernel was gated to Charades (NC=544) and TACoS BB<=2
(compile-memory OOM at 8.4k-row cells with the unrolled body). With the
layer body now a fori_loop (compiled once), this probes what the chip can
actually do:

* TACoS (L=32, NC=2112) at BB=4 — the cell size that OOM-killed the r2
  compile;
* ActivityNet (L=64, NC=8320) at BB=1 — the scale supports() rejects.

For each: compile the fused forward directly (bypassing supports()),
check numerics vs the packed XLA path, and time both. Run AFTER other
chip work is done (serving batches fill HBM).

Usage: python scripts/probe_fused_scales.py <dataset> <B> [BB]
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> None:
    dataset = sys.argv[1] if len(sys.argv) > 1 else "activitynet"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    if len(sys.argv) > 3:
        import os

        os.environ["VML_SMIN_BB"] = sys.argv[3]

    from __graft_entry__ import _charades_cfg, _synthetic_arrays
    from video_moment_localization_tpu.models import init_smin_params
    from video_moment_localization_tpu.models.smin import (
        backbone,
        smin_forward,
    )
    from video_moment_localization_tpu.ops import smin_pallas
    from video_moment_localization_tpu.ops.packing import packed_valid_mask

    cfg = _charades_cfg()
    if dataset == "tacos":
        cfg = dataclasses.replace(cfg, T=128, L=32, max_query_length=14,
                                  input_video_dim=4096)
    elif dataset == "activitynet":
        cfg = dataclasses.replace(cfg, T=128, L=64, max_query_length=20,
                                  input_video_dim=500)

    params = init_smin_params(jax.random.PRNGKey(0), cfg)
    vf, vm, qf, qm, lm, mm = _synthetic_arrays(cfg, B=B)
    dtype = jnp.dtype(cfg.compute_dtype)

    @jax.jit
    def fused(params, vf, vm, qf, qm, lm):
        f, fs, fw = backbone(params, cfg, vf.astype(dtype), vm,
                             qf.astype(dtype), qm)
        vmask = packed_valid_mask(lm.astype(jnp.float32)).astype(dtype)
        return smin_pallas.smin_stack_fused(params, cfg, f, fw, fs, qm, lm,
                                            vmask)

    @jax.jit
    def xla(params, vf, vm, qf, qm, lm):
        return smin_forward(params, cfg, vf, vm, qf, qm, lm, None)

    t0 = time.perf_counter()
    out_f = fused(params, vf, vm, qf, qm, lm)
    np.asarray(out_f[0])
    print(f"[{dataset} B={B}] fused compile+run: {time.perf_counter()-t0:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    out_x = xla(params, vf, vm, qf, qm, lm)
    np.asarray(out_x[0])
    print(f"[{dataset} B={B}] xla compile+run: {time.perf_counter()-t0:.1f}s",
          flush=True)

    for name, a, b in zip(("pm", "ps", "pe", "pa"), out_f, out_x):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        print(f"  {name}: max|diff|={np.abs(a - b).max():.4g} "
              f"p98={np.percentile(np.abs(a - b), 98):.4g}")

    def timeit(fn):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.tree.map(np.asarray, fn(params, vf, vm, qf, qm, lm))
            best = min(best, time.perf_counter() - t0)
        return best

    tf, tx = timeit(fused), timeit(xla)
    print(f"[{dataset} B={B}] fused {tf*1e3:.1f} ms vs xla {tx*1e3:.1f} ms "
          f"-> {tx/tf:.2f}x (incl. tunnel fetch)", flush=True)


if __name__ == "__main__":
    main()
