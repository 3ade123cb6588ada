"""Measure cold-compile time + runtime of the fused SMI-stack kernel.

Round-2 VERDICT weak #1/#2: the static 3-layer unroll made the Mosaic
compile take tens of minutes and killed the driver bench. This script
times the compile of the serving forward at the bench config (Charades
BB=8, B configurable) against a throwaway compilation cache so the
number is a true cold compile, then times the runtime.

Usage: python scripts/time_fused_compile.py [B] [dataset]
"""

from __future__ import annotations

import sys
import tempfile
import time

import jax
import numpy as np

# Throwaway cache: measure a genuine cold compile.
jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp())

sys.path.insert(0, "/root/repo")


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 6144
    dataset = sys.argv[2] if len(sys.argv) > 2 else "charades"

    import dataclasses

    from __graft_entry__ import _charades_cfg, _synthetic_arrays
    from video_moment_localization_tpu.models import init_smin_params
    from video_moment_localization_tpu.models.smin import smin_forward_inference

    cfg = _charades_cfg()
    if dataset == "tacos":
        cfg = dataclasses.replace(cfg, T=128, L=32, max_query_length=14,
                                  input_video_dim=4096)
    elif dataset == "activitynet":
        cfg = dataclasses.replace(cfg, T=128, L=64, max_query_length=20,
                                  input_video_dim=500)

    params = init_smin_params(jax.random.PRNGKey(0), cfg)
    vf, vm, qf, qm, lm, mm = _synthetic_arrays(cfg, B=B)

    fwd = jax.jit(lambda p, *a: smin_forward_inference(p, cfg, *a))

    t0 = time.perf_counter()
    out = fwd(params, vf, vm, qf, qm, lm, mm)
    np.asarray(out[0])  # block_until_ready is unreliable through the tunnel
    compile_and_first_run = time.perf_counter() - t0
    print(f"[{dataset} B={B}] compile+first-run: {compile_and_first_run:.1f}s")

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fwd(params, vf, vm, qf, qm, lm, mm)
        jax.tree.map(np.asarray, out)
        best = min(best, time.perf_counter() - t0)
    print(f"[{dataset} B={B}] steady-state: {best * 1e3:.1f} ms "
          f"({B / best:.0f} pairs/s forward-only)")


if __name__ == "__main__":
    main()
