"""A/B the fused serving kernel's grid dimension_semantics on chip.

Grid cells of the serving megakernel are independent (disjoint per-cell
input/output blocks, read-only weights), so the batch grid axis can be
declared "parallel" instead of "arbitrary" — this probe measures whether
Mosaic uses that freedom for anything (cell reordering / better DMA
overlap). VML_SMIN_GRID_SEM is read at TRACE time, so one process
compiles both variants against shared device inputs.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_grid_sem.py \
      [--batch 6144] [--k 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6144)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--train_batch", type=int, default=0,
                    help="also probe the fused TRAIN fwd kernel at this "
                         "batch (0 = skip)")
    args = ap.parse_args()

    import jax  # noqa: F401

    import bench
    from __graft_entry__ import _charades_cfg

    bench.B_SERVE = args.batch
    bench.K_CHAIN = args.k

    cfg = _charades_cfg()
    params, arrays, sm = bench._setup(cfg)

    for sem in ("arbitrary", "parallel"):
        os.environ["VML_SMIN_GRID_SEM"] = sem
        t0 = time.perf_counter()
        _, chain = bench._make_score_chain(cfg)
        argv = (params, *arrays, sm)
        np.asarray(chain(*argv))
        compile_s = time.perf_counter() - t0
        dt = bench._timed_fetch(chain, *argv)
        pairs = args.k * args.batch / dt
        print(f"serving {sem:9s} {pairs:9.0f} pairs/s "
              f"(chain {dt * 1e3:7.1f} ms, compile {compile_s:5.1f}s)",
              flush=True)

    if args.train_batch:
        bench.B_TRAIN = args.train_batch
        for sem in ("arbitrary", "parallel"):
            os.environ["VML_SMIN_GRID_SEM"] = sem
            t0 = time.perf_counter()
            train_chain, targs = bench._make_train_chain(cfg, params)
            np.asarray(train_chain(*targs))
            compile_s = time.perf_counter() - t0
            dt = bench._timed_fetch(train_chain, *targs)
            sps = bench.K_TRAIN * args.train_batch / dt
            print(f"train   {sem:9s} {sps:9.0f} samples/s "
                  f"(chain {dt * 1e3:7.1f} ms, compile {compile_s:5.1f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
