"""On-chip section ablation of the fused SMI-stack serving kernel.

Times the fused forward (smin_forward_inference, bf16 packed flagship
config) with kernel sections disabled via VML_SMIN_ABLATE — the env var
is read at TRACE time, so one process compiles every variant while
sharing the device inputs and params. Differences against the full
kernel give per-section on-chip costs; a 1-layer variant separates the
per-layer cost from the proposal+heads intercept. This is the
measurement that directs the serving-MFU work (round-3 VERDICT item 5).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_ablate.py \
      [--batch 6144] [--k 8] [--variants full,noattn,nocc,nobu,l1]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6144)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--variants",
                    default="full,noattn,nocc,nobu,l1,noprop,backbone")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _charades_cfg
    from bench import _device_inputs
    from video_moment_localization_tpu.models import init_smin_params
    from video_moment_localization_tpu.models.smin import (
        backbone,
        smin_forward_inference,
    )

    B, K = args.batch, args.k
    cfg = _charades_cfg()
    params = init_smin_params(jax.random.PRNGKey(0), cfg)
    arrays, _ = _device_inputs(cfg, B)

    from video_moment_localization_tpu.models.lstm import bilstm
    from video_moment_localization_tpu.models.smin import video_encoder
    from video_moment_localization_tpu.ops.lstm_pallas import bilstm_fused

    def make_chain(run_cfg, piece=None):
        @jax.jit
        def chain(params, vf, vm, qf, qm, lm, mm):
            def body(c, _):
                if piece == "backbone":
                    f, fs, fw = backbone(params, run_cfg,
                                         (vf + c).astype(jnp.bfloat16), vm,
                                         qf.astype(jnp.bfloat16), qm)
                    return f.astype(jnp.float32).sum() * 1e-30, ()
                if piece == "lstm":
                    fw_ = bilstm((qf + c.astype(qf.dtype)).astype(jnp.bfloat16),
                                 qm[..., 0], params["query_encoder"])
                    return fw_.astype(jnp.float32).sum() * 1e-30, ()
                if piece == "lstmf":
                    fw_ = bilstm_fused(
                        (qf + c.astype(qf.dtype)).astype(jnp.bfloat16),
                        qm[..., 0], params["query_encoder"])
                    return fw_.astype(jnp.float32).sum() * 1e-30, ()
                if piece == "venc":
                    f = video_encoder(params["video_encoder"],
                                      (vf + c).astype(jnp.bfloat16), vm)
                    return f.astype(jnp.float32).sum() * 1e-30, ()
                pm, ps, pe, pa = smin_forward_inference(
                    params, run_cfg, vf + c, vm, qf, qm, lm, mm)
                return pm.astype(jnp.float32).sum() * 1e-30, ()

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return c

        return chain

    results = {}
    for name in args.variants.split(","):
        run_cfg = cfg
        if name == "l1":
            os.environ["VML_SMIN_ABLATE"] = ""
            run_cfg = dataclasses.replace(cfg, num_smi_layers=1)
        else:
            os.environ["VML_SMIN_ABLATE"] = (
                "" if name in ("full", "backbone", "lstm", "lstmf", "venc")
                else name)
        t0 = time.perf_counter()
        piece = name if name in ("backbone", "lstm", "lstmf", "venc") else None
        fn = make_chain(run_cfg, piece=piece)
        p = params
        if name == "l1":
            p = dict(params, smi=params["smi"][:1])
        np.asarray(fn(p, *arrays))  # compile + run
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(p, *arrays))
            best = min(best, time.perf_counter() - t0)
        per_batch_ms = 1e3 * best / K
        results[name] = per_batch_ms
        print(f"{name:8s} {per_batch_ms:8.2f} ms/batch  "
              f"({K * B / best:8.0f} pairs/s, compile {compile_s:.0f}s)",
              flush=True)

    if "full" in results:
        full = results["full"]
        for name, ms in results.items():
            if name in ("full", "l1", "backbone", "lstm", "lstmf", "venc"):
                continue
            print(f"section {name[2:]:6s}: {full - ms:6.2f} ms "
                  f"({100 * (full - ms) / full:4.1f}% of full)", flush=True)
        if "l1" in results:
            per_layer = (full - results["l1"]) / 2
            print(f"per-SMI-layer: {per_layer:.2f} ms; "
                  f"proposal+heads+backbone intercept: "
                  f"{full - 3 * per_layer:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
