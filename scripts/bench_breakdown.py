"""Per-stage on-chip time breakdown of the serving forward (flagship cfg).

Times each stage of the packed SMIN forward independently (chained-in-jit
device timing, same methodology as scripts/bench_ops.py) and compares the
sum against the full forward — this is the measurement that directs the
MFU work (ROADMAP round-3 item 1).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_breakdown.py \
      [--batch 6144] [--scale charades] [--dtype bfloat16] [--k 8]
"""

from __future__ import annotations

import argparse
import math
import time

import numpy as np

_SCALES = {
    # (T, L, C, D, dl, Nq, dv)
    "charades": (64, 16, 4, 512, 128, 13, 1024),
    "activitynet": (128, 64, 4, 512, 128, 20, 500),
    "tacos": (128, 32, 4, 512, 128, 14, 4096),
}


def _chain_time(fn, args, K, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*args):
        def body(c, _):
            out = fn(*((args[0] + c.astype(args[0].dtype),) + args[1:]))
            leaf = jax.tree.leaves(out)[0]
            return leaf.astype(jnp.float32).sum() * 1e-30, ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return c

    np.asarray(chained(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / K


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6144)
    ap.add_argument("--scale", default="charades")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from video_moment_localization_tpu.config import ModelConfig
    from video_moment_localization_tpu.models import init_smin_params
    from video_moment_localization_tpu.models.smin import (
        backbone,
        boundary_unit_packed,
        content_unit_packed,
        localization_packed,
        moment_unit_packed,
        smin_forward,
    )
    from video_moment_localization_tpu.ops.packing import (
        packed_valid_mask,
        triu_packing,
    )
    from video_moment_localization_tpu.ops.proposal import (
        proposal_features_packed_auto,
    )
    from video_moment_localization_tpu.train.metrics import recall_counts_packed

    T, L, C, D, dl, Nq, dv = _SCALES[args.scale]
    B, K = args.batch, args.k
    cfg = ModelConfig(
        T=T, L=L, C=C, D=D, dl=dl, num_smi_layers=3, input_video_dim=dv,
        max_query_length=Nq, lstm_hidden_size=D // 2,
        compute_dtype=args.dtype, packed=True,
    )
    dt = jnp.dtype(args.dtype)
    N = triu_packing(L).N
    rng = np.random.default_rng(0)
    params = init_smin_params(jax.random.PRNGKey(0), cfg)

    vf = jnp.asarray(rng.standard_normal((B, T, dv)), dt)
    vm = jnp.ones((B, T, 1), jnp.float32)
    qf = jnp.asarray(rng.standard_normal((B, Nq, 300)), dt)
    qmask_np = (np.arange(Nq)[None, :] < rng.integers(3, Nq + 1, B)[:, None])
    qm = jnp.asarray(qmask_np[..., None].astype(np.float32))
    lm = jnp.ones((B, L), jnp.float32)
    vmask = packed_valid_mask(lm).astype(dt)
    sm = jnp.asarray(rng.uniform(0, 1, (B, N)).astype(np.float32))

    # Large intermediates are generated ON DEVICE (the axon tunnel rejects
    # multi-GB host->device transfers with HTTP 413).
    def dnorm(seed, shape):
        return jax.jit(
            lambda: jax.random.normal(jax.random.PRNGKey(seed), shape, dt)
        )()

    f = dnorm(1, (B, T, D))
    fs = dnorm(2, (B, D))
    fw = dnorm(3, (B, Nq, D))
    fc = dnorm(4, (B, N, C, D))
    fm = dnorm(5, (B, N, D))
    fb = dnorm(6, (B, L, D))
    fm32 = fm.astype(jnp.float32)
    fb32 = fb.astype(jnp.float32)
    pm = jnp.asarray(rng.uniform(0, 1, (B, N)).astype(np.float32))
    ps = jnp.asarray(rng.uniform(0, 1, (B, L)).astype(np.float32))

    # Every device array is an explicit jit argument: arrays merely closed
    # over become embedded HLO constants, and the tunnel's remote_compile
    # rejects multi-GB request bodies (HTTP 413).
    p_smi = params["smi"][0]
    stages = {
        "backbone": (
            lambda vf, vm, qf, qm: backbone(params, cfg, vf, vm, qf, qm),
            (vf, vm, qf, qm)),
        "proposal(pallas)": (
            lambda f, lm: proposal_features_packed_auto(f, lm, L, C, True),
            (f, lm)),
        "content_unit x3": (
            lambda fc, fw, fs, fm, qm, vmask: content_unit_packed(
                p_smi["content"], fc, fw, fs, fm, qm, vmask),
            (fc, fw, fs, fm, qm, vmask)),
        "boundary_unit x3": (
            lambda fb, fw, fs, fm, qm, lm: boundary_unit_packed(
                p_smi["boundary"], fb, fw, fs, fm, qm, lm, L),
            (fb, fw, fs, fm, qm, lm)),
        "moment_unit x3": (
            lambda fc, fm, fb, vmask: moment_unit_packed(
                p_smi["moment"], fc, fm, fb, vmask, L),
            (fc, fm, fb, vmask)),
        "localization": (
            lambda fm32, fb32, lm, vmask: localization_packed(
                params["localization"], fm32, fb32, lm, vmask, L),
            (fm32, fb32, lm, vmask)),
        "recall_counts": (
            lambda pm, ps, lm, sm: recall_counts_packed(pm, ps, ps, lm, sm),
            (pm, ps, lm, sm)),
    }

    total = 0.0
    print(f"B={B} scale={args.scale} dtype={args.dtype} K={K}")
    for name, (fn, a) in stages.items():
        dt_s = _chain_time(fn, a, K)
        mult = 3 if "x3" in name else 1
        total += dt_s * mult
        print(f"  {name:20s} {dt_s * 1e3:8.2f} ms" +
              (f"  (x3 = {dt_s * 3e3:.2f})" if mult == 3 else ""))

    def full(vf):
        pm_, ps_, pe_, _ = smin_forward(params, cfg, vf, vm, qf, qm, lm, None)
        return recall_counts_packed(pm_, ps_, pe_, lm, sm)

    dt_full = _chain_time(full, (vf,), K)
    print(f"  {'SUM of stages':20s} {total * 1e3:8.2f} ms")
    print(f"  {'FULL forward+score':20s} {dt_full * 1e3:8.2f} ms "
          f"({B / dt_full:.0f} pairs/s)")


if __name__ == "__main__":
    main()
