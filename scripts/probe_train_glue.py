"""Pinpoint the train-step glue costs the coarse breakdown can't see.

bench_train_breakdown.py at B=1024 leaves ~33 ms/step unaccounted between
`full` and `stack + backbone + adam`, and its short chains (K=4) hide a
~9 ms/step host-fetch RTT in every number. This probe:

* measures an EMPTY chain first (pure per-chain RTT) and reports it, so
  every other number can be read net of transport;
* times each glue piece in isolation, K-chained in one jit:
    - proposal_pallas : fused proposal kernel fwd + custom-vjp bwd
    - proposal_xla    : prefix-sum proposal fwd + autodiff bwd
    - pack_rows       : the (B, N, C, D) -> (B, C*N, D) transpose fwd+bwd
    - heads_loss      : localization heads + smin_loss grad (backbone/stack
                        outputs as constants)
    - full            : the production train step (reference point)

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_train_glue.py \
      [--batch 1024] [--k 16] [--variants ...]
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
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument(
        "--variants",
        default="empty,proposal_pallas,proposal_xla,pack_rows,heads_loss",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _charades_cfg
    from video_moment_localization_tpu.models import init_smin_params
    from video_moment_localization_tpu.models.smin import (
        backbone,
        localization_packed,
    )
    from video_moment_localization_tpu.ops.packing import packed_valid_mask
    from video_moment_localization_tpu.ops.proposal import (
        proposal_features_packed,
    )
    from video_moment_localization_tpu.ops.proposal_pallas import (
        proposal_features_packed_pallas,
    )
    from video_moment_localization_tpu.ops.smin_train_pallas import (
        pack_rows,
        unpack_rows,
    )
    from video_moment_localization_tpu.train.loss import smin_loss

    cfg = _charades_cfg()
    B, K = args.batch, args.k
    dt = jnp.dtype(cfg.compute_dtype)
    N = cfg.L * (cfg.L + 1) // 2
    NC = N * cfg.C
    params = init_smin_params(jax.random.PRNGKey(0), cfg)

    # Device-side inputs (host draws cross the tunnel — see bench.py).
    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 4)
        vf = jax.random.normal(ks[0], (B, cfg.T, cfg.input_video_dim),
                               jnp.float32)
        qf = jax.random.normal(ks[1], (B, cfg.max_query_length, cfg.word_dim),
                               jnp.float32)
        sm = jax.random.uniform(ks[2], (B, N), jnp.float32)
        lab = jax.random.uniform(ks[3], (B, 5, cfg.L), jnp.float32)
        return vf, qf, sm, lab

    vf, qf, sm, lab = gen(jax.random.PRNGKey(0))
    vm = jnp.ones((B, cfg.T, 1), jnp.float32)
    qm = jnp.ones((B, cfg.max_query_length, 1), jnp.float32)
    lm = jnp.ones((B, cfg.L), jnp.float32)
    batch = {
        "video_features": vf, "video_mask": vm, "query_features": qf,
        "query_mask": qm, "length_mask": lm, "sm": sm,
        "ym": (sm > 0.5).astype(jnp.float32),
        "sample_mask": jnp.ones(B, jnp.float32),
        "ss": lab[:, 0], "se": lab[:, 1],
        "ys": (lab[:, 2] > 0.5).astype(jnp.float32),
        "ye": (lab[:, 3] > 0.5).astype(jnp.float32),
        "ya": (lab[:, 4] > 0.5).astype(jnp.float32),
    }

    # Precompute stage boundaries once (constants for the isolated chains).
    @jax.jit
    def pre(p, v, q):
        f, fs, fw = backbone(p, cfg, v.astype(dt), vm, q.astype(dt), qm)
        fc, fm, fb = proposal_features_packed(f, lm, cfg.L, cfg.C)
        return f, fs, fw, fc, fm, fb

    f0, fs0, fw0, fc0, fm0, fb0 = pre(params, vf, qf)
    vmask0 = packed_valid_mask(lm).astype(dt)

    def timed(fn, *a):
        np.asarray(fn(*a))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    def chain(body):
        """K-scan a body: carry is a f32 scalar bump, body(c) -> scalar."""
        @jax.jit
        def run(c0, *a):
            def step(c, _):
                return body(c, *a).astype(jnp.float32) * 1e-30, ()

            c, _ = jax.lax.scan(step, c0, None, length=K)
            return c

        return run

    results = {}
    for name in args.variants.split(","):
        t_build = time.perf_counter()
        if name == "empty":
            run = chain(lambda c: c + 1.0)
            dt_chain = timed(run, jnp.float32(0.0))
        elif name == "proposal_pallas":
            def body(c, f):
                def lf(f_):
                    fc, fm, fb = proposal_features_packed_pallas(
                        f_ + c.astype(f_.dtype), lm, cfg.L, cfg.C)
                    return (fc.astype(jnp.float32).sum() * 1e-9
                            + fm.astype(jnp.float32).sum() * 1e-9
                            + fb.astype(jnp.float32).sum() * 1e-9)

                val, g = jax.value_and_grad(lf)(f)
                return val + g.astype(jnp.float32).sum() * 1e-9

            run = chain(body)
            dt_chain = timed(run, jnp.float32(0.0), f0)
        elif name == "proposal_xla":
            def body(c, f):
                def lf(f_):
                    fc, fm, fb = proposal_features_packed(
                        f_ + c.astype(f_.dtype), lm, cfg.L, cfg.C)
                    return (fc.astype(jnp.float32).sum() * 1e-9
                            + fm.astype(jnp.float32).sum() * 1e-9
                            + fb.astype(jnp.float32).sum() * 1e-9)

                val, g = jax.value_and_grad(lf)(f)
                return val + g.astype(jnp.float32).sum() * 1e-9

            run = chain(body)
            dt_chain = timed(run, jnp.float32(0.0), f0)
        elif name == "pack_rows":
            def body(c, fc):
                def lf(fc_):
                    rows = pack_rows(fc_ + c.astype(fc_.dtype))
                    back = unpack_rows(rows * 1.000001, N, cfg.C)
                    return back.astype(jnp.float32).sum() * 1e-9

                val, g = jax.value_and_grad(lf)(fc)
                return val + g.astype(jnp.float32).sum() * 1e-9

            run = chain(body)
            dt_chain = timed(run, jnp.float32(0.0), fc0)
        elif name == "heads_loss":
            def body(c, p, fm, fb):
                def lf(pp):
                    out = localization_packed(
                        pp["localization"], fm + c.astype(fm.dtype), fb,
                        lm, vmask0, cfg.L)
                    return smin_loss(out, batch)[0]

                val, g = jax.value_and_grad(lf)(p)
                leaves = jax.tree.leaves(g["localization"])
                return val + sum(x.sum() for x in leaves) * 1e-9

            run = chain(body)
            dt_chain = timed(run, jnp.float32(0.0), params, fm0, fb0)
        else:
            print(f"{name:16s} unknown variant, skipped")
            continue
        per = dt_chain / K * 1e3
        results[name] = per
        print(f"{name:16s} {per:8.3f} ms/step  (chain {dt_chain * 1e3:7.1f} ms,"
              f" build+compile {time.perf_counter() - t_build:5.1f}s)",
              flush=True)

    if "empty" in results:
        rtt = results["empty"]
        print(f"\nnet of the {rtt:.2f} ms/step empty-chain floor:")
        for name, per in results.items():
            if name != "empty":
                print(f"  {name:16s} {per - rtt:8.3f} ms/step")


if __name__ == "__main__":
    main()
