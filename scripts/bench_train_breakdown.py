"""Per-stage on-chip breakdown of the fused TRAIN step (flagship cfg).

Times value-and-grad of each model stage independently (K-chained in-jit,
same methodology as scripts/bench_ablate.py) against the full train step,
to direct the train-MFU work:

* ``full``     — the production train step (fwd + bwd + Adam).
* ``stack``    — grad of the fused SMI-stack + heads only (backbone
                 outputs as constants): the Pallas fwd/bwd kernels.
* ``backbone`` — grad of venc + biLSTM + fusion under a SUM loss.
                 CAVEAT: the all-ones cotangent lets XLA degenerate the
                 output-side backward matmuls into column sums — this
                 UNDERCOUNTS the real backbone backward; prefer
                 ``backbone_rc``.
* ``backbone_rc`` — same but loss = <f, rf> + <fw, rw> with random
                 cotangent arrays: the honest backbone fwd+bwd cost.
* ``lstm_rc``  — query encoder (biLSTM) alone under a random cotangent.
* ``fwdonly``  — the forward + loss, no backward: separates fwd cost.
* ``adam``     — optimizer update alone on captured grads (every
                 updated leaf consumed into the carry).
* ``empty``    — the empty K-chain: per-call dispatch overhead floor.
                 At K=4 the ~27 ms/call tunnel dispatch adds ~7 ms/step
                 to EVERY variant; subtract this floor before comparing.

Every grad LEAF is consumed (summed into the carry): consuming only one
leaf lets XLA dead-code-eliminate the rest of the backward, which made
the old stack/backbone numbers measure mostly the forward (and the old
``adam`` number measure one leaf's update out of 87).

MEASURED (Charades cfg, B=1024, K=16, bf16, net of the 1.79 ms floor):

    full        85.04 -> 83.3   the production fused train step
    stack       77.66 -> 75.9   proposal fwd + SMI train kernels + heads
    fwdonly     23.57 -> 21.8   whole forward + loss (no backward)
    backbone_rc  6.22 ->  4.4   venc + biLSTM fwd+bwd, honest cotangent
    lstm_rc      7.86 ->  6.1   biLSTM alone (take_along_axis bwd incl.)
    adam         2.09 ->  0.3   optimizer update
    (proposal pallas bwd: 6.3 — scripts/probe_train_glue.py)

Decomposition closes: stack + backbone + proposal-bwd + adam = 86.9 vs
full 83.3 (overlap/noise). The train step is ~91% the fused SMI-stack
kernels; their bwd/fwd ratio is ~3.0 = the in-VMEM recompute + vjp
structural bound (1x recompute + 2x backward GEMMs). An earlier
"full - stack - backbone = 42.5 ms unaccounted" reading came from the
pre-fix DCE-broken variants and was wrong.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_train_breakdown.py \
      [--batch 512] [--k 4] [--dtype bfloat16]
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
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument(
        "--variants",
        default="full,stack,backbone,backbone_rc,lstm_rc,fwdonly,adam,empty")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _charades_cfg
    from bench import _make_train_chain, B_TRAIN  # noqa: F401
    import bench

    bench.B_TRAIN = args.batch
    bench.K_TRAIN = args.k
    import dataclasses

    from video_moment_localization_tpu.models import init_smin_params
    from video_moment_localization_tpu.models.smin import (
        backbone,
        localization_packed,
        query_encoder,
        smin_forward,
    )
    from video_moment_localization_tpu.ops.proposal import (
        proposal_features_packed,
    )
    from video_moment_localization_tpu.ops.packing import packed_valid_mask
    from video_moment_localization_tpu.ops.smin_train_pallas import (
        smin_smi_stack_train,
        supports_train,
    )
    from video_moment_localization_tpu.train.loss import smin_loss

    cfg = dataclasses.replace(_charades_cfg(), compute_dtype=args.dtype)
    B, K = args.batch, args.k
    params = init_smin_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    N = cfg.L * (cfg.L + 1) // 2
    dt = jnp.dtype(cfg.compute_dtype)
    vf = jnp.asarray(rng.standard_normal((B, cfg.T, cfg.input_video_dim))
                     .astype(np.float32))
    qf = jnp.asarray(rng.standard_normal(
        (B, cfg.max_query_length, cfg.word_dim)).astype(np.float32))
    vm = jnp.ones((B, cfg.T, 1), jnp.float32)
    qm = jnp.ones((B, cfg.max_query_length, 1), jnp.float32)
    lm = jnp.ones((B, cfg.L), jnp.float32)
    sm = jnp.asarray(rng.random((B, N)).astype(np.float32))
    lab = {k: jnp.asarray((rng.random((B, cfg.L)) > 0.5).astype(np.float32))
           for k in ("ss", "ys", "se", "ye", "ya")}
    batch = {"video_features": vf, "video_mask": vm, "query_features": qf,
             "query_mask": qm, "length_mask": lm, "sm": sm,
             "ym": (sm > 0.5).astype(jnp.float32),
             "sample_mask": jnp.ones(B, jnp.float32), **lab}

    def loss_of(out):
        return smin_loss(out, batch)[0]

    def chain(grad_fn, init_args):
        @jax.jit
        def run(*a):
            def body(c, _):
                val = grad_fn(*((a[0],) + a[1:]), bump=c)
                return val.astype(jnp.float32) * 1e-30, ()

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return c

        return run, init_args

    # Precompute backbone outputs once for the stack-only variant.
    # vf/qf must be jit ARGS: closure-captured device arrays are embedded
    # in the MLIR as hex literals (HTTP 413 at B=1024 through the remote
    # compile service — same pitfall as bench.py _make_train_chain).
    f0, fs0, fw0 = jax.jit(
        lambda p, v, q: backbone(p, cfg, v.astype(dt), vm, q.astype(dt), qm)
    )(params, vf, qf)
    vmask0 = packed_valid_mask(lm).astype(dt)

    results = {}
    for name in args.variants.split(","):
        if name == "full":
            optimizer = optax.adam(5e-4)
            opt_state = optimizer.init(params)

            # Big inputs are jit ARGS, never closure captures: captured
            # device arrays are embedded in the MLIR as hex literals
            # (268 MB for vf at B=512 — see bench.py _make_train_chain).
            @jax.jit
            def full_run(p, o, vf_, qf_, bump0):
                def body(carry, _):
                    p_, o_, c = carry

                    def lf(pp):
                        out = smin_forward(pp, cfg, vf_ + c, vm, qf_, qm, lm,
                                           None)
                        return loss_of(out)

                    l, g = jax.value_and_grad(lf)(p_)
                    up, o2 = optimizer.update(g, o_, p_)
                    return (optax.apply_updates(p_, up), o2,
                            l.astype(jnp.float32) * 1e-30), ()

                (p_, o_, c), _ = jax.lax.scan(
                    body, (p, o, bump0), None, length=K)
                return c

            fn = lambda: np.asarray(full_run(params, opt_state,  # noqa: E731
                                             vf, qf, jnp.float32(0.0)))
        elif name == "stack":
            if not supports_train(cfg):
                print(f"{name:8s} skipped (unsupported)")
                continue

            @jax.jit
            def stack_run(p, f, fw, fs, bump0):
                def body(c, _):
                    def lf(pp):
                        fc, fm_, fb = proposal_features_packed(
                            f + c.astype(f.dtype), lm, cfg.L, cfg.C)
                        fm_, fb = smin_smi_stack_train(
                            pp, cfg, fc, fm_, fb, fw, fs, qm, lm, vmask0)
                        out = localization_packed(
                            pp["localization"], fm_, fb, lm, vmask0, cfg.L)
                        return loss_of(out)

                    l, g = jax.value_and_grad(lf)(p)
                    gsum = sum(x.sum() for x in jax.tree.leaves(g))
                    return (l + gsum * 1e-9).astype(
                        jnp.float32) * 1e-30, ()

                c, _ = jax.lax.scan(body, bump0, None, length=K)
                return c

            fn = lambda: np.asarray(stack_run(params, f0, fw0, fs0,  # noqa: E731,E501
                                              jnp.float32(0.0)))
        elif name == "backbone":

            @jax.jit
            def bb_run(p, vf_, qf_, bump0):
                def body(c, _):
                    def lf(pp):
                        f, fs, fw = backbone(
                            pp, cfg, (vf_ + c).astype(dt), vm,
                            qf_.astype(dt), qm)
                        return (f.astype(jnp.float32).sum()
                                + fw.astype(jnp.float32).sum()) * 1e-9

                    l, g = jax.value_and_grad(lf)(p)
                    gsum = sum(x.sum() for x in jax.tree.leaves(g))
                    return (l + gsum * 1e-9).astype(
                        jnp.float32) * 1e-30, ()

                c, _ = jax.lax.scan(body, bump0, None, length=K)
                return c

            fn = lambda: np.asarray(bb_run(params, vf, qf, jnp.float32(0.0)))  # noqa: E731,E501
        elif name in ("backbone_rc", "lstm_rc"):
            # Honest backward: random cotangent arrays (jit args, never
            # closure captures) force the full dL/dW matmuls + the
            # reverse biLSTM scan instead of ones-cotangent column sums.
            rf = jnp.asarray(rng.standard_normal(
                (B, cfg.T, cfg.D)).astype(np.float32)) * 1e-3
            rw = jnp.asarray(rng.standard_normal(
                (B, cfg.max_query_length,
                 2 * cfg.lstm_hidden_size)).astype(np.float32)) * 1e-3
            rs = jnp.asarray(rng.standard_normal(
                (B, 2 * cfg.lstm_hidden_size)).astype(np.float32)) * 1e-3
            lstm_only = name == "lstm_rc"

            @jax.jit
            def rc_run(p, vf_, qf_, rf_, rw_, rs_, bump0):
                def body(c, _):
                    def lf(pp):
                        if lstm_only:
                            fs, fw = query_encoder(
                                pp["query_encoder"],
                                (qf_ + c).astype(dt), qm,
                                cfg.lstm_hidden_size)
                            return (
                                (fw.astype(jnp.float32) * rw_).sum()
                                + (fs.astype(jnp.float32) * rs_).sum())
                        f, fs, fw = backbone(
                            pp, cfg, (vf_ + c).astype(dt), vm,
                            qf_.astype(dt), qm)
                        return ((f.astype(jnp.float32) * rf_).sum()
                                + (fw.astype(jnp.float32) * rw_).sum())

                    l, g = jax.value_and_grad(lf)(p)
                    gsum = sum(x.sum() for x in jax.tree.leaves(g))
                    return (l + gsum * 1e-9).astype(
                        jnp.float32) * 1e-30, ()

                c, _ = jax.lax.scan(body, bump0, None, length=K)
                return c

            fn = lambda: np.asarray(rc_run(params, vf, qf, rf, rw, rs,  # noqa: E731,E501
                                           jnp.float32(0.0)))
        elif name == "empty":

            @jax.jit
            def empty_run(p, bump0):
                def body(c, _):
                    return (c + jax.tree.leaves(p)[0].sum().astype(
                        jnp.float32) * 1e-30), ()

                c, _ = jax.lax.scan(body, bump0, None, length=K)
                return c

            fn = lambda: np.asarray(empty_run(params, jnp.float32(0.0)))  # noqa: E731,E501
        elif name == "fwdonly":

            @jax.jit
            def fwd_run(p, vf_, qf_, bump0):
                def body(c, _):
                    out = smin_forward(p, cfg, vf_ + c, vm, qf_, qm, lm, None)
                    return loss_of(out).astype(jnp.float32) * 1e-30, ()

                c, _ = jax.lax.scan(body, bump0, None, length=K)
                return c

            fn = lambda: np.asarray(fwd_run(params, vf, qf, jnp.float32(0.0)))  # noqa: E731,E501
        elif name == "adam":
            optimizer = optax.adam(5e-4)
            opt_state = optimizer.init(params)
            g0 = jax.tree.map(lambda x: x * 1e-3, params)

            @jax.jit
            def adam_run(p, o, g, bump0):
                def body(carry, _):
                    p_, o_, c = carry
                    up, o2 = optimizer.update(
                        jax.tree.map(lambda x: x + c.astype(x.dtype), g),
                        o_, p_)
                    p2 = optax.apply_updates(p_, up)
                    # Consume EVERY updated leaf: a one-leaf carry lets
                    # XLA dead-code-eliminate the other 86 updates
                    # (measured 0.94 vs 1.19 ms/step at K=32).
                    tot = sum(x.sum().astype(jnp.float32)
                              for x in jax.tree.leaves(p2))
                    return (p2, o2, tot * 1e-30), ()

                (p_, o_, c), _ = jax.lax.scan(
                    body, (p, o, bump0), None, length=K)
                return c

            fn = lambda: np.asarray(adam_run(params, opt_state, g0,  # noqa: E731,E501
                                             jnp.float32(0.0)))
        else:
            print(f"unknown variant {name}")
            continue

        t0 = time.perf_counter()
        fn()  # compile + run
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        ms = 1e3 * best / K
        results[name] = ms
        print(f"{name:8s} {ms:8.2f} ms/step  ({K * B / best:8.0f} samples/s,"
              f" compile {compile_s:.0f}s)", flush=True)

    if "full" in results and "stack" in results and "backbone" in results:
        other = results["full"] - results["stack"] - results["backbone"]
        print(f"full - stack - backbone = {other:.2f} ms "
              "(loss/heads-bwd glue + Adam + proposal grad)", flush=True)


if __name__ == "__main__":
    main()
