"""On-chip probe: where does the fused-train SMI stack spend its time?

K-chains each variant inside one jit (transport-free, like bench.py) at
Charades dims: fwd-only and full grad, XLA vs fused train kernels.

Usage: python scripts/probe_train_kernel.py [--batch 256] [--bb N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--bb", type=int, default=0)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--variants", default="xla,fused")
    args = ap.parse_args()
    if args.bb:
        os.environ["VML_SMIN_TRAIN_BB"] = str(args.bb)

    import jax
    import jax.numpy as jnp

    from video_moment_localization_tpu.config import ModelConfig
    from video_moment_localization_tpu.models import init_smin_params
    from video_moment_localization_tpu.models.smin import smi_block_packed
    from video_moment_localization_tpu.ops.packing import packed_valid_mask
    from video_moment_localization_tpu.ops.proposal import (
        proposal_features_packed,
    )
    from video_moment_localization_tpu.ops.smin_train_pallas import (
        smin_smi_stack_train,
    )

    cfg = ModelConfig(T=64, L=16, C=4, D=512, dl=128, num_smi_layers=3,
                      input_video_dim=1024, max_query_length=13,
                      lstm_hidden_size=256)
    B, Nq, dt, K = args.batch, 13, jnp.bfloat16, args.k
    params = init_smin_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((B, cfg.T, cfg.D)), dt)
    fw = jnp.asarray(rng.standard_normal((B, Nq, cfg.D)), dt)
    fs = jnp.asarray(rng.standard_normal((B, cfg.D)), dt)
    qm = jnp.ones((B, Nq, 1), jnp.float32)
    lm = jnp.ones((B, cfg.L), jnp.float32)
    vm = packed_valid_mask(lm)
    fc0, fm0, fb0 = proposal_features_packed(f, lm, cfg.L, cfg.C)
    fc0, fm0, fb0 = fc0.astype(dt), fm0.astype(dt), fb0.astype(dt)

    def stack_xla(p, fc_, fm_, fb_):
        vmask = vm.astype(dt)
        for p_layer in p["smi"]:
            fc_, fm_, fb_ = smi_block_packed(p_layer, fc_, fm_, fb_, fw, fs,
                                             qm, lm, vmask, cfg.L)
        return fm_, fb_

    def stack_fused(p, fc_, fm_, fb_):
        return smin_smi_stack_train(p, cfg, fc_, fm_, fb_, fw, fs, qm, lm, vm)

    def chain(body):
        @jax.jit
        def run(p, fc_):
            def step(c, _):
                out = body(p, fc_ * (1.0 + c).astype(fc_.dtype))
                # Sum EVERY leaf: summing only one could let XLA dead-code
                # the rest of the computation (a grad's first leaf may be a
                # zero cotangent of an unused parameter).
                s = sum(l.astype(jnp.float32).sum()
                        for l in jax.tree.leaves(out))
                return s * 1e-30, s
            _, ss = jax.lax.scan(step, jnp.float32(0), None, length=K)
            return ss[-1]
        return run

    def timed(fn, *a):
        np.asarray(fn(*a))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best / K

    for name in args.variants.split(","):
        stack = {"xla": stack_xla, "fused": stack_fused}[name]
        t_f = timed(chain(lambda p, fc_, s=stack: s(p, fc_, fm0, fb0)),
                    params, fc0)

        def scalar(p, fc_, s=stack):
            fm_o, fb_o = s(p, fc_, fm0, fb0)
            return (jnp.sum(fm_o.astype(jnp.float32) ** 2)
                    + jnp.sum(fb_o.astype(jnp.float32) ** 2))

        t_g = timed(chain(jax.grad(scalar, argnums=(0, 1))), params, fc0)
        print(f"{name:6s} fwd {t_f * 1e3:7.2f} ms   grad {t_g * 1e3:7.2f} ms "
              f"(bwd-ish {(t_g - t_f) * 1e3:7.2f} ms)  B={B} K={K}",
              flush=True)


if __name__ == "__main__":
    main()
