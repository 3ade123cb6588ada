"""On-chip op micro-benchmarks with honest device timing.

Per-op timing through the remote-execution tunnel is unreliable: a single
call is dominated by the ~30 ms round trip, and `block_until_ready` can be
acknowledged early (see bench.py). Every benchmark here therefore runs K
iterations chained *inside one jit* (each iteration's input perturbed by a
value derived from the previous output, so XLA cannot CSE or reorder), and
fetches one scalar: per-iter time = total / K with one RTT amortized away.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_ops.py \
      --op content --scale charades --batch 512
  ops: content (XLA packed vs fused Pallas ContentUnit),
       proposal (XLA prefix-sum vs fused Pallas kernel, fwd and fwd+bwd)
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _chain_time(fn, args, K, reps=3):
    """Wall time per iteration of fn chained K times inside one jit."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*args):
        def body(c, _):
            # cast the perturbation: f32 scalar + bf16 array would silently
            # promote the op's input to f32
            out = fn(*((args[0] + c.astype(args[0].dtype),) + args[1:]))
            leaf = jax.tree.leaves(out)[0]
            return leaf.astype(jnp.float32).sum() * 1e-30, ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return c

    np.asarray(chained(*args))  # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / K


_SCALES = {
    # (T, L, C, D, dl, Nq)
    "charades": (64, 16, 4, 512, 128, 13),
    "activitynet": (128, 64, 4, 512, 128, 20),
    "tacos": (128, 32, 4, 512, 128, 14),
}


def bench_content(scale: str, B: int, dtype: str, K: int):
    import jax
    import jax.numpy as jnp

    from video_moment_localization_tpu.config import ModelConfig
    from video_moment_localization_tpu.models import init_smin_params
    from video_moment_localization_tpu.models.smin import content_unit_packed
    from video_moment_localization_tpu.ops.content_pallas import (
        content_unit_fused,
        supports,
    )
    from video_moment_localization_tpu.ops.packing import triu_packing

    T, L, C, D, dl, Nq = _SCALES[scale]
    cfg = ModelConfig(T=T, L=L, C=C, D=D, dl=dl, num_smi_layers=1,
                      max_query_length=Nq, lstm_hidden_size=D // 2,
                      compute_dtype=dtype)
    dt = jnp.dtype(dtype)
    N = triu_packing(L).N
    rng = np.random.default_rng(0)
    p = init_smin_params(jax.random.PRNGKey(0), cfg)["smi"][0]["content"]
    f_c = jnp.asarray(rng.standard_normal((B, N, C, D)), dt)
    f_w = jnp.asarray(rng.standard_normal((B, Nq, D)), dt)
    f_s = jnp.asarray(rng.standard_normal((B, D)), dt)
    f_m = jnp.asarray(rng.standard_normal((B, N, D)), dt)
    qmask = jnp.ones((B, Nq, 1), jnp.float32)
    vmask = jnp.ones((B, N), jnp.float32)
    args = (f_c, f_w, f_s, f_m)

    t_xla = _chain_time(
        lambda fc, fw, fs, fm: content_unit_packed(p, fc, fw, fs, fm, qmask, vmask),
        args, K)
    print(f"content[{scale}] B={B} {dtype}: XLA packed   {t_xla*1e3:8.3f} ms/call")
    if supports(L, C):
        t_fused = _chain_time(
            lambda fc, fw, fs, fm: content_unit_fused(p, fc, fw, fs, fm, qmask, vmask),
            args, K)
        print(f"content[{scale}] B={B} {dtype}: fused Pallas {t_fused*1e3:8.3f} ms/call"
              f"  ({t_xla/t_fused:.2f}x vs XLA)")


def bench_proposal(scale: str, B: int, dtype: str, K: int):
    import jax
    import jax.numpy as jnp

    from video_moment_localization_tpu.ops.proposal import proposal_features_packed
    from video_moment_localization_tpu.ops.proposal_pallas import (
        proposal_features_packed_pallas,
    )

    T, L, C, D, dl, Nq = _SCALES[scale]
    dt = jnp.dtype(dtype)
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((B, T, D)), dt)
    lm = jnp.ones((B, L), jnp.float32)

    for name, fn in (("XLA prefix-sum", lambda f_, m_: proposal_features_packed(f_, m_, L, C)),
                     ("fused Pallas  ", lambda f_, m_: proposal_features_packed_pallas(f_, m_, L, C))):
        t = _chain_time(fn, (f, lm), K)
        print(f"proposal[{scale}] B={B} {dtype}: {name} fwd      {t*1e3:8.3f} ms/call")

    # Random cotangent: grad of a plain sum lets XLA collapse the whole
    # gather/cumsum chain algebraically, benchmarking nothing. Passed as an
    # argument (a closed-over array would be baked into the program).
    # NB the op is linear and its backward consumes only residual inputs,
    # so XLA DCEs the forward in both variants: these lines time the
    # backward alone (hence "bwd-only", and why they can undercut "fwd").
    N = L * (L + 1) // 2
    gct = jnp.asarray(rng.standard_normal((B, N, C, D)), dt)

    def grad_of(fn):
        def g(f_, m_, gct_):
            return jax.grad(
                lambda x: (jax.tree.leaves(fn(x, m_))[0] * gct_)
                .astype(jnp.float32).sum()
            )(f_)
        return g

    for name, fn in (("XLA prefix-sum", lambda f_, m_: proposal_features_packed(f_, m_, L, C)),
                     ("fused Pallas  ", lambda f_, m_: proposal_features_packed_pallas(f_, m_, L, C))):
        t = _chain_time(grad_of(fn), (f, lm, gct), K)
        print(f"proposal[{scale}] B={B} {dtype}: {name} bwd-only {t*1e3:8.3f} ms/call")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", choices=["content", "proposal"], required=True)
    ap.add_argument("--scale", choices=list(_SCALES), default="charades")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    if args.op == "content":
        bench_content(args.scale, args.batch, args.dtype, args.iters)
    else:
        bench_proposal(args.scale, args.batch, args.dtype, args.iters)


if __name__ == "__main__":
    main()
