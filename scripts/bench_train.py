"""Training-step throughput benchmark (samples/s/chip).

Times the fused train step (forward + backward + Adam + on-device metrics)
at a chosen dataset scale on synthetic device-resident data. Timing fetches
a scalar every iteration to guarantee real completion under remote
transports (see bench.py note).

Usage:
  python scripts/bench_train.py [--dataset charadessta|activitynet|tacos]
      [--batch_size 64] [--iters 10] [--dtype bfloat16] [--remat]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


_SCALES = {
    "charadessta": dict(T=64, L=16, input_video_dim=1024, max_query_length=13),
    "activitynet": dict(T=128, L=64, input_video_dim=500, max_query_length=20),
    "tacos": dict(T=128, L=32, input_video_dim=4096, max_query_length=14),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="charadessta", choices=sorted(_SCALES))
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--no_fused_train", action="store_true",
                        help="force the XLA SMI stack (fused_smi_train=False)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from video_moment_localization_tpu.config import ModelConfig
    from video_moment_localization_tpu.models import init_smin_params
    from video_moment_localization_tpu.parallel.steps import make_train_step

    scale = _SCALES[args.dataset]
    cfg = ModelConfig(C=4, D=512, dl=128, num_smi_layers=3,
                      lstm_hidden_size=256, compute_dtype=args.dtype,
                      remat_smi=args.remat,
                      fused_smi_train=not args.no_fused_train, **scale)
    B, T, L = args.batch_size, cfg.T, cfg.L
    rng = np.random.default_rng(0)
    batch = {
        "video_features": jnp.asarray(
            rng.standard_normal((B, T, cfg.input_video_dim)).astype(np.float32)),
        "video_mask": jnp.ones((B, T, 1), jnp.float32),
        "query_features": jnp.asarray(
            rng.standard_normal((B, cfg.max_query_length, 300)).astype(np.float32)),
        "query_mask": jnp.ones((B, cfg.max_query_length, 1), jnp.float32),
        "length_mask": jnp.ones((B, L), jnp.float32),
        # packed (N,) labels in the default layout; dense otherwise
        **({
            "sm": jnp.asarray(rng.uniform(
                0, 1, (B, L * (L + 1) // 2)).astype(np.float32)),
            "ym": jnp.zeros((B, L * (L + 1) // 2), jnp.float32),
        } if cfg.packed else {
            "moment_mask": jnp.asarray(
                np.triu(np.ones((L, L), np.float32))[None].repeat(B, 0)),
            "sm": jnp.asarray(rng.uniform(0, 1, (B, L, L)).astype(np.float32)),
            "ym": jnp.zeros((B, L, L), jnp.float32),
        }),
        "ss": jnp.asarray(rng.uniform(0, 1, (B, L)).astype(np.float32)),
        "ys": jnp.zeros((B, L), jnp.float32),
        "se": jnp.asarray(rng.uniform(0, 1, (B, L)).astype(np.float32)),
        "ye": jnp.zeros((B, L), jnp.float32),
        "ya": jnp.zeros((B, L), jnp.float32),
        "sample_mask": jnp.ones((B,), jnp.float32),
    }

    optimizer = optax.adam(5e-4)
    params = init_smin_params(jax.random.PRNGKey(0), cfg)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, optimizer)

    params, opt_state, m = step(params, opt_state, batch)
    _ = float(m["loss"])  # compile + sync

    t0 = time.perf_counter()
    for _ in range(args.iters):
        params, opt_state, m = step(params, opt_state, batch)
        _ = float(m["loss"])  # per-iteration host fetch
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{args.dataset} train step: B={B} dtype={args.dtype} remat={args.remat} "
          f"fused_train={cfg.fused_smi_train} "
          f"{dt * 1e3:.2f} ms/step  ({B / dt:.0f} samples/s/chip)  "
          f"loss={float(m['loss']):.4f}")


if __name__ == "__main__":
    main()
