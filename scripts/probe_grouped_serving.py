"""On-chip probe: grouped-video serving (encode G unique videos, gather to
B pairs) vs per-pair encoding, at the bench serving batch.

The serving workload on the real datasets scores one video against many
queries (Charades-STA test: ~4 annotations/video), so `MomentLocalizer`
dedups repeated video arrays and routes a (vf_g (G, T, dv), vidx (B,))
grouped batch (models/smin.py `video_group`). This probe measures the
ON-CHIP effect at B=6144 with a 4:1 dedup (G=1536): the interior
(proposal + SMI stack + heads) is unchanged — the delta is the raw-feature
HBM read (1.6 GB -> 402 MB fp32) plus the video-encoder matmul running
once per unique video. The HOST-side wins (4x less featurization and
host->device transfer) are workload- and transport-dependent and are NOT
in this number.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_grouped_serving.py [B] [Q]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 6144
    Q = int(sys.argv[2]) if len(sys.argv) > 2 else 4   # queries per video
    K = int(os.environ.get("VML_BENCH_K", 8))
    G = B // Q

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _charades_cfg
    from video_moment_localization_tpu.models import init_smin_params
    from video_moment_localization_tpu.models.smin import (
        smin_forward_inference,
    )

    cfg = _charades_cfg()
    params = init_smin_params(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 2)
        vf_g = jax.random.normal(ks[0], (G, cfg.T, cfg.input_video_dim),
                                 jnp.float32)
        qf = jax.random.normal(ks[1], (B, cfg.max_query_length,
                                       cfg.word_dim), jnp.float32)
        return vf_g, qf

    vf_g, qf = gen(jax.random.PRNGKey(7))
    vm_g = jnp.ones((G, cfg.T, 1), jnp.float32)
    qm = jnp.ones((B, cfg.max_query_length, 1), jnp.float32)
    lm = jnp.ones((B, cfg.L), jnp.float32)
    vidx = jnp.asarray(np.repeat(np.arange(G), Q).astype(np.int32))
    vf = jnp.take(vf_g, vidx, axis=0)           # the per-pair copy
    vm = jnp.ones((B, cfg.T, 1), jnp.float32)

    def chain(fn):
        @jax.jit
        def run(*args):
            def body(c, _):
                pm, ps, pe, _ = fn(*args, c)
                s = pm.sum() + ps.sum() + pe.sum()
                return s * 1e-30, s
            _, out = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return out[-1]
        return run

    def plain(p, vf_, vm_, qf_, qm_, lm_, c):
        return smin_forward_inference(p, cfg, vf_ + c, vm_, qf_, qm_, lm_,
                                      None)

    def grouped(p, vfg_, vmg_, vidx_, qf_, qm_, lm_, c):
        return smin_forward_inference(p, cfg, None, None, qf_, qm_, lm_,
                                      None,
                                      video_group=(vfg_ + c, vmg_, vidx_))

    for name, run, args in (
        ("plain  ", chain(plain), (params, vf, vm, qf, qm, lm)),
        ("grouped", chain(grouped), (params, vf_g, vm_g, vidx, qf, qm, lm)),
    ):
        np.asarray(run(*args))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(*args))
            best = min(best, time.perf_counter() - t0)
        per_call = best / K * 1e3
        print(f"{name}: {per_call:8.2f} ms/batch  "
              f"({K * B / best:,.0f} pairs/s chained)", flush=True)


if __name__ == "__main__":
    main()
