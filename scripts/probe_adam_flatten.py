"""On-chip A/B: per-leaf Adam vs optax.flatten'd Adam.

Motivated by an old breakdown reading of ~9.2 ms/step for the Adam
update at B=1024 — which turned out to be a K=4 measurement artifact
(~6.8 ms/step of per-call tunnel dispatch) on top of a DCE-broken
variant. MEASURED RESULT (K=32, every updated leaf consumed):

    adam         1.19 ms/step   (net of the ~0.85 ms chain floor: ~0.3)
    adam_flat    1.45 ms/step   <- optax.flatten is SLOWER here

Negative result: the 87-leaf/7.3M-param update is already near its
HBM-traffic bound under XLA fusion; flatten's concat/split bookkeeping
costs more than the per-leaf dispatch it removes. The optimizer stays
plain ``optax.adam``.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_adam_flatten.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _charades_cfg
    from video_moment_localization_tpu.models import init_smin_params

    cfg = _charades_cfg()
    params = init_smin_params(jax.random.PRNGKey(0), cfg)
    g0 = jax.tree.map(lambda x: x * 1e-3, params)
    K = 32

    for name, optimizer in (
        ("adam", optax.adam(5e-4)),
        ("adam_flat", optax.flatten(optax.adam(5e-4))),
    ):
        opt_state = optimizer.init(params)

        @jax.jit
        def run(p, o, g, bump0, _opt=optimizer):
            def body(carry, _):
                p_, o_, c = carry
                up, o2 = _opt.update(
                    jax.tree.map(lambda x: x + c.astype(x.dtype), g), o_, p_)
                p2 = optax.apply_updates(p_, up)
                # Consume EVERY leaf: carrying only one leaf lets XLA
                # dead-code-eliminate the other 86 updates entirely
                # (measured 0.94 ms/step for that degenerate program).
                tot = sum(x.sum().astype(jnp.float32)
                          for x in jax.tree.leaves(p2))
                return (p2, o2, tot * 1e-30), ()

            (p_, o_, c), _ = jax.lax.scan(body, (p, o, bump0), None, length=K)
            return c

        t0 = time.perf_counter()
        np.asarray(run(params, opt_state, g0, jnp.float32(0.0)))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(run(params, opt_state, g0, jnp.float32(0.0)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:10s} {1e3 * best / K:7.3f} ms/step "
              f"(compile {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
