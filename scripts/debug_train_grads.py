"""Isolate the compiled fused-train-kernel mismatch on TPU.

Compares, at Charades dims fp32 (matching scripts/verify_kernels.py):
  1. compiled fused train FORWARD (fm_out, fb_out) vs XLA stack
  2. per-leaf gradient rel errors fused vs XLA (named worst offenders)

Env: VML_SMIN_TRAIN_BB to force BB; VML_DBG_LAYERS to shrink the stack.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from video_moment_localization_tpu.config import ModelConfig
    from video_moment_localization_tpu.models import init_smin_params
    from video_moment_localization_tpu.models.smin import smi_block_packed
    from video_moment_localization_tpu.ops.packing import packed_valid_mask
    from video_moment_localization_tpu.ops.proposal import (
        proposal_features_packed,
    )
    from video_moment_localization_tpu.ops import smin_train_pallas

    n_layers = int(os.environ.get("VML_DBG_LAYERS", 3))
    cfg = ModelConfig(T=64, L=16, C=4, D=512, dl=128, num_smi_layers=n_layers,
                      input_video_dim=1024, max_query_length=13,
                      lstm_hidden_size=256)
    B, Nq = 16, 13
    rng = np.random.default_rng(0)
    params = init_smin_params(jax.random.PRNGKey(2), cfg)
    f = jnp.asarray(rng.standard_normal((B, cfg.T, cfg.D)).astype(np.float32))
    fw = jnp.asarray(rng.standard_normal((B, Nq, cfg.D)).astype(np.float32))
    fs = jnp.asarray(rng.standard_normal((B, cfg.D)).astype(np.float32))
    qm = jnp.ones((B, Nq, 1), jnp.float32)
    length = np.ones((B, cfg.L), np.float32)
    length[1, cfg.L // 2 :] = 0
    lm = jnp.asarray(length)
    vm = packed_valid_mask(lm)
    fc, fm, fb = proposal_features_packed(f, lm, cfg.L, cfg.C)
    wm = jnp.asarray(rng.standard_normal(
        (B, vm.shape[1], cfg.D)).astype(np.float32))
    wb = jnp.asarray(rng.standard_normal((B, cfg.L, cfg.D)).astype(np.float32))

    def xla_stack(p, fc_, fm_, fb_, fw_, fs_):
        vmask = vm.astype(fc_.dtype)
        for p_layer in p["smi"]:
            fc_, fm_, fb_ = smi_block_packed(p_layer, fc_, fm_, fb_, fw_,
                                             fs_, qm, lm, vmask, cfg.L)
        return fm_, fb_

    def fused_stack(p, fc_, fm_, fb_, fw_, fs_):
        return smin_train_pallas.smin_smi_stack_train(
            p, cfg, fc_, fm_, fb_, fw_, fs_, qm, lm, vm)

    # ---- 1. compiled forward parity ----
    fm_x, fb_x = jax.jit(xla_stack)(params, fc, fm, fb, fw, fs)
    fm_k, fb_k = jax.jit(fused_stack)(params, fc, fm, fb, fw, fs)
    for nm, a, b in (("fm", fm_x * vm[..., None], fm_k * vm[..., None]),
                     ("fb", fb_x * lm[..., None], fb_k * lm[..., None])):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        d = np.abs(a - b)
        print(f"fwd {nm}: max abs {d.max():.3e}  rel "
              f"{d.max() / max(np.abs(a).max(), 1e-9):.3e}", flush=True)

    # ---- 2. per-leaf grad comparison ----
    def scalar(stack, p, fc_, fw_, fs_):
        fm_o, fb_o = stack(p, fc_, fm, fb, fw_, fs_)
        return (jnp.sum(fm_o * wm * vm[..., None])
                + jnp.sum(fb_o * wb * lm[..., None])) / B

    g_x = jax.jit(jax.grad(lambda *a: scalar(xla_stack, *a),
                           argnums=(0, 1, 2, 3)))(params, fc, fw, fs)
    g_k = jax.jit(jax.grad(lambda *a: scalar(fused_stack, *a),
                           argnums=(0, 1, 2, 3)))(params, fc, fw, fs)
    paths_x = jax.tree_util.tree_flatten_with_path(g_x)[0]
    paths_k = jax.tree_util.tree_flatten_with_path(g_k)[0]
    rows = []
    for (pa, a), (_, b) in zip(paths_x, paths_k):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        denom = max(np.abs(a).max(), 1e-6)
        rel = np.abs(a - b).max() / denom
        rows.append((rel, jax.tree_util.keystr(pa), float(np.abs(a).max()),
                     float(np.abs(b).max())))
    rows.sort(reverse=True)
    for rel, name, ma, mb in rows[:16]:
        print(f"rel {rel:9.3e}  |xla|max {ma:9.3e}  |fused|max {mb:9.3e}  "
              f"{name}", flush=True)


if __name__ == "__main__":
    main()
