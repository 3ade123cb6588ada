"""On-device Pallas kernel verification.

The test suite exercises the kernels in interpret mode on CPU; this script
compiles them on the actual accelerator and checks numerical parity against
the XLA reference paths at real model scales. Run on TPU hardware:

    python scripts/verify_kernels.py            # all scales
    python scripts/verify_kernels.py --quick    # Charades scale only

Exits nonzero on any mismatch.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check(name: str, got, want, rtol=2e-5, atol=2e-5) -> bool:
    ok = all(
        np.allclose(np.asarray(g), np.asarray(w), rtol=rtol, atol=atol)
        for g, w in zip(got, want)
    )
    print(f"{'PASS' if ok else 'FAIL'}  {name}")
    return ok


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from video_moment_localization_tpu.ops.proposal import (
        proposal_features,
        proposal_features_packed,
    )
    from video_moment_localization_tpu.ops.proposal_pallas import (
        proposal_features_pallas,
        proposal_features_packed_pallas,
    )

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    scales = [("charades", 8, 64, 16, 4, 512)]
    if not args.quick:
        scales += [("tacos", 4, 128, 32, 4, 512), ("activitynet", 4, 128, 64, 4, 512)]

    ok = True
    rng = np.random.default_rng(0)
    for name, B, T, L, C, D in scales:
        f = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
        length = np.ones((B, L), np.float32)
        length[0, L // 2 :] = 0
        lm = jnp.asarray(length)
        mm = jnp.asarray(np.triu(np.einsum("bi,bj->bij", length, length)))

        dense_ref = jax.jit(lambda a, b: proposal_features(a, b, L, C))(f, mm)
        dense_ker = jax.jit(lambda a, b: proposal_features_pallas(a, b, L, C))(f, mm)
        ok &= check(f"{name}: dense proposal kernel", dense_ker, dense_ref)

        packed_ref = jax.jit(lambda a, b: proposal_features_packed(a, b, L, C))(f, lm)
        packed_ker = jax.jit(
            lambda a, b: proposal_features_packed_pallas(a, b, L, C)
        )(f, lm)
        ok &= check(f"{name}: packed proposal kernel", packed_ker, packed_ref)

    # Experimental fused ContentUnit (single-block scales only).
    from video_moment_localization_tpu.config import ModelConfig
    from video_moment_localization_tpu.models import init_smin_params
    from video_moment_localization_tpu.models.smin import content_unit_packed
    from video_moment_localization_tpu.ops.content_pallas import (
        content_unit_fused,
        supports,
    )
    from video_moment_localization_tpu.ops.packing import triu_packing

    cfg = ModelConfig(T=64, L=16, C=4, D=512, dl=128, num_smi_layers=1,
                      input_video_dim=1024, max_query_length=13,
                      lstm_hidden_size=256)
    if supports(cfg.L, cfg.C):
        params = init_smin_params(jax.random.PRNGKey(0), cfg)["smi"][0]["content"]
        N = triu_packing(cfg.L).N
        B = 4
        f_c = jnp.asarray(rng.standard_normal((B, N, cfg.C, cfg.D)).astype(np.float32))
        f_w = jnp.asarray(rng.standard_normal((B, 13, cfg.D)).astype(np.float32))
        f_s = jnp.asarray(rng.standard_normal((B, cfg.D)).astype(np.float32))
        f_m = jnp.asarray(rng.standard_normal((B, N, cfg.D)).astype(np.float32))
        qm = jnp.ones((B, 13, 1), jnp.float32)
        vm = jnp.ones((B, N), jnp.float32)
        ref = content_unit_packed(params, f_c, f_w, f_s, f_m, qm, vm)
        got = jax.jit(
            lambda *a: content_unit_fused(*a)
        )(params, f_c, f_w, f_s, f_m, qm, vm)
        # compiled XLA f32 on TPU uses single-pass MXU (bf16-ish) by default;
        # the kernel runs HIGHEST — compare at bf16-level tolerance.
        ok &= check("charades: fused ContentUnit (experimental)", [got], [ref],
                    rtol=2e-2, atol=2e-2)

    # Fused SMI-stack serving kernel vs the packed XLA pipeline.
    from video_moment_localization_tpu.models.smin import (
        localization_packed,
        smi_block_packed,
    )
    from video_moment_localization_tpu.ops import smin_pallas
    from video_moment_localization_tpu.ops.packing import packed_valid_mask

    stack_scales = [("charades", 8, 64, 16, 4, 512, 128, 13)]
    if not args.quick:
        stack_scales += [("tacos", 4, 128, 32, 4, 512, 128, 14)]
    for name, B, T, L, C, D, dl, Nq in stack_scales:
        cfg = ModelConfig(T=T, L=L, C=C, D=D, dl=dl, num_smi_layers=3,
                          input_video_dim=1024, max_query_length=Nq,
                          lstm_hidden_size=D // 2)
        if not smin_pallas.supports(cfg):
            print(f"skip  {name}: fused SMI stack (unsupported scale)")
            continue
        params = init_smin_params(jax.random.PRNGKey(1), cfg)
        f = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
        fw = jnp.asarray(rng.standard_normal((B, Nq, D)).astype(np.float32))
        fs = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
        qmask = np.ones((B, Nq, 1), np.float32)
        qmask[0, Nq // 2 :] = 0
        qm = jnp.asarray(qmask)
        length = np.ones((B, L), np.float32)
        length[1, L // 2 :] = 0
        lm = jnp.asarray(length)
        vm = packed_valid_mask(lm)

        def xla_stack(f, fw, fs, qm, lm, _params=params, _cfg=cfg):
            vmask = packed_valid_mask(lm.astype(jnp.float32)).astype(f.dtype)
            fc, fm_, fb = proposal_features_packed(f, lm, _cfg.L, _cfg.C)
            for p_layer in _params["smi"]:
                fc, fm_, fb = smi_block_packed(p_layer, fc, fm_, fb, fw, fs,
                                               qm, lm, vmask, _cfg.L)
            return localization_packed(_params["localization"], fm_, fb, lm,
                                       vmask, _cfg.L)

        # bf16 is the production path; verify with bulk + outlier bounds
        # (3 recurrent bf16 layers diverge slightly between any two op
        # orderings). fp32 activations run the kernel's HIGHEST-precision
        # MXU mode (smin_pallas.py `prec`) and must track the fp32 XLA
        # parity path tightly.
        bf = jnp.bfloat16
        args16 = (f.astype(bf), fw.astype(bf), fs.astype(bf), qm, lm)
        ref = jax.jit(xla_stack)(*args16)
        got = jax.jit(
            lambda *a, _p=params, _c=cfg: smin_pallas.smin_stack_fused(
                _p, _c, *a)
        )(*args16, vm)
        stack_ok = True
        for g, w_, nm in zip(got, ref, ("pm", "ps", "pe", "pa")):
            d = np.abs(np.asarray(g, np.float32) - np.asarray(w_, np.float32))
            stack_ok &= (d.mean() < 0.01 and np.quantile(d, 0.98) < 0.06
                         and d.max() < 0.3)
        print(f"{'PASS' if stack_ok else 'FAIL'}  {name}: fused SMI stack (bf16)")
        ok &= stack_ok

        args32 = (f, fw, fs, qm, lm)
        # The kernel's fp32 mode runs every matmul at HIGHEST precision;
        # XLA's DEFAULT f32 matmuls on TPU use bf16 MXU passes (~3e-2 p98
        # drift on this stack), so the reference must also run HIGHEST or
        # the check measures XLA's own rounding, not the kernel's.
        with jax.default_matmul_precision("highest"):
            ref32 = jax.jit(xla_stack)(*args32)
        got32 = jax.jit(
            lambda *a, _p=params, _c=cfg: smin_pallas.smin_stack_fused(
                _p, _c, *a)
        )(*args32, vm)
        stack32_ok = True
        report = []
        for g, w_, nm in zip(got32, ref32, ("pm", "ps", "pe", "pa")):
            d = np.abs(np.asarray(g, np.float64) - np.asarray(w_, np.float64))
            report.append(f"{nm} max={d.max():.2e} p98={np.quantile(d, 0.98):.2e}")
            stack32_ok &= bool(d.max() < 2e-3 and np.quantile(d, 0.98) < 2e-4)
        print(f"{'PASS' if stack32_ok else 'FAIL'}  {name}: fused SMI stack "
              f"(fp32 HIGHEST) [{'; '.join(report)}]")
        ok &= stack32_ok

    # Differentiable fused SMI stack (training path): compiled gradient
    # parity vs the XLA packed stack at Charades scale.
    from video_moment_localization_tpu.ops import smin_train_pallas

    cfg = ModelConfig(T=64, L=16, C=4, D=512, dl=128, num_smi_layers=3,
                      input_video_dim=1024, max_query_length=13,
                      lstm_hidden_size=256)
    if smin_train_pallas.supports_train(cfg):
        B, Nq = 16, 13
        params = init_smin_params(jax.random.PRNGKey(2), cfg)
        f = jnp.asarray(rng.standard_normal((B, cfg.T, cfg.D)).astype(np.float32))
        fw = jnp.asarray(rng.standard_normal((B, Nq, cfg.D)).astype(np.float32))
        fs = jnp.asarray(rng.standard_normal((B, cfg.D)).astype(np.float32))
        qm = jnp.ones((B, Nq, 1), jnp.float32)
        length = np.ones((B, cfg.L), np.float32)
        length[1, cfg.L // 2 :] = 0
        lm = jnp.asarray(length)
        vm = packed_valid_mask(lm)
        wm = jnp.asarray(rng.standard_normal(
            (B, vm.shape[1], cfg.D)).astype(np.float32))
        wb = jnp.asarray(rng.standard_normal((B, cfg.L, cfg.D)).astype(np.float32))

        def scalar(stack, p, f_, fw_, fs_):
            fc, fm_, fb = proposal_features_packed(f_, lm, cfg.L, cfg.C)
            if stack == "fused":
                fm_o, fb_o = smin_train_pallas.smin_smi_stack_train(
                    p, cfg, fc, fm_, fb, fw_, fs_, qm, lm, vm)
            else:
                vmask = vm.astype(f_.dtype)
                for p_layer in p["smi"]:
                    fc, fm_, fb = smi_block_packed(p_layer, fc, fm_, fb,
                                                   fw_, fs_, qm, lm, vmask,
                                                   cfg.L)
                fm_o, fb_o = fm_, fb
            return (jnp.sum(fm_o * wm * vm[..., None])
                    + jnp.sum(fb_o * wb * lm[..., None])) / B

        g_x = jax.jit(jax.grad(lambda *a: scalar("xla", *a),
                               argnums=(0, 1, 2, 3)))(params, f, fw, fs)
        g_k = jax.jit(jax.grad(lambda *a: scalar("fused", *a),
                               argnums=(0, 1, 2, 3)))(params, f, fw, fs)
        flat_x = jax.tree.leaves(g_x)
        flat_k = jax.tree.leaves(g_k)
        worst = 0.0
        for a, b in zip(flat_x, flat_k):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            amax = np.abs(a).max()
            if amax < 1e-2:
                # Mathematically-zero gradients (the attention KEY biases:
                # softmax is shift-invariant in the keys, so their true
                # grad is 0 and both sides compute O(1e-3) cancellation
                # noise — a relative comparison of two noises is
                # meaningless). Require the fused side to be equally tiny.
                ok_leaf = np.abs(b).max() < 5e-2
                worst = max(worst, 0.0 if ok_leaf else float("inf"))
                continue
            worst = max(worst, float(np.abs(a - b).max() / amax))
        # compiled XLA f32 matmuls on TPU default to single-pass MXU
        # (bf16-ish mantissas); the kernel runs HIGHEST — bf16-level bound.
        train_ok = worst < 3e-2
        print(f"{'PASS' if train_ok else 'FAIL'}  charades: fused SMI train "
              f"grads (max rel err {worst:.2e})")
        ok &= train_ok

    # Row-blocked fused ContentUnit train kernel (ActivityNet-scale path):
    # compiled gradient parity vs the XLA packed stack at Charades dims
    # (same kernel body; N=136 keeps the check's compile time sane).
    from video_moment_localization_tpu.ops import content_train_pallas as ctp

    cfg = ModelConfig(T=64, L=16, C=4, D=512, dl=128, num_smi_layers=2,
                      input_video_dim=1024, max_query_length=13,
                      lstm_hidden_size=256)
    if ctp.supports(cfg):
        B, Nq = 8, 13
        params = init_smin_params(jax.random.PRNGKey(3), cfg)
        f = jnp.asarray(rng.standard_normal((B, cfg.T, cfg.D)).astype(np.float32))
        fw = jnp.asarray(rng.standard_normal((B, Nq, cfg.D)).astype(np.float32))
        fs = jnp.asarray(rng.standard_normal((B, cfg.D)).astype(np.float32))
        qm = jnp.ones((B, Nq, 1), jnp.float32)
        length = np.ones((B, cfg.L), np.float32)
        length[1, cfg.L // 2 :] = 0
        lm = jnp.asarray(length)
        vm = packed_valid_mask(lm)
        wm = jnp.asarray(rng.standard_normal(
            (B, vm.shape[1], cfg.D)).astype(np.float32))
        wb = jnp.asarray(rng.standard_normal((B, cfg.L, cfg.D)).astype(np.float32))

        def scalar2(stack, p, f_, fw_, fs_):
            fc, fm_, fb = proposal_features_packed(f_, lm, cfg.L, cfg.C)
            if stack == "fused":
                fm_o, fb_o = ctp.smi_stack_content_train(
                    p, cfg, fc, fm_, fb, fw_, fs_, qm, lm, vm)
            else:
                vmask = vm.astype(f_.dtype)
                for p_layer in p["smi"]:
                    fc, fm_, fb = smi_block_packed(p_layer, fc, fm_, fb,
                                                   fw_, fs_, qm, lm, vmask,
                                                   cfg.L)
                fm_o, fb_o = fm_, fb
            return (jnp.sum(fm_o * wm * vm[..., None])
                    + jnp.sum(fb_o * wb * lm[..., None])) / B

        g_x = jax.jit(jax.grad(lambda *a: scalar2("xla", *a),
                               argnums=(0, 1, 2, 3)))(params, f, fw, fs)
        g_k = jax.jit(jax.grad(lambda *a: scalar2("fused", *a),
                               argnums=(0, 1, 2, 3)))(params, f, fw, fs)
        worst = 0.0
        for a, b in zip(jax.tree.leaves(g_x), jax.tree.leaves(g_k)):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            amax = np.abs(a).max()
            if amax < 1e-2:   # mathematically-zero grads (key biases)
                worst = max(worst,
                            0.0 if np.abs(b).max() < 5e-2 else float("inf"))
                continue
            worst = max(worst, float(np.abs(a - b).max() / amax))
        ct_ok = worst < 3e-2
        print(f"{'PASS' if ct_ok else 'FAIL'}  charades-dims: fused content "
              f"train grads (max rel err {worst:.2e})")
        ok &= ct_ok

    # Fused 2-layer biLSTM serving kernel vs the XLA scan.
    from video_moment_localization_tpu.models.lstm import (
        bilstm,
        init_bilstm_params,
    )
    from video_moment_localization_tpu.ops import lstm_pallas

    B, S, Din, H = 64, 13, 300, 256
    layers = init_bilstm_params(jax.random.PRNGKey(2), Din, H, 2)
    if lstm_pallas.supports(layers, S, B):
        x = jnp.asarray(rng.standard_normal((B, S, Din)).astype(np.float32))
        lengths = rng.integers(1, S + 1, size=B)
        qmask = jnp.asarray(
            (np.arange(S)[None] < lengths[:, None]).astype(np.float32))
        ref32 = jax.jit(lambda a, m: bilstm(a, m, layers))(x, qmask)
        got32 = jax.jit(
            lambda a, m: lstm_pallas.bilstm_fused(a, m, layers))(x, qmask)
        # fp32: XLA's DEFAULT-precision bf16-pass matmuls vs the kernel's
        # f32 accumulation — bf16-level tolerance.
        ok &= check("charades-dims: fused biLSTM fp32", [got32], [ref32],
                    rtol=2e-2, atol=2e-2)
        xb = x.astype(jnp.bfloat16)
        refb = jax.jit(lambda a, m: bilstm(a, m, layers))(xb, qmask)
        gotb = jax.jit(
            lambda a, m: lstm_pallas.bilstm_fused(a, m, layers))(xb, qmask)
        ok &= check("charades-dims: fused biLSTM bf16",
                    [np.asarray(gotb).astype(np.float32)],
                    [np.asarray(refb).astype(np.float32)],
                    rtol=5e-2, atol=5e-2)

    print("ALL KERNELS VERIFIED" if ok else "KERNEL MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
