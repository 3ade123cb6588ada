"""Row-blocked fused ContentUnit training kernel
(ops/content_train_pallas.py): forward and gradient parity with the
packed XLA SMI stack, in interpret mode on CPU. Compiled parity +
throughput are exercised on TPU by scripts/verify_kernels.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_moment_localization_tpu.config import ModelConfig
from video_moment_localization_tpu.models import init_smin_params
from video_moment_localization_tpu.models.smin import smi_block_packed
from video_moment_localization_tpu.ops import content_train_pallas as ctp
from video_moment_localization_tpu.ops.packing import packed_valid_mask
from video_moment_localization_tpu.ops.proposal import proposal_features_packed

CFG = ModelConfig(T=16, L=8, C=4, D=64, dl=32, num_smi_layers=2,
                  input_video_dim=12, max_query_length=6, lstm_hidden_size=32)


def _inputs(cfg, B=3, seed=0):
    rng = np.random.default_rng(seed)
    f = jnp.asarray(rng.standard_normal((B, cfg.T, cfg.D)).astype(np.float32))
    fw = jnp.asarray(
        rng.standard_normal((B, cfg.max_query_length, cfg.D)).astype(np.float32))
    fs = jnp.asarray(rng.standard_normal((B, cfg.D)).astype(np.float32))
    qmask = np.ones((B, cfg.max_query_length, 1), np.float32)
    qmask[0, 3:] = 0
    lmask = np.ones((B, cfg.L), np.float32)
    lmask[1 % B, cfg.L // 2 :] = 0
    return f, fw, fs, jnp.asarray(qmask), jnp.asarray(lmask)


def _xla_stack(params, cfg, fc, fm, fb, fw, fs, qmask, lmask, vmask):
    for p_layer in params["smi"]:
        fc, fm, fb = smi_block_packed(p_layer, fc, fm, fb, fw, fs,
                                      qmask, lmask, vmask, cfg.L)
    return fm, fb


def _fused_stack(params, cfg, fc, fm, fb, fw, fs, qmask, lmask, vmask):
    return ctp.smi_stack_content_train(params, cfg, fc, fm, fb, fw, fs,
                                       qmask, lmask, vmask, interpret=True)


def test_supports_and_bn():
    anet = ModelConfig(T=128, L=64, C=4, D=512, dl=128, max_query_length=20,
                       input_video_dim=500, lstm_hidden_size=256)
    assert ctp.supports(anet)
    assert ctp._pick_bn(2080, 4, 512) == 520          # activitynet
    assert ctp._pick_bn(136, 4, 512) == 136           # charades: one block
    with pytest.raises(ValueError):
        import os

        os.environ["VML_CONTENT_TRAIN_BN"] = "7"
        try:
            ctp._pick_bn(2080, 4, 512)
        finally:
            del os.environ["VML_CONTENT_TRAIN_BN"]


def test_forward_parity():
    params = init_smin_params(jax.random.PRNGKey(0), CFG)
    f, fw, fs, qmask, lmask = _inputs(CFG)
    vmask = packed_valid_mask(lmask)
    fc, fm, fb = proposal_features_packed(f, lmask, CFG.L, CFG.C)

    fm_x, fb_x = _xla_stack(params, CFG, fc, fm, fb, fw, fs, qmask, lmask,
                            vmask)
    fm_k, fb_k = _fused_stack(params, CFG, fc, fm, fb, fw, fs, qmask, lmask,
                              vmask)
    np.testing.assert_allclose(
        np.asarray(fm_k * vmask[..., None]),
        np.asarray(fm_x * vmask[..., None]), rtol=2e-5, atol=2e-5)
    lm3 = lmask[..., None]
    np.testing.assert_allclose(np.asarray(fb_k * lm3), np.asarray(fb_x * lm3),
                               rtol=2e-5, atol=2e-5)


def test_gradient_parity():
    params = init_smin_params(jax.random.PRNGKey(0), CFG)
    f, fw, fs, qmask, lmask = _inputs(CFG)
    vmask = packed_valid_mask(lmask)
    fc, fm, fb = proposal_features_packed(f, lmask, CFG.L, CFG.C)
    rng = np.random.default_rng(7)
    wm = jnp.asarray(rng.standard_normal(fm.shape).astype(np.float32))
    wb = jnp.asarray(rng.standard_normal(fb.shape).astype(np.float32))
    B = fc.shape[0]

    def scalar(stack_fn, p, fc_, fm_, fb_, fw_, fs_):
        fm_o, fb_o = stack_fn(p, CFG, fc_, fm_, fb_, fw_, fs_, qmask,
                              lmask, vmask)
        return (jnp.sum(fm_o * wm * vmask[..., None])
                + jnp.sum(fb_o * wb * lmask[..., None])) / B

    g_x = jax.grad(lambda *a: scalar(_xla_stack, *a),
                   argnums=(0, 1, 2, 3, 4, 5))(params, fc, fm, fb, fw, fs)
    g_k = jax.grad(lambda *a: scalar(_fused_stack, *a),
                   argnums=(0, 1, 2, 3, 4, 5))(params, fc, fm, fb, fw, fs)
    flat_x, tree_x = jax.tree.flatten(g_x)
    flat_k, tree_k = jax.tree.flatten(g_k)
    assert tree_x == tree_k
    for a, b in zip(flat_x, flat_k):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)
