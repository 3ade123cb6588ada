"""Fused ContentUnit kernel: parity with the XLA packed unit (interpret
mode on CPU; compiled parity exercised on TPU by the perf harness)."""

import numpy as np
import pytest

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

CFG = ModelConfig(T=16, L=8, C=4, D=32, dl=8, num_smi_layers=1,
                  input_video_dim=12, max_query_length=6, lstm_hidden_size=16)


def _inputs(B=3, seed=0):
    rng = np.random.default_rng(seed)
    N = triu_packing(CFG.L).N
    f_c = jnp.asarray(rng.standard_normal((B, N, CFG.C, CFG.D)).astype(np.float32))
    f_w = jnp.asarray(rng.standard_normal((B, CFG.max_query_length, CFG.D)).astype(np.float32))
    f_s = jnp.asarray(rng.standard_normal((B, CFG.D)).astype(np.float32))
    f_m = jnp.asarray(rng.standard_normal((B, N, CFG.D)).astype(np.float32))
    qmask = np.ones((B, CFG.max_query_length, 1), np.float32)
    qmask[0, 3:] = 0  # ragged query
    vmask = np.ones((B, N), np.float32)
    vmask[1, N // 2 :] = 0  # short video
    return f_c, f_w, f_s, f_m, jnp.asarray(qmask), jnp.asarray(vmask)


def test_supports_thresholds():
    # v2 tiles arbitrarily large maps in row blocks — ActivityNet L=64
    # (N*C = 8,320 rows) is in scope, not a fallback.
    assert supports(8, 4) and supports(16, 4) and supports(64, 4)


def test_fused_multiblock_matches_xla_packed():
    # L=32 -> N*C = 2,112 rows > one block: exercises the row-block grid
    # (padding, per-block fm slices, block-crossing pair groups).
    import dataclasses

    cfg = dataclasses.replace(CFG, T=32, L=32, C=2)
    params = init_smin_params(jax.random.PRNGKey(4), cfg)
    p = params["smi"][0]["content"]
    rng = np.random.default_rng(5)
    N = triu_packing(cfg.L).N
    B = 2
    f_c = jnp.asarray(rng.standard_normal((B, N, cfg.C, cfg.D)).astype(np.float32))
    f_w = jnp.asarray(rng.standard_normal((B, cfg.max_query_length, cfg.D)).astype(np.float32))
    f_s = jnp.asarray(rng.standard_normal((B, cfg.D)).astype(np.float32))
    f_m = jnp.asarray(rng.standard_normal((B, N, cfg.D)).astype(np.float32))
    qmask = jnp.ones((B, cfg.max_query_length, 1), jnp.float32)
    vmask = np.ones((B, N), np.float32)
    vmask[0, N // 3 :] = 0
    ref = content_unit_packed(p, f_c, f_w, f_s, f_m, qmask, jnp.asarray(vmask))
    got = content_unit_fused(p, f_c, f_w, f_s, f_m, qmask, jnp.asarray(vmask), True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_matches_xla_packed():
    params = init_smin_params(jax.random.PRNGKey(0), CFG)
    p = params["smi"][0]["content"]
    f_c, f_w, f_s, f_m, qmask, vmask = _inputs()
    ref = content_unit_packed(p, f_c, f_w, f_s, f_m, qmask, vmask)
    got = content_unit_fused(p, f_c, f_w, f_s, f_m, qmask, vmask, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_grads_match_xla_packed():
    params = init_smin_params(jax.random.PRNGKey(1), CFG)
    p = params["smi"][0]["content"]
    f_c, f_w, f_s, f_m, qmask, vmask = _inputs(seed=2)
    g = jnp.asarray(np.random.default_rng(3).standard_normal(f_c.shape).astype(np.float32))

    def loss(fused, p_, fc_, fw_, fs_, fm_):
        if fused:
            out = content_unit_fused(p_, fc_, fw_, fs_, fm_, qmask, vmask, True)
        else:
            out = content_unit_packed(p_, fc_, fw_, fs_, fm_, qmask, vmask)
        return jnp.sum(out * g)

    args = (p, f_c, f_w, f_s, f_m)
    g_f = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2, 3, 4))(*args)
    g_x = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
