"""Fused SMI-stack serving kernel: parity with the packed XLA pipeline
(interpret mode on CPU; compiled parity exercised on TPU by
scripts/verify_kernels.py)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_moment_localization_tpu.config import ModelConfig
from video_moment_localization_tpu.models import init_smin_params
from video_moment_localization_tpu.models.smin import (
    localization_packed,
    smi_block_packed,
)
from video_moment_localization_tpu.ops.packing import packed_valid_mask, triu_packing
from video_moment_localization_tpu.ops.proposal import proposal_features_packed
from video_moment_localization_tpu.ops.smin_pallas import (
    smin_stack_fused,
    supports,
)

CFG = ModelConfig(T=16, L=8, C=4, D=64, dl=32, num_smi_layers=3,
                  input_video_dim=12, max_query_length=6, lstm_hidden_size=32)


def _xla_reference(params, cfg, f, fw, fs, qmask, lmask):
    """The packed XLA pipeline the kernel fuses (proposal -> SMI x n ->
    heads), as wired in models/smin.py smin_forward."""
    vmask = packed_valid_mask(lmask.astype(jnp.float32)).astype(f.dtype)
    fc, fm, fb = proposal_features_packed(f, lmask, cfg.L, cfg.C)
    for p_layer in params["smi"]:
        fc, fm, fb = smi_block_packed(p_layer, fc, fm, fb, fw, fs,
                                      qmask, lmask, vmask, cfg.L)
    return localization_packed(params["localization"], fm, fb, lmask,
                               vmask, cfg.L)


def _inputs(cfg, B=4, seed=0):
    rng = np.random.default_rng(seed)
    f = jnp.asarray(rng.standard_normal((B, cfg.T, cfg.D)).astype(np.float32))
    fw = jnp.asarray(
        rng.standard_normal((B, cfg.max_query_length, cfg.D)).astype(np.float32))
    fs = jnp.asarray(rng.standard_normal((B, cfg.D)).astype(np.float32))
    qmask = np.ones((B, cfg.max_query_length, 1), np.float32)
    qmask[0, 3:] = 0                      # ragged query
    lmask = np.ones((B, cfg.L), np.float32)
    lmask[1 % B, cfg.L // 2 :] = 0        # short video
    return f, fw, fs, jnp.asarray(qmask), jnp.asarray(lmask)


def test_supports_gates_on_vmem():
    assert supports(8, 4, 64)             # tiny
    assert supports(16, 4, 512)           # charades
    assert supports(32, 4, 512)           # tacos
    assert supports(64, 4, 512)           # activitynet (BB=1, round 3)
    assert not supports(128, 4, 512)      # 33k-row map: beyond VMEM/rows


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_stack_matches_xla_packed(seed):
    params = init_smin_params(jax.random.PRNGKey(7 + seed), CFG)
    f, fw, fs, qmask, lmask = _inputs(CFG, B=4, seed=seed)
    vmask = packed_valid_mask(lmask)

    want = _xla_reference(params, CFG, f, fw, fs, qmask, lmask)
    got = smin_stack_fused(params, CFG, f, fw, fs, qmask, lmask, vmask,
                           interpret=True)
    for g, w_, name in zip(got, want, ("pm", "ps", "pe", "pa")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_fused_stack_single_layer_and_bb1():
    """1 SMI layer and a batch size forcing BB=1."""
    cfg = dataclasses.replace(CFG, num_smi_layers=1)
    params = init_smin_params(jax.random.PRNGKey(3), cfg)
    f, fw, fs, qmask, lmask = _inputs(cfg, B=3, seed=2)  # B=3 -> BB=1
    vmask = packed_valid_mask(lmask)
    want = _xla_reference(params, cfg, f, fw, fs, qmask, lmask)
    got = smin_stack_fused(params, cfg, f, fw, fs, qmask, lmask, vmask,
                           interpret=True)
    for g, w_, name in zip(got, want, ("pm", "ps", "pe", "pa")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_fused_stack_tacos_shape_paths():
    """L=32 / Nq=14 / uneven masks — the other supported production scale
    (shrunk D for CPU interpret speed; geometry/indexing paths identical)."""
    cfg = dataclasses.replace(CFG, T=128, L=32, C=4, D=96, dl=32,
                              lstm_hidden_size=48,
                              max_query_length=14, num_smi_layers=2)
    params = init_smin_params(jax.random.PRNGKey(5), cfg)
    f, fw, fs, qmask, lmask = _inputs(cfg, B=2, seed=4)
    vmask = packed_valid_mask(lmask)
    want = _xla_reference(params, cfg, f, fw, fs, qmask, lmask)
    got = smin_stack_fused(params, cfg, f, fw, fs, qmask, lmask, vmask,
                           interpret=True)
    for g, w_, name in zip(got, want, ("pm", "ps", "pe", "pa")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_fused_stack_bf16_close():
    params = init_smin_params(jax.random.PRNGKey(11), CFG)
    f, fw, fs, qmask, lmask = _inputs(CFG, B=4, seed=3)
    vmask = packed_valid_mask(lmask)
    bf = jnp.bfloat16
    want = _xla_reference(params, CFG, f.astype(bf), fw.astype(bf),
                          fs.astype(bf), qmask, lmask)
    got = smin_stack_fused(params, CFG, f.astype(bf), fw.astype(bf),
                           fs.astype(bf), qmask, lmask, vmask, interpret=True)
    # bf16 rounding diverges slightly between the two op orderings and is
    # amplified through 3 recurrent layers: require close agreement in bulk
    # and bounded outliers (scores live in [0, 1]).
    for g, w_, name in zip(got, want, ("pm", "ps", "pe", "pa")):
        diff = np.abs(np.asarray(g, np.float32) - np.asarray(w_, np.float32))
        assert np.mean(diff) < 0.01, (name, np.mean(diff))
        assert np.quantile(diff, 0.98) < 0.05, (name, np.quantile(diff, 0.98))
        assert diff.max() < 0.3, (name, diff.max())


def test_fused_stack_activitynet_geometry():
    """L=64 (N=2080, 8320-row cells at BB=1) — the ActivityNet map enabled
    in round 3 (shrunk D for CPU interpret speed; the c-major row geometry,
    block-diag masks and BB=1 pick are what this exercises)."""
    cfg = dataclasses.replace(CFG, T=128, L=64, C=4, D=32, dl=16,
                              lstm_hidden_size=16,
                              max_query_length=10, num_smi_layers=2)
    assert supports(cfg.L, cfg.C, cfg.D)
    params = init_smin_params(jax.random.PRNGKey(9), cfg)
    f, fw, fs, qmask, lmask = _inputs(cfg, B=1, seed=6)
    vmask = packed_valid_mask(lmask)
    want = _xla_reference(params, cfg, f, fw, fs, qmask, lmask)
    got = smin_stack_fused(params, cfg, f, fw, fs, qmask, lmask, vmask,
                           interpret=True)
    for g, w_, name in zip(got, want, ("pm", "ps", "pe", "pa")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)
