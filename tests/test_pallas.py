"""Fused Pallas proposal-kernel tests (interpret mode on CPU; the same
kernel is exercised compiled on real TPU hardware by bench.py and the
manual parity harness)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_moment_localization_tpu.ops.proposal import proposal_features
from video_moment_localization_tpu.ops.proposal_pallas import proposal_features_pallas


@pytest.mark.parametrize("T,L,C,D,B", [(16, 8, 4, 128, 3), (64, 16, 4, 256, 2)])
def test_pallas_kernel_matches_xla_path(T, L, C, D, B):
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    length = np.ones((B, L), np.float32)
    length[0, L // 2 :] = 0
    mm = jnp.asarray(np.triu(np.einsum("bi,bj->bij", length, length)).astype(np.float32))

    fc_x, fm_x, fb_x = proposal_features(f, mm, L, C)
    fc_p, fm_p, fb_p = proposal_features_pallas(f, mm, L, C, True)  # interpret

    np.testing.assert_allclose(np.asarray(fc_p), np.asarray(fc_x), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fm_p), np.asarray(fm_x), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fb_p), np.asarray(fb_x), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("T,L,C,D,B", [(16, 8, 4, 128, 3), (64, 16, 4, 256, 2)])
def test_packed_pallas_kernel_matches_xla_packed(T, L, C, D, B):
    from video_moment_localization_tpu.ops.proposal import proposal_features_packed
    from video_moment_localization_tpu.ops.proposal_pallas import (
        proposal_features_packed_pallas,
    )

    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    length = np.ones((B, L), np.float32)
    length[0, L // 2 :] = 0
    lm = jnp.asarray(length)

    fc_x, fm_x, fb_x = proposal_features_packed(f, lm, L, C)
    fc_p, fm_p, fb_p = proposal_features_packed_pallas(f, lm, L, C, True)
    np.testing.assert_allclose(np.asarray(fc_p), np.asarray(fc_x), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fm_p), np.asarray(fm_x), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fb_p), np.asarray(fb_x), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("ragged", [False, True])
def test_packed_pallas_grad_matches_xla_packed(ragged):
    # Exercises the fused Pallas backward (transposed row-block matmul,
    # dfm/dfb folding, mask handling) against autodiff of the XLA path.
    from video_moment_localization_tpu.ops.proposal import proposal_features_packed
    from video_moment_localization_tpu.ops.proposal_pallas import (
        proposal_features_packed_pallas,
    )

    T, L, C, D, B = 16, 8, 4, 128, 2
    rng = np.random.default_rng(4)
    f = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    length = np.ones((B, L), np.float32)
    if ragged:
        length[0, L // 2:] = 0
        length[1, 3:] = 0
    lm = jnp.asarray(length)
    N = L * (L + 1) // 2
    g = jnp.asarray(rng.standard_normal((B, N, C, D)).astype(np.float32))

    def loss(pallas, f_):
        if pallas:
            fc, fm, fb = proposal_features_packed_pallas(f_, lm, L, C, True)
        else:
            fc, fm, fb = proposal_features_packed(f_, lm, L, C)
        return jnp.sum(fc * g) + jnp.sum(fm) + jnp.sum(fb)

    g_p = jax.grad(lambda x: loss(True, x))(f)
    g_x = jax.grad(lambda x: loss(False, x))(f)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-4)


def test_pallas_kernel_grad_matches_xla_path():
    T, L, C, D, B = 16, 8, 4, 128, 2
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    mm = jnp.asarray(np.triu(np.ones((L, L), np.float32))[None].repeat(B, 0))
    g = jnp.asarray(rng.standard_normal((B, L, L, C, D)).astype(np.float32))

    def loss(fn_is_pallas, f_):
        if fn_is_pallas:
            fc, fm, fb = proposal_features_pallas(f_, mm, L, C, True)
        else:
            fc, fm, fb = proposal_features(f_, mm, L, C)
        return jnp.sum(fc * g) + jnp.sum(fm) + jnp.sum(fb)

    g_p = jax.grad(lambda x: loss(True, x))(f)
    g_x = jax.grad(lambda x: loss(False, x))(f)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-4)
