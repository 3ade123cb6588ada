"""Tests for proposal-map geometry and the prefix-sum proposal op."""

import jax.numpy as jnp
import numpy as np
import pytest

from video_moment_localization_tpu.ops import (
    content_matrix,
    content_segments,
    proposal_features,
)


def _dense_wc_loop(T, L, C):
    """Literal triple-loop oracle mirroring the reference definition
    (reference models.py:88-98)."""
    Wc = np.zeros((L, L, C, T), np.float32)
    for i in range(L):
        for j in range(i, L):
            window_size = (j - i) + 1
            window_start, num_frames = i * (T // L), window_size * (T // L)
            clip_size = max(1, num_frames // C)
            for c in range(min(C, num_frames)):
                clip_start = window_start + c * clip_size
                Wc[i, j, c, clip_start : clip_start + clip_size] = 1.0 / clip_size
    return Wc


@pytest.mark.parametrize("T,L,C", [(64, 16, 4), (16, 8, 4), (128, 64, 4), (128, 32, 4)])
def test_content_matrix_matches_loop_oracle(T, L, C):
    np.testing.assert_array_equal(content_matrix(T, L, C), _dense_wc_loop(T, L, C))


def test_segments_partial_clip_edge():
    # T/L = 2: single-snippet moments have num_frames=2 < C=4 -> only 2 clips
    seg = content_segments(16, 8, 4)
    assert seg.sizes[0, 0, 0] == 1 and seg.sizes[0, 0, 1] == 1
    assert seg.sizes[0, 0, 2] == 0 and seg.sizes[0, 0, 3] == 0
    assert seg.weights[3, 1, 0] == 0  # lower triangle invalid


@pytest.mark.parametrize("T,L,C,D,B", [(16, 8, 4, 12, 3), (64, 16, 4, 8, 2)])
def test_proposal_features_match_dense_einsum(T, L, C, D, B):
    rng = np.random.default_rng(0)
    f = rng.standard_normal((B, T, D)).astype(np.float32)
    # moment mask with a short video in the batch
    length = np.ones((B, L), np.float32)
    length[0, L // 2 :] = 0
    mm = np.triu(np.einsum("bi,bj->bij", length, length)).astype(np.float32)

    Wc = content_matrix(T, L, C)
    fc_ref = np.einsum("lmit,btj->blmij", Wc, f) * mm[..., None, None]
    fm_ref = fc_ref.mean(axis=3)
    fb_ref = f.reshape(B, L, T // L, D).mean(axis=2)

    fc, fm, fb = proposal_features(jnp.asarray(f), jnp.asarray(mm), L, C)
    np.testing.assert_allclose(np.asarray(fc), fc_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fm), fm_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fb), fb_ref, rtol=2e-5, atol=2e-5)


def test_proposal_features_grad_matches_dense():
    """Autodiff of the prefix-sum gather == autodiff of the dense einsum."""
    import jax

    T, L, C, D, B = 16, 8, 4, 6, 2
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    mm = jnp.asarray(np.triu(np.ones((L, L), np.float32)))[None].repeat(B, 0)
    Wc = jnp.asarray(content_matrix(T, L, C))
    g = jnp.asarray(rng.standard_normal((B, L, L, C, D)).astype(np.float32))

    def loss_ours(x):
        fc, fm, fb = proposal_features(x, mm, L, C)
        return jnp.sum(fc * g) + jnp.sum(fm) + jnp.sum(fb)

    def loss_dense(x):
        fc = jnp.einsum("lmit,btj->blmij", Wc, x) * mm[..., None, None]
        fm = jnp.mean(fc, axis=3)
        fb = jnp.mean(x.reshape(B, L, T // L, D), axis=2)
        return jnp.sum(fc * g) + jnp.sum(fm) + jnp.sum(fb)

    g1 = jax.grad(loss_ours)(f)
    g2 = jax.grad(loss_dense)(f)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)
