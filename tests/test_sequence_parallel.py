"""Sequence-parallel pooling: sharded partial sums + reduce-scatter must
reproduce the single-device proposal features exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_moment_localization_tpu.ops.proposal import proposal_features
from video_moment_localization_tpu.parallel.sequence import (
    SEQ_AXIS,
    proposal_features_seq_sharded,
)


@pytest.mark.parametrize("n", [2, 4, 8])
def test_seq_sharded_matches_single_device(n):
    T, L, C, D, B = 64, 16, 4, 32, 3
    mesh = Mesh(np.asarray(jax.devices()[:n]), (SEQ_AXIS,))
    rng = np.random.default_rng(0)
    f_np = rng.standard_normal((B, T, D)).astype(np.float32)
    length = np.ones((B, L), np.float32)
    length[1, L // 2 :] = 0
    mm_np = np.triu(np.einsum("bi,bj->bij", length, length)).astype(np.float32)

    fc_ref, fm_ref, fb_ref = proposal_features(jnp.asarray(f_np), jnp.asarray(mm_np), L, C)

    f = jax.device_put(f_np, NamedSharding(mesh, P(None, SEQ_AXIS, None)))
    mm = jax.device_put(mm_np, NamedSharding(mesh, P(None, SEQ_AXIS, None)))
    fc, fm, fb = jax.jit(
        lambda f_, m_: proposal_features_seq_sharded(f_, m_, L, C, mesh)
    )(f, mm)

    assert len(fc.sharding.device_set) == n
    np.testing.assert_allclose(np.asarray(fc), np.asarray(fc_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fm), np.asarray(fm_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(fb_ref), rtol=2e-5, atol=2e-5)


def test_seq_sharded_bf16_dtype_preserved():
    T, L, C, D, B, n = 64, 16, 4, 32, 2, 4
    mesh = Mesh(np.asarray(jax.devices()[:n]), (SEQ_AXIS,))
    rng = np.random.default_rng(2)
    f = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32)).astype(jnp.bfloat16)
    mm = jnp.asarray(np.triu(np.ones((L, L), np.float32))[None].repeat(B, 0))
    f = jax.device_put(f, NamedSharding(mesh, P(None, SEQ_AXIS, None)))
    mm_s = jax.device_put(mm, NamedSharding(mesh, P(None, SEQ_AXIS, None)))
    fc, fm, fb = proposal_features_seq_sharded(f, mm_s, L, C, mesh)
    assert fc.dtype == fm.dtype == fb.dtype == jnp.bfloat16
    ref = proposal_features(f, mm, L, C)
    np.testing.assert_allclose(np.asarray(fc, dtype=np.float32),
                               np.asarray(ref[0], dtype=np.float32),
                               rtol=2e-2, atol=2e-2)
