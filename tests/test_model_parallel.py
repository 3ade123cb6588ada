"""Sequence-parallel full SMIN forward: exact agreement with the dense
single-device forward on 2/4/8-device meshes."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_moment_localization_tpu.config import ModelConfig
from video_moment_localization_tpu.data.pipeline import BatchLoader
from video_moment_localization_tpu.data.synthetic import SyntheticDataset
from video_moment_localization_tpu.models import init_smin_params, smin_forward
from video_moment_localization_tpu.parallel.model_parallel import (
    smin_forward_seq_sharded,
)
from video_moment_localization_tpu.parallel.sequence import SEQ_AXIS

CFG = ModelConfig(T=32, L=8, C=4, D=32, dl=8, num_smi_layers=2,
                  input_video_dim=12, max_query_length=6, lstm_hidden_size=16,
                  packed=False, use_pallas=False)


def _batch(B=4, seed=0):
    ds = SyntheticDataset(num_videos=B, queries_per_video=1, T=CFG.T, L=CFG.L,
                          max_query_length=CFG.max_query_length,
                          input_video_dim=CFG.input_video_dim, seed=seed)
    return next(iter(BatchLoader(ds, B, num_workers=1, seed=seed).epoch(0)))


@pytest.mark.parametrize("n", [2, 4, 8])
def test_seq_sharded_forward_matches_dense(n):
    mesh = Mesh(np.asarray(jax.devices()[:n]), (SEQ_AXIS,))
    params = init_smin_params(jax.random.PRNGKey(0), CFG)
    b = _batch(seed=4)
    args = tuple(jnp.asarray(b[k]) for k in
                 ("video_features", "video_mask", "query_features",
                  "query_mask", "length_mask", "moment_mask"))
    pm_ref, ps_ref, pe_ref, pa_ref = smin_forward(params, CFG, *args)

    shard_specs = (P(None, SEQ_AXIS, None), P(None, SEQ_AXIS, None),
                   P(), P(), P(), P(None, SEQ_AXIS, None))
    sharded = tuple(jax.device_put(a, NamedSharding(mesh, s))
                    for a, s in zip(args, shard_specs))
    pm, ps, pe, pa = jax.jit(
        lambda *a: smin_forward_seq_sharded(params, CFG, *a, mesh=mesh)
    )(*sharded)

    assert len(pm.sharding.device_set) == n
    np.testing.assert_allclose(np.asarray(pm), np.asarray(pm_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(ps_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pe), np.asarray(pe_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pa_ref), rtol=1e-4, atol=1e-5)


def test_seq_sharded_rejects_bad_mesh():
    mesh = Mesh(np.asarray(jax.devices()[:3]), (SEQ_AXIS,))
    params = init_smin_params(jax.random.PRNGKey(0), CFG)
    b = _batch()
    args = tuple(jnp.asarray(b[k]) for k in
                 ("video_features", "video_mask", "query_features",
                  "query_mask", "length_mask", "moment_mask"))
    with pytest.raises(ValueError, match="must divide"):
        smin_forward_seq_sharded(params, CFG, *args, mesh=mesh)
