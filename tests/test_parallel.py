"""Data-parallel mesh tests on the virtual 8-device CPU mesh.

Validates that the sharded train step (batch split over the ``data`` axis,
params replicated, gradient all-reduce inserted by XLA) computes the same
numbers as the single-device step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from video_moment_localization_tpu.config import ModelConfig
from video_moment_localization_tpu.data.pipeline import BatchLoader
from video_moment_localization_tpu.data.synthetic import SyntheticDataset
from video_moment_localization_tpu.models import init_smin_params
from video_moment_localization_tpu.parallel.mesh import (
    device_batch,
    make_mesh,
    put_batch,
    put_replicated,
)
from video_moment_localization_tpu.parallel.steps import make_train_step

CFG = ModelConfig(
    T=16, L=8, C=4, D=32, dl=8, num_smi_layers=1,
    input_video_dim=12, max_query_length=6, lstm_hidden_size=16,
)


@pytest.fixture(scope="module")
def batch():
    ds = SyntheticDataset(num_videos=8, queries_per_video=1, T=CFG.T, L=CFG.L,
                          max_query_length=CFG.max_query_length,
                          input_video_dim=CFG.input_video_dim, seed=0)
    ds.packed_labels = CFG.packed
    return device_batch(next(iter(BatchLoader(ds, 8, num_workers=1, seed=0).epoch(0))))


def test_eight_cpu_devices_available():
    assert len(jax.devices()) == 8, (
        "conftest must force an 8-device CPU platform; got " f"{jax.devices()}"
    )


def test_sharded_step_matches_single_device(batch):
    optimizer = optax.adam(1e-3)
    base_params = init_smin_params(jax.random.PRNGKey(0), CFG)
    base_opt = optimizer.init(base_params)

    results = {}
    for n in (1, 8):
        mesh = make_mesh(n)
        params = put_replicated(jax.tree.map(jnp.array, base_params), mesh)
        opt_state = put_replicated(jax.tree.map(jnp.array, base_opt), mesh)
        step = make_train_step(CFG, optimizer)
        dbatch = put_batch(batch, mesh)
        for _ in range(3):
            params, opt_state, m = step(params, opt_state, dbatch)
        results[n] = (
            float(m["loss"]),
            np.asarray(m["counts"]),
            jax.tree.map(np.asarray, params),
        )

    loss1, counts1, p1 = results[1]
    loss8, counts8, p8 = results[8]
    assert loss8 == pytest.approx(loss1, rel=2e-4)
    np.testing.assert_array_equal(counts1, counts8)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)


def test_batch_actually_sharded(batch):
    mesh = make_mesh(8)
    dbatch = put_batch(batch, mesh)
    vf = dbatch["video_features"]
    assert len(vf.sharding.device_set) == 8
    # each device holds 1/8 of the batch axis
    shard = vf.addressable_shards[0]
    assert shard.data.shape[0] == vf.shape[0] // 8
