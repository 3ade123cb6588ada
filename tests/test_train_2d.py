"""2-D (data x seq) mesh training: numerics match the single-device step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from video_moment_localization_tpu.config import ModelConfig
from video_moment_localization_tpu.data.pipeline import BatchLoader
from video_moment_localization_tpu.data.synthetic import SyntheticDataset
from video_moment_localization_tpu.models import init_smin_params
from video_moment_localization_tpu.parallel.mesh import device_batch
from video_moment_localization_tpu.parallel.model_parallel import (
    make_train_step_2d,
    put_batch_2d,
)
from video_moment_localization_tpu.parallel.steps import make_train_step

CFG = ModelConfig(T=32, L=8, C=4, D=32, dl=8, num_smi_layers=2,
                  input_video_dim=12, max_query_length=6, lstm_hidden_size=16,
                  packed=False, use_pallas=False)


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_2d_mesh_training_matches_single_device(shape):
    nd, ns = shape
    mesh = Mesh(np.asarray(jax.devices()[: nd * ns]).reshape(nd, ns),
                ("data", "seq"))
    B = 2 * nd
    ds = SyntheticDataset(num_videos=B, queries_per_video=1, T=CFG.T, L=CFG.L,
                          max_query_length=CFG.max_query_length,
                          input_video_dim=CFG.input_video_dim, seed=0)
    host_batch = device_batch(next(iter(BatchLoader(ds, B, num_workers=1, seed=0).epoch(0))))

    optimizer = optax.adam(1e-3)
    params0 = init_smin_params(jax.random.PRNGKey(0), CFG)

    # single-device reference trajectory
    params = jax.tree.map(jnp.array, params0)
    opt_state = optimizer.init(params)
    step = make_train_step(CFG, optimizer)
    jb = {k: jnp.asarray(v) for k, v in host_batch.items()}
    for _ in range(3):
        params, opt_state, m_ref = step(params, opt_state, jb)
    ref_params = jax.tree.map(np.asarray, params)

    # 2-D mesh trajectory
    params2 = jax.tree.map(jnp.array, params0)
    opt_state2 = optimizer.init(params2)
    step2d = make_train_step_2d(CFG, optimizer, mesh)
    batch2d = put_batch_2d(host_batch, mesh)
    for _ in range(3):
        params2, opt_state2, m_2d = step2d(params2, opt_state2, batch2d)

    assert float(m_2d["loss"]) == pytest.approx(float(m_ref["loss"]), rel=2e-4)
    np.testing.assert_array_equal(np.asarray(m_2d["counts"]),
                                  np.asarray(m_ref["counts"]))
    for a, b in zip(jax.tree.leaves(jax.tree.map(np.asarray, params2)),
                    jax.tree.leaves(ref_params)):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)
