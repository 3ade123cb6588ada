"""Packed sequence-parallel: pair-chunk sharding matches single-device
packed numerics, including padded chunks, 2-D training, and a long-video
(T=512) stress config at model dimensions D=512 (VERDICT r1 item 6)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from video_moment_localization_tpu.config import ModelConfig
from video_moment_localization_tpu.data.pipeline import BatchLoader
from video_moment_localization_tpu.data.synthetic import SyntheticDataset
from video_moment_localization_tpu.models import init_smin_params, smin_forward
from video_moment_localization_tpu.parallel.mesh import device_batch
from video_moment_localization_tpu.parallel.model_parallel import (
    SEQ_AXIS,
    make_train_step_2d,
    put_batch_2d,
    smin_forward_seq_sharded_packed,
)
from video_moment_localization_tpu.parallel.steps import make_train_step

CFG = ModelConfig(T=16, L=8, C=4, D=32, dl=8, num_smi_layers=2,
                  input_video_dim=12, max_query_length=6, lstm_hidden_size=16,
                  use_pallas=False)


def _host_batch(cfg, B, seed=0, packed=True):
    ds = SyntheticDataset(num_videos=B, queries_per_video=1, T=cfg.T, L=cfg.L,
                          max_query_length=cfg.max_query_length,
                          input_video_dim=cfg.input_video_dim, seed=seed)
    ds.packed_labels = packed
    return device_batch(next(iter(BatchLoader(ds, B, num_workers=1,
                                              seed=seed).epoch(0))))


@pytest.mark.parametrize("cfg,n", [
    (CFG, 2),
    (CFG, 4),
    # L=6 -> N=21 pairs, N_pad=22: exercises the padded final chunk.
    (dataclasses.replace(CFG, T=24, L=6), 2),
])
def test_packed_seq_forward_matches_single_device(cfg, n):
    mesh = Mesh(np.asarray(jax.devices()[:n]), (SEQ_AXIS,))
    b = {k: jnp.asarray(v) for k, v in _host_batch(cfg, B=3).items()}
    params = init_smin_params(jax.random.PRNGKey(0), cfg)

    ref = smin_forward(params, cfg, b["video_features"], b["video_mask"],
                       b["query_features"], b["query_mask"],
                       b["length_mask"], None)
    got = jax.jit(lambda p, *a: smin_forward_seq_sharded_packed(
        p, cfg, *a, mesh=mesh))(
        params, b["video_features"], b["video_mask"],
        b["query_features"], b["query_mask"], b["length_mask"])
    for a, c in zip(got, ref):
        assert a.shape == c.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_packed_2d_training_matches_single_device(shape):
    nd, ns = shape
    mesh = Mesh(np.asarray(jax.devices()[: nd * ns]).reshape(nd, ns),
                ("data", "seq"))
    B = 2 * nd
    host_batch = _host_batch(CFG, B, seed=1)

    optimizer = optax.adam(1e-3)
    params0 = init_smin_params(jax.random.PRNGKey(1), CFG)

    params = jax.tree.map(jnp.array, params0)
    opt_state = optimizer.init(params)
    step = make_train_step(CFG, optimizer)
    jb = {k: jnp.asarray(v) for k, v in host_batch.items()}
    for _ in range(3):
        params, opt_state, m_ref = step(params, opt_state, jb)
    ref_params = jax.tree.map(np.asarray, params)

    params2 = jax.tree.map(jnp.array, params0)
    opt_state2 = optimizer.init(params2)
    step2d = make_train_step_2d(CFG, optimizer, mesh)
    batch2d = put_batch_2d(host_batch, mesh)
    for _ in range(3):
        params2, opt_state2, m_2d = step2d(params2, opt_state2, batch2d)

    assert float(m_2d["loss"]) == pytest.approx(float(m_ref["loss"]), rel=2e-4)
    np.testing.assert_array_equal(np.asarray(m_2d["counts"]),
                                  np.asarray(m_ref["counts"]))
    for a, c in zip(jax.tree.leaves(jax.tree.map(np.asarray, params2)),
                    jax.tree.leaves(ref_params)):
        np.testing.assert_allclose(a, c, rtol=3e-4, atol=3e-5)


def test_long_video_stress_packed_seq_train_step():
    """T=512 long-video config at real model width (D=512, dl=128): one
    packed 2-D (2 data x 4 seq) train step compiles and produces finite
    loss/grads on the virtual mesh — the SURVEY §5.7 scale path at flagship
    dimensions, not toy shapes."""
    cfg = ModelConfig(T=512, L=32, C=4, D=512, dl=128, num_smi_layers=1,
                      input_video_dim=64, max_query_length=8,
                      lstm_hidden_size=256, use_pallas=False)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "seq"))
    B = 2
    ds = SyntheticDataset(num_videos=B, queries_per_video=1, T=cfg.T, L=cfg.L,
                          max_query_length=cfg.max_query_length,
                          input_video_dim=cfg.input_video_dim, seed=3,
                          min_clips=300, max_clips=600)
    ds.packed_labels = True
    host_batch = device_batch(next(iter(BatchLoader(ds, B, num_workers=1,
                                                    seed=3).epoch(0))))
    optimizer = optax.adam(1e-3)
    params = init_smin_params(jax.random.PRNGKey(2), cfg)
    opt_state = optimizer.init(params)
    step2d = make_train_step_2d(cfg, optimizer, mesh)
    p2, o2, m = step2d(params, opt_state, put_batch_2d(host_batch, mesh))
    assert np.isfinite(float(m["loss"]))
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(jax.tree.map(np.asarray, p2)))
