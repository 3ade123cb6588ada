"""Triangular-packed layout: exact agreement with the dense path."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from video_moment_localization_tpu.config import ModelConfig
from video_moment_localization_tpu.data.pipeline import BatchLoader
from video_moment_localization_tpu.data.synthetic import SyntheticDataset
from video_moment_localization_tpu.models import init_smin_params, smin_forward
from video_moment_localization_tpu.ops.packing import (
    pack_map,
    packed_valid_mask,
    rowsum_packed,
    triu_packing,
    unpack_map,
)
from video_moment_localization_tpu.ops.proposal import (
    proposal_features,
    proposal_features_packed,
)
from video_moment_localization_tpu.parallel.mesh import device_batch
from video_moment_localization_tpu.parallel.steps import make_train_step

CFG_D = ModelConfig(T=16, L=8, C=4, D=32, dl=8, num_smi_layers=2,
                    input_video_dim=12, max_query_length=6, lstm_hidden_size=16,
                    packed=False, use_pallas=False)
CFG_P = dataclasses.replace(CFG_D, packed=True)


def _batch(B=4, seed=0, n_videos=4, packed_labels=False):
    ds = SyntheticDataset(num_videos=n_videos, queries_per_video=1, T=CFG_D.T,
                          L=CFG_D.L, max_query_length=CFG_D.max_query_length,
                          input_video_dim=CFG_D.input_video_dim, seed=seed)
    ds.packed_labels = packed_labels
    b = device_batch(next(iter(BatchLoader(ds, B, num_workers=1, seed=seed).epoch(0))))
    return {k: jnp.asarray(v) for k, v in b.items()}


def test_pack_unpack_roundtrip():
    L = 8
    rng = np.random.default_rng(0)
    dense = np.triu(rng.standard_normal((3, L, L)).astype(np.float32))
    packed = pack_map(jnp.asarray(dense), L)
    assert packed.shape == (3, L * (L + 1) // 2)
    np.testing.assert_array_equal(np.asarray(unpack_map(packed, L)), dense)


def test_packed_valid_mask_matches_moment_mask():
    length = np.asarray([[1, 1, 1, 0, 0, 0, 0, 0], [1] * 8], np.float32)
    mm = np.stack([np.triu(np.outer(l, l)) for l in length])
    vm = packed_valid_mask(jnp.asarray(length))
    np.testing.assert_array_equal(np.asarray(vm), np.asarray(pack_map(jnp.asarray(mm), 8)))


def test_rowsum_matches_dense_row_reduction():
    L, D = 8, 5
    rng = np.random.default_rng(1)
    dense = np.triu(
        rng.standard_normal((2, L, L, D)).astype(np.float32).transpose(0, 3, 1, 2)
    ).transpose(0, 2, 3, 1)  # upper-triangular over the (L, L) map dims
    packed = pack_map(jnp.asarray(dense), L)
    got = rowsum_packed(packed, L)
    np.testing.assert_allclose(np.asarray(got), dense.sum(axis=2), rtol=1e-5, atol=1e-5)


def test_packed_proposal_matches_dense():
    b = _batch()
    f = jnp.asarray(np.random.default_rng(2).standard_normal((4, 16, 12)).astype(np.float32))
    fc_d, fm_d, fb_d = proposal_features(f, b["moment_mask"], 8, 4)
    fc_p, fm_p, fb_p = proposal_features_packed(f, b["length_mask"], 8, 4)
    np.testing.assert_allclose(np.asarray(pack_map(fc_d, 8)), np.asarray(fc_p),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pack_map(fm_d, 8)), np.asarray(fm_p),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fb_d), np.asarray(fb_p), rtol=1e-6, atol=1e-7)


def test_packed_forward_matches_dense():
    params = init_smin_params(jax.random.PRNGKey(0), CFG_D)
    b = _batch(seed=3)
    args = tuple(b[k] for k in ("video_features", "video_mask", "query_features",
                                "query_mask", "length_mask", "moment_mask"))
    out_d = smin_forward(params, CFG_D, *args)
    out_p = smin_forward(params, CFG_P, *args)
    # Packed pm is (B, N); densify for comparison (zeros at invalid pairs
    # match the dense path's masking).
    out_p = (unpack_map(out_p[0], CFG_D.L),) + tuple(out_p[1:])
    for a, c in zip(out_p, out_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-5)


def test_packed_training_matches_dense():
    opt = optax.adam(1e-3)
    params0 = init_smin_params(jax.random.PRNGKey(1), CFG_D)
    results = {}
    for name, cfg in (("dense", CFG_D), ("packed", CFG_P)):
        # Each layout consumes its own label layout (same underlying data).
        b = _batch(seed=5, packed_labels=cfg.packed)
        params = jax.tree.map(jnp.array, params0)
        opt_state = opt.init(params)
        step = make_train_step(cfg, opt)
        for _ in range(3):
            params, opt_state, m = step(params, opt_state, b)
        results[name] = (float(m["loss"]), jax.tree.map(np.asarray, params))
    assert results["packed"][0] == pytest.approx(results["dense"][0], rel=2e-5)
    for a, c in zip(jax.tree.leaves(results["packed"][1]),
                    jax.tree.leaves(results["dense"][1])):
        np.testing.assert_allclose(a, c, rtol=3e-4, atol=3e-5)
