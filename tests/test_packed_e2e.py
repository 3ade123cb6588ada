"""Packed end-to-end pipeline: packed labels, loss, metrics, NMS, compat mode.

The default path never materializes an (L, L) map anywhere — data layer,
loss, metrics and serving all run in the packed (N = L(L+1)/2) layout —
while `compat_head` restores the dense reference-quirk behavior
(PARITY.md #16) bit-exactly.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_moment_localization_tpu.config import ModelConfig
from video_moment_localization_tpu.data import native
from video_moment_localization_tpu.data.labels import pack_triu
from video_moment_localization_tpu.data.pipeline import BatchLoader
from video_moment_localization_tpu.data.synthetic import SyntheticDataset
from video_moment_localization_tpu.models import init_smin_params, smin_forward
from video_moment_localization_tpu.ops.nms import soft_nms_topk
from video_moment_localization_tpu.ops.packing import pack_map, triu_packing
from video_moment_localization_tpu.parallel.mesh import device_batch
from video_moment_localization_tpu.train.loss import smin_loss
from video_moment_localization_tpu.train.metrics import (
    recall_counts,
    recall_counts_packed,
)

L = 8
N = L * (L + 1) // 2
CFG = ModelConfig(T=16, L=L, C=4, D=32, dl=8, num_smi_layers=2,
                  input_video_dim=12, max_query_length=6, lstm_hidden_size=16)


def _dataset(seed=0):
    return SyntheticDataset(num_videos=4, queries_per_video=1, T=CFG.T, L=CFG.L,
                            max_query_length=CFG.max_query_length,
                            input_video_dim=CFG.input_video_dim, seed=seed)


def _batch(packed_labels, seed=0):
    ds = _dataset(seed)
    ds.packed_labels = packed_labels
    b = device_batch(next(iter(BatchLoader(ds, 4, num_workers=1, seed=seed).epoch(0))))
    return {k: jnp.asarray(v) for k, v in b.items()}


# --------------------------------------------------------------------- #
# Data layer
# --------------------------------------------------------------------- #
def test_packed_sample_matches_dense_sample():
    ds_d, ds_p = _dataset(), _dataset()
    ds_p.packed_labels = True
    for i in range(len(ds_d)):
        d = ds_d.sample(i)
        p = ds_p.sample(i)
        assert "moment_mask" not in p
        assert p["sm"].shape == (N,)
        np.testing.assert_array_equal(p["sm"], pack_triu(d["sm"]))
        np.testing.assert_array_equal(p["ym"], pack_triu(d["ym"]))
        for k in ("ss", "ys", "se", "ye", "ya", "length_mask", "video_mask"):
            np.testing.assert_array_equal(p[k], d[k])


def test_native_packed_labels_match_numpy():
    if not native.available():
        pytest.skip("native library unavailable")
    import os

    for spos, epos, dur in ((1.0, 5.0, 10.0), (0.0, 9.9, 10.0), (2.5, 2.6, 7.0)):
        got = native.generate_labels_packed(spos, epos, dur, L)
        os.environ["VML_NATIVE"] = "0"
        try:
            want = native.generate_labels_packed(spos, epos, dur, L)
        finally:
            os.environ["VML_NATIVE"] = "1"
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, rtol=1e-6, atol=1e-6)
        vm_g, lm_g = native.build_masks_packed(11, CFG.T, L)
        os.environ["VML_NATIVE"] = "0"
        try:
            vm_w, lm_w = native.build_masks_packed(11, CFG.T, L)
        finally:
            os.environ["VML_NATIVE"] = "1"
        np.testing.assert_array_equal(vm_g, vm_w)
        np.testing.assert_array_equal(lm_g, lm_w)


# --------------------------------------------------------------------- #
# Loss / metrics equivalence
# --------------------------------------------------------------------- #
def test_packed_loss_equals_dense_loss():
    params = init_smin_params(jax.random.PRNGKey(0), CFG)
    bd = _batch(packed_labels=False)
    bp = _batch(packed_labels=True)
    dense_cfg = dataclasses.replace(CFG, packed=False, use_pallas=False)
    args_d = tuple(bd[k] for k in ("video_features", "video_mask", "query_features",
                                   "query_mask", "length_mask", "moment_mask"))
    out_d = smin_forward(params, dense_cfg, *args_d)
    out_p = (pack_map(out_d[0], L),) + tuple(out_d[1:])
    loss_d, _ = smin_loss(out_d, bd)
    loss_p, _ = smin_loss(out_p, bp)
    assert float(loss_p) == pytest.approx(float(loss_d), rel=1e-6)


def test_packed_metrics_equal_dense_for_nondegenerate_scores():
    # All valid scores strictly positive -> no top-k ties with masked slots,
    # so packed and dense selections are identical.
    rng = np.random.default_rng(3)
    B = 5
    pm_d = rng.uniform(0.05, 1, (B, L, L)).astype(np.float32)
    ps = jnp.asarray(rng.uniform(0.05, 1, (B, L)).astype(np.float32))
    pe = jnp.asarray(rng.uniform(0.05, 1, (B, L)).astype(np.float32))
    sm_d = rng.uniform(0, 1, (B, L, L)).astype(np.float32)
    lm = jnp.ones((B, L), jnp.float32)
    mm = jnp.asarray(np.triu(np.ones((L, L), np.float32))[None].repeat(B, 0))

    counts_d = recall_counts(jnp.asarray(pm_d) * mm, ps, pe, mm,
                             jnp.asarray(sm_d))
    counts_p = recall_counts_packed(
        pack_map(jnp.asarray(pm_d), L), ps, pe, lm,
        pack_map(jnp.asarray(sm_d), L),
    )
    np.testing.assert_array_equal(np.asarray(counts_d), np.asarray(counts_p))


def test_packed_nms_matches_dense_nms():
    rng = np.random.default_rng(4)
    B = 3
    pk = triu_packing(L)
    score_p = rng.uniform(0.1, 1, (B, N)).astype(np.float32)
    score_d = np.zeros((B, L * L), np.float32)
    score_d[:, pk.flat_idx] = score_p

    vals_d, idx_d = soft_nms_topk(jnp.asarray(score_d), L, k=3, sigma=0.4)
    vals_p, idx_p = soft_nms_topk(jnp.asarray(score_p), L, k=3, sigma=0.4,
                                  packed=True)
    np.testing.assert_allclose(np.asarray(vals_d), np.asarray(vals_p),
                               rtol=1e-6, atol=1e-7)
    # translate packed indices to dense-flat and compare selections
    np.testing.assert_array_equal(pk.flat_idx[np.asarray(idx_p)],
                                  np.asarray(idx_d))


# --------------------------------------------------------------------- #
# Compat mode
# --------------------------------------------------------------------- #
def test_compat_head_returns_dense_pm():
    cfg_c = dataclasses.replace(CFG, compat_head=True)
    params = init_smin_params(jax.random.PRNGKey(1), CFG)
    b = _batch(packed_labels=False, seed=2)
    args = tuple(b[k] for k in ("video_features", "video_mask", "query_features",
                                "query_mask", "length_mask", "moment_mask"))
    pm_c, *_ = smin_forward(params, cfg_c, *args)
    pm_p, *_ = smin_forward(params, CFG, *args)
    assert pm_c.shape == (4, L, L)
    assert pm_p.shape == (4, N)
    np.testing.assert_allclose(np.asarray(pack_map(pm_c, L)), np.asarray(pm_p),
                               rtol=1e-6, atol=1e-7)


def test_batched_labelgen_path_matches_per_sample(tmp_path):
    """BatchLoader's whole-batch native labelgen + preallocated feature
    buffer produce byte-comparable batches to the per-sample path."""
    from video_moment_localization_tpu.data import native
    from video_moment_localization_tpu.data.datasets import CharadesSTA
    from video_moment_localization_tpu.data.glove import WordEmbedding
    from video_moment_localization_tpu.data.synthetic import write_charades_style_dir

    if not native.available():
        pytest.skip("native library unavailable")
    root = write_charades_style_dir(str(tmp_path / "d"), num_videos=6,
                                    queries_per_video=3)
    emb = WordEmbedding.load(root + "/glove/glove.6B.300d.txt")
    ds = CharadesSTA(root, T=16, L=8, max_query_length=6, split="train",
                     embedding=emb)
    ds.packed_labels = True

    def epoch_batches():
        # two epochs: epoch 0 learns the feature width, epoch 1 uses the
        # preallocated-buffer path
        loader = BatchLoader(ds, 8, shuffle=True, num_workers=2, seed=5)
        list(loader.epoch(0))
        return list(loader.epoch(1))

    fast = epoch_batches()
    orig = native.available
    native.available = lambda: False  # force the per-sample fallback
    try:
        slow = epoch_batches()
    finally:
        native.available = orig
    assert len(fast) == len(slow) and len(fast) > 1  # incl. a padded batch
    for bf, bs in zip(fast, slow):
        assert set(bf) == set(bs)
        for k in bs:
            if isinstance(bs[k], np.ndarray):
                np.testing.assert_allclose(bf[k], bs[k], rtol=1e-6,
                                           atol=1e-6, err_msg=k)


def test_trainer_sets_packed_labels(tmp_path):
    from video_moment_localization_tpu.config import config_from_dict
    from video_moment_localization_tpu.data.synthetic import write_charades_style_dir
    from video_moment_localization_tpu.train.trainer import build_datasets

    root = write_charades_style_dir(str(tmp_path / "data"), num_videos=3,
                                    queries_per_video=1)
    raw = dict(model="SMIN", checkpoint_path=str(tmp_path), resume_training=False,
               T=16, L=8, C=4, d=32, input_video_dim=32, dl=8, max_query_length=6,
               lstm_hidden_size=16, num_smi_layers=1, dataset="charadessta",
               data_dir=root, batch_size=4, num_workers=1, seed=0,
               optimizer="Adam", lr=1e-3, num_epochs=1)
    cfg = config_from_dict(raw)
    train, evald = build_datasets(cfg)
    assert train.packed_labels and evald.packed_labels
    assert "moment_mask" not in train.sample(0)

    cfg_c = config_from_dict({**raw, "compat_head": True})
    train_c, _ = build_datasets(cfg_c)
    assert not train_c.packed_labels
    assert train_c.sample(0)["moment_mask"].shape == (8, 8)
