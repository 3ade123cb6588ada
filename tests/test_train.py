"""Training-stack tests: loss semantics, metrics vs brute force, soft-NMS,
optimization sanity, checkpoint round-trip."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from video_moment_localization_tpu.config import ModelConfig
from video_moment_localization_tpu.data.pipeline import BatchLoader
from video_moment_localization_tpu.data.synthetic import SyntheticDataset
from video_moment_localization_tpu.models import init_smin_params
from video_moment_localization_tpu.ops.nms import soft_nms_topk
from video_moment_localization_tpu.parallel.mesh import device_batch
from video_moment_localization_tpu.parallel.steps import make_eval_step, make_train_step
from video_moment_localization_tpu.train.loss import scaled_bce, smin_loss
from video_moment_localization_tpu.train.metrics import metric_names, recall_counts

CFG = ModelConfig(
    T=16, L=8, C=4, D=32, dl=8, num_smi_layers=2,
    input_video_dim=12, max_query_length=6, lstm_hidden_size=16,
)


def _batches(B=4, seed=0, n_videos=4, packed_labels=False):
    ds = SyntheticDataset(
        num_videos=n_videos, queries_per_video=1, T=CFG.T, L=CFG.L,
        max_query_length=CFG.max_query_length, input_video_dim=CFG.input_video_dim,
        seed=seed,
    )
    ds.packed_labels = packed_labels
    return [device_batch(b) for b in BatchLoader(ds, B, shuffle=False, num_workers=1, seed=seed).epoch(0)]


# --------------------------------------------------------------------- #
# Loss
# --------------------------------------------------------------------- #
def test_scaled_bce_hand_case():
    p = jnp.array([[0.8, 0.3]])
    y = jnp.array([[1.0, 0.0]])
    s = jnp.array([[0.6, 0.2]])
    mask = jnp.ones((1, 2))
    expected = (-(0.6 * math.log(0.8)) - (0.8 * math.log(0.7))) / 2.0
    got = float(scaled_bce(p, y, s, mask)[0])
    assert got == pytest.approx(expected, rel=1e-5)


def test_unweighted_bce_hand_case():
    p = jnp.array([[0.9, 0.1]])
    y = jnp.array([[1.0, 0.0]])
    mask = jnp.ones((1, 2))
    expected = (-(math.log(0.9)) - math.log(0.9)) / 2.0
    assert float(scaled_bce(p, y, None, mask)[0]) == pytest.approx(expected, rel=1e-5)


def test_bce_respects_mask_and_2d():
    p = jnp.array([[[0.5, 0.0], [0.0, 0.0]]])  # masked entries are exactly 0
    y = jnp.zeros((1, 2, 2))
    s = jnp.zeros((1, 2, 2))
    mask = jnp.array([[[1.0, 0.0], [0.0, 0.0]]])
    # only (0,0): -(1-0)*(1-0)*log(0.5)
    assert float(scaled_bce(p, y, s, mask)[0]) == pytest.approx(math.log(2.0), rel=1e-5)
    assert np.isfinite(float(scaled_bce(p, y, s, mask)[0]))


def test_smin_loss_ignores_padded_samples():
    batches = _batches(B=4, n_videos=3)  # last batch padded
    b = {k: jnp.asarray(v) for k, v in batches[0].items()}
    pm = jnp.full((4, CFG.L, CFG.L), 0.5) * b["moment_mask"]
    ps = pe = pa = jnp.full((4, CFG.L), 0.5) * b["length_mask"]
    loss_full, aux = smin_loss((pm, ps, pe, pa), b)
    assert float(aux["num_valid"]) == 3.0
    # recompute with only the 3 valid rows, no padding
    b3 = {k: v[:3] for k, v in b.items()}
    b3["sample_mask"] = jnp.ones(3)
    loss3, _ = smin_loss((pm[:3], ps[:3], pe[:3], pa[:3]), b3)
    assert float(loss_full) == pytest.approx(float(loss3), rel=1e-6)


# --------------------------------------------------------------------- #
# Metrics
# --------------------------------------------------------------------- #
def test_recall_counts_vs_bruteforce():
    rng = np.random.default_rng(0)
    B, L = 6, 8
    pm = rng.uniform(0.01, 1, (B, L, L)).astype(np.float32)
    ps = rng.uniform(0.01, 1, (B, L)).astype(np.float32)
    pe = rng.uniform(0.01, 1, (B, L)).astype(np.float32)
    sm = rng.uniform(0, 1, (B, L, L)).astype(np.float32)
    mm = np.triu(np.ones((L, L), np.float32))[None].repeat(B, 0)
    sample_mask = np.array([1, 1, 1, 1, 1, 0], np.float32)

    counts = np.asarray(recall_counts(
        jnp.asarray(pm), jnp.asarray(ps), jnp.asarray(pe),
        jnp.asarray(mm), jnp.asarray(sm), jnp.asarray(sample_mask),
    ))

    score = pm * np.sqrt(ps)[:, :, None] * np.sqrt(pe)[:, None, :] * mm
    flat = score.reshape(B, -1)
    order = np.argsort(-flat, axis=1)[:, :5]
    top_ious = np.take_along_axis(sm.reshape(B, -1), order, axis=1)
    for i, n in enumerate((1, 5)):
        for j, m in enumerate((0.1, 0.3, 0.5, 0.7)):
            expected = sum(
                bool((top_ious[b, :n] > m).any()) for b in range(B) if sample_mask[b]
            )
            assert counts[i, j] == expected, (n, m)


def test_metric_names_match_reference_strings():
    assert metric_names()[0] == "R@1, IoU=0.1"
    assert metric_names()[-1] == "R@5, IoU=0.7"
    assert len(metric_names()) == 8


def test_soft_nms_suppresses_duplicates():
    L = 8
    scores = np.zeros((1, L * L), np.float32)
    # proposal (0, 3) strong; (0, 4) nearly identical span slightly weaker;
    # (5, 7) disjoint and weaker still.
    scores[0, 0 * L + 3] = 0.9
    scores[0, 0 * L + 4] = 0.8
    scores[0, 5 * L + 7] = 0.5
    vals, idxs = soft_nms_topk(jnp.asarray(scores), L, k=2, sigma=0.25)
    idxs = np.asarray(idxs)[0]
    assert idxs[0] == 0 * L + 3
    # the overlapping (0,4) is decayed below the disjoint (5,7)
    assert idxs[1] == 5 * L + 7


# --------------------------------------------------------------------- #
# Train step
# --------------------------------------------------------------------- #
def test_train_step_learns():
    optimizer = optax.adam(5e-3)
    params = init_smin_params(jax.random.PRNGKey(0), CFG)
    opt_state = optimizer.init(params)
    step = make_train_step(CFG, optimizer)
    eval_step = make_eval_step(CFG)
    batch = {k: jnp.asarray(v) for k, v in
             _batches(B=4, n_videos=4, packed_labels=CFG.packed)[0].items()}

    loss0 = float(eval_step(params, batch)["loss"])
    for _ in range(40):
        params, opt_state, m = step(params, opt_state, batch)
    loss1 = float(m["loss"])
    assert np.isfinite(loss1)
    assert loss1 < loss0 * 0.6, (loss0, loss1)


def test_checkpoint_roundtrip(tmp_path):
    from video_moment_localization_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    optimizer = optax.adam(1e-3)
    params = init_smin_params(jax.random.PRNGKey(1), CFG)
    opt_state = optimizer.init(params)
    # advance a step so opt_state is nontrivial
    step = make_train_step(CFG, optimizer)
    batch = {k: jnp.asarray(v) for k, v in
             _batches(B=4, n_videos=4, packed_labels=CFG.packed)[0].items()}
    params, opt_state, _ = step(params, opt_state, batch)

    path = str(tmp_path / "exp_model.ckpt")
    save_checkpoint(path, epoch=7, params=params, opt_state=opt_state)
    restored = restore_checkpoint(
        path,
        jax.tree.map(np.asarray, params),
        jax.tree.map(np.asarray, opt_state),
    )
    assert restored["epoch"] == 7
    for a, b in zip(jax.tree.leaves(restored["params"]), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state structure is preserved (namedtuples intact)
    jax.tree.map(lambda a, b: None, restored["opt_state"], opt_state)
    # training can continue from the restored state
    p2, o2, m2 = step(restored["params"], restored["opt_state"], batch)
    assert np.isfinite(float(m2["loss"]))
