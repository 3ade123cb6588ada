"""SMIN model tests: shapes, masking invariants, and full forward parity
against the reference implementation (used as a numerical oracle when
present at /root/reference; skipped elsewhere)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_moment_localization_tpu.config import ModelConfig
from video_moment_localization_tpu.data.pipeline import BatchLoader
from video_moment_localization_tpu.data.synthetic import SyntheticDataset
from video_moment_localization_tpu.models import init_smin_params, smin_forward

CFG = ModelConfig(
    T=16, L=8, C=4, D=32, dl=8, num_smi_layers=2,
    input_video_dim=12, max_query_length=6, lstm_hidden_size=16,
)


def _batch(B=4, seed=0):
    ds = SyntheticDataset(
        num_videos=B, queries_per_video=1, T=CFG.T, L=CFG.L,
        max_query_length=CFG.max_query_length, input_video_dim=CFG.input_video_dim,
        seed=seed,
    )
    return next(iter(BatchLoader(ds, B, shuffle=False, num_workers=1, seed=seed).epoch(0)))


def _forward_args(batch):
    return tuple(
        jnp.asarray(batch[k])
        for k in ("video_features", "video_mask", "query_features",
                  "query_mask", "length_mask", "moment_mask")
    )


def test_forward_shapes_and_ranges():
    params = init_smin_params(jax.random.PRNGKey(0), CFG)
    batch = _batch()
    pm, ps, pe, pa = jax.jit(
        lambda p, *a: smin_forward(p, CFG, *a)
    )(params, *_forward_args(batch))
    B, L = 4, CFG.L
    # Default packed head: pm lives on the N = L(L+1)/2 valid pairs.
    assert pm.shape == (B, L * (L + 1) // 2)
    assert ps.shape == pe.shape == pa.shape == (B, L)
    for x in (pm, ps, pe, pa):
        x = np.asarray(x)
        assert np.isfinite(x).all() and (x >= 0).all() and (x <= 1).all()


def test_forward_respects_masks():
    """Scores are exactly zero outside valid moments/snippets."""
    params = init_smin_params(jax.random.PRNGKey(1), CFG)
    batch = _batch(seed=3)
    from video_moment_localization_tpu.ops.packing import packed_valid_mask

    pm, ps, pe, pa = smin_forward(params, CFG, *_forward_args(batch))
    lm = np.asarray(batch["length_mask"])
    vmask = np.asarray(packed_valid_mask(jnp.asarray(lm)))
    assert np.all(np.asarray(pm)[vmask == 0] == 0)
    for x in (ps, pe, pa):
        assert np.all(np.asarray(x)[lm == 0] == 0)


def test_forward_batch_independence():
    """Padded/extra batch rows don't change other rows' outputs."""
    params = init_smin_params(jax.random.PRNGKey(2), CFG)
    batch = _batch(B=4, seed=5)
    args = _forward_args(batch)
    pm_full, *_ = smin_forward(params, CFG, *args)
    args_half = tuple(a[:2] for a in args)
    pm_half, *_ = smin_forward(params, CFG, *args_half)
    np.testing.assert_allclose(np.asarray(pm_full)[:2], np.asarray(pm_half),
                               rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------------- #
# Reference-oracle parity (torch CPU)
# --------------------------------------------------------------------- #
@pytest.mark.skipif(
    not os.path.exists("/root/reference/models.py"),
    reason="reference implementation not available",
)
def test_full_forward_parity_with_reference():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        import importlib

        ref_models = importlib.import_module("models")
    finally:
        sys.path.remove("/root/reference")

    torch.manual_seed(0)
    ref = ref_models.SMIN(
        T=CFG.T, L=CFG.L, C=CFG.C, D=CFG.D, dl=CFG.dl,
        num_smi_layers=CFG.num_smi_layers, input_video_dim=CFG.input_video_dim,
        max_query_length=CFG.max_query_length, lstm_hidden_size=CFG.lstm_hidden_size,
        device="cpu",
    )
    ref.eval()

    batch = _batch(B=4, seed=7)
    tb = {k: torch.from_numpy(np.asarray(batch[k])) for k in
          ("video_features", "video_mask", "query_features", "query_mask",
           "length_mask", "moment_mask")}
    with torch.no_grad():
        pm_r, ps_r, pe_r, pa_r = ref(
            tb["video_features"], tb["video_mask"], tb["query_features"],
            tb["query_mask"], tb["length_mask"], tb["moment_mask"],
        )

    from video_moment_localization_tpu.models.port import params_from_torch_state_dict

    params = jax.tree.map(jnp.asarray, params_from_torch_state_dict(ref.state_dict(), CFG))
    pm, ps, pe, pa = smin_forward(params, CFG, *_forward_args(batch))
    if CFG.packed:  # densify the packed head for the torch oracle
        from video_moment_localization_tpu.ops.packing import unpack_map

        pm = unpack_map(pm, CFG.L)

    np.testing.assert_allclose(np.asarray(pm), pm_r.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ps), ps_r.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pe), pe_r.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pa), pa_r.numpy(), rtol=1e-4, atol=1e-5)


def test_attention_weights_sink():
    """Functional counterpart of reference models.py:150 (attn_weights):
    the sink captures per-layer content + word attention weights of an
    un-jitted forward, each a valid softmax over the query tokens."""
    from video_moment_localization_tpu.models.smin import attention_weights_sink

    params = init_smin_params(jax.random.PRNGKey(2), CFG)
    batch = _batch(seed=5)
    with attention_weights_sink() as sink:
        smin_forward(params, CFG, *_forward_args(batch))
    names = [n for n, _ in sink]
    assert names.count("content") == CFG.num_smi_layers
    assert names.count("word") == CFG.num_smi_layers
    for _, w in sink:
        w = np.asarray(w)
        assert np.isfinite(w).all()
        np.testing.assert_allclose(w.sum(axis=-1), 1.0, atol=1e-5)

    # Outside the context nothing is recorded (and the sink is restored).
    smin_forward(params, CFG, *_forward_args(batch))
    assert len(sink) == 2 * CFG.num_smi_layers
