"""bfloat16 compute-dtype and SMI rematerialization configs."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
import optax

from video_moment_localization_tpu.config import ModelConfig
from video_moment_localization_tpu.data.pipeline import BatchLoader
from video_moment_localization_tpu.data.synthetic import SyntheticDataset
from video_moment_localization_tpu.models import init_smin_params, smin_forward
from video_moment_localization_tpu.parallel.mesh import device_batch
from video_moment_localization_tpu.parallel.steps import make_train_step

CFG = ModelConfig(
    T=16, L=8, C=4, D=32, dl=8, num_smi_layers=2,
    input_video_dim=12, max_query_length=6, lstm_hidden_size=16,
)


def _batch(B=4, seed=0, packed_labels=False):
    ds = SyntheticDataset(num_videos=B, queries_per_video=1, T=CFG.T, L=CFG.L,
                          max_query_length=CFG.max_query_length,
                          input_video_dim=CFG.input_video_dim, seed=seed)
    ds.packed_labels = packed_labels
    b = device_batch(next(iter(BatchLoader(ds, B, num_workers=1, seed=seed).epoch(0))))
    return {k: jnp.asarray(v) for k, v in b.items()}


def _fwd_args(b):
    return tuple(b[k] for k in ("video_features", "video_mask", "query_features",
                                "query_mask", "length_mask", "moment_mask"))


def test_bf16_forward_close_to_fp32_and_outputs_fp32():
    params = init_smin_params(jax.random.PRNGKey(0), CFG)
    b = _batch()
    cfg16 = dataclasses.replace(CFG, compute_dtype="bfloat16")
    out32 = smin_forward(params, CFG, *_fwd_args(b))
    out16 = smin_forward(params, cfg16, *_fwd_args(b))
    for a, c in zip(out16, out32):
        assert a.dtype == jnp.float32  # heads always emit fp32 probabilities
        # bf16 activations: probabilities should track fp32 within ~2e-2
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-2)


def test_bf16_training_is_finite_and_learns():
    cfg16 = dataclasses.replace(CFG, compute_dtype="bfloat16")
    opt = optax.adam(5e-3)
    params = init_smin_params(jax.random.PRNGKey(0), cfg16)
    opt_state = opt.init(params)
    step = make_train_step(cfg16, opt)
    b = _batch(packed_labels=cfg16.packed)
    losses = []
    for _ in range(25):
        params, opt_state, m = step(params, opt_state, b)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8


def test_remat_smi_matches_no_remat():
    """jax.checkpoint over SMI blocks changes memory, not numbers."""
    cfg_r = dataclasses.replace(CFG, remat_smi=True)
    params = init_smin_params(jax.random.PRNGKey(1), CFG)
    b = _batch(seed=2)

    def loss(cfg, p):
        pm, ps, pe, pa = smin_forward(p, cfg, *_fwd_args(b))
        return jnp.sum(pm) + jnp.sum(ps * pe * pa)

    l0, g0 = jax.value_and_grad(lambda p: loss(CFG, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(cfg_r, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, c in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-6)
