"""End-to-end learning test: overfitting a small synthetic set must drive
R@1,IoU=0.5 to the provable quantization ceiling (the fraction of samples
whose L-snippet grid admits any proposal with IoU > 0.5)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from video_moment_localization_tpu.config import ModelConfig
from video_moment_localization_tpu.data.pipeline import BatchLoader
from video_moment_localization_tpu.data.synthetic import SyntheticDataset
from video_moment_localization_tpu.models import init_smin_params
from video_moment_localization_tpu.parallel.mesh import device_batch
from video_moment_localization_tpu.parallel.steps import make_eval_step, make_train_step

CFG = ModelConfig(T=16, L=8, C=4, D=32, dl=8, num_smi_layers=2,
                  input_video_dim=12, max_query_length=6, lstm_hidden_size=16)


import dataclasses

import pytest


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_overfit_reaches_recall_ceiling(dtype):
    # bf16 must reach the same recall ceiling as fp32 (VERDICT r1 item 7:
    # convergence, not just finiteness; full-scale drift numbers are in
    # docs/ARCHITECTURE.md from the 10-epoch fixture runs).
    CFG = dataclasses.replace(globals()["CFG"], compute_dtype=dtype)
    B = 8
    ds = SyntheticDataset(num_videos=B, queries_per_video=1, T=CFG.T, L=CFG.L,
                          max_query_length=CFG.max_query_length,
                          input_video_dim=CFG.input_video_dim, seed=11,
                          split="test")  # eval split: no jitter, fixed batch
    ds.packed_labels = CFG.packed
    batch = {k: jnp.asarray(v) for k, v in
             device_batch(next(iter(BatchLoader(ds, B, num_workers=1, seed=0).epoch(0)))).items()}

    # provable ceiling: fraction of samples with any valid proposal IoU > 0.5
    from video_moment_localization_tpu.ops.packing import packed_valid_mask

    vmask = packed_valid_mask(batch["length_mask"])
    ceiling = float(jnp.mean((batch["sm"] * vmask).max(axis=1) > 0.5))
    assert ceiling > 0.4, "degenerate fixture"

    opt = optax.adam(2e-3)
    params = init_smin_params(jax.random.PRNGKey(0), CFG)
    opt_state = opt.init(params)
    step = make_train_step(CFG, opt)
    eval_step = make_eval_step(CFG)

    for _ in range(150):
        params, opt_state, m = step(params, opt_state, batch)

    metrics = eval_step(params, batch)
    r1_05 = float(metrics["counts"][0, 2]) / B  # n=1, IoU=0.5
    assert np.isfinite(float(metrics["loss"]))
    assert r1_05 >= ceiling - 1e-6, (r1_05, ceiling)
