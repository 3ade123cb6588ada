"""Weight-port round trip: params -> torch state_dict -> params, and
(with the reference present) reference-model forward parity after a
reverse port."""

import os
import sys

import numpy as np
import pytest

import jax

from video_moment_localization_tpu.config import ModelConfig
from video_moment_localization_tpu.models import init_smin_params
from video_moment_localization_tpu.models.port import (
    params_from_torch_state_dict,
    torch_state_dict_from_params,
)

CFG = ModelConfig(T=16, L=8, C=4, D=32, dl=8, num_smi_layers=2,
                  input_video_dim=12, max_query_length=6, lstm_hidden_size=16)


def test_port_roundtrip_identity():
    params = init_smin_params(jax.random.PRNGKey(3), CFG)
    sd = torch_state_dict_from_params(params, CFG)
    back = params_from_torch_state_dict(sd, CFG)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(
    not os.path.exists("/root/reference/models.py"),
    reason="reference implementation not available",
)
def test_reverse_port_loads_into_reference():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        import importlib

        ref_models = importlib.import_module("models")
    finally:
        sys.path.remove("/root/reference")

    params = init_smin_params(jax.random.PRNGKey(4), CFG)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in torch_state_dict_from_params(params, CFG).items()}

    ref = ref_models.SMIN(T=CFG.T, L=CFG.L, C=CFG.C, D=CFG.D, dl=CFG.dl,
                          num_smi_layers=CFG.num_smi_layers,
                          input_video_dim=CFG.input_video_dim,
                          max_query_length=CFG.max_query_length,
                          lstm_hidden_size=CFG.lstm_hidden_size, device="cpu")
    ref.load_state_dict(sd, strict=True)
    ref.eval()

    # forward parity: our params through the reference must equal our model
    from video_moment_localization_tpu.data.pipeline import BatchLoader
    from video_moment_localization_tpu.data.synthetic import SyntheticDataset
    from video_moment_localization_tpu.models import smin_forward

    ds = SyntheticDataset(num_videos=4, queries_per_video=1, T=CFG.T, L=CFG.L,
                          max_query_length=CFG.max_query_length,
                          input_video_dim=CFG.input_video_dim, seed=9)
    batch = next(iter(BatchLoader(ds, 4, num_workers=1, seed=9).epoch(0)))
    keys = ("video_features", "video_mask", "query_features", "query_mask",
            "length_mask", "moment_mask")
    with torch.no_grad():
        pm_r, ps_r, pe_r, pa_r = ref(*[torch.from_numpy(np.asarray(batch[k]))
                                       for k in keys])
    import jax.numpy as jnp

    pm, ps, pe, pa = smin_forward(params, CFG, *[jnp.asarray(batch[k]) for k in keys])
    if CFG.packed:  # packed head emits (B, N); densify for the torch oracle
        from video_moment_localization_tpu.ops.packing import unpack_map

        pm = unpack_map(pm, CFG.L)
    np.testing.assert_allclose(np.asarray(pm), pm_r.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pa), pa_r.numpy(), rtol=1e-4, atol=1e-5)
