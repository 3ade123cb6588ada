"""Module-by-module smoke script (the reference's simpletest.py analog,
reference simpletest.py:1-97) — but hermetic: runs on a synthetic batch, no
downloads. Instantiates each model block, prints output shapes, and checks
that untrained sigmoid heads emit probabilities near 0.5 inside the mask.

Usage: python scripts/simpletest.py [--config_path config/charadessta.yml]
(defaults to a small CPU-friendly config when no flag is given).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp
import numpy as np

from video_moment_localization_tpu.config import ModelConfig, load_config
from video_moment_localization_tpu.data.pipeline import BatchLoader
from video_moment_localization_tpu.data.synthetic import SyntheticDataset
from video_moment_localization_tpu.models import init_smin_params
from video_moment_localization_tpu.models.smin import (
    backbone,
    boundary_unit,
    content_unit,
    localization,
    moment_unit,
    smi_block,
    smin_forward,
)
from video_moment_localization_tpu.ops.proposal import proposal_features


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", default=None)
    args = parser.parse_args()

    if args.config_path:
        cfg = load_config(args.config_path).model
    else:
        cfg = ModelConfig(T=32, L=8, C=4, D=64, dl=16, num_smi_layers=2,
                          input_video_dim=24, max_query_length=6,
                          lstm_hidden_size=32)
    B = 4

    ds = SyntheticDataset(num_videos=B, queries_per_video=1, T=cfg.T, L=cfg.L,
                          max_query_length=cfg.max_query_length,
                          input_video_dim=cfg.input_video_dim, seed=0)
    batch = next(iter(BatchLoader(ds, B, num_workers=1, seed=0).epoch(0)))
    a = {k: jnp.asarray(batch[k]) for k in
         ("video_features", "video_mask", "query_features", "query_mask",
          "length_mask", "moment_mask")}
    params = init_smin_params(jax.random.PRNGKey(0), cfg)

    f, fs, fw = backbone(params, cfg, a["video_features"], a["video_mask"],
                         a["query_features"], a["query_mask"])
    print(f"Backbone:            f {f.shape}  fs {fs.shape}  fw {fw.shape}")

    fc, fm, fb = proposal_features(f, a["moment_mask"], cfg.L, cfg.C)
    print(f"ProposalGeneration:  fc {fc.shape}  fm {fm.shape}  fb {fb.shape}")

    p0 = params["smi"][0]
    cu = content_unit(p0["content"], fc, fw, fs, fm, a["query_mask"], a["moment_mask"])
    print(f"ContentUnit:         {cu.shape}")
    bu = boundary_unit(p0["boundary"], fb, fw, fs, fm, a["query_mask"], a["length_mask"])
    print(f"BoundaryUnit:        {bu.shape}")
    mu = moment_unit(p0["moment"], cu, fm, bu, a["moment_mask"])
    print(f"MomentUnit:          {mu.shape}")
    fc2, fm2, fb2 = smi_block(p0, fc, fm, fb, fw, fs, a["query_mask"],
                              a["length_mask"], a["moment_mask"])
    print(f"SMI block:           fc {fc2.shape}  fm {fm2.shape}  fb {fb2.shape}")

    pm, ps, pe, pa = localization(params["localization"], fm2, fb2,
                                  a["length_mask"], a["moment_mask"])
    print(f"Localization:        pm {pm.shape}  ps {ps.shape}  pe {pe.shape}  pa {pa.shape}")

    pm, ps, pe, pa = jax.jit(lambda p, *x: smin_forward(p, cfg, *x))(
        params, *[a[k] for k in ("video_features", "video_mask", "query_features",
                                 "query_mask", "length_mask", "moment_mask")])
    if cfg.packed:  # default packed head: densify for the inspection below
        from video_moment_localization_tpu.ops.packing import unpack_map

        pm = unpack_map(pm, cfg.L)
    mm = np.asarray(a["moment_mask"]) > 0
    lm = np.asarray(a["length_mask"]) > 0
    mean_pm = float(np.asarray(pm)[mm].mean())
    mean_ps = float(np.asarray(ps)[lm].mean())
    print(f"SMIN forward:        pm {pm.shape}, masked means pm={mean_pm:.3f} "
          f"ps={mean_ps:.3f} (untrained heads should sit near 0.5)")
    assert 0.2 < mean_pm < 0.8 and 0.2 < mean_ps < 0.8, "untrained heads look off"
    assert np.all(np.asarray(pm)[~mm] == 0), "masked moments must score 0"
    print("OK")


if __name__ == "__main__":
    main()
