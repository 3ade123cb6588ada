"""Port a reference PyTorch checkpoint into this framework's format.

Migration path for users of the reference: their `{experiment}_model.pt`
(torch.save of {epoch, model state_dict, optimizer state_dict} — reference
main.py:270-274) becomes a checkpoint this framework's `--test` /
`resume_training` can load. Model weights port exactly (see
models/port.py); Adam moments are re-initialized (torch and optax Adam
states are equivalent at step 0 up to bias correction warmup).

Usage:
  python scripts/port_checkpoint.py --torch_ckpt checkpoints/charadessta_model.pt \
      --config_path config/charadessta.yml [--out checkpoints/]

Reverse direction (export a trained checkpoint back to the reference's
torch format):
  python scripts/port_checkpoint.py --reverse --config_path config/charadessta.yml \
      --torch_ckpt exported_model.pt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--torch_ckpt", required=True,
                        help="torch checkpoint to read (or write with --reverse)")
    parser.add_argument("--config_path", required=True)
    parser.add_argument("--out", default=None,
                        help="checkpoint dir (default: config's checkpoint_path)")
    parser.add_argument("--reverse", action="store_true",
                        help="export this framework's checkpoint to torch format")
    args = parser.parse_args()

    import torch

    from video_moment_localization_tpu.config import load_config
    from video_moment_localization_tpu.models.port import (
        params_from_torch_state_dict,
        torch_state_dict_from_params,
    )
    from video_moment_localization_tpu.train.trainer import build_optimizer
    from video_moment_localization_tpu.utils.checkpoint import (
        checkpoint_paths,
        restore_checkpoint,
        save_checkpoint,
    )

    cfg = load_config(args.config_path)

    if args.reverse:
        from video_moment_localization_tpu.models import init_smin_params

        import jax
        import numpy as np

        template = jax.tree.map(
            np.asarray, init_smin_params(jax.random.PRNGKey(cfg.seed), cfg.model)
        )
        model_path, _ = checkpoint_paths(args.out or cfg.checkpoint_path,
                                         cfg.experiment)
        restored = restore_checkpoint(model_path, template)
        if restored is None:
            raise FileNotFoundError(f"No saved model at {model_path}!")
        sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
              torch_state_dict_from_params(restored["params"], cfg.model).items()}
        torch.save({"epoch": restored["epoch"], "model": sd, "optimizer": {}},
                   args.torch_ckpt)
        print(f"Exported {model_path} (epoch {restored['epoch']}) -> "
              f"{args.torch_ckpt} (reference torch format)")
        return

    blob = torch.load(args.torch_ckpt, map_location="cpu")
    state_dict = blob["model"] if "model" in blob else blob
    epoch = int(blob.get("epoch", 0))

    params = params_from_torch_state_dict(state_dict, cfg.model)
    opt_state = build_optimizer(cfg).init(params)

    out_dir = args.out or cfg.checkpoint_path
    model_path, _ = checkpoint_paths(out_dir, cfg.experiment)
    save_checkpoint(model_path, epoch, params, opt_state)
    print(f"Ported {args.torch_ckpt} (epoch {epoch}) -> {model_path}")


if __name__ == "__main__":
    main()
