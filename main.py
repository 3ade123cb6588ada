"""CLI entry point — public surface matches the reference
(`python main.py --config_path config/<dataset>.yml [--num_epochs N] [--test]`,
reference main.py:13-28, 278-313), with TPU-native extensions:
`--nms` (soft-NMS eval), `--num_devices N` (data-parallel mesh width),
`--compute_dtype bfloat16`, `--profile_dir <dir>` (jax.profiler trace).
"""

from __future__ import annotations

import argparse
import dataclasses
import os

# The axon TPU plugin ignores the JAX_PLATFORMS env var; honor it here so
# `JAX_PLATFORMS=cpu python main.py ...` works as users expect.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from video_moment_localization_tpu.config import load_config
from video_moment_localization_tpu.data.pipeline import BatchLoader
from video_moment_localization_tpu.train.trainer import Trainer, build_datasets


def get_parameters() -> argparse.Namespace:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", default="config/charadessta.yml",
                        help="Path to config file.")
    parser.add_argument("--num_epochs", default=0, type=int,
                        help="Number of epochs to override value in the config.")
    parser.add_argument("--test", default=False, action="store_true",
                        help="Test the saved model for this config.")
    # TPU-native extensions (not in the reference CLI):
    parser.add_argument("--nms", default=False, action="store_true",
                        help="Use soft-NMS proposal selection at eval.")
    parser.add_argument("--num_devices", default=None, type=int,
                        help="Total device count (default: all).")
    parser.add_argument("--seq_devices", default=None, type=int,
                        help="Sequence-parallel width: shard the clip axis "
                             "and proposal-map rows over this many devices "
                             "(2-D data x seq mesh when > 1).")
    parser.add_argument("--compute_dtype", default=None,
                        choices=["float32", "bfloat16"],
                        help="Activation compute dtype.")
    parser.add_argument("--profile_dir", default=None,
                        help="Write a jax.profiler trace to this directory.")
    parser.add_argument("--debug_nans", default=False, action="store_true",
                        help="Enable jax_debug_nans (fail fast on NaN/Inf).")
    parser.add_argument("--save_best", default=None,
                        help="Track the best checkpoint by this eval metric "
                             "(e.g. 'R@1, IoU=0.5'); saves "
                             "{experiment}_model_best.ckpt.")
    parser.add_argument("--best", default=False, action="store_true",
                        help="With --test: load the best checkpoint instead "
                             "of the last one.")
    parser.add_argument("--compat_metrics", default=False, action="store_true",
                        help="Reference-compat eval: dense (L, L) score map "
                             "and labels, bit-reproducing the reference's "
                             "top-k tie quirk (PARITY.md #16).")
    parser.add_argument("--distributed", default=False, action="store_true",
                        help="Multi-host training: jax.distributed.initialize "
                             "(coordinator from JAX_COORDINATOR_ADDRESS / "
                             "auto-detected on Cloud TPU); each process loads "
                             "its shard of every global batch.")
    return parser.parse_args()


def main() -> None:
    args = get_parameters()
    shard_id, num_shards = 0, 1
    if args.distributed:
        import jax

        from video_moment_localization_tpu.parallel.mesh import (
            initialize_distributed,
        )

        if initialize_distributed():
            shard_id, num_shards = jax.process_index(), jax.process_count()
    cfg = load_config(args.config_path, num_epochs_override=args.num_epochs)
    # Flags only override when explicitly provided (YAML values otherwise).
    if args.nms:
        cfg.nms = True
    if args.num_devices is not None:
        cfg.num_devices = args.num_devices
    if args.seq_devices is not None:
        cfg.seq_devices = args.seq_devices
    if args.save_best is not None:
        cfg.save_best = args.save_best
    if args.profile_dir is not None:
        cfg.profile_dir = args.profile_dir
    if args.compute_dtype:
        cfg.model = dataclasses.replace(cfg.model, compute_dtype=args.compute_dtype)
    if args.compat_metrics:
        cfg.model = dataclasses.replace(cfg.model, compat_head=True)
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)

    trainer = Trainer(cfg)

    shard = dict(shard_id=shard_id, num_shards=num_shards)
    if not args.test:
        train_ds, eval_ds = build_datasets(cfg)
        train_loader = BatchLoader(train_ds, cfg.batch_size, shuffle=True,
                                   num_workers=cfg.num_workers, seed=cfg.seed,
                                   **shard)
        eval_loader = BatchLoader(eval_ds, cfg.batch_size, shuffle=False,
                                  num_workers=cfg.num_workers, seed=cfg.seed,
                                  **shard)
        trainer.fit(train_loader, eval_loader)
    else:
        test_ds = build_datasets(cfg, test_only=True)
        test_loader = BatchLoader(test_ds, cfg.batch_size, shuffle=False,
                                  num_workers=cfg.num_workers, seed=cfg.seed,
                                  **shard)
        trainer.load_for_test(use_best=args.best)
        metrics = trainer.evaluate(test_loader)
        if shard_id == 0:  # one metrics report per job under --distributed
            for k, v in metrics.items():
                print(f"{k} - {v}")
            print(f"throughput - {trainer.timer.throughput:.1f} "
                  "query-video pairs/s")


if __name__ == "__main__":
    main()
