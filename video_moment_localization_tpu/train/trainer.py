"""Training/eval/test orchestration.

Public behavior mirrors the reference orchestration (reference
main.py:135-276): per-epoch stdout lines, cumulative
``{experiment}_stats.json`` rewritten every epoch with
epoch/train_loss/eval_loss/train_<metric>/eval_<metric> arrays, a single
overwritten checkpoint per experiment, and resume-at-epoch+1 semantics.
Charades-STA evaluates on its test split (it has no val split —
reference main.py:45-47).

TPU-native differences: one fused jit step for train and one for eval
(forward+loss+metrics on device; training adds backward+Adam in the same
executable), data-parallel sharding over a device mesh, padded fixed-shape
batches, and an optional soft-NMS eval mode.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from video_moment_localization_tpu.config import Config
from video_moment_localization_tpu.data.datasets import get_dataset_class
from video_moment_localization_tpu.data.glove import WordEmbedding
from video_moment_localization_tpu.data.pipeline import BatchLoader
from video_moment_localization_tpu.models import init_smin_params
from video_moment_localization_tpu.parallel.mesh import make_mesh, put_batch, put_replicated
from video_moment_localization_tpu.parallel.steps import make_eval_step, make_train_step
from video_moment_localization_tpu.train.metrics import counts_to_dict
from video_moment_localization_tpu.utils.checkpoint import (
    checkpoint_paths,
    restore_checkpoint,
    save_checkpoint,
)
from video_moment_localization_tpu.utils.profiling import StepTimer, trace_context


def build_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Optimizer factory (reference main.py:77-87: Adam only)."""
    if cfg.optimizer == "Adam":
        return optax.adam(cfg.lr)
    raise ValueError(f"Optimizer {cfg.optimizer!r} is not supported!")


def build_datasets(cfg: Config, embedding: Optional[WordEmbedding] = None,
                   test_only: bool = False):
    """Split factories (reference main.py:43-55)."""
    cls = get_dataset_class(cfg.dataset)
    emb = embedding or WordEmbedding.load(
        os.path.join(cfg.data_dir, "glove/glove.6B.300d.txt")
        if os.path.exists(os.path.join(cfg.data_dir, "glove/glove.6B.300d.txt"))
        else None
    )
    m = cfg.model
    kw = dict(data_dir=cfg.data_dir, T=m.T, L=m.L,
              max_query_length=m.max_query_length, embedding=emb)
    # Packed models consume packed (N,) sm/ym and no dense moment_mask;
    # the compat_head eval mode keeps the dense reference-quirk pipeline.
    packed_labels = m.packed and not m.compat_head
    if test_only:
        test = cls(split="test", **kw)
        test.packed_labels = packed_labels
        return test
    train = cls(split="train", **kw)
    eval_split = "test" if cfg.dataset == "charadessta" else "val"
    evald = cls(split=eval_split, **kw)
    train.packed_labels = evald.packed_labels = packed_labels
    return train, evald


class Trainer:
    """Owns params/opt-state, the compiled steps, and the epoch loop."""

    def __init__(self, cfg: Config, embedding: Optional[WordEmbedding] = None):
        self.cfg = cfg
        self.seq = max(1, int(cfg.seq_devices))
        if self.seq > 1:
            self._init_mesh_2d()
        elif cfg.num_devices is None:
            # Default: the most devices that evenly divide the global batch.
            n = len(jax.devices())
            while cfg.batch_size % n != 0:
                n -= 1
            self.mesh = make_mesh(n)
        else:
            self.mesh = make_mesh(cfg.num_devices)
            if cfg.batch_size % self.mesh.size != 0:
                raise ValueError(
                    f"batch_size ({cfg.batch_size}) must be divisible by the "
                    f"number of devices ({self.mesh.size})"
                )
        # Multi-process: create the gloo/ICI communicator cliques while the
        # processes are still synchronized from distributed init — the
        # first collective's rendezvous must not wait behind the train-step
        # compile (parallel/mesh.py warmup_collectives; round-3 flake).
        from video_moment_localization_tpu.parallel.mesh import (
            warmup_collectives,
        )

        warmup_collectives(self.mesh)
        self.embedding = embedding
        self._maybe_enable_remat()
        self.optimizer = build_optimizer(cfg)
        params = init_smin_params(jax.random.PRNGKey(cfg.seed), cfg.model)
        self.params = put_replicated(params, self.mesh)
        self.opt_state = put_replicated(self.optimizer.init(params), self.mesh)
        if self.seq > 1:
            from video_moment_localization_tpu.parallel.model_parallel import (
                make_eval_step_2d,
                make_train_step_2d,
            )

            self.train_step = make_train_step_2d(cfg.model, self.optimizer, self.mesh)
            self.eval_step = make_eval_step_2d(cfg.model, self.mesh)
            self.test_step = make_eval_step_2d(cfg.model, self.mesh,
                                               use_nms=cfg.nms,
                                               nms_sigma=cfg.nms_sigma)
        else:
            self.train_step = make_train_step(cfg.model, self.optimizer)
            self.eval_step = make_eval_step(cfg.model)
            self.test_step = make_eval_step(cfg.model, use_nms=cfg.nms,
                                            nms_sigma=cfg.nms_sigma)
        self.model_path, self.stats_path = checkpoint_paths(
            cfg.checkpoint_path, cfg.experiment
        )
        self.best_model_path = self.model_path.replace("_model.ckpt",
                                                       "_model_best.ckpt")
        if cfg.save_best is not None:
            from video_moment_localization_tpu.train.metrics import metric_names

            if cfg.save_best not in metric_names():
                raise ValueError(
                    f"save_best metric {cfg.save_best!r} unknown; choose "
                    f"from {metric_names()}"
                )
        self.timer = StepTimer()

    def _init_mesh_2d(self) -> None:
        """2-D (data x seq) mesh for sequence-parallel training."""
        import dataclasses

        from jax.sharding import Mesh

        cfg = self.cfg
        available = len(jax.devices())
        total = cfg.num_devices or available
        if total > available:
            raise ValueError(f"requested {total} devices, only {available} available")
        if total % self.seq != 0:
            raise ValueError(
                f"device count ({total}) must be divisible by seq_devices "
                f"({self.seq})"
            )
        nd = total // self.seq
        m = cfg.model
        if cfg.batch_size % nd != 0 or m.T % self.seq != 0 or m.L % self.seq != 0:
            raise ValueError(
                f"2-D mesh needs batch_size % {nd} == 0 and "
                f"T ({m.T}), L ({m.L}) divisible by seq_devices ({self.seq})"
            )
        if m.packed and m.compat_head:
            # The reference-compat eval quirk needs the dense pipeline;
            # the packed pair-chunk seq path is the default otherwise.
            self.cfg.model = dataclasses.replace(m, packed=False)
            print("[trainer] 2-D (data x seq) mesh + compat_head: dense "
                  "row-sharded layout (packed=False)")
        from video_moment_localization_tpu.parallel.mesh import arrange_2d

        # arrange_2d keeps each seq row on one host (ICI-only seq collectives;
        # the data axis may span DCN on multi-host jobs).
        self.mesh = Mesh(arrange_2d(jax.devices()[:total], self.seq),
                         ("data", "seq"))

    def _maybe_enable_remat(self) -> None:
        """Auto-enable SMI rematerialization when the estimated backward
        residuals would crowd a single chip's HBM (numerically invisible —
        tests/test_dtype_remat.py)."""
        import dataclasses

        m = self.cfg.model
        if m.remat_smi:
            return
        per_dev_b = self.cfg.batch_size // self.mesh.size
        n_pairs = m.L * (m.L + 1) // 2 if m.packed else m.L * m.L
        itemsize = 2 if m.compute_dtype == "bfloat16" else 4
        # ~5 content-unit residual tensors of (B, N, C, D) scale per layer.
        est = m.num_smi_layers * 5 * per_dev_b * n_pairs * m.C * m.D * itemsize
        if est > 6e9:
            self.cfg.model = dataclasses.replace(m, remat_smi=True)
            print(f"[trainer] enabling SMI remat: estimated residuals "
                  f"{est / 1e9:.1f} GB/chip exceed budget")

    # ------------------------------------------------------------------ #
    def _run_epoch(self, loader: BatchLoader, epoch: int, train: bool,
                   step_fn=None) -> Tuple[float, Dict[str, float]]:
        """One pass over a loader; returns (avg loss, normalized metrics)."""
        step_fn = step_fn or (self.train_step if train else self.eval_step)
        if self.seq > 1:
            from video_moment_localization_tpu.parallel.model_parallel import (
                put_batch_2d,
            )

            place = lambda b: put_batch_2d(b, self.mesh)  # noqa: E731
        else:
            place = lambda b: put_batch(b, self.mesh)  # noqa: E731

        # Fully asynchronous epoch: steps are dispatched back-to-back with no
        # host synchronization (per-step metrics stay on device; valid-sample
        # counts come from the host-side batch), so input transfer and
        # compute pipeline. One sync at epoch end drains everything.
        # Multi-host: the host-side batch holds only this process's shard;
        # the global valid-sample count comes from the assembled device
        # array (a lazy device scalar — no extra sync per step).
        multiproc = jax.process_count() > 1
        per_step = []
        self.timer.start()
        for i, batch in enumerate(loader.epoch(epoch)):
            device = place(batch)
            if train:
                self.params, self.opt_state, m = step_fn(
                    self.params, self.opt_state, device
                )
            else:
                m = step_fn(self.params, device)
            n_valid = (jnp.sum(device["sample_mask"]) if multiproc
                       else float(batch["sample_mask"].sum()))
            per_step.append((m, n_valid))
            if (i + 1) % 16 == 0:
                # Periodic drain: bounds the number of in-flight batches
                # resident on device without giving up pipelining.
                m["loss"].block_until_ready()
        loss_sum, counts_sum, num = 0.0, None, 0.0
        for m, n_valid in per_step:
            n_valid = float(n_valid)
            loss_sum += float(m["loss"]) * n_valid
            counts = np.asarray(m["counts"])
            counts_sum = counts if counts_sum is None else counts_sum + counts
            num += n_valid
        self.timer.stop(int(num))
        metrics = counts_to_dict(counts_sum / max(num, 1.0)) if counts_sum is not None else {}
        return loss_sum / max(num, 1.0), metrics

    # ------------------------------------------------------------------ #
    def _existing_stats(self, start_epoch: int) -> Dict[str, list]:
        """Truncate a prior stats file to completed epochs on resume
        (reference main.py:220-229)."""
        stats = defaultdict(list)
        if self.cfg.resume_training and os.path.exists(self.stats_path):
            done = start_epoch - 1
            # With eval_every > 1 the eval arrays are shorter: one entry per
            # evaluated epoch (multiples of eval_every, plus the final epoch).
            evals_done = done // self.cfg.eval_every
            if done == self.cfg.num_epochs and done % self.cfg.eval_every:
                evals_done += 1
            with open(self.stats_path) as f:
                for key, val in json.load(f).items():
                    keep = evals_done if key.startswith("eval") else done
                    stats[key] = val[:keep]
        return stats

    def maybe_resume(self) -> int:
        """Load checkpoint if resume_training is set; return start epoch."""
        if not self.cfg.resume_training:
            return 1
        restored = restore_checkpoint(
            self.model_path,
            jax.tree.map(np.asarray, self.params),
            jax.tree.map(np.asarray, self.opt_state),
        )
        if restored is None:
            return 1
        self.params = put_replicated(restored["params"], self.mesh)
        self.opt_state = put_replicated(restored["opt_state"], self.mesh)
        return restored["epoch"] + 1

    def load_for_test(self, use_best: bool = False) -> None:
        path = self.best_model_path if use_best else self.model_path
        restored = restore_checkpoint(
            path,
            jax.tree.map(np.asarray, self.params),
            jax.tree.map(np.asarray, self.opt_state),
        )
        if restored is None:
            raise FileNotFoundError(f"No saved model at {path}!")
        self.params = put_replicated(restored["params"], self.mesh)

    # ------------------------------------------------------------------ #
    def fit(self, train_loader: BatchLoader, eval_loader: BatchLoader) -> None:
        start_epoch = self.maybe_resume()
        stats = self._existing_stats(start_epoch)
        best_key = f"eval_{self.cfg.save_best}" if self.cfg.save_best else None
        best = max(stats[best_key], default=-float("inf")) if best_key else None

        # Multi-process: every process runs the identical SPMD epoch loop,
        # but host-side artifacts (stdout, stats.json, checkpoints) are
        # process 0's job alone — concurrent orbax saves to one path would
        # race, and duplicate metric lines would break stdout parsing.
        is_main = jax.process_index() == 0
        with trace_context(self.cfg.profile_dir):
            for epoch in range(start_epoch, self.cfg.num_epochs + 1):
                if is_main:
                    print(f"Training Epoch - {epoch}")
                self.timer.reset()
                train_loss, train_metrics = self._run_epoch(train_loader, epoch, True)
                train_tput = self.timer.throughput
                # eval_every=1 is the reference cadence; last epoch always evals.
                do_eval = (epoch % self.cfg.eval_every == 0
                           or epoch == self.cfg.num_epochs)
                if do_eval:
                    eval_loss, eval_metrics = self._run_epoch(eval_loader, epoch, False)
                    if is_main:
                        print(f"Training Loss - {train_loss:.4f}, "
                              f"Eval Loss - {eval_loss:.4f}")
                else:
                    eval_loss, eval_metrics = None, {}
                    if is_main:
                        print(f"Training Loss - {train_loss:.4f}")
                if is_main:
                    for k, v in train_metrics.items():
                        print(f"train_{k} - {v}")
                    for k, v in eval_metrics.items():
                        print(f"eval_{k} - {v}")
                    print(f"throughput - {train_tput:.1f} "
                          "query-video pairs/s (train)")

                stats["epoch"].append(epoch)
                stats["train_loss"].append(train_loss)
                if do_eval:
                    stats["eval_loss"].append(eval_loss)
                    if self.cfg.eval_every != 1:
                        # extra alignment key (absent at the reference cadence,
                        # keeping the default stats schema identical)
                        stats["eval_epoch"].append(epoch)
                for k, v in train_metrics.items():
                    stats[f"train_{k}"].append(v)
                for k, v in eval_metrics.items():
                    stats[f"eval_{k}"].append(v)

                if is_main:
                    os.makedirs(os.path.dirname(self.stats_path) or ".",
                                exist_ok=True)
                    with open(self.stats_path, "w") as f:
                        json.dump(stats, f)
                    save_checkpoint(self.model_path, epoch, self.params,
                                    self.opt_state)
                if best_key is not None and self.cfg.save_best in eval_metrics:
                    current = eval_metrics[self.cfg.save_best]
                    if current > best:
                        best = current
                        if is_main:
                            save_checkpoint(self.best_model_path, epoch,
                                            self.params, self.opt_state)
                            print(f"new best {best_key} - {best} "
                                  f"(epoch {epoch})")

    def evaluate(self, loader: BatchLoader) -> Dict[str, float]:
        """Metrics-only pass over a test loader (reference main.py:193-211)."""
        self.timer.reset()
        _, metrics = self._run_epoch(loader, 0, False, step_fn=self.test_step)
        return metrics
