"""TPU-native framework for temporal video-moment localization by natural-language query.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
PyTorch implementation (SMIN: Structured Multi-level Interaction Network):

* `data/`     — host-side input pipeline: tokenization, GloVe embedding,
                fixed-length temporal sampling, IoU/boundary/snippet label
                generation, dataset readers, prefetching batch loader.
* `models/`   — the SMIN model family as pure-functional pytree modules
                (masked bi-LSTM via `lax.scan`, cross-modal fusion,
                structured multi-level interaction blocks, scoring heads).
* `ops/`      — TPU compute kernels: fused proposal-map generation
                (Pallas + XLA prefix-sum paths), fused scoring/top-k,
                soft-NMS.
* `parallel/` — `jax.sharding.Mesh`-based data parallelism (ICI collectives
                inserted by XLA), multi-chip train step.
* `train/`    — scaled-IoU BCE loss, R@n/IoU@m metrics, trainer with
                checkpoint/resume and stats.json reporting.
* `utils/`    — checkpointing, profiling, misc.

Public CLI surface (see repo-root `main.py`) matches the reference:
`python main.py --config_path config/<dataset>.yml [--num_epochs N] [--test]`.
"""

__version__ = "0.1.0"
