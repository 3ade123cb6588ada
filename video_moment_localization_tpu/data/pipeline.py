"""Host-side input pipeline: threaded sample assembly + batch prefetching.

Replaces the reference's torch DataLoader worker processes (reference
main.py:57-66) with a thread pool (NumPy/h5py release the GIL for the heavy
ops) and a background prefetch queue, producing **fixed-shape** float32
batches ready for a single jit-compiled executable:

* every batch has exactly ``batch_size`` rows — the final partial batch is
  zero-padded and accompanied by ``sample_mask`` (1 for real rows) so that
  losses/metrics can ignore padding without recompilation;
* shuffling and the training sampler's temporal jitter are driven by
  per-(seed, epoch, index) Philox streams, making every sample bit-exactly
  reproducible regardless of thread scheduling — and therefore resumable
  (the reference's jitter used the unseeded global RNG).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List

import numpy as np

from video_moment_localization_tpu.data.datasets import TENSOR_KEYS, MomentDataset

_META_KEYS = ("video_id", "times", "duration", "start_index", "end_index")


def collate(samples: List[Dict[str, Any]], batch_size: int) -> Dict[str, Any]:
    """Stack sample dicts into one fixed-shape batch, padding to batch_size."""
    n = len(samples)
    batch: Dict[str, Any] = {}
    # TENSOR_KEYS is the superset; packed-label samples omit moment_mask.
    for k in (k for k in TENSOR_KEYS if k in samples[0]):
        rows = np.stack([s[k] for s in samples], axis=0)
        if n < batch_size:
            pad = np.zeros((batch_size - n,) + rows.shape[1:], dtype=rows.dtype)
            rows = np.concatenate([rows, pad], axis=0)
        batch[k] = rows
    for k in _META_KEYS:
        batch[k] = [s[k] for s in samples]
    mask = np.zeros(batch_size, dtype=np.float32)
    mask[:n] = 1.0
    batch["sample_mask"] = mask
    return batch


class BatchLoader:
    """Deterministic, prefetching batch loader over a MomentDataset."""

    def __init__(
        self,
        dataset: MomentDataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 4,
        seed: int = 0,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch

    def __len__(self) -> int:
        n = len(self.dataset)
        return (n + self.batch_size - 1) // self.batch_size

    @property
    def num_samples(self) -> int:
        return len(self.dataset)

    def _stream(self, epoch: int, counter: int) -> np.random.Generator:
        # Philox 2x64 key: (seed, epoch) in word 0, stream counter in word 1.
        key = [((self.seed & 0xFFFFFFFF) << 32) | (epoch & 0xFFFFFFFF), counter]
        return np.random.Generator(np.random.Philox(key=key))

    def _sample_rng(self, epoch: int, index: int) -> np.random.Generator:
        return self._stream(epoch, 2 * index)

    def _order(self, epoch: int) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._stream(epoch, 1).shuffle(order)
        return order

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, Any]]:
        """Iterate batches for one epoch, prefetching in the background."""
        order = self._order(epoch)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_checked(item) -> bool:
            """Enqueue, re-checking `stop` so an abandoned consumer (e.g. a
            training step raised mid-epoch) never leaves this thread parked
            forever on a full queue."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    # Submit per-batch chunks; keep ordering deterministic.
                    for start in range(0, len(order), self.batch_size):
                        if stop.is_set():
                            return
                        idxs = order[start : start + self.batch_size]
                        futures = [
                            pool.submit(
                                self.dataset.sample, int(i), self._sample_rng(epoch, int(i))
                            )
                            for i in idxs
                        ]
                        samples = [f.result() for f in futures]
                        if not put_checked(collate(samples, self.batch_size)):
                            return
                put_checked(None)
            except BaseException as exc:  # surface worker errors to consumer
                put_checked(exc)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
