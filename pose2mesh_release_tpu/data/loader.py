"""Batch loader: threaded host-side pipeline feeding device-ready batches.

Replaces torch DataLoader + 16 worker processes (lib/core/base.py:30-43).
Because GT synthesis is precomputed (data.gt_synth), per-sample work is
tiny 2-D numpy, so a small thread pool + double-buffered prefetch queue
keeps a TPU fed without process-spawn overhead.  Per-host sharding for
multi-host SPMD: each host iterates its own contiguous index shard
(`host_id`/`host_count`), matching jax.distributed process indices.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

__all__ = ["BatchLoader", "stack_samples"]


def stack_samples(samples):
    """Stack a list of per-sample pytrees (dicts/tuples of arrays)."""
    first = samples[0]
    if isinstance(first, dict):
        return {k: stack_samples([s[k] for s in samples]) for k in first}
    if isinstance(first, (tuple, list)):
        return type(first)(
            stack_samples([s[i] for s in samples]) for i in range(len(first))
        )
    return np.stack(samples)


class BatchLoader:
    """Iterable over stacked batches with background prefetch.

    dataset: anything with __len__/__getitem__.
    drop_last: True for training (static shapes under jit).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 8,
        prefetch: int = 2,
        seed: int = 0,
        host_id: int = 0,
        host_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        self.host_id = host_id
        self.host_count = host_count

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        # contiguous per-host shard (same order across hosts given same seed)
        shard = len(idx) // self.host_count
        if self.host_count > 1:
            idx = idx[self.host_id * shard:(self.host_id + 1) * shard]
        return idx

    def __len__(self) -> int:
        n = len(self._epoch_indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        indices = self._epoch_indices()
        nb = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        fused = (getattr(self.dataset, "supports_batch", lambda: False)())

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in range(nb):
                    if stop.is_set():
                        return
                    batch_idx = indices[b * self.batch_size:(b + 1) * self.batch_size]
                    if fused:  # vectorized whole-batch path (data/pipeline.py)
                        q.put(self.dataset.get_batch(batch_idx))
                    else:
                        samples = list(pool.map(self.dataset.__getitem__, batch_idx))
                        q.put(stack_samples(samples))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
