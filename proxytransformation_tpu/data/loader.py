"""Simple prefetching data loader (thread-based).

Replaces the reference's torch DataLoader + SharedArray machinery
(reference: configs/...clip.py:145-164, utils/shared_mem_utils.py) with
a host-side loader: shuffling sampler, preprocessor collate, and a
background-thread prefetch queue (the TPU transfer overlaps compute).
Per-host sharding under jax.distributed: each host iterates its own
slice of the index space.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np


class DataLoader:

    def __init__(self, dataset, batch_size: int, collate_fn: Callable,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True,
                 prefetch: int = 2, num_shards: int = 1, shard_id: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # per-host shard (DistSamplerSeed equivalent)
        idx = idx[self.shard_id::self.num_shards]
        if self.drop_last:
            n_batches = len(idx) // self.batch_size
            idx = idx[:n_batches * self.batch_size]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        return (n // self.batch_size if self.drop_last
                else -(-n // self.batch_size))

    def __iter__(self) -> Iterator:
        idx = self._indices()
        batches = [
            idx[i:i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()
        cancel = threading.Event()

        def _put(item) -> bool:
            """put that aborts when the consumer went away."""
            while not cancel.is_set():
                try:
                    q.put(item, timeout=0.05)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in batches:
                    if cancel.is_set():
                        return
                    samples = [self.dataset[int(i)] for i in b]
                    if not _put(self.collate_fn(samples)):
                        return
            except Exception as e:  # surface pipeline errors to the consumer
                _put(e)
            _put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            # Generator cleanup: a consumer that stops early (partial
            # epoch, exception, test loop) must not leak a live worker
            # parked on q.put — a background thread touching numpy/jax
            # concurrently with later compiles corrupted the test
            # process (observed: SIGSEGV inside the compilation cache).
            cancel.set()
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5.0)
