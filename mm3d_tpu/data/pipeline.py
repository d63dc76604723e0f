"""Host-side input pipeline: fixed-shape batches + background prefetch.

The reference's train loop blocks on per-batch numpy work (SURVEY.md §3.1);
here a daemon thread produces batches ahead of the consumer and
(optionally) starts the H2D transfer early, double-buffering the input so
the accelerator never waits on preprocessing.  Heavy augmentation lives
on-device (`augment.py`), so the host only samples/stacks.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional, Sequence

import jax
import numpy as np


def _default_collate(samples: Sequence[Any]):
    first = samples[0]
    if isinstance(first, dict):
        return {k: np.stack([s[k] for s in samples]) for k in first}
    if isinstance(first, tuple):
        return tuple(np.stack([s[i] for s in samples])
                     for i in range(len(first)))
    return np.stack(samples)


class DataPipeline:
    """Batches a map-style dataset with per-epoch shuffling and prefetch.

    Args:
      dataset: supports __len__ and __getitem__(int).
      batch_size: static batch size; incomplete tails are dropped so every
        device step sees the same shapes (no recompiles).
      shuffle: reshuffle indices every epoch from `seed`.
      prefetch: number of batches prepared ahead by the worker thread.
      to_device: if True, `jax.device_put` each batch as it is produced
        (overlaps H2D with the previous step's compute).
      sharding: optional jax sharding passed to device_put (DP batch layout).
      pad_remainder: if True, the final incomplete batch is padded (by
        wrapping to the first samples) instead of dropped, and the epoch
        iterator yields ``(batch, valid)`` pairs where ``valid`` is a
        bool [batch_size] row mask — eval must see the full test set
        (the reference protocol evaluates every sample).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, prefetch: int = 2,
                 collate: Optional[Callable] = None,
                 to_device: bool = True, sharding=None,
                 pad_remainder: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = max(1, prefetch)
        self.collate = collate or _default_collate
        self.to_device = to_device
        self.sharding = sharding
        self.pad_remainder = pad_remainder

    def steps_per_epoch(self) -> int:
        n = len(self.dataset)
        if self.pad_remainder:
            return -(-n // self.batch_size)
        return n // self.batch_size

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + epoch).shuffle(idx)
        total = self.steps_per_epoch() * self.batch_size
        if self.pad_remainder and total > n:
            # wrap-pad; np.resize cycles when the pad exceeds the
            # dataset (idx[:total-n] under-padded for n < batch_size,
            # silently yielding ZERO eval batches)
            idx = np.concatenate([idx, np.resize(idx, total - n)])
        return idx[:total]

    def epoch(self, epoch: int = 0,
              max_steps: Optional[int] = None) -> Iterator[Any]:
        """Iterate one epoch of batches with background prefetch.

        max_steps bounds the epoch (e.g. the Trainer's BN-refresh
        passes): the worker thread sees the same bound, so a consumer
        that stops there never leaves the worker blocked on a full
        prefetch queue (thread + device-batch leak otherwise)."""
        n = len(self.dataset)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)  # per-epoch resampling
        idx = self._epoch_indices(epoch)
        nsteps = len(idx) // self.batch_size
        if max_steps is not None:
            nsteps = min(nsteps, max_steps)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()
        stop = threading.Event()

        def put(item):
            # bounded put: an abandoned consumer (exception mid-epoch,
            # early break) sets `stop` from the generator finalizer so
            # the worker exits instead of blocking forever on a full
            # queue while pinning device batches
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for s in range(nsteps):
                    lo = s * self.batch_size
                    rows = idx[lo:lo + self.batch_size]
                    batch = self.collate([self.dataset[int(i)] for i in rows])
                    if self.pad_remainder:
                        valid = np.arange(lo, lo + self.batch_size) < n
                        batch = (batch, valid)
                    if self.to_device:
                        batch = jax.device_put(batch, self.sharding)
                    if not put(batch):
                        return
            except Exception as e:  # surface worker errors to the consumer
                put(e)
            finally:
                put(SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is SENTINEL:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
