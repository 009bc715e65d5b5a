"""Host input pipeline: batching, shuffling, prefetch.

Replaces the reference's DataLoader (/root/reference/utils_data.py:31-80),
whose per-image synchronous PIL decode on the training thread was the #1
throughput bottleneck (SURVEY.md §3.1 hot loops). Design changes:

- images are held/shipped as uint8; normalization happens on device
  (gltvae.train.steps._as_f32_image / the Pallas preprocess kernel) —
  4x less host->device traffic than the reference's host-side f32.
- decode + batch assembly run on worker threads (PIL/cv2 release the GIL
  during JPEG decode), with a bounded prefetch queue so the accelerator
  never waits on the host. A C++ decode pool (native/) slots in behind
  the same interface for GIL-free decoding at pod scale.
- per-epoch reshuffle by default; `reshuffle_each_epoch=False` restores
  the reference's shuffle-once-at-init semantics (utils_data.py:39-40)
  for parity runs.
- wrap-around batching matches the reference exactly: the final short
  batch is completed with indices from the front (utils_data.py:65-72).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Callable, Iterator, Optional, Tuple

import numpy as np


@dataclass
class ArrayDataset:
    """In-memory dataset: uint8 images + float labels."""
    images: np.ndarray           # (N, H, W, C) uint8 (or f32)
    labels: np.ndarray           # (N, y_dim)

    def __post_init__(self):
        assert len(self.images) == len(self.labels)

    def __len__(self):
        return len(self.images)

    def fetch(self, idxs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        return self.images[idxs], self.labels[idxs]


class BatchLoader:
    """Infinite wrap-around batch stream with optional worker prefetch.

    `n_s` and `epoch_batches` mirror the reference loader's accounting
    (utils_data.py:36, gated_ccvae.py:320-334 uses ceil(n_s/bs))."""

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 reshuffle_each_epoch: bool = True, seed: int = 0,
                 num_workers: int = 0, prefetch: int = 4):
        self.dataset = dataset
        self.bs = batch_size
        self.n_s = len(dataset)
        self.shuffle = shuffle
        self.reshuffle_each_epoch = reshuffle_each_epoch
        self._rng = np.random.RandomState(seed)
        self._idxs = np.arange(self.n_s)
        if shuffle:
            self._rng.shuffle(self._idxs)
        self._start = 0
        self.num_workers = num_workers
        self.prefetch = prefetch

    @property
    def epoch_batches(self) -> int:
        return int(np.ceil(self.n_s / self.bs))

    def _next_batch_idxs(self) -> np.ndarray:
        """Reference-exact wrap-around slice (utils_data.py:65-72)."""
        s, bs, n = self._start, self.bs, self.n_s
        if s + bs < n:
            # copy, not view: the epoch-boundary reshuffle below is
            # in-place, and prefetched batches must not see it
            out = self._idxs[s:s + bs].copy()
            self._start = s + bs
        else:
            out = np.concatenate([self._idxs[s:], self._idxs[:bs - (n - s)]])
            self._start = (s + bs) % n
            if self.reshuffle_each_epoch and self.shuffle:
                self._rng.shuffle(self._idxs)
        return out

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        if self.num_workers > 0:
            return self._threaded_iter()
        return self._sync_iter()

    def _sync_iter(self):
        while True:
            yield self.dataset.fetch(self._next_batch_idxs())

    def _threaded_iter(self):
        """Bounded-queue pipeline: index generation stays ordered on one
        feeder thread; fetch/decode fans out to workers; batches are
        re-ordered by sequence number so training sees a deterministic
        stream regardless of decode-latency jitter."""
        idx_q: queue.Queue = queue.Queue(maxsize=self.prefetch * 2)
        out: dict = {}
        out_lock = threading.Condition()
        stop = threading.Event()

        def feeder():
            seq = 0
            item = None
            while not stop.is_set():
                if item is None:  # generate once; retry the same item on Full
                    item = (seq, self._next_batch_idxs())
                    seq += 1
                try:
                    idx_q.put(item, timeout=0.1)
                    item = None
                except queue.Full:
                    continue

        def worker():
            while not stop.is_set():
                try:
                    seq, idxs = idx_q.get(timeout=0.1)
                except queue.Empty:
                    continue
                batch = self.dataset.fetch(idxs)
                with out_lock:
                    out[seq] = batch
                    out_lock.notify_all()

        threads = [threading.Thread(target=feeder, daemon=True)]
        threads += [threading.Thread(target=worker, daemon=True)
                    for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            seq = 0
            while True:
                with out_lock:
                    while seq not in out:
                        out_lock.wait(timeout=1.0)
                    batch = out.pop(seq)
                seq += 1
                yield batch
        finally:
            stop.set()

    def reset(self):
        self._start = 0
