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
    (utils_data.py:36, gated_ccvae.py:320-334 uses ceil(n_s/bs)).

    `shard=(process_index, process_count)` enables HOST-SHARDED multi-host
    input: every process generates the identical seed-coordinated global
    index stream (so DP semantics stay mesh-shape-independent), but each
    fetches/decodes only its own contiguous 1/N slice of every batch —
    rows [p*B/N, (p+1)*B/N), matching the global-array row ownership of
    parallel/dp.shard_batch(local=True). This removes the N-x redundant
    JPEG decode of the replicate-then-slice convention (each host decodes
    exactly global/N images; the reference's single-host loader,
    utils_data.py:48-63, is the bottleneck being multiplied)."""

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 reshuffle_each_epoch: bool = True, seed: int = 0,
                 num_workers: int = 0, prefetch: int = 4,
                 shard: Optional[Tuple[int, int]] = None):
        self.dataset = dataset
        self.bs = batch_size
        if shard is not None:
            pid, pc = shard
            if not (0 <= pid < pc):
                raise ValueError(f'shard process_index {pid} out of range '
                                 f'for process_count {pc}')
            if batch_size % pc:
                raise ValueError(
                    f'host-sharded loading needs batch_size divisible by '
                    f'process_count (got {batch_size} % {pc}) — rows would '
                    f'be silently dropped')
        self.shard = shard
        self.n_s = len(dataset)
        self.shuffle = shuffle
        self.reshuffle_each_epoch = reshuffle_each_epoch
        self._seed = seed
        rng = np.random.RandomState(seed)
        idxs = np.arange(self.n_s)
        if shuffle:
            rng.shuffle(idxs)
        self._cur = BatchLoader._Cursor(idxs, 0, rng)
        self.num_workers = num_workers
        self.prefetch = prefetch

    # compatibility views onto the authoritative cursor
    @property
    def _start(self):
        return self._cur.start

    @property
    def _idxs(self):
        return self._cur.idxs

    @property
    def _rng(self):
        return self._cur.rng

    @property
    def epoch_batches(self) -> int:
        return int(np.ceil(self.n_s / self.bs))

    class _Cursor:
        """Index-stream state: (permutation, offset, rng). The loader owns
        the authoritative cursor; a threaded iterator additionally runs a
        SPECULATIVE clone ahead of consumption (generation is deterministic,
        so clone and authoritative streams are identical)."""

        __slots__ = ('idxs', 'start', 'rng')

        def __init__(self, idxs, start, rng):
            self.idxs, self.start, self.rng = idxs, start, rng

        def clone(self) -> 'BatchLoader._Cursor':
            rng = np.random.RandomState()
            rng.set_state(self.rng.get_state())
            return BatchLoader._Cursor(self.idxs.copy(), self.start, rng)

    def _advance(self, cur: '_Cursor') -> np.ndarray:
        """Reference-exact wrap-around slice (utils_data.py:65-72),
        mutating the given cursor."""
        s, bs, n = cur.start, self.bs, self.n_s
        if s + bs < n:
            # copy, not view: the epoch-boundary reshuffle below is
            # in-place, and prefetched batches must not see it
            out = cur.idxs[s:s + bs].copy()
            cur.start = s + bs
        else:
            out = np.concatenate([cur.idxs[s:], cur.idxs[:bs - (n - s)]])
            cur.start = (s + bs) % n
            if self.reshuffle_each_epoch and self.shuffle:
                cur.rng.shuffle(cur.idxs)
        return out

    def _next_batch_idxs(self) -> np.ndarray:
        return self._advance(self._cur)

    def epoch_indices(self) -> np.ndarray:
        """Advance the authoritative cursor one epoch and return the
        stacked [epoch_batches, bs] GLOBAL index stream — exactly the
        batches iteration would have fetched. Device-resident eval
        (train/steps.py::make_resident_eval_step) gathers these rows on
        device instead of fetching/shipping them from host."""
        return np.stack([self._next_batch_idxs()
                         for _ in range(self.epoch_batches)])

    def _local(self, idxs: np.ndarray) -> np.ndarray:
        """This process's slice of a global batch's indices (identity when
        unsharded). Slicing AFTER the global stream is generated keeps the
        permutation/cursor state identical on every process."""
        if self.shard is None:
            return idxs
        pid, pc = self.shard
        ls = len(idxs) // pc
        return idxs[pid * ls:(pid + 1) * ls]

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        if self.num_workers > 0:
            return self._threaded_iter()
        return self._sync_iter()

    def _sync_iter(self):
        while True:
            yield self.dataset.fetch(self._local(self._next_batch_idxs()))

    def _threaded_iter(self):
        """Bounded pipeline: index generation stays ordered on one feeder
        thread working a SPECULATIVE cursor clone; fetch/decode fans out to
        workers; batches are re-ordered by sequence number so training sees
        a deterministic stream regardless of decode-latency jitter.

        Two invariants the naive version got wrong:
        - backpressure at the SOURCE: the feeder stalls once
          produced − consumed ≥ cap, so the completed-batch buffer is
          bounded (not just the pending-index queue);
        - the loader's authoritative cursor advances only on CONSUMED
          batches (replayed at yield time — generation is deterministic, so
          speculative ≡ authoritative). Abandoning an iterator mid-stream
          (fresh iter() every epoch) therefore skips nothing: the next
          iterator resumes exactly after the last batch training saw.
        """
        spec = self._cur.clone()
        cap = self.prefetch * 2 + self.num_workers
        idx_q: queue.Queue = queue.Queue(maxsize=self.prefetch * 2)
        out: dict = {}
        cv = threading.Condition()
        counters = {'consumed': 0}
        stop = threading.Event()
        # introspection handle for tests asserting the backpressure cap
        self._iter_buffers = {'out': out, 'idx_q': idx_q,
                              'counters': counters, 'cap': cap}

        def feeder():
            seq = 0
            item = None
            while not stop.is_set():
                with cv:
                    while (seq - counters['consumed'] >= cap
                           and not stop.is_set()):
                        cv.wait(timeout=0.1)
                if stop.is_set():
                    return
                if item is None:  # generate once; retry the same item on Full
                    item = (seq, self._advance(spec))
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
                batch = self.dataset.fetch(self._local(idxs))
                with cv:
                    out[seq] = batch
                    cv.notify_all()

        threads = [threading.Thread(target=feeder, daemon=True)]
        threads += [threading.Thread(target=worker, daemon=True)
                    for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            seq = 0
            while True:
                with cv:
                    while seq not in out:
                        cv.wait(timeout=1.0)
                    batch = out.pop(seq)
                    counters['consumed'] = seq + 1
                    cv.notify_all()
                # commit: advance the authoritative cursor past this batch
                self._advance(self._cur)
                seq += 1
                yield batch
        finally:
            stop.set()

    def reset(self):
        """Restore the exact post-init state (seeded permutation + cursor)
        so a reset loader replays the identical batch stream."""
        rng = np.random.RandomState(self._seed)
        idxs = np.arange(self.n_s)
        if self.shuffle:
            rng.shuffle(idxs)
        self._cur = BatchLoader._Cursor(idxs, 0, rng)
