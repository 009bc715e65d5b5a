"""Structured training metrics: per-step ELBO decomposition + throughput.

The reference logs only tqdm postfix scalars and a per-epoch val accuracy
line (gated_ccvae.py:351-386). Here every step's ELBO terms are recorded
(host-async: metrics stay on device until flush, so logging never forces a
device sync inside the hot loop — the reference's per-step .numpy() sync,
SURVEY.md §3.1, is exactly what this avoids) and written as CSV.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, List, Optional

import jax
import numpy as np


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, flush_every: int = 50,
                 tensorboard_dir: Optional[str] = None):
        self.path = path
        self.flush_every = flush_every
        self._pending: List[Dict] = []   # values may be device arrays
        self._rows: List[Dict] = []
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        # a resumed run appends to the existing CSV — only write the
        # header once per FILE, not once per process
        self._header_written = bool(path and os.path.exists(path)
                                    and os.path.getsize(path) > 0)
        # Optional TensorBoard event stream alongside the CSV (SURVEY §5
        # metrics plan). Writer creation is deferred to the first flush
        # so runs without --tensorboard never pay it — but the TF import
        # is probed NOW so a missing tensorflow fails before minutes of
        # compile/training, not at the first mid-run flush.
        self.tensorboard_dir = tensorboard_dir
        self._tb_writer = None
        if tensorboard_dir:
            try:
                import tensorflow  # noqa: F401  (CPU-only event writer)
            except ImportError as e:
                raise RuntimeError(
                    '--tensorboard needs tensorflow for the event writer '
                    '(CSV metrics work without it)') from e

    def _tb(self):
        if self._tb_writer is None and self.tensorboard_dir:
            import tensorflow as tf    # CPU-only here; never touches TPU
            self._tb_writer = tf.summary.create_file_writer(
                self.tensorboard_dir)
        return self._tb_writer

    def log(self, step: int, metrics: Dict, **extra):
        """Queue device scalars WITHOUT syncing; they are fetched at flush."""
        row = {'step': step, 'time': time.time(), **metrics, **extra}
        self._pending.append(row)
        if len(self._pending) >= self.flush_every:
            self.flush()

    def flush(self) -> List[Dict]:
        if not self._pending:
            return self._rows
        fetched = jax.device_get(self._pending)
        rows = [{k: (float(v) if isinstance(v, (np.ndarray, np.generic))
                     else v) for k, v in r.items()} for r in fetched]
        self._rows.extend(rows)
        self._pending.clear()
        tb = self._tb()
        if tb is not None:
            import tensorflow as tf
            with tb.as_default():
                for r in rows:
                    for k, v in r.items():
                        if k in ('step', 'time') or not isinstance(
                                v, (int, float)):
                            continue
                        tf.summary.scalar(k, v, step=int(r['step']))
            tb.flush()
        if self.path:
            write_header = not self._header_written
            with open(self.path, 'a', newline='') as f:
                w = csv.DictWriter(f, fieldnames=sorted(rows[0].keys()))
                if write_header:
                    w.writeheader()
                    self._header_written = True
                for r in rows:
                    w.writerow(r)
        return self._rows

    @property
    def rows(self) -> List[Dict]:
        self.flush()
        return self._rows


class Throughput:
    """images/sec meter with warmup exclusion (compile steps skew means)."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup = warmup_steps
        self._count = 0
        self._images = 0
        self._images_raw = 0
        self._t0 = None

    def step(self, batch_images: int):
        self._count += 1
        self._images_raw += batch_images
        if self._count == self.warmup + 1:
            self._t0 = time.perf_counter()
            self._images = 0
        if self._count > self.warmup:
            self._images += batch_images

    @property
    def images_total(self) -> int:
        """ALL images stepped, warmup included — per-epoch deltas must
        use this raw counter (epoch wall time includes the warmup
        dispatches, so excluding their images would understate epoch-0
        rates; the warmup gate only serves the run-level mean)."""
        return self._images_raw

    @property
    def images_per_sec(self) -> float:
        if self._t0 is None or self._images == 0:
            return 0.0
        dt = time.perf_counter() - self._t0
        return self._images / dt if dt > 0 else 0.0
