"""Grain-backed CelebA pipeline (optional backend).

Google Grain is the canonical TPU input pipeline (deterministic, seekable,
multi-worker); this module exposes the same splits as gltvae.data.celeba
through `grain.MapDataset` so large-scale runs get checkpointable input
state and process-parallel decode for free. Host-sharding for multi-host
DP: pass `shard_options=grain.ShardOptions(shard_index=process_index,
shard_count=process_count)`.

Falls back cleanly (is_available()) when grain is absent.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np

try:
    import grain.python as grain
    _GRAIN = True
except ImportError:  # pragma: no cover
    grain = None
    _GRAIN = False


def is_available() -> bool:
    return _GRAIN


class _DecodeMap:
    """Decode one record: (image path, label row) -> (uint8 image, f32 y)."""

    def __init__(self, image_dir: str, ids, labels, image_size: int,
                 center_crop: bool = False):
        self.image_dir = image_dir
        self.ids = list(ids)
        self.labels = np.asarray(labels, np.float32)
        self.image_size = image_size
        self.center_crop = center_crop

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, i: int):
        import cv2
        path = os.path.join(self.image_dir, self.ids[i])
        img = cv2.cvtColor(cv2.imread(path, cv2.IMREAD_COLOR),
                           cv2.COLOR_BGR2RGB)
        if self.center_crop:
            h, w = img.shape[:2]
            s = min(h, w)
            img = img[(h - s) // 2:(h + s) // 2, (w - s) // 2:(w + s) // 2]
        img = cv2.resize(img, (self.image_size, self.image_size),
                         interpolation=cv2.INTER_LINEAR)
        return img.astype(np.uint8), self.labels[i]


def make_grain_loader(image_dir: str, ids, labels, *, batch_size: int,
                      image_size: int = 64, seed: int = 0,
                      shuffle: bool = True,
                      reshuffle_each_epoch: bool = True,
                      num_workers: int = 0,
                      center_crop: bool = False,
                      shard_options=None,
                      drop_remainder: bool = False):
    """grain.DatasetIterator yielding (uint8 [B,H,W,3], f32 [B,y]) batches,
    repeating indefinitely (epoch accounting is the trainer's job, as in
    gltvae.data.pipeline.BatchLoader).

    reshuffle_each_epoch=False (the --parity loader quirk, reference
    utils_data.py:39-40) bakes ONE seeded permutation into the source
    order instead of grain's per-epoch reshuffle, so every epoch replays
    the same fixed sequence like BatchLoader's shuffle-once mode."""
    if not _GRAIN:
        raise RuntimeError('grain is not installed')
    if shuffle and not reshuffle_each_epoch:
        ids_list = list(ids)
        perm = np.random.RandomState(seed).permutation(len(ids_list))
        ids = [ids_list[i] for i in perm]
        labels = np.asarray(labels)[perm]
    source = _DecodeMap(image_dir, ids, labels, image_size,
                        center_crop=center_crop)
    ds = grain.MapDataset.source(source)
    if shard_options is not None:
        ds = ds[shard_options.shard_index::shard_options.shard_count]
    # per-HOST epoch length: under shard_options each process sees only
    # its slice, so epoch accounting must count the slice, not the corpus
    n_local = len(ds)
    if shuffle and reshuffle_each_epoch:
        ds = ds.shuffle(seed=seed)
    ds = ds.repeat()
    it = ds.to_iter_dataset(
        grain.ReadOptions(num_threads=max(1, num_workers),
                          prefetch_buffer_size=max(2, num_workers) * 2))
    it = it.batch(batch_size, drop_remainder=drop_remainder)

    class _Loader:
        """BatchLoader-compatible facade (n_s / epoch_batches / __iter__).

        Holds ONE persistent DatasetIterator for the loader's lifetime:
        the trainer calls iter() once per epoch and must resume exactly
        after the last batch it saw (pipeline.BatchLoader contract). A
        fresh iterator per __iter__ would restart the repeated stream at
        grain-epoch 0 — same first batches every epoch, no per-epoch
        reshuffle."""
        n_s = n_local

        def __init__(self):
            self._it = iter(it)

        @property
        def epoch_batches(self) -> int:
            return int(np.ceil(self.n_s / batch_size))

        def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
            for imgs, ys in self._it:
                yield np.asarray(imgs), np.asarray(ys)

    return _Loader()
