"""CelebA disk pipeline: attribute parsing, official splits, decode workers.

Reproduces the data semantics of /root/reference/utils_data.py:83-196:
- the hybrid space+comma attr-CSV parse (rows look like
  '000001.jpg,-1,1,...'; the reference splits on space then on comma —
  net effect: image id + 40 ints) — we parse directly;
- -1 -> 0 label mapping, 40 -> 18 'easy' label filtering;
- hardcoded official split sizes 162770/19867/19962 (the reference ships
  but ignores list_eval_partition.csv);
- sup/unsup split = leading sup_frac fraction of train;
- resize to 64x64 with NO crop (aspect-distorting, reference quirk:
  utils_data.py:57 PIL .resize((64,64))). A center-crop option exists for
  the 128px config.

The decode path is pluggable: cv2 (fastest pure-Python), PIL, or the C++
libjpeg worker pool in native/ (see gltvae.data.native_loader).
"""

from __future__ import annotations

import csv
import os
import threading
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from gltvae.config import (CELEBA_LABELS, CELEBA_EASY_LABELS, DataConfig)
from gltvae.data.pipeline import BatchLoader
from gltvae.ops.gating import gating_matrix_from_labels


def load_attr_csv(path: str,
                  use_easy_labels: bool = True
                  ) -> Tuple[List[str], np.ndarray]:
    """Parse list_attr_celeba.csv -> (image ids, 0/1 label matrix).

    Handles both the comma-separated Kaggle format the reference consumes
    (utils_data.py:99-127) and the original space-separated
    list_attr_celeba.txt layout.
    """
    with open(path) as f:
        rows = list(csv.reader(f, delimiter=' ', skipinitialspace=True))
    # drop header(s): the txt format has a count line + header line;
    # the csv format has one header row.
    if len(rows[0]) == 1 and rows[0][0].split(',')[0] == 'image_id':
        rows = rows[1:]
    elif rows[0] and rows[0][0].isdigit():
        rows = rows[2:]
    elif rows[0] and rows[0][0] == 'image_id':
        rows = rows[1:]

    ids, data = [], []
    for row in rows:
        if not row:
            continue
        if ',' in row[0]:        # comma-separated (Kaggle csv)
            parts = row[0].split(',')
            ids.append(parts[0])
            data.append([int(v) for v in parts[1:]])
        else:                    # space-separated (original txt)
            ids.append(row[0])
            data.append([int(v) for v in row[1:]])
    labels = np.asarray(data, dtype=np.int64)
    labels[labels == -1] = 0
    if use_easy_labels:
        keep = [i for i, name in enumerate(CELEBA_LABELS)
                if name in CELEBA_EASY_LABELS]
        labels = labels[:, keep]
    return ids, labels


def load_partition_csv(path: str) -> Dict[str, int]:
    """Parse list_eval_partition.csv -> {image_id: partition} with the
    official coding 0=train, 1=valid, 2=test. Accepts the comma CSV the
    reference ships (header 'image_id,partition') and the original
    space-separated list_eval_partition.txt."""
    out: Dict[str, int] = {}
    with open(path) as f:
        for lineno, line in enumerate(f, start=1):
            line = line.strip()
            if not line:
                continue
            parts = (line.split(',') if ',' in line else line.split())
            if parts[0] == 'image_id':
                continue                       # header
            if len(parts) < 2 or not parts[0]:
                raise ValueError(
                    f'{path}:{lineno}: malformed partition row {line!r} '
                    f'— expected "<image_id>,<partition>" (or '
                    f'space-separated); is the file truncated?')
            try:
                out[parts[0]] = int(parts[1])
            except ValueError:
                raise ValueError(
                    f'{path}:{lineno}: partition column {parts[1]!r} is '
                    f'not an integer (expected 0=train, 1=valid, 2=test) '
                    f'in row {line!r}') from None
    return out


@dataclass
class _SplitData:
    ids: List[str]
    labels: np.ndarray

    def __len__(self):
        return len(self.ids)


class ImageFolderDataset:
    """Decode-on-fetch dataset over a directory of JPEGs.

    fetch() decodes a batch of images to a uint8 array — run under
    BatchLoader worker threads (decode releases the GIL) or swapped for
    the native C++ pool.
    """

    def __init__(self, image_dir: str, split: _SplitData, image_size: int,
                 center_crop: bool = False, backend: str = 'auto',
                 host_resize: bool = True):
        self.image_dir = image_dir
        self.split = split
        self.image_size = image_size
        self.center_crop = center_crop
        # host_resize=False ships decoded full-resolution uint8; the
        # resize then runs on device inside the train jit
        # (DataConfig.device_resize -> gltvae.ops.resize bilinear GEMMs)
        self.host_resize = host_resize
        if backend == 'auto':
            try:
                import cv2  # noqa: F401
                backend = 'cv2'
            except ImportError:
                backend = 'pil'
        self.backend = backend

    def __len__(self):
        return len(self.split)

    def _decode(self, path: str) -> np.ndarray:
        s = self.image_size
        if self.backend == 'cv2':
            import cv2
            img = cv2.imread(path, cv2.IMREAD_COLOR)  # BGR
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            if self.center_crop:
                img = _center_crop(img)
            if not self.host_resize:
                return np.asarray(img, dtype=np.uint8)
            return cv2.resize(img, (s, s), interpolation=cv2.INTER_LINEAR)
        import PIL.Image
        # grayscale/RGBA/palette PNGs (tools/infer.py accepts arbitrary
        # photo dirs) must land as 3-channel RGB like every other image
        img = PIL.Image.open(path).convert('RGB')
        if self.center_crop:
            img = PIL.Image.fromarray(_center_crop(np.asarray(img)))
        if not self.host_resize:
            return np.asarray(img, dtype=np.uint8)
        # The reference's exact resize call: np.array -> fromarray ->
        # .resize((64,64)) with the DEFAULT resample (utils_data.py:55-58)
        # — antialiased BICUBIC on modern Pillow. This is the
        # byte-identical-parity backend; cv2's INTER_LINEAR above is NOT
        # antialiased on downscale (keeps ~3x more high-frequency
        # content), which docs/HEAD2HEAD.md measures as a real
        # early-learning difference on noisy corpora.
        return np.asarray(img.resize((s, s)), dtype=np.uint8)

    def fetch(self, idxs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        imgs = np.stack([
            self._decode(os.path.join(self.image_dir, self.split.ids[i]))
            for i in idxs])
        return imgs, self.split.labels[idxs].astype(np.float32)


def _center_crop(img: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    s = min(h, w)
    top, left = (h - s) // 2, (w - s) // 2
    return img[top:top + s, left:left + s]


class CachedDataset:
    """In-RAM decoded-image cache around any fetch(idxs) dataset.

    tf.data.cache() counterpart for the uint8 ship path: the first epoch
    decodes through the wrapped dataset (cv2 / PIL / C++ pool) and stores
    each image in a preallocated uint8 array; later epochs are pure numpy
    gathers, so training stops being host-decode-bound after epoch 1
    (the reference re-decodes every JPEG every epoch,
    utils_data.py:48-63). Thread-safety under BatchLoader's workers: the
    one-time array allocation is double-checked under a lock (a bare
    `is None` check could let a second worker rebind `_imgs` and orphan
    already-cached rows whose `_have` flags stay set); after that no
    lock is needed — rows are written before their `_have` flags and a
    racing double-decode of one index writes identical bytes.
    """

    def __init__(self, ds):
        self.ds = ds
        self.split = ds.split
        self._imgs = None                   # allocated on first miss batch
        self._have = np.zeros(len(ds), dtype=bool)
        self._alloc_lock = threading.Lock()

    def __len__(self):
        return len(self.ds)

    def fetch(self, idxs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        idxs = np.asarray(idxs)
        miss = idxs[~self._have[idxs]]
        if miss.size:
            imgs, _ = self.ds.fetch(miss)
            if self._imgs is None:
                with self._alloc_lock:
                    if self._imgs is None:
                        self._imgs = np.empty(
                            (len(self.ds),) + imgs.shape[1:], dtype=np.uint8)
            self._imgs[miss] = imgs
            self._have[miss] = True
        return self._imgs[idxs], self.split.labels[idxs].astype(np.float32)


class DiskCachedDataset:
    """Disk-PERSISTENT decoded-image cache (np.memmap-backed).

    CachedDataset removes re-decode within one process; this removes it
    across processes and runs — the tf.data `cache(filename=...)`
    counterpart. Decoded uint8 rows stream into a memmap of shape
    (N, S, S, 3) under `cache_dir`, keyed by the split's image list +
    decode size (so a changed corpus or resolution can never serve stale
    rows), and a `.complete` sidecar is written atomically once every row
    has been decoded. A later run — any process, any decode backend —
    opens the completed file read-only and serves batches at page-cache
    speed with zero JPEG work. Incomplete caches (interrupted first
    epoch) are simply re-filled: rows are only trusted once the marker
    exists, so torn writes cannot serve garbage.

    Thread-safety under BatchLoader workers mirrors CachedDataset: row
    bytes are written before their `_have` flags, and a racing
    double-decode of one index writes identical bytes.
    """

    def __init__(self, ds, cache_dir: str, name: str):
        import hashlib
        import json
        self.ds = ds
        self.split = ds.split
        n = len(ds)
        size = ds.image_size
        key = hashlib.sha256(
            ('\n'.join(ds.split.ids)
             + f'|{size}|{getattr(ds, "center_crop", False)}')
            .encode()).hexdigest()[:16]
        os.makedirs(cache_dir, exist_ok=True)
        base = os.path.join(cache_dir, f'{name}_{size}px_{key}')
        self._data_path = base + '.u8'
        self._marker_path = base + '.complete'
        self._shape = (n, size, size, 3)
        meta = {'n': n, 'size': size, 'key': key}
        if os.path.exists(self._marker_path):
            self._mm = np.memmap(self._data_path, dtype=np.uint8, mode='r',
                                 shape=self._shape)
            self._have = None               # complete: inner ds never used
        else:
            self._reap_stale_fills()
            # NEVER memmap the shared path with truncating 'w+': that
            # zeroes rows a concurrently filling sibling process (multi-
            # host run on shared scratch, or two jobs) already wrote and
            # flagged, making it silently serve zeros. Fill a process-
            # unique temp instead; _finalize publishes it atomically.
            self._fill_path = f'{self._data_path}.{os.getpid()}.fill'
            self._mm = np.memmap(self._fill_path, dtype=np.uint8,
                                 mode='w+', shape=self._shape)
            self._have = np.zeros(n, dtype=bool)
            with open(base + '.json', 'w') as f:
                json.dump(meta, f)
        self._mark_lock = threading.Lock()

    def _reap_stale_fills(self):
        """Best-effort removal of .fill temps left by dead processes
        (killed mid-first-epoch). Live fillers are left alone."""
        import glob
        for p in glob.glob(self._data_path + '.*.fill'):
            try:
                pid = int(p.rsplit('.', 2)[-2])
                os.kill(pid, 0)             # raises if pid is gone
            except (ValueError, ProcessLookupError):
                try:
                    os.remove(p)
                except OSError:
                    pass
            except PermissionError:
                pass                         # pid alive under another uid

    def __len__(self):
        return self._shape[0]

    @property
    def complete(self) -> bool:
        return self._have is None

    def _finalize(self):
        with self._mark_lock:
            if self._have is None or not self._have.all():
                return
            self._mm.flush()
            # publish: atomic rename, then atomic marker. A sibling
            # process finishing later replaces the file with identical
            # bytes (same corpus + geometry, pinned by the key), so
            # readers of the old inode and the new one agree.
            os.replace(self._fill_path, self._data_path)
            tmp = self._marker_path + '.tmp'
            with open(tmp, 'w') as f:
                f.write('ok')
            os.replace(tmp, self._marker_path)   # atomic: no torn marker
            self._mm = np.memmap(self._data_path, dtype=np.uint8, mode='r',
                                 shape=self._shape)
            self._have = None

    def fetch(self, idxs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        idxs = np.asarray(idxs)
        # snapshot: another worker thread's _finalize may swap _mm to the
        # published read-only map and drop _have mid-fetch; locals keep
        # this fetch coherent (a straggler's writes go through the old
        # map to the inode os.replace just made live, identical bytes).
        have, mm = self._have, self._mm
        if have is not None:
            miss = idxs[~have[idxs]]
            if miss.size:
                imgs, _ = self.ds.fetch(miss)
                mm[miss] = imgs
                have[miss] = True
                if have.all():
                    self._finalize()
        return np.asarray(mm[idxs]), \
            self.split.labels[idxs].astype(np.float32)


class CelebAReader:
    """Split construction + gating init + loaders; the TPU-era counterpart
    of the reference CelebAReader (utils_data.py:83-196)."""

    def __init__(self, cfg: DataConfig, sup_frac: float, batch_size: int,
                 *, seed: int = 0, num_workers: Optional[int] = None,
                 reshuffle_each_epoch: bool = True,
                 shard: Optional[Tuple[int, int]] = None):
        self.cfg = cfg
        self.sup_frac = sup_frac
        self.batch_size = batch_size
        self.seed = seed
        # (process_index, process_count): host-sharded multi-host input —
        # each process decodes only its 1/N slice of every global batch
        # (BatchLoader.shard); pair with Trainer(local_batches=True)
        self.shard = shard
        self.num_workers = (cfg.num_workers if num_workers is None
                            else num_workers)
        self.reshuffle = reshuffle_each_epoch

        ids, labels = load_attr_csv(
            os.path.join(cfg.data_dir, cfg.attr_file), cfg.use_easy_labels)
        self.splits = self._make_splits(ids, labels)
        self.init_gating_prob = self._init_gating()

    def _make_splits(self, ids, labels) -> Dict[str, _SplitData]:
        cfg = self.cfg
        if cfg.split_file is not None:
            part = load_partition_csv(
                os.path.join(cfg.data_dir, cfg.split_file))
            missing = sum(1 for i in ids if i not in part)
            if missing:
                raise ValueError(
                    f'{missing}/{len(ids)} attr-CSV images are absent from '
                    f'split file {cfg.split_file}; the two files must '
                    'cover the same images')
            out = {}
            for name, code in (('train', 0), ('valid', 1), ('test', 2)):
                keep = [k for k, i in enumerate(ids) if part[i] == code]
                out[name] = _SplitData([ids[k] for k in keep], labels[keep])
            sizes_msg = (f'split file {cfg.split_file} assigns '
                         + '/'.join(str(len(out[m]))
                                    for m in ('train', 'valid', 'test')))
        else:
            n_tr, n_va = cfg.n_train, cfg.n_valid
            # test honors n_test rather than swallowing every remaining
            # CSV row (identical on official CelebA, where
            # 162770+19867+19962 covers the CSV exactly, but --n-test on
            # a larger corpus must mean what it says)
            n_end = n_tr + n_va + cfg.n_test
            out = {'train': _SplitData(ids[:n_tr], labels[:n_tr]),
                   'valid': _SplitData(ids[n_tr:n_tr + n_va],
                                       labels[n_tr:n_tr + n_va]),
                   'test': _SplitData(ids[n_tr + n_va:n_end],
                                      labels[n_tr + n_va:n_end])}
            sizes_msg = (f'the configured split sizes are n_train={n_tr}, '
                         f'n_valid={n_va} (defaults are the official '
                         'CelebA 162770/19867). For a smaller corpus pass '
                         '--n-train/--n-valid sized to the corpus')
        empty = [m for m in ('train', 'valid', 'test') if len(out[m]) == 0]
        if empty:
            raise ValueError(
                f'split(s) {empty} are empty: the attribute CSV lists '
                f'{len(ids)} images but {sizes_msg}.')
        tr = out['train']
        if self.sup_frac == 0.0:
            out['unsup'] = tr
        elif self.sup_frac == 1.0:
            out['sup'] = tr
        else:
            # leading-fraction sup split (utils_data.py:129-145), sized by
            # the ACTUAL train split (== n_train whenever sizes are exact)
            k = int(len(tr) * self.sup_frac)
            out['sup'] = _SplitData(tr.ids[:k], tr.labels[:k])
            out['unsup'] = _SplitData(tr.ids[k:], tr.labels[k:])
        return out

    def _init_gating(self) -> np.ndarray:
        y_dim = self.splits['train'].labels.shape[1]
        sup = self.splits['sup'].labels if 'sup' in self.splits else None
        return gating_matrix_from_labels(
            sup, self.splits['valid'].labels, y_dim, self.sup_frac,
            cache_dir=self.cfg.data_dir,
            label_names=(CELEBA_EASY_LABELS if self.cfg.use_easy_labels
                         else CELEBA_LABELS))

    def setup_data_loaders(self) -> Dict[str, BatchLoader]:
        if self.sup_frac == 0.0:
            # the reference builds no valid loader for sup=0.0
            # (utils_data.py modes) because it never checkpoints those
            # runs; this framework best-checkpoints them on validation
            # ELBO (train/loop.py), which needs the valid split
            modes = ['unsup', 'test', 'valid']
        elif self.sup_frac == 1.0:
            modes = ['sup', 'test', 'valid']
        else:
            modes = ['unsup', 'test', 'sup', 'valid']
        image_dir = os.path.join(self.cfg.data_dir, self.cfg.image_dir)
        backend = self.cfg.decode_backend
        if backend == 'grain' and self.cfg.cache_decoded:
            raise ValueError('cache_decoded applies to the cv2/pil/native '
                             'fetch() datasets; grain manages its own '
                             'pipeline (drop one of the two flags)')
        if self.cfg.cache_dir is not None:
            if backend == 'grain':
                raise ValueError('cache_dir applies to the cv2/pil/native '
                                 'fetch() datasets; grain manages its own '
                                 'pipeline (drop one of the two flags)')
            if self.cfg.cache_decoded:
                raise ValueError('cache_dir already serves rows from the '
                                 'OS page cache once filled; stacking the '
                                 'in-RAM cache_decoded on top doubles host '
                                 'memory for nothing (drop one)')
            if self.cfg.device_resize:
                raise ValueError('cache_dir stores host-resized fixed-'
                                 'shape uint8 rows; with device_resize '
                                 'rows are full-resolution (~19 GB for '
                                 'CelebA) — drop one of the two flags')
        if backend == 'native' and self.cfg.device_resize:
            raise ValueError('decode_backend=native always resizes on the '
                             'host (the C++ pool decodes straight into the '
                             'target-size buffer); drop device_resize or '
                             'use cv2/pil')
        if backend == 'grain' and self.cfg.device_resize:
            raise ValueError('decode_backend=grain always resizes on the '
                             'host (the grain DecodeMap resizes via cv2); '
                             'drop device_resize or use cv2/pil')
        if self.cfg.cache_decoded and self.cfg.device_resize:
            # at 64/128px the cache is ~1.9/7.6 GB; full-res 178x218
            # decode-only rows would be ~19 GB — refuse rather than
            # silently 10x the documented RAM budget
            raise ValueError('cache_decoded stores host-resized uint8 rows '
                             '(~1.9 GB at 64px); with device_resize the '
                             'cache would hold full-resolution 178x218 '
                             'images (~19 GB for CelebA) — drop one of the '
                             'two flags')
        return {mode: self._make_loader(mode, image_dir, backend)
                for mode in modes}

    def _make_loader(self, mode: str, image_dir: str, backend: str):
        """One split -> loader, routed by decode backend. All backends
        yield identical (uint8 [B,S,S,3], f32 [B,y]) batches; the choice
        is purely a host-throughput knob (the reference's single-threaded
        PIL decode, utils_data.py:48-63, was its data bottleneck)."""
        split = self.splits[mode]
        # augmentation pad: TRAIN images decode to S+2P so the device can
        # random-crop back to S (fused_augment); eval splits stay at S
        size = self.cfg.image_size
        if self.cfg.augment_pad and mode in ('sup', 'unsup', 'train'):
            if self.cfg.device_resize:
                raise ValueError('augment_pad with device_resize is '
                                 'unsupported (pick one device-side '
                                 'input stage)')
            size = size + 2 * self.cfg.augment_pad
        if backend == 'grain':
            from gltvae.data import grain_loader
            if not grain_loader.is_available():
                raise RuntimeError('decode_backend=grain: grain is not '
                                   'installed')
            # Host-sharded multi-host input, grain convention: each
            # process's dataset is the corpus SLICE ids[pid::pc] (grain
            # ShardOptions) and it batches its own bs/pc rows of every
            # global batch. Unlike the BatchLoader path (which slices a
            # seed-coordinated GLOBAL index stream, keeping batches
            # identical across mesh shapes), grain's slicing changes
            # which rows share a batch vs a single-host run — valid DP,
            # but not mesh-shape-invariant. Pair with
            # Trainer(local_batches=True) like the BatchLoader path.
            shard_options = None
            bs = self.batch_size
            if self.shard is not None:
                from grain.sharding import ShardOptions
                pid, pc = self.shard
                if bs % pc:
                    raise ValueError(
                        f'host-sharded grain loading needs batch_size '
                        f'divisible by process_count (got {bs} % {pc})')
                shard_options = ShardOptions(shard_index=pid,
                                             shard_count=pc)
                bs //= pc
            return grain_loader.make_grain_loader(
                image_dir, split.ids, split.labels,
                batch_size=bs,
                image_size=size, seed=self.seed,
                reshuffle_each_epoch=self.reshuffle,
                num_workers=self.num_workers,
                center_crop=self.cfg.center_crop,
                shard_options=shard_options)
        if backend == 'native':
            from gltvae.data.native_loader import NativeImageFolderDataset
            ds = NativeImageFolderDataset(
                image_dir, split, size,
                center_crop=self.cfg.center_crop,
                num_threads=self.num_workers)
        else:
            ds = ImageFolderDataset(image_dir, split, size,
                                    center_crop=self.cfg.center_crop,
                                    backend=backend,
                                    host_resize=not self.cfg.device_resize)
        if self.cfg.cache_dir is not None:
            ds = DiskCachedDataset(ds, self.cfg.cache_dir, mode)
            if self.shard is not None and not ds.complete:
                raise ValueError(
                    f'cache_dir with host-sharded loading (shard=) needs a '
                    f'COMPLETE cache, but split {mode!r} is unfilled: each '
                    f'process only decodes its 1/N slice, so a sharded '
                    f'first-fill can never reach completion and decode '
                    f'would be silently re-paid every run. Pre-fill once '
                    f'with an unsharded pass over the same corpus/size, '
                    f'then sharded runs serve it read-only.')
        elif self.cfg.cache_decoded:
            ds = CachedDataset(ds)
        return BatchLoader(
            ds, self.batch_size, shuffle=True,
            reshuffle_each_epoch=self.reshuffle, seed=self.seed,
            # the native pool parallelizes INSIDE fetch(); one loader
            # worker thread just keeps prefetch ahead of the device
            num_workers=1 if backend == 'native' else self.num_workers,
            prefetch=self.cfg.prefetch_batches, shard=self.shard)
