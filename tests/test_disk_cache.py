"""Disk-persistent decoded cache (celeba.py::DiskCachedDataset).

The in-RAM CachedDataset kills re-decode within one process; the disk
cache kills it across processes/runs (tf.data cache(filename=...)
counterpart). These tests pin the contract: byte-identical batches,
exactly one decode per image across RUNS once complete, no trust in
incomplete caches, and key separation by decode geometry.
"""

import os

import numpy as np
import pytest

from gltvae.config import CELEBA_LABELS, DataConfig
from gltvae.data.celeba import (CelebAReader, DiskCachedDataset,
                                ImageFolderDataset)


@pytest.fixture
def mini_root(tmp_path):
    rng = np.random.RandomState(1)
    n = 24
    rows = rng.choice([-1, 1], size=(n, 40))
    lines = ['image_id,' + ','.join(CELEBA_LABELS)]
    img_dir = tmp_path / 'img_align_celeba'
    img_dir.mkdir()
    import PIL.Image
    for i in range(n):
        name = f'{i:06d}.jpg'
        lines.append(name + ',' + ','.join(map(str, rows[i])))
        PIL.Image.fromarray(
            rng.randint(0, 255, (178, 218, 3), dtype=np.uint8)
        ).save(img_dir / name)
    (tmp_path / 'list_attr_celeba.csv').write_text('\n'.join(lines) + '\n')
    return tmp_path


def _counted(ds):
    calls = []
    orig = ds.fetch
    ds.fetch = lambda idxs: calls.append(len(np.asarray(idxs))) or orig(idxs)
    return ds, calls


def _split(mini_root):
    cfg = DataConfig(data_dir=str(mini_root), n_train=16, n_valid=4,
                     n_test=4, num_workers=0)
    reader = CelebAReader(cfg, sup_frac=1.0, batch_size=4, seed=0)
    return reader.splits['sup'], os.path.join(str(mini_root), cfg.image_dir)


def test_fill_then_serve_across_instances(mini_root, tmp_path):
    """Run 1 decodes every image exactly once and completes the cache;
    run 2 (a fresh instance = a fresh process) serves byte-identical
    batches without touching the decoder at all."""
    split, img_dir = _split(mini_root)
    cache_dir = str(tmp_path / 'cache')
    plain = ImageFolderDataset(img_dir, split, 64)
    n = len(split)

    inner1, calls1 = _counted(ImageFolderDataset(img_dir, split, 64))
    run1 = DiskCachedDataset(inner1, cache_dir, 'sup')
    assert not run1.complete
    for lo in range(0, n, 4):
        idxs = np.arange(lo, lo + 4)
        xs, ys = run1.fetch(idxs)
        xs0, ys0 = plain.fetch(idxs)
        np.testing.assert_array_equal(xs, xs0)
        np.testing.assert_array_equal(ys, ys0)
    assert sum(calls1) == n
    assert run1.complete                    # marker written at coverage

    inner2, calls2 = _counted(ImageFolderDataset(img_dir, split, 64))
    run2 = DiskCachedDataset(inner2, cache_dir, 'sup')
    assert run2.complete                    # trusts the completed file
    for lo in range(0, n, 4):
        idxs = np.arange(lo, lo + 4)
        xs, ys = run2.fetch(idxs)
        xs0, ys0 = plain.fetch(idxs)
        np.testing.assert_array_equal(xs, xs0)
        np.testing.assert_array_equal(ys, ys0)
    assert calls2 == []                     # zero JPEG work in run 2


def test_incomplete_cache_not_trusted(mini_root, tmp_path):
    """An interrupted first run (partial fill, no marker) must NOT be
    served by a later run — rows are re-decoded, never read torn."""
    split, img_dir = _split(mini_root)
    cache_dir = str(tmp_path / 'cache')
    run1 = DiskCachedDataset(ImageFolderDataset(img_dir, split, 64),
                             cache_dir, 'sup')
    run1.fetch(np.arange(4))                # partial: 4 of 16
    assert not run1.complete

    inner2, calls2 = _counted(ImageFolderDataset(img_dir, split, 64))
    run2 = DiskCachedDataset(inner2, cache_dir, 'sup')
    assert not run2.complete
    run2.fetch(np.arange(4))
    assert sum(calls2) == 4                 # re-decoded, not trusted


def test_key_separates_decode_geometry(mini_root, tmp_path):
    """64px and 32px caches of the same split must not collide."""
    split, img_dir = _split(mini_root)
    cache_dir = str(tmp_path / 'cache')
    d64 = DiskCachedDataset(ImageFolderDataset(img_dir, split, 64),
                            cache_dir, 'sup')
    d32 = DiskCachedDataset(ImageFolderDataset(img_dir, split, 32),
                            cache_dir, 'sup')
    x64, _ = d64.fetch(np.arange(4))
    x32, _ = d32.fetch(np.arange(4))
    assert x64.shape[1:] == (64, 64, 3)
    assert x32.shape[1:] == (32, 32, 3)
    assert d64._data_path != d32._data_path


def test_reader_wiring_end_to_end(mini_root, tmp_path):
    """DataConfig.cache_dir routes every loader through the disk cache;
    a second reader (fresh process) yields the same batches from the
    completed cache."""
    base = dict(data_dir=str(mini_root), n_train=16, n_valid=4, n_test=4,
                num_workers=0)
    cache_dir = str(tmp_path / 'cache')

    def one_epoch():
        cfg = DataConfig(cache_dir=cache_dir, **base)
        reader = CelebAReader(cfg, sup_frac=1.0, batch_size=4, seed=0)
        loaders = reader.setup_data_loaders()
        out = []
        it = iter(loaders['sup'])
        for _ in range(4):
            x, y = next(it)
            out.append((x.copy(), y.copy()))
        if hasattr(it, 'close'):
            it.close()
        return out

    e1, e2 = one_epoch(), one_epoch()
    for (x1, y1), (x2, y2) in zip(e1, e2):
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)
    assert any(f.endswith('.complete') for f in os.listdir(cache_dir))


def test_guards(mini_root, tmp_path):
    base = dict(data_dir=str(mini_root), n_train=16, n_valid=4, n_test=4,
                num_workers=0)
    cache_dir = str(tmp_path / 'cache')
    for extra, msg in ((dict(cache_decoded=True), 'cache_dir already'),
                       (dict(device_resize=True), 'full-resolution'),
                       (dict(decode_backend='grain'), 'grain')):
        cfg = DataConfig(cache_dir=cache_dir, **base, **extra)
        reader = CelebAReader(cfg, sup_frac=1.0, batch_size=4, seed=0)
        with pytest.raises((ValueError, RuntimeError), match=msg):
            reader.setup_data_loaders()
