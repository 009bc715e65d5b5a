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


_CONCURRENT_FILLER = r'''
import os, sys, time
import numpy as np
sys.path.insert(0, "@REPO@")
from gltvae.config import DataConfig
from gltvae.data.celeba import (CelebAReader, DiskCachedDataset,
                                ImageFolderDataset)

root, cache_dir, order, rdv = sys.argv[1:5]
cfg = DataConfig(data_dir=root, n_train=16, n_valid=4, n_test=4,
                 num_workers=0)
reader = CelebAReader(cfg, sup_frac=1.0, batch_size=4, seed=0)
split = reader.splits['sup']
img_dir = os.path.join(root, cfg.image_dir)
plain = ImageFolderDataset(img_dir, split, 64)
ds = DiskCachedDataset(ImageFolderDataset(img_dir, split, 64),
                       cache_dir, 'sup')
# rendezvous: both fillers must be constructed (and so both must have
# opened their own .fill temp) before either starts writing rows
open(os.path.join(rdv, f'ready_{order}'), 'w').close()
t0 = time.time()
while len([f for f in os.listdir(rdv) if f.startswith('ready_')]) < 2:
    if time.time() - t0 > 30:
        sys.exit(3)
    time.sleep(0.005)
n = len(split)
starts = range(0, n, 4)
if order == 'desc':
    starts = reversed(list(starts))
for lo in starts:
    idxs = np.arange(lo, lo + 4)
    xs, ys = ds.fetch(idxs)
    x0, y0 = plain.fetch(idxs)
    if not (np.array_equal(xs, x0) and np.array_equal(ys, y0)):
        print('BYTE MISMATCH at', lo, flush=True)
        sys.exit(1)
    time.sleep(0.02)          # interleave the two fillers
if not ds.complete:
    sys.exit(2)
# serve again from the published file — the old corruption mode zeroed
# rows the sibling truncated; must still be byte-correct
for lo in range(0, n, 4):
    idxs = np.arange(lo, lo + 4)
    xs, _ = ds.fetch(idxs)
    x0, _ = plain.fetch(idxs)
    if not np.array_equal(xs, x0):
        print('POST-PUBLISH MISMATCH at', lo, flush=True)
        sys.exit(1)
sys.exit(0)
'''


def test_concurrent_first_fill_two_processes(mini_root, tmp_path):
    """Two processes filling ONE shared cache_dir concurrently: neither
    may clobber the other (the old truncating memmap(mode='w+') zeroed
    the sibling's rows mid-run), both serve byte-correct batches
    throughout, and the cache still reaches completion."""
    import subprocess
    import sys
    cache_dir = str(tmp_path / 'cache')
    rdv = str(tmp_path / 'rdv')
    os.makedirs(rdv)
    code = _CONCURRENT_FILLER.replace(
        '@REPO@', os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    procs = [subprocess.Popen(
        [sys.executable, '-c', code, str(mini_root), cache_dir, order, rdv],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for order in ('asc', 'desc')]
    outs = [p.communicate(timeout=120)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    assert any(f.endswith('.complete') for f in os.listdir(cache_dir))
    assert not any(f.endswith('.fill') for f in os.listdir(cache_dir)), \
        'both fillers should have published (renamed away) their temps'

    # a fresh reader (third process) trusts and serves the published cache
    split, img_dir = _split(mini_root)
    plain = ImageFolderDataset(img_dir, split, 64)
    inner, calls = _counted(ImageFolderDataset(img_dir, split, 64))
    ds = DiskCachedDataset(inner, cache_dir, 'sup')
    assert ds.complete
    xs, _ = ds.fetch(np.arange(len(split)))
    x0, _ = plain.fetch(np.arange(len(split)))
    np.testing.assert_array_equal(xs, x0)
    assert calls == []


def test_finalize_fetch_thread_race(mini_root, tmp_path):
    """Hammer fetch() from many threads across the completion boundary:
    _finalize swaps _mm to the read-only published map and drops _have
    while other threads are mid-fetch. The snapshot discipline must keep
    every fetch byte-correct and exception-free (the old code could
    TypeError on _have[idxs] or ValueError writing a read-only map)."""
    import threading as th
    split, img_dir = _split(mini_root)
    cache_dir = str(tmp_path / 'cache')
    plain = ImageFolderDataset(img_dir, split, 64)
    ds = DiskCachedDataset(ImageFolderDataset(img_dir, split, 64),
                           cache_dir, 'sup')
    n = len(split)
    errors = []

    def hammer(seed):
        rng = np.random.RandomState(seed)
        try:
            for _ in range(60):
                idxs = rng.randint(0, n, size=4)
                xs, _ = ds.fetch(idxs)
                x0, _ = plain.fetch(idxs)
                np.testing.assert_array_equal(xs, x0)
        except Exception as e:       # noqa: BLE001 — reported to main
            errors.append(e)

    threads = [th.Thread(target=hammer, args=(s,)) for s in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert ds.complete


def test_stale_fill_temp_reaped(mini_root, tmp_path):
    """A .fill temp left by a dead pid is removed at init; a live pid's
    temp is left alone."""
    split, img_dir = _split(mini_root)
    cache_dir = str(tmp_path / 'cache')
    d1 = DiskCachedDataset(ImageFolderDataset(img_dir, split, 64),
                           cache_dir, 'sup')
    dead = d1._data_path + '.999999.fill'     # pid_max default is < 999999
    open(dead, 'w').close()
    live = d1._fill_path                       # our own (live) temp
    d2 = DiskCachedDataset(ImageFolderDataset(img_dir, split, 64),
                           cache_dir, 'sup')
    assert not os.path.exists(dead)
    assert os.path.exists(live)
    assert os.path.exists(d2._fill_path)


def test_shard_requires_complete_cache(mini_root, tmp_path):
    """cache_dir + host-sharded loading: rejected while the cache is
    unfilled (a sharded fill can never complete), accepted once a
    single-process pass has published it."""
    base = dict(data_dir=str(mini_root), n_train=16, n_valid=4, n_test=4,
                num_workers=0)
    cache_dir = str(tmp_path / 'cache')
    cfg = DataConfig(cache_dir=cache_dir, **base)
    sharded = CelebAReader(cfg, sup_frac=1.0, batch_size=4, seed=0,
                           shard=(0, 2))
    with pytest.raises(ValueError, match='COMPLETE cache'):
        sharded.setup_data_loaders()

    # pre-fill with an unsharded pass
    reader = CelebAReader(cfg, sup_frac=1.0, batch_size=4, seed=0)
    for mode, loader in reader.setup_data_loaders().items():
        it = iter(loader)
        for _ in range(loader.epoch_batches):
            next(it)
    loaders = sharded.setup_data_loaders()     # now serves read-only
    x, y = next(iter(loaders['sup']))
    assert x.shape == (2, 64, 64, 3)           # this host's 1/2 slice


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
