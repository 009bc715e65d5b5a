"""Data pipeline semantics: wrap-around batching, splits, CSV parsing,
prefetch determinism (reference: utils_data.py)."""

import os
import textwrap

import numpy as np
import pytest

from gltvae.config import DataConfig, CELEBA_LABELS, CELEBA_EASY_LABELS
from gltvae.data.pipeline import ArrayDataset, BatchLoader
from gltvae.data.synthetic import synthetic_celeba, synthetic_splits
from gltvae.data.celeba import load_attr_csv, CelebAReader


def make_ds(n=10, y=3):
    return ArrayDataset(images=np.arange(n, dtype=np.uint8)
                        .reshape(n, 1, 1, 1) * np.ones((1, 2, 2, 1), np.uint8),
                        labels=np.eye(n, y, dtype=np.float32))


class TestBatchLoader:
    def test_wraparound_exact_reference_semantics(self):
        """Final short batch completes from the front
        (utils_data.py:65-72): n=10, bs=4 -> batches [0:4],[4:8],[8:10]+[0:2]."""
        dl = BatchLoader(make_ds(10), 4, shuffle=False)
        idxs1 = dl._next_batch_idxs()
        idxs2 = dl._next_batch_idxs()
        idxs3 = dl._next_batch_idxs()
        np.testing.assert_array_equal(idxs1, [0, 1, 2, 3])
        np.testing.assert_array_equal(idxs2, [4, 5, 6, 7])
        np.testing.assert_array_equal(idxs3, [8, 9, 0, 1])
        assert dl._start == 2

    def test_epoch_batches_ceil(self):
        assert BatchLoader(make_ds(10), 4, shuffle=False).epoch_batches == 3
        assert BatchLoader(make_ds(8), 4, shuffle=False).epoch_batches == 2

    def test_every_batch_full_size(self):
        dl = BatchLoader(make_ds(10), 4, shuffle=True, seed=1)
        it = iter(dl)
        for _ in range(7):
            x, y = next(it)
            assert x.shape[0] == 4 and y.shape[0] == 4

    def test_shuffle_once_mode_reproduces_reference(self):
        """reshuffle_each_epoch=False: index order fixed after init
        (utils_data.py:39-40)."""
        a = BatchLoader(make_ds(10), 4, shuffle=True,
                        reshuffle_each_epoch=False, seed=3)
        b = BatchLoader(make_ds(10), 4, shuffle=True,
                        reshuffle_each_epoch=False, seed=3)
        for _ in range(6):  # cross epoch boundary twice
            np.testing.assert_array_equal(a._next_batch_idxs(),
                                          b._next_batch_idxs())

    def test_reshuffle_changes_epoch_order(self):
        dl = BatchLoader(make_ds(10), 5, shuffle=True, seed=0,
                         reshuffle_each_epoch=True)
        e1 = [dl._next_batch_idxs().copy() for _ in range(2)]
        e2 = [dl._next_batch_idxs().copy() for _ in range(2)]
        assert not all(np.array_equal(a, b) for a, b in zip(e1, e2))
        # each epoch still covers all samples
        assert set(np.concatenate(e2).tolist()) == set(range(10))

    def test_threaded_prefetch_matches_sync_order(self):
        ds = make_ds(20)
        sync = BatchLoader(ds, 4, shuffle=True, seed=7, num_workers=0)
        thr = BatchLoader(ds, 4, shuffle=True, seed=7, num_workers=2)
        it_s, it_t = iter(sync), iter(thr)
        for _ in range(8):
            (xs, ys), (xt, yt) = next(it_s), next(it_t)
            np.testing.assert_array_equal(xs, xt)
            np.testing.assert_array_equal(ys, yt)

    def test_abandoned_threaded_iter_skips_nothing(self):
        """Trainer creates a fresh iter() per epoch; prefetched-but-unread
        batches must NOT advance the loader — the next iterator resumes
        exactly where consumption stopped."""
        ds = make_ds(40)
        sync = BatchLoader(ds, 4, shuffle=True, seed=11, num_workers=0)
        thr = BatchLoader(ds, 4, shuffle=True, seed=11, num_workers=3,
                          prefetch=4)
        it_s = iter(sync)
        stream_s = [next(it_s) for _ in range(20)]
        got = []
        for n in (3, 5, 1, 11):  # 4 epochs of different consumed lengths
            it_t = iter(thr)
            got += [next(it_t) for _ in range(n)]
            it_t.close()  # abandon mid-stream with batches in flight
        assert len(got) == 20
        for (xs, ys), (xt, yt) in zip(stream_s, got):
            np.testing.assert_array_equal(xs, xt)
            np.testing.assert_array_equal(ys, yt)

    def test_threaded_output_buffer_is_bounded(self):
        """Backpressure: with a stalled consumer, the feeder may run at most
        prefetch*2 + num_workers batches ahead of consumption."""
        import time
        ds = make_ds(64)
        thr = BatchLoader(ds, 4, shuffle=True, seed=0, num_workers=2,
                          prefetch=2)
        it = iter(thr)
        next(it)  # start the pipeline, consume one
        time.sleep(0.5)  # let the feeder/workers run as far as they can
        # authoritative cursor reflects only CONSUMED batches
        assert thr._start == 4
        # the completed-batch buffer is actually capped: the stream is
        # infinite (wrap-around), so an unbounded feeder would have
        # produced far more than cap batches in 0.5s
        buf = thr._iter_buffers
        assert len(buf['out']) <= buf['cap'], \
            (len(buf['out']), buf['cap'])
        assert buf['idx_q'].qsize() <= thr.prefetch * 2
        # speculative production is capped (observable via the next
        # batches still matching the sync stream after the stall)
        sync = BatchLoader(ds, 4, shuffle=True, seed=0, num_workers=0)
        it_s = iter(sync)
        next(it_s)
        for _ in range(10):
            (xs, _), (xt, _) = next(it_s), next(it)
            np.testing.assert_array_equal(xs, xt)
        it.close()

    def test_reset_replays_identical_stream(self):
        dl = BatchLoader(make_ds(10), 4, shuffle=True, seed=5)
        first = [dl._next_batch_idxs().copy() for _ in range(7)]
        dl.reset()
        again = [dl._next_batch_idxs().copy() for _ in range(7)]
        for a, b in zip(first, again):
            np.testing.assert_array_equal(a, b)

    def test_shard_slices_identical_global_stream(self):
        """Host-sharded mode: N shard loaders with the same seed yield,
        per batch, contiguous 1/N slices whose concatenation (in process
        order) is exactly the unsharded loader's global batch — the
        invariant parallel/dp.shard_batch(local=True) relies on. Each
        shard fetches exactly bs/N rows (the decode saving)."""
        ds = make_ds(20, y=3)
        full = iter(BatchLoader(ds, 8, shuffle=True, seed=5))
        parts = [iter(BatchLoader(ds, 8, shuffle=True, seed=5,
                                  shard=(p, 4))) for p in range(4)]
        for _ in range(9):          # crosses epoch boundaries (n=20, bs=8)
            xf, yf = next(full)
            got = [next(p) for p in parts]
            assert all(x.shape[0] == 2 for x, _ in got)
            np.testing.assert_array_equal(
                xf, np.concatenate([x for x, _ in got]))
            np.testing.assert_array_equal(
                yf, np.concatenate([y for _, y in got]))

    def test_shard_validation(self):
        with pytest.raises(ValueError, match='divisible'):
            BatchLoader(make_ds(10), 5, shard=(0, 2))
        with pytest.raises(ValueError, match='out of range'):
            BatchLoader(make_ds(10), 4, shard=(2, 2))


class TestSynthetic:
    def test_shapes_and_dtypes(self):
        ds = synthetic_celeba(32, image_size=64, y_dim=18)
        assert ds.images.shape == (32, 64, 64, 3)
        assert ds.images.dtype == np.uint8
        assert ds.labels.shape == (32, 18)
        assert ds.labels.sum(1).min() >= 1  # no all-zero rows

    def test_splits_partition(self):
        splits = synthetic_splits(100, 20, 20, sup_frac=0.5)
        assert len(splits['sup']) == 50
        assert len(splits['unsup']) == 50
        assert len(splits['valid']) == 20
        assert len(splits['test']) == 20

    def test_splits_sup_modes(self):
        assert 'unsup' not in synthetic_splits(sup_frac=1.0)
        assert 'sup' not in synthetic_splits(sup_frac=0.0)


ATTR_CSV = textwrap.dedent("""\
    image_id,{names}
    000001.jpg,{row1}
    000002.jpg,{row2}
    000003.jpg,{row3}
    """)


@pytest.fixture
def attr_csv(tmp_path):
    rng = np.random.RandomState(0)
    rows = rng.choice([-1, 1], size=(3, 40))
    txt = ATTR_CSV.format(
        names=','.join(CELEBA_LABELS),
        row1=','.join(map(str, rows[0])),
        row2=','.join(map(str, rows[1])),
        row3=','.join(map(str, rows[2])))
    path = tmp_path / 'list_attr_celeba.csv'
    path.write_text(txt)
    return str(path), rows


class TestAttrCSV:
    def test_parse_comma_format(self, attr_csv):
        path, rows = attr_csv
        ids, labels = load_attr_csv(path, use_easy_labels=False)
        assert ids == ['000001.jpg', '000002.jpg', '000003.jpg']
        want = np.where(rows == -1, 0, rows)
        np.testing.assert_array_equal(labels, want)

    def test_easy_label_filter(self, attr_csv):
        path, rows = attr_csv
        _, labels = load_attr_csv(path, use_easy_labels=True)
        assert labels.shape == (3, 18)
        keep = [i for i, n in enumerate(CELEBA_LABELS)
                if n in CELEBA_EASY_LABELS]
        want = np.where(rows == -1, 0, rows)[:, keep]
        np.testing.assert_array_equal(labels, want)

    def test_parse_space_format(self, tmp_path):
        """Original list_attr_celeba.txt: count line, header, space-sep."""
        txt = ('2\n' + ' '.join(CELEBA_LABELS) + '\n'
               + '000001.jpg ' + ' '.join(['1', '-1'] * 20) + '\n'
               + '000002.jpg ' + ' '.join(['-1', '1'] * 20) + '\n')
        p = tmp_path / 'list_attr_celeba.txt'
        p.write_text(txt)
        ids, labels = load_attr_csv(str(p), use_easy_labels=False)
        assert ids == ['000001.jpg', '000002.jpg']
        np.testing.assert_array_equal(labels[0], [1, 0] * 20)


class TestCelebAReader:
    def _mini_root(self, tmp_path, n=30):
        rng = np.random.RandomState(1)
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
        return rows

    def test_end_to_end_mini(self, tmp_path):
        self._mini_root(tmp_path, n=30)
        cfg = DataConfig(data_dir=str(tmp_path), n_train=20, n_valid=5,
                         n_test=5, num_workers=0)
        reader = CelebAReader(cfg, sup_frac=0.5, batch_size=4, seed=0)
        assert reader.init_gating_prob.shape == (18, 18)
        np.testing.assert_allclose(np.diag(reader.init_gating_prob), 1.0)
        loaders = reader.setup_data_loaders()
        assert set(loaders) == {'sup', 'unsup', 'valid', 'test'}
        assert loaders['sup'].n_s == 10
        assert loaders['unsup'].n_s == 10
        x, y = next(iter(loaders['sup']))
        assert x.shape == (4, 64, 64, 3)
        assert x.dtype == np.uint8
        assert y.shape == (4, 18)
        # gating cache written in reference format
        assert os.path.exists(tmp_path / 'gating_matrix_0.5.npy')

    def test_cache_decoded_identical_batches(self, tmp_path):
        """cache_decoded epochs must yield byte-identical batches to the
        uncached path, and epoch 2 must not touch the decoder at all."""
        from gltvae.data.celeba import CachedDataset, ImageFolderDataset
        from gltvae.data.celeba import CelebAReader  # noqa: F401
        self._mini_root(tmp_path, n=30)
        cfg = DataConfig(data_dir=str(tmp_path), n_train=20, n_valid=5,
                         n_test=5, num_workers=0)
        reader = CelebAReader(cfg, sup_frac=1.0, batch_size=4, seed=0)
        split = reader.splits['sup']
        img_dir = os.path.join(str(tmp_path), cfg.image_dir)
        plain = ImageFolderDataset(img_dir, split, 64)
        inner = ImageFolderDataset(img_dir, split, 64)
        calls = []
        orig_fetch = inner.fetch
        inner.fetch = lambda idxs: calls.append(len(idxs)) or orig_fetch(idxs)
        cached = CachedDataset(inner)
        idx_all = np.arange(len(split))
        for _ in range(2):                      # two "epochs"
            for lo in range(0, len(split), 4):
                idxs = idx_all[lo:lo + 4]
                xs, ys = cached.fetch(idxs)
                xs0, ys0 = plain.fetch(idxs)
                np.testing.assert_array_equal(xs, xs0)
                np.testing.assert_array_equal(ys, ys0)
        assert sum(calls) == len(split)         # every image decoded ONCE

    def test_cache_decoded_end_to_end_loader(self, tmp_path):
        """Reader-built loader with cache_decoded covers the same label
        multiset per epoch as uncached."""
        self._mini_root(tmp_path, n=30)
        base = dict(data_dir=str(tmp_path), n_train=20, n_valid=5,
                    n_test=5, num_workers=0)
        outs = []
        for cache in (False, True):
            cfg = DataConfig(cache_decoded=cache, **base)
            loaders = CelebAReader(cfg, sup_frac=1.0, batch_size=4,
                                   seed=0).setup_data_loaders()
            it = iter(loaders['sup'])
            rows = [next(it) for _ in range(loaders['sup'].epoch_batches)]
            outs.append(np.concatenate([y for _, y in rows]))
        np.testing.assert_array_equal(outs[0], outs[1])

    def test_cache_decoded_grain_rejected(self, tmp_path):
        self._mini_root(tmp_path, n=30)
        cfg = DataConfig(data_dir=str(tmp_path), n_train=20, n_valid=5,
                         n_test=5, num_workers=0, decode_backend='grain',
                         cache_decoded=True)
        reader = CelebAReader(cfg, sup_frac=1.0, batch_size=4, seed=0)
        with pytest.raises(ValueError, match='cache_decoded'):
            reader.setup_data_loaders()

    def test_grain_device_resize_rejected(self, tmp_path):
        """grain always host-resizes; device_resize must fail fast, not
        silently host-resize while the config says device-resize."""
        self._mini_root(tmp_path, n=30)
        cfg = DataConfig(data_dir=str(tmp_path), n_train=20, n_valid=5,
                         n_test=5, num_workers=0, decode_backend='grain',
                         device_resize=True)
        reader = CelebAReader(cfg, sup_frac=1.0, batch_size=4, seed=0)
        with pytest.raises(ValueError, match='device_resize'):
            reader.setup_data_loaders()

    def test_cache_decoded_device_resize_rejected(self, tmp_path):
        """cache_decoded + device_resize would cache full-res 178x218 rows
        (~19 GB for CelebA, ~10x the documented budget) — refuse."""
        self._mini_root(tmp_path, n=30)
        cfg = DataConfig(data_dir=str(tmp_path), n_train=20, n_valid=5,
                         n_test=5, num_workers=0, cache_decoded=True,
                         device_resize=True)
        reader = CelebAReader(cfg, sup_frac=1.0, batch_size=4, seed=0)
        with pytest.raises(ValueError, match='cache_decoded'):
            reader.setup_data_loaders()

    def test_split_file_partitions(self, tmp_path):
        """DataConfig.split_file routes splits through the official
        list_eval_partition.csv coding (0=train 1=valid 2=test) — the
        file the reference ships but ignores. Non-contiguous assignment
        must be honored and sup split by the ACTUAL train length."""
        self._mini_root(tmp_path, n=30)
        # interleaved partitions: every 3rd image valid/test
        lines = ['image_id,partition']
        for i in range(30):
            lines.append(f'{i:06d}.jpg,{(0, 0, 1, 0, 0, 2)[i % 6]}')
        (tmp_path / 'list_eval_partition.csv').write_text(
            '\n'.join(lines) + '\n')
        cfg = DataConfig(data_dir=str(tmp_path),
                         split_file='list_eval_partition.csv',
                         num_workers=0)
        reader = CelebAReader(cfg, sup_frac=0.5, batch_size=4, seed=0)
        assert len(reader.splits['train']) == 20
        assert len(reader.splits['valid']) == 5
        assert len(reader.splits['test']) == 5
        assert reader.splits['valid'].ids[0] == '000002.jpg'
        assert reader.splits['test'].ids[0] == '000005.jpg'
        assert len(reader.splits['sup']) == 10      # 0.5 of the REAL 20
        # loaders build end-to-end off the partition splits
        x, y = next(iter(reader.setup_data_loaders()['sup']))
        assert x.shape == (4, 64, 64, 3)

    def test_split_file_missing_image_fails(self, tmp_path):
        self._mini_root(tmp_path, n=30)
        lines = ['image_id,partition'] + [
            f'{i:06d}.jpg,0' for i in range(29)]   # one image absent
        (tmp_path / 'list_eval_partition.csv').write_text(
            '\n'.join(lines) + '\n')
        cfg = DataConfig(data_dir=str(tmp_path),
                         split_file='list_eval_partition.csv',
                         num_workers=0)
        with pytest.raises(ValueError, match='absent from'):
            CelebAReader(cfg, sup_frac=1.0, batch_size=4, seed=0)

    def test_split_file_malformed_rows_diagnosed(self, tmp_path):
        """Malformed partition rows must raise a ValueError naming the
        file and line number, not a bare IndexError/ValueError from
        int(parts[1]) — truncated downloads and trailing-comma rows are
        the common real-world shapes."""
        from gltvae.data.celeba import load_partition_csv
        short = tmp_path / 'short_row.csv'
        short.write_text('image_id,partition\n000001.jpg,0\n000002.jpg\n')
        with pytest.raises(ValueError, match=r'short_row\.csv:3'):
            load_partition_csv(str(short))
        trailing = tmp_path / 'trailing.csv'
        trailing.write_text('image_id,partition\n000001.jpg,\n')
        with pytest.raises(ValueError, match=r'trailing\.csv:2'):
            load_partition_csv(str(trailing))
        notint = tmp_path / 'notint.csv'
        notint.write_text('image_id,partition\n000001.jpg,train\n')
        with pytest.raises(ValueError, match='not an integer'):
            load_partition_csv(str(notint))

    def test_n_test_honored_not_remainder(self, tmp_path):
        """--n-test must bound the test split; extra CSV rows beyond
        n_train+n_valid+n_test stay out (previously the test split
        silently swallowed every remaining row)."""
        self._mini_root(tmp_path, n=30)
        cfg = DataConfig(data_dir=str(tmp_path), n_train=10, n_valid=5,
                         n_test=5, num_workers=0)
        reader = CelebAReader(cfg, sup_frac=1.0, batch_size=4, seed=0)
        assert len(reader.splits['test']) == 5      # not the 15 remaining
        # official-CelebA-style exact cover is unchanged
        cfg = DataConfig(data_dir=str(tmp_path), n_train=20, n_valid=5,
                         n_test=5, num_workers=0)
        reader = CelebAReader(cfg, sup_frac=1.0, batch_size=4, seed=0)
        assert len(reader.splits['test']) == 5

    def test_empty_split_fails_fast(self, tmp_path):
        """A corpus smaller than the configured split sizes must raise a
        clear error at reader construction, not crash batch-less deep in
        Trainer.evaluate (the default n_train is the official 162770)."""
        self._mini_root(tmp_path, n=30)
        cfg = DataConfig(data_dir=str(tmp_path), num_workers=0)  # defaults
        with pytest.raises(ValueError, match='--n-train'):
            CelebAReader(cfg, sup_frac=0.5, batch_size=4, seed=0)
