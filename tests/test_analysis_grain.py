"""Gating analysis module + grain loader backend tests."""

import numpy as np
import pytest

from gltvae.eval.analysis import (off_diagonal_gates,
                                  gating_threshold_analysis,
                                  compare_init_vs_learned)


class TestAnalysis:
    def test_off_diagonal_gates_matches_naive(self, rng):
        mu = rng.rand(18, 18)
        got = off_diagonal_gates(mu, 0.6)
        want = [(z, y, mu[z, y]) for z in range(18) for y in range(18)
                if z != y and mu[z, y] > 0.6]
        assert sorted(got) == sorted(want)

    def test_threshold_counts_match_reference_loop(self, rng):
        """Oracle: the reference's counting (Quantitative_analysis.py:45-52)."""
        mu = rng.rand(18, 18)
        got = dict(gating_threshold_analysis(mu))
        for t in (0.1, 0.5, 0.9):
            zs, ys = np.where(mu > t)
            want = len([(z, y) for z, y in zip(zs, ys) if z != y])
            assert got[t] == want

    def test_compare_shapes(self, rng):
        out = compare_init_vs_learned(rng.rand(4, 4), rng.rand(4, 4))
        assert set(out) == {'init', 'learned'}
        assert len(out['init']) == 9

    def test_reference_artifacts_analysis(self):
        """End-to-end over the reference's shipped matrices: learnable
        training must have produced SOME off-diagonal structure."""
        import os
        p = '/root/reference/models/params_1.0_learnable/learned_gating_matrix_best.npy'
        if not os.path.exists(p):
            pytest.skip('reference artifacts unavailable')
        learned = np.load(p)
        counts = dict(gating_threshold_analysis(learned))
        assert counts[0.1] > 0
        assert counts[0.9] == 0  # gates are means in [0,1], never saturated


class TestGrainLoader:
    @pytest.fixture
    def jpeg_split(self, tmp_path):
        import PIL.Image
        rng = np.random.RandomState(0)
        ids, labels = [], rng.rand(12, 18) > 0.5
        for i in range(12):
            name = f'{i:06d}.jpg'
            PIL.Image.fromarray(
                rng.randint(0, 255, (100, 80, 3), dtype=np.uint8)
            ).save(tmp_path / name)
            ids.append(name)
        return str(tmp_path), ids, labels.astype(np.float32)

    def test_grain_batches(self, jpeg_split):
        from gltvae.data import grain_loader
        if not grain_loader.is_available():
            pytest.skip('grain unavailable')
        image_dir, ids, labels = jpeg_split
        loader = grain_loader.make_grain_loader(
            image_dir, ids, labels, batch_size=4, image_size=32, seed=0)
        assert loader.n_s == 12
        assert loader.epoch_batches == 3
        it = iter(loader)
        for _ in range(4):  # crosses the epoch boundary (repeat)
            x, y = next(it)
            assert x.shape == (4, 32, 32, 3) and x.dtype == np.uint8
            assert y.shape == (4, 18)

    def test_grain_fresh_iter_resumes_not_restarts(self, jpeg_split):
        """BatchLoader contract: the trainer calls iter() once per epoch
        and must resume after the last batch it saw — a fresh iterator
        restarting the repeated stream at grain-epoch 0 would replay the
        identical batch sequence every epoch (and never reshuffle)."""
        from gltvae.data import grain_loader
        if not grain_loader.is_available():
            pytest.skip('grain unavailable')
        image_dir, ids, labels = jpeg_split
        loader = grain_loader.make_grain_loader(
            image_dir, ids, labels, batch_size=4, image_size=32, seed=0)
        epoch1 = [next(iter(loader))[1] for _ in range(3)]
        epoch2 = [next(iter(loader))[1] for _ in range(3)]
        assert not all(np.array_equal(a, b)
                       for a, b in zip(epoch1, epoch2)), \
            'second epoch replayed the first batch-for-batch'
        # both epochs still cover the full dataset (12 items, 18-bit rows)
        for ep in (epoch1, epoch2):
            rows = np.concatenate(ep)
            assert rows.shape == (12, 18)
            assert len({r.tobytes() for r in rows}) == len(
                {l.tobytes() for l in labels})

    def test_grain_shuffle_once_replays_epochs(self, jpeg_split):
        """reshuffle_each_epoch=False (--parity loader quirk): every
        epoch replays ONE fixed seeded permutation, like BatchLoader's
        shuffle-once mode mirroring reference utils_data.py:39-40."""
        from gltvae.data import grain_loader
        if not grain_loader.is_available():
            pytest.skip('grain unavailable')
        image_dir, ids, labels = jpeg_split
        loader = grain_loader.make_grain_loader(
            image_dir, ids, labels, batch_size=4, image_size=32, seed=0,
            reshuffle_each_epoch=False)
        it = iter(loader)
        epoch1 = [next(it)[1] for _ in range(3)]
        epoch2 = [next(it)[1] for _ in range(3)]
        for a, b in zip(epoch1, epoch2):
            np.testing.assert_array_equal(a, b)
        # still shuffled (not source order) and full coverage
        rows = np.concatenate(epoch1)
        assert rows.shape == (12, 18)
        assert len({r.tobytes() for r in rows}) == len(
            {l.tobytes() for l in labels})
        assert not all(np.array_equal(rows[i], labels[i])
                       for i in range(len(labels)))

    def test_grain_sharding(self, jpeg_split):
        from gltvae.data import grain_loader
        if not grain_loader.is_available():
            pytest.skip('grain unavailable')
        import grain.python as grain
        image_dir, ids, labels = jpeg_split
        loader = grain_loader.make_grain_loader(
            image_dir, ids, labels, batch_size=2, image_size=32, seed=0,
            shuffle=False,
            shard_options=grain.ShardOptions(shard_index=0, shard_count=2))
        x, y = next(iter(loader))
        assert x.shape == (2, 32, 32, 3)
        # epoch accounting is per-HOST: 12 images / 2 shards = 6 local
        # -> 3 batches of 2, not the unsharded 6
        assert loader.n_s == 6
        assert loader.epoch_batches == 3

    def test_reader_wires_grain_shard(self, tmp_path):
        """CelebAReader(shard=(pid, pc)) + decode_backend=grain: each
        process gets per-host batches of bs/pc rows over ITS corpus
        slice (grain ShardOptions convention) — the two shards' label
        coverage is disjoint and unions to the split."""
        from gltvae.config import CELEBA_LABELS, DataConfig
        from gltvae.data import grain_loader
        from gltvae.data.celeba import CelebAReader
        if not grain_loader.is_available():
            pytest.skip('grain unavailable')
        import PIL.Image
        rng = np.random.RandomState(3)
        n = 24
        img_dir = tmp_path / 'img_align_celeba'
        img_dir.mkdir()
        lines = ['image_id,' + ','.join(CELEBA_LABELS)]
        for i in range(n):
            name = f'{i:06d}.jpg'
            lines.append(name + ','
                         + ','.join(map(str, rng.choice([-1, 1], 40))))
            PIL.Image.fromarray(
                rng.randint(0, 255, (100, 80, 3), dtype=np.uint8)
            ).save(img_dir / name)
        (tmp_path / 'list_attr_celeba.csv').write_text(
            '\n'.join(lines) + '\n')
        cfg = DataConfig(data_dir=str(tmp_path), n_train=16, n_valid=4,
                         n_test=4, num_workers=0, decode_backend='grain')

        def epoch_rows(pid):
            reader = CelebAReader(cfg, sup_frac=1.0, batch_size=4, seed=0,
                                  shard=(pid, 2))
            loader = reader.setup_data_loaders()['sup']
            assert loader.n_s == 8              # per-host slice of 16
            assert loader.epoch_batches == 4    # of bs/pc = 2 rows
            it = iter(loader)
            rows = []
            for _ in range(loader.epoch_batches):
                x, y = next(it)
                assert x.shape == (2, 64, 64, 3)
                rows += [r.tobytes() for r in y]
            return set(rows)

        r0, r1 = epoch_rows(0), epoch_rows(1)
        assert not (r0 & r1)                    # disjoint corpus slices
        reader = CelebAReader(cfg, sup_frac=1.0, batch_size=4, seed=0)
        want = {r.astype(np.float32).tobytes()
                for r in reader.splits['sup'].labels}
        assert (r0 | r1) == want                # full split coverage

    def test_reader_grain_shard_divisibility(self, tmp_path):
        from gltvae.config import CELEBA_LABELS, DataConfig
        from gltvae.data import grain_loader
        from gltvae.data.celeba import CelebAReader
        if not grain_loader.is_available():
            pytest.skip('grain unavailable')
        import PIL.Image
        rng = np.random.RandomState(3)
        img_dir = tmp_path / 'img_align_celeba'
        img_dir.mkdir()
        lines = ['image_id,' + ','.join(CELEBA_LABELS)]
        for i in range(12):
            name = f'{i:06d}.jpg'
            lines.append(name + ','
                         + ','.join(map(str, rng.choice([-1, 1], 40))))
            PIL.Image.fromarray(
                rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
            ).save(img_dir / name)
        (tmp_path / 'list_attr_celeba.csv').write_text(
            '\n'.join(lines) + '\n')
        cfg = DataConfig(data_dir=str(tmp_path), n_train=8, n_valid=2,
                         n_test=2, num_workers=0, decode_backend='grain')
        reader = CelebAReader(cfg, sup_frac=1.0, batch_size=5, seed=0,
                              shard=(0, 2))
        with pytest.raises(ValueError, match='divisible'):
            reader.setup_data_loaders()


def test_metrics_summary_tool(tmp_path):
    """tools/metrics_summary.py folds a Trainer metrics.csv into per-epoch
    aggregates (the reference has no machine-readable training record)."""
    import csv as _csv
    path = tmp_path / 'metrics.csv'
    cols = ['c_sum', 'elbo', 'epoch', 'kl', 'log_pxz', 'log_qy_x',
            'log_qy_zc', 'loss', 'step', 'supervised', 'time']
    with open(path, 'w', newline='') as f:
        w = _csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        for ep in range(3):
            for s in range(2):
                w.writerow({'c_sum': 10 + ep, 'elbo': -100 - ep,
                            'epoch': ep, 'kl': 5.0, 'log_pxz': -90,
                            'log_qy_x': -1, 'log_qy_zc': -2,
                            'loss': 100 + ep, 'step': ep * 2 + s,
                            'supervised': 1, 'time': 0.0})
    from tools.metrics_summary import main
    epochs = main([str(path)])
    assert [e['epoch'] for e in epochs] == [0, 1, 2]
    assert epochs[0]['n'] == 2
    np.testing.assert_allclose(epochs[2]['loss'], 102.0)
    png = tmp_path / 'c.png'
    main([str(path), '--plot', str(png)])
    assert png.exists()


def test_metrics_summary_gating_history(tmp_path):
    """--gating-history folds the Trainer's per-epoch μ snapshot stack
    into off-diagonal-mass / movement rows and a companion plot."""
    import csv as _csv
    path = tmp_path / 'metrics.csv'
    cols = ['c_sum', 'elbo', 'epoch', 'kl', 'log_pxz', 'log_qy_x',
            'log_qy_zc', 'loss', 'step', 'supervised', 'time']
    with open(path, 'w', newline='') as f:
        w = _csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        w.writerow({c: 1.0 for c in cols})
    rng = np.random.RandomState(0)
    mus = (np.cumsum(rng.rand(4, 6, 6) * 0.1, axis=0)
           + np.eye(6)[None] * 0.5).astype(np.float32)
    npz = tmp_path / 'gating_history.npz'
    np.savez(npz, epochs=np.arange(4, dtype=np.int32), mu=mus)
    from tools.metrics_summary import main, summarize_gating_history
    png = tmp_path / 'c.png'
    main([str(path), '--plot', str(png), '--gating-history', str(npz)])
    assert (tmp_path / 'c_gating.png').exists()
    rows = summarize_gating_history(str(npz))
    assert len(rows) == 4
    assert rows[0][3] == 0.0                       # no Δ at first epoch
    assert all(r[3] > 0 for r in rows[1:])         # μ moves each epoch
    off = ~np.eye(6, dtype=bool)
    np.testing.assert_allclose(rows[2][1], mus[2][off].mean(), rtol=1e-6)
