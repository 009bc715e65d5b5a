"""End-to-end: the full train.py CLI path over an on-disk JPEG dataset.

Everything between the filesystem and the device is real here: attr-CSV
parse, split construction, threaded JPEG decode workers, host resize,
uint8 ship + device normalize, the sup/unsup interleave, Orbax
checkpointing, and best-model test eval — the same path a user runs on
real CelebA (reference driver: /root/reference/gated_ccvae.py:458-537).
The synthetic-mode CLI tests (test_cli.py) bypass the image pipeline;
this one does not.
"""

import os

import numpy as np
import pytest

from gltvae.config import CELEBA_LABELS


@pytest.fixture(scope='module')
def celeba_root(tmp_path_factory):
    """A miniature CelebA-format root: JPEGs at the real 178x218
    resolution + comma-format attr CSV (utils_data.py:99-127)."""
    import PIL.Image
    root = tmp_path_factory.mktemp('mini_celeba')
    img_dir = root / 'img_align_celeba'
    img_dir.mkdir()
    rng = np.random.RandomState(7)
    n = 32
    rows = rng.choice([-1, 1], size=(n, 40))
    lines = ['image_id,' + ','.join(CELEBA_LABELS)]
    for i in range(n):
        name = f'{i:06d}.jpg'
        lines.append(name + ',' + ','.join(map(str, rows[i])))
        PIL.Image.fromarray(
            rng.randint(0, 255, (218, 178, 3), dtype=np.uint8)
        ).save(img_dir / name, quality=92)
    (root / 'list_attr_celeba.csv').write_text('\n'.join(lines) + '\n')
    return root


def test_cli_trains_on_jpeg_dataset(celeba_root, tmp_path):
    import train as cli
    out = tmp_path / 'models'
    results = cli.main([
        '--data-dir', str(celeba_root), '--output-dir', str(out),
        '--do-train', '--epochs', '1', '-bs', '4', '--sup', '0.5',
        '--n-train', '20', '--n-valid', '6', '--n-test', '6',
        '--num-workers', '2', '--seed', '0',
    ])
    assert set(results) == {0.5}
    assert 0.0 <= results[0.5] <= 1.0
    run_dir = out / 'params_0.5_learnable'
    assert (run_dir / 'metrics.csv').exists()
    assert (run_dir / 'learned_gating_matrix_best.npy').exists()
    assert os.listdir(run_dir / 'orbax'), 'no checkpoint written'
    # gating-matrix cache written next to the data in reference format
    # (utils_data.py:166-172)
    assert (celeba_root / 'gating_matrix_0.5.npy').exists()
    mu = np.load(celeba_root / 'gating_matrix_0.5.npy')
    assert mu.shape == (18, 18)
    np.testing.assert_allclose(np.diag(mu), 1.0)


@pytest.mark.slow
def test_cli_trains_128px_on_jpeg_dataset(celeba_root, tmp_path):
    """BASELINE config 4 over real files: 40-attr labels, center-crop +
    resize to 128, the deeper 5-stage deconv stack — end to end through
    the CLI (the 128px config was previously trained only on synthetic
    tensors)."""
    import train as cli
    out = tmp_path / 'models'
    results = cli.main([
        '--data-dir', str(celeba_root), '--output-dir', str(out),
        '--do-train', '--epochs', '1', '-bs', '4', '--sup', '1.0',
        '--image-size', '128',
        '--n-train', '12', '--n-valid', '4', '--n-test', '4',
        '--num-workers', '2', '--seed', '0',
    ])
    assert 0.0 <= results[1.0] <= 1.0
    assert (out / 'params_1.0_learnable' / 'metrics.csv').exists()
    # 40-label gating cache written under the width-suffixed name so it
    # can never poison the reference-protocol 18-label cache
    mu = np.load(celeba_root / 'gating_matrix_1.0_40.npy')
    assert mu.shape == (40, 40)


def _native_available():
    from gltvae.data import native_loader
    return native_loader.is_available()


def _grain_available():
    from gltvae.data import grain_loader
    return grain_loader.is_available()


@pytest.mark.parametrize('backend', [
    pytest.param('native', marks=pytest.mark.skipif(
        not _native_available(), reason='native loader not built')),
    pytest.param('grain', marks=pytest.mark.skipif(
        not _grain_available(), reason='grain not installed')),
])
def test_cli_trains_with_decode_backend(celeba_root, tmp_path, backend):
    """--decode-backend native/grain end-to-end through the CLI: the C++
    libjpeg pool / Grain pipeline feed the SAME training path as cv2."""
    import train as cli
    out = tmp_path / 'models'
    results = cli.main([
        '--data-dir', str(celeba_root), '--output-dir', str(out),
        '--do-train', '--epochs', '1', '-bs', '4', '--sup', '1.0',
        '--n-train', '12', '--n-valid', '4', '--n-test', '4',
        '--num-workers', '2', '--seed', '0',
        '--decode-backend', backend,
    ])
    assert 0.0 <= results[1.0] <= 1.0
    assert (out / 'params_1.0_learnable' / 'metrics.csv').exists()


def test_decode_backends_agree_pixelwise(celeba_root):
    """All decode backends must produce the same pixels for the same file
    (within resize-rounding): cv2 is the yardstick; the native C++ pool
    and the Grain map must not introduce train/serve skew."""
    from gltvae.config import DataConfig
    from gltvae.data.celeba import CelebAReader, ImageFolderDataset
    cfg = DataConfig(data_dir=str(celeba_root), n_train=20, n_valid=6,
                     n_test=6, num_workers=0)
    reader = CelebAReader(cfg, sup_frac=1.0, batch_size=4)
    split = reader.splits['train']
    img_dir = os.path.join(str(celeba_root), 'img_align_celeba')
    ref_ds = ImageFolderDataset(img_dir, split, 64, backend='cv2')
    idxs = np.arange(4)
    ref, ref_y = ref_ds.fetch(idxs)
    assert ref.dtype == np.uint8 and ref.shape == (4, 64, 64, 3)

    if _native_available():
        from gltvae.data.native_loader import NativeImageFolderDataset
        nat, nat_y = NativeImageFolderDataset(img_dir, split, 64).fetch(idxs)
        assert nat.shape == ref.shape and nat.dtype == np.uint8
        np.testing.assert_array_equal(nat_y, ref_y)
        # bilinear implementations may round differently by ±1-2 levels
        assert np.mean(np.abs(nat.astype(int) - ref.astype(int))) < 3.0

    if _grain_available():
        from gltvae.data.grain_loader import _DecodeMap
        dm = _DecodeMap(img_dir, split.ids, split.labels, 64)
        g_img, g_y = dm[0]
        np.testing.assert_array_equal(g_img, ref[0])   # same cv2 path
        np.testing.assert_array_equal(g_y, ref_y[0])


def test_grain_decode_map_center_crops(celeba_root):
    """Round-2 bug: make_grain_loader dropped center_crop, silently
    skewing 128px runs. The crop must now reach the decode map."""
    if not _grain_available():
        pytest.skip('grain not installed')
    from gltvae.config import DataConfig
    from gltvae.data.celeba import CelebAReader, ImageFolderDataset
    from gltvae.data.grain_loader import _DecodeMap, make_grain_loader
    cfg = DataConfig(data_dir=str(celeba_root), n_train=20, n_valid=6,
                     n_test=6, num_workers=0)
    reader = CelebAReader(cfg, sup_frac=1.0, batch_size=4)
    split = reader.splits['train']
    img_dir = os.path.join(str(celeba_root), 'img_align_celeba')
    ref = ImageFolderDataset(img_dir, split, 64, backend='cv2',
                             center_crop=True).fetch(np.arange(1))[0][0]
    dm = _DecodeMap(img_dir, split.ids, split.labels, 64, center_crop=True)
    np.testing.assert_array_equal(dm[0][0], ref)
    # and the loader factory forwards it
    loader = make_grain_loader(img_dir, split.ids, split.labels,
                               batch_size=2, image_size=64, shuffle=False,
                               center_crop=True)
    x, _ = next(iter(loader))
    np.testing.assert_array_equal(x[0], ref)


def test_sup0_reader_builds_valid_loader(celeba_root):
    """sup=0.0 runs best-checkpoint on validation ELBO (train/loop.py), so
    the real-data reader must include the 'valid' loader — the reference
    omits it for sup=0.0 because it never checkpoints those runs."""
    from gltvae.config import DataConfig
    from gltvae.data.celeba import CelebAReader
    cfg = DataConfig(data_dir=str(celeba_root), n_train=20, n_valid=6,
                     n_test=6, num_workers=0)
    reader = CelebAReader(cfg, sup_frac=0.0, batch_size=4)
    loaders = reader.setup_data_loaders()
    assert set(loaders) == {'unsup', 'test', 'valid'}


def test_split_override_flags_reach_dataconfig():
    import train as cli
    args = cli.parse_args(['--n-train', '20', '--n-valid', '6'])
    _, _, data_cfg = cli.build_configs(args, sup=1.0)
    assert data_cfg.n_train == 20 and data_cfg.n_valid == 6
    assert data_cfg.n_test == 19962  # untouched default stays official
