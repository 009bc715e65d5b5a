"""C++ decode pool: correctness vs PIL/cv2 decode of the same JPEGs."""

import os

import numpy as np
import pytest

from gltvae.data import native_loader


pytestmark = pytest.mark.skipif(not native_loader.is_available(),
                                reason='native loader not built')


@pytest.fixture(scope='module')
def jpeg_dir(tmp_path_factory):
    import PIL.Image
    d = tmp_path_factory.mktemp('jpegs')
    rng = np.random.RandomState(0)
    paths = []
    for i, (h, w) in enumerate([(218, 178), (100, 100), (64, 64), (37, 53)]):
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        p = d / f'{i}.jpg'
        PIL.Image.fromarray(img).save(p, quality=95)
        paths.append(str(p))
    return paths


def test_decode_batch_shapes(jpeg_dir):
    out = native_loader.decode_batch(jpeg_dir, 64)
    assert out.shape == (4, 64, 64, 3)
    assert out.dtype == np.uint8


def test_decode_matches_cv2_pipeline(jpeg_dir):
    """Same decode+bilinear-resize as cv2 (both use libjpeg + INTER_LINEAR
    pixel-center mapping); tolerance for rounding differences."""
    import cv2
    got = native_loader.decode_batch(jpeg_dir, 64)
    for i, p in enumerate(jpeg_dir):
        ref = cv2.cvtColor(cv2.imread(p, cv2.IMREAD_COLOR),
                           cv2.COLOR_BGR2RGB)
        ref = cv2.resize(ref, (64, 64), interpolation=cv2.INTER_LINEAR)
        diff = np.abs(got[i].astype(int) - ref.astype(int))
        assert diff.mean() < 2.0, f'image {i}: mean diff {diff.mean()}'
        assert np.percentile(diff, 99) <= 6, f'image {i}'


def test_center_crop(jpeg_dir):
    out = native_loader.decode_batch(jpeg_dir, 32, center_crop=True)
    assert out.shape == (4, 32, 32, 3)


def test_missing_file_raises(jpeg_dir, tmp_path):
    with pytest.raises(IOError):
        native_loader.decode_batch([str(tmp_path / 'nope.jpg')], 64)


def test_multithreaded_matches_single(jpeg_dir):
    a = native_loader.decode_batch(jpeg_dir * 4, 64, num_threads=1)
    b = native_loader.decode_batch(jpeg_dir * 4, 64, num_threads=4)
    np.testing.assert_array_equal(a, b)


def test_built_from_source_not_vendored():
    """The .so must be a build product (lazy `make -C native` in
    native_loader._ensure_built), never a committed binary — and at
    least as new as its source."""
    import subprocess
    src = os.path.join(native_loader._NATIVE_DIR, 'loader.cpp')
    tracked = subprocess.run(
        ['git', 'ls-files', 'native/libgltvae_loader.so'],
        capture_output=True, text=True,
        cwd=os.path.dirname(native_loader._NATIVE_DIR)).stdout.strip()
    assert tracked == '', 'libgltvae_loader.so must not be committed'
    assert os.path.exists(native_loader._LIB_PATH)   # lazily built
    assert (os.path.getmtime(native_loader._LIB_PATH)
            >= os.path.getmtime(src))


@pytest.mark.skipif((os.cpu_count() or 1) < 4,
                    reason=f'thread-scaling needs >=4 cores, host has '
                           f'{os.cpu_count()}')
def test_pool_scales_with_threads(jpeg_dir):
    """The pool's headline property: batch decode throughput rises with
    worker threads (>=1.6x from 1 -> 4 threads on a 4-core host; decode
    parallelism is inside fetch(), native/loader.cpp worker loop)."""
    import time
    paths = jpeg_dir * 64              # 256 decodes per trial
    native_loader.decode_batch(paths[:8], 64)   # warm (build + page-in)

    def rate(threads):
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            native_loader.decode_batch(paths, 64, num_threads=threads)
            best = max(best, len(paths) / (time.perf_counter() - t0))
        return best

    r1, r4 = rate(1), rate(4)
    assert r4 >= 1.6 * r1, f'1 thread {r1:.0f}/s vs 4 threads {r4:.0f}/s'
