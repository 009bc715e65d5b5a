"""Input-pipeline benchmark: images/sec for decode+resize+batch across
backends (PIL one-at-a-time ~= the reference's loader, cv2 threaded, C++
native pool). Generates its own JPEG corpus so it runs anywhere.

Usage: python tools/bench_data.py --n 512 --batch-size 256
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def make_corpus(root, n, size=(218, 178)):
    import PIL.Image
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        img = rng.randint(0, 255, (*size, 3), dtype=np.uint8)
        p = os.path.join(root, f'{i:06d}.jpg')
        PIL.Image.fromarray(img).save(p, quality=90)
        paths.append(p)
    return paths


def bench_pil_sequential(paths, out_size):
    """The reference's access pattern (utils_data.py:48-63)."""
    import PIL.Image
    t0 = time.perf_counter()
    for p in paths:
        img = PIL.Image.open(p)
        img = np.array(img)
        img = np.array(PIL.Image.fromarray(img).resize((out_size, out_size)),
                       dtype=np.float32) / 255.0
    return len(paths) / (time.perf_counter() - t0)


def bench_cv2_sequential(paths, out_size):
    import cv2
    t0 = time.perf_counter()
    for p in paths:
        img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (out_size, out_size))
    return len(paths) / (time.perf_counter() - t0)


def bench_native(paths, out_size, threads):
    from gltvae.data import native_loader
    if not native_loader.is_available():
        return None
    # warm
    native_loader.decode_batch(paths[:16], out_size, num_threads=threads)
    t0 = time.perf_counter()
    native_loader.decode_batch(paths, out_size, num_threads=threads)
    return len(paths) / (time.perf_counter() - t0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--n', type=int, default=512)
    p.add_argument('--out-size', type=int, default=64)
    p.add_argument('--threads', type=int, default=os.cpu_count() or 1)
    args = p.parse_args()

    with tempfile.TemporaryDirectory() as d:
        paths = make_corpus(d, args.n)
        results = {
            'pil_sequential (reference pattern)':
                bench_pil_sequential(paths, args.out_size),
            'cv2_sequential': bench_cv2_sequential(paths, args.out_size),
            f'native_cpp_x{args.threads}':
                bench_native(paths, args.out_size, args.threads),
        }
    for k, v in results.items():
        print(f'{k:45s} {"n/a" if v is None else f"{v:8.0f} img/s"}')


if __name__ == '__main__':
    main()
