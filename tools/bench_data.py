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
    """CelebA-format corpus: root/img_align_celeba/*.jpg + attr CSV, so
    the training-wired loader benches can use CelebAReader itself."""
    import PIL.Image
    from gltvae.config import CELEBA_LABELS
    img_dir = os.path.join(root, 'img_align_celeba')
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    paths, lines = [], ['image_id,' + ','.join(CELEBA_LABELS)]
    for i in range(n):
        img = rng.randint(0, 255, (*size, 3), dtype=np.uint8)
        name = f'{i:06d}.jpg'
        p = os.path.join(img_dir, name)
        PIL.Image.fromarray(img).save(p, quality=90)
        paths.append(p)
        lines.append(name + ',' + ','.join(
            map(str, rng.choice([-1, 1], size=40))))
    with open(os.path.join(root, 'list_attr_celeba.csv'), 'w') as f:
        f.write('\n'.join(lines) + '\n')
    return paths


def bench_training_loader(root, n, out_size, batch_size, backend, workers,
                          cache_decoded=False):
    """images/sec through the EXACT loader stack train.py uses for
    --decode-backend: CelebAReader -> (BatchLoader worker threads |
    native C++ pool | Grain iterator) -> stacked uint8 batches. This is
    the e2e-relevant number (round 2 measured e2e host-decode-bound).

    cache_decoded warms a FULL epoch first so the timed loop measures
    the steady-state (epoch 2+) in-RAM cached path."""
    from gltvae.config import DataConfig
    from gltvae.data.celeba import CelebAReader
    nv = max(1, n // 8)
    cfg = DataConfig(data_dir=root, image_size=out_size,
                     n_train=n - 2 * nv, n_valid=nv, n_test=nv,
                     num_workers=workers, decode_backend=backend,
                     cache_decoded=cache_decoded)
    try:
        reader = CelebAReader(cfg, sup_frac=1.0, batch_size=batch_size)
        loader = reader.setup_data_loaders()['sup']
    except (RuntimeError, ValueError):
        return None          # backend unavailable
    it = iter(loader)
    nb = loader.epoch_batches
    for _ in range(nb if cache_decoded else min(2, nb)):
        next(it)             # warm workers / prefetch (+ fill the cache)
    total = 0
    t0 = time.perf_counter()
    for _ in range(nb * 3):
        x, _ = next(it)
        total += len(x)
    rate = total / (time.perf_counter() - t0)
    if hasattr(it, 'close'):
        it.close()
    return rate


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


def bench_ship_and_step(out_size, batch_size=256, iters=20, full_res=False):
    """End-to-end device leg: host->device transfer of a uint8 batch +
    one supervised train step, with either host-resized (out_size px) or
    FULL-RES (218x178) batches resized on device (DataConfig.device_resize
    via steps._prep_image -> ops/resize GEMMs). Fenced by a host fetch of
    the loss. Isolates the bus-vs-MXU tradeoff the north star asks about:
    full-res uint8 is ~10x the bytes at 64px, ~2.4x at 128px."""
    import jax
    import jax.numpy as jnp
    from gltvae.config import ModelConfig, TrainConfig, celeba128
    from gltvae.models.ccvae import CCVAE
    from gltvae.train.state import create_train_state
    from gltvae.train.steps import make_train_steps

    if out_size == 128:
        cfg, _ = celeba128()
        import dataclasses
        cfg = dataclasses.replace(cfg, compute_dtype='bfloat16')
    else:
        cfg = ModelConfig(compute_dtype='bfloat16')
    tc = TrainConfig(batch_size=batch_size)
    model = CCVAE(cfg)
    rng = np.random.RandomState(0)
    mu = rng.rand(cfg.z_classify, cfg.y_dim).astype(np.float32)
    state = create_train_state(model, tc, jax.random.key(0), mu_init=mu)
    sup, _ = make_train_steps(model, tc)

    shape = ((batch_size, 218, 178, 3) if full_res
             else (batch_size, out_size, out_size, 3))
    host_batches = [rng.randint(0, 256, shape, dtype=np.uint8)
                    for _ in range(4)]
    y = jnp.asarray((rng.rand(batch_size, cfg.y_dim) > 0.5)
                    .astype(np.float32))
    # warm / compile
    state, m = sup(state, jnp.asarray(host_batches[0]), y, 1.0)
    float(jax.device_get(m['loss']))
    t0 = time.perf_counter()
    for i in range(iters):
        x = jnp.asarray(host_batches[i % 4])   # fresh host->device ship
        state, m = sup(state, x, y, 1.0)
    float(jax.device_get(m['loss']))           # completion fence
    return batch_size * iters / (time.perf_counter() - t0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--n', type=int, default=512)
    p.add_argument('--out-size', type=int, default=64)
    p.add_argument('--threads', type=int, default=os.cpu_count() or 1)
    p.add_argument('--device-resize', action='store_true',
                   help='also bench the host->device ship + train step '
                        'with host-resize vs full-res device-resize')
    from gltvae.utils.platform import add_platform_arg, apply_platform
    add_platform_arg(p)
    args = p.parse_args()
    apply_platform(args.platform)

    with tempfile.TemporaryDirectory() as d:
        paths = make_corpus(d, args.n)
        results = {
            'pil_sequential (reference pattern)':
                bench_pil_sequential(paths, args.out_size),
            'cv2_sequential': bench_cv2_sequential(paths, args.out_size),
            f'native_cpp_x{args.threads} (raw pool)':
                bench_native(paths, args.out_size, args.threads),
        }
        # the loader stacks exactly as train.py --decode-backend wires them
        bs = min(64, args.n // 4)
        for backend in ('cv2', 'native', 'grain'):
            results[f'train-path {backend} x{args.threads}'] = \
                bench_training_loader(d, args.n, args.out_size, bs,
                                      backend, args.threads)
        results['train-path cv2 + cache_decoded (epoch 2+)'] = \
            bench_training_loader(d, args.n, args.out_size, bs,
                                  'cv2', args.threads, cache_decoded=True)
    if args.device_resize:
        results[f'ship{args.out_size}px+step (host resize)'] = \
            bench_ship_and_step(args.out_size, full_res=False)
        results['ship218x178+step (device resize)'] = \
            bench_ship_and_step(args.out_size, full_res=True)
    for k, v in results.items():
        print(f'{k:45s} {"n/a" if v is None else f"{v:8.0f} img/s"}')


if __name__ == '__main__':
    main()
