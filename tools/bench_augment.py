"""Bench: fused Pallas augmentation vs the XLA composition, on device.

Measures the full device-side augmentation stage (uint8 in HBM ->
random-crop + hflip + dequant-normalize -> f32) both ways at 64px and
128px, fenced by a host fetch of a data-dependent scalar (the axon
backend returns from block_until_ready at enqueue; see
.claude/skills/verify). Numbers go to docs/BENCH_NOTES.md; the train
path keeps whichever wins (train/loop.py _build_augment).

Usage: python tools/bench_augment.py [--batch 256] [--iters 50]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def bench(fn, u8, keys, iters):
    import jax
    out = fn(u8, keys[0])
    float(jax.device_get(out.ravel()[0]))        # compile + fence
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(u8, keys[i % len(keys)])
    float(jax.device_get(out.ravel()[0]))        # completion fence
    dt = time.perf_counter() - t0
    return u8.shape[0] * iters / dt, dt / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch', type=int, default=256)
    p.add_argument('--iters', type=int, default=50)
    p.add_argument('--pad', type=int, default=4)
    from gltvae.utils.platform import add_platform_arg, apply_platform
    add_platform_arg(p)
    args = p.parse_args()
    apply_platform(args.platform)

    import jax
    import jax.numpy as jnp
    from gltvae.ops.pallas.preprocess import fused_augment, augment_xla

    rng = np.random.RandomState(0)
    keys = [jax.random.fold_in(jax.random.key(0), i) for i in range(8)]
    print(f'backend: {jax.default_backend()}, batch {args.batch}, '
          f'pad {args.pad}')
    for S in (64, 128):
        Hin = S + 2 * args.pad
        u8 = jnp.asarray(rng.randint(0, 256,
                                     (args.batch, Hin, Hin, 3),
                                     dtype=np.uint8))
        pal = jax.jit(lambda u, k, S=S: fused_augment(u, k, S))
        xla = jax.jit(lambda u, k, S=S: augment_xla(u, k, S))
        r_pal, ms_pal = bench(pal, u8, keys, args.iters)
        r_xla, ms_xla = bench(xla, u8, keys, args.iters)
        # exactness cross-check on device
        same = bool(jnp.array_equal(pal(u8, keys[0]), xla(u8, keys[0])))
        print(f'{S:4d}px  pallas {r_pal:11.0f} img/s ({ms_pal:6.3f} ms)  '
              f'xla {r_xla:11.0f} img/s ({ms_xla:6.3f} ms)  '
              f'speedup x{r_pal / r_xla:.2f}  bit-identical={same}')


if __name__ == '__main__':
    main()
