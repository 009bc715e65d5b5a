"""jax.profiler trace of the train step (SURVEY.md §5 tracing plan).

Writes a TensorBoard-loadable trace of N supervised steps; use to confirm
MXU occupancy and find HBM-bound stretches.

Usage: python tools/profile_train.py --logdir /tmp/gltvae-trace --steps 10
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--logdir', default='/tmp/gltvae-trace')
    p.add_argument('--steps', type=int, default=10)
    p.add_argument('--batch-size', type=int, default=256)
    p.add_argument('--dtype', default='bfloat16')
    from gltvae.utils.platform import add_platform_arg, apply_platform
    add_platform_arg(p)
    args = p.parse_args()
    apply_platform(args.platform)

    import jax
    import jax.numpy as jnp
    from gltvae.config import ModelConfig, TrainConfig
    from gltvae.models.ccvae import CCVAE
    from gltvae.train.state import create_train_state
    from gltvae.train.steps import make_train_steps

    cfg = ModelConfig(compute_dtype=args.dtype)
    train_cfg = TrainConfig(batch_size=args.batch_size)
    model = CCVAE(cfg)
    rng = np.random.RandomState(0)
    mu = rng.rand(18, 18).astype(np.float32)
    state = create_train_state(model, train_cfg, jax.random.key(0),
                               mu_init=mu)
    sup_step, _ = make_train_steps(model, train_cfg)
    x = jnp.asarray(rng.randint(0, 256, (args.batch_size, 64, 64, 3)),
                    jnp.uint8)
    y = jnp.asarray((rng.rand(args.batch_size, 18) > 0.5)
                    .astype(np.float32))

    # compile outside the trace
    state, m = sup_step(state, x, y, 1.0)
    jax.block_until_ready(m['loss'])

    with jax.profiler.trace(args.logdir):
        for _ in range(args.steps):
            state, m = sup_step(state, x, y, 1.0)
        jax.block_until_ready(m['loss'])
    print(f'trace written to {args.logdir}')


if __name__ == '__main__':
    main()
