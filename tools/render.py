"""Qualitative rendering CLI: latent-traversal grids, reconstructions, and
attribute-conditioned samples, saved as PNG.

The reference has no visualization at all (its fig_path is dead code,
gated_ccvae.py:499); the BASELINE north star's headline capability is the
batched traversal renderer — this is its user-facing surface.

Usage:
  python tools/render.py --mode traversal --out /tmp/traversal.png \
      [--checkpoint <orbax dir>] [--synthetic-anchor]
  python tools/render.py --mode conditional --labels Male,Smiling --out ...
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def save_grid(images: np.ndarray, path: str):
    """(rows, cols, H, W, C) float [0,1] -> one tiled PNG."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    r, c, h, w, ch = images.shape
    tile = images.transpose(0, 2, 1, 3, 4).reshape(r * h, c * w, ch)
    plt.figure(figsize=(c, r), dpi=2 * max(h, 64))
    plt.imshow(np.clip(tile, 0, 1))
    plt.axis('off')
    plt.tight_layout(pad=0)
    plt.savefig(path, bbox_inches='tight', pad_inches=0)
    plt.close()


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--mode', default='traversal',
                   choices=['traversal', 'reconstruct', 'conditional'])
    p.add_argument('--out', required=True)
    p.add_argument('--checkpoint', default=None,
                   help='orbax checkpoint dir (omit for fresh init)')
    p.add_argument('--ref-checkpoint', default=None,
                   help='reference param dir with .h5 weights')
    p.add_argument('--dims', type=int, nargs='*', default=None)
    p.add_argument('--n-steps', type=int, default=8)
    p.add_argument('--anchor', default='zeros', choices=['zeros', 'prior'],
                   help="traversal anchor: 'zeros' (z=0; fine for fresh "
                        "inits) or 'prior' (z_classify at the trained "
                        "conditional prior mean p(z|y) for --labels, "
                        "z_style=0 — in-distribution for TRAINED weights, "
                        "whose ReLU'd posterior means never visit z=0)")
    p.add_argument('--lo', type=float, default=-3.0)
    p.add_argument('--hi', type=float, default=3.0)
    p.add_argument('--labels', default='',
                   help='comma-separated attribute names to switch ON '
                        '(conditional mode)')
    p.add_argument('--n', type=int, default=8)
    p.add_argument('--seed', type=int, default=0)
    from gltvae.utils.platform import add_platform_arg, apply_platform
    add_platform_arg(p)
    args = p.parse_args()
    apply_platform(args.platform)

    import jax
    import jax.numpy as jnp
    from gltvae.config import ModelConfig, TrainConfig, CELEBA_EASY_LABELS
    from gltvae.models.ccvae import CCVAE, Temps

    model = CCVAE(ModelConfig())
    if args.ref_checkpoint:
        from gltvae.utils.h5_import import load_reference_checkpoint
        params = load_reference_checkpoint(args.ref_checkpoint, 'best')
    elif args.checkpoint:
        from gltvae.train.state import create_train_state
        from gltvae.train.checkpoint import CheckpointManager
        state = create_train_state(model, TrainConfig(), jax.random.key(0),
                                   mu_init=np.eye(18, dtype=np.float32))
        state = CheckpointManager(args.checkpoint).restore(state)
        params = state.params
    else:
        params = model.init(jax.random.key(0),
                            mu_init=np.eye(18, dtype=np.float32))

    key = jax.random.key(args.seed)
    if args.mode == 'traversal':
        from gltvae.eval.traversal import latent_traversal
        cfg = model.cfg
        dims = (args.dims if args.dims
                else list(range(cfg.z_style, cfg.z_dim)))  # z_classify
        z_base = None
        if args.anchor == 'prior':
            from gltvae.ops.sampling import sample_gating_deterministic
            on = [s for s in args.labels.split(',') if s]
            y = np.zeros((1, cfg.y_dim), np.float32)
            for name in on:
                y[:, CELEBA_EASY_LABELS.index(name)] = 1.0
            c = sample_gating_deterministic(params['mu'])
            locs, _ = model.prior_zc(params, jnp.asarray(y), c)
            # z_style from ITS prior N(0,I) (--seed selects the identity;
            # seed 0 keeps the deterministic mean-style anchor)
            zs = (jnp.zeros((cfg.z_style,), jnp.float32) if args.seed == 0
                  else jax.random.normal(key, (cfg.z_style,), jnp.float32))
            z_base = jnp.concatenate([zs, locs[0]])
        grid = latent_traversal(model, params, z_base=z_base,
                                n_steps=args.n_steps, dims=dims,
                                lo=args.lo, hi=args.hi)
        save_grid(np.asarray(grid), args.out)
    elif args.mode == 'reconstruct':
        from gltvae.data.synthetic import synthetic_celeba
        ds = synthetic_celeba(args.n, seed=args.seed)
        x = jnp.asarray(ds.images, jnp.float32) / 255.0
        recon = model.reconstruct(params, x)
        save_grid(np.stack([np.asarray(x), np.asarray(recon)]), args.out)
    else:  # conditional
        on = [s for s in args.labels.split(',') if s]
        y = np.zeros((args.n, 18), np.float32)
        for name in on:
            y[:, CELEBA_EASY_LABELS.index(name)] = 1.0
        imgs = model.sample_conditional(params, jnp.asarray(y), key,
                                        Temps(gating=jnp.float32(0.3)))
        save_grid(np.asarray(imgs)[None], args.out)
    print(f'wrote {args.out}')


if __name__ == '__main__':
    main()
