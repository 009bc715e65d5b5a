"""Export a trained checkpoint as a self-contained StableHLO serving
artifact (gltvae.utils.serving; weights baked in, symbolic batch dim,
cpu+tpu platforms). The artifact is deserialized with
jax.export.deserialize / serving.load_serving and called directly —
no gltvae model code needed at serving time.

Accepts the same checkpoint layouts as tools/infer.py: a train.py run
dir (Orbax) or a reference-format directory of *_best.h5 files
(/root/reference/models/params_*). Always round-trips the artifact and
verifies it against the live model on random pixels before writing.

Examples:
  python tools/export_serving.py --checkpoint models/params_1.0_learnable \
      --output model.gltvae.shlo
  python tools/export_serving.py --checkpoint /root/reference/models/params_1.0_learnable \
      --output ref.shlo --with-reconstruct
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--checkpoint', required=True,
                   help='train.py run dir (contains orbax/) or a '
                        'reference-format dir of *_best.h5 files')
    p.add_argument('--model-id', default='best', choices=['best', 'last'])
    p.add_argument('--output', required=True,
                   help='artifact path (e.g. model.shlo); with '
                        '--with-reconstruct a second file '
                        '<output>.recon is written')
    p.add_argument('--with-reconstruct', action='store_true',
                   help='also export the reconstruction path')
    p.add_argument('--image-size', type=int, default=None,
                   choices=[64, 128], help='default 64')
    p.add_argument('--gate-type', default=None,
                   choices=['learnable', 'fixed'], help='default learnable')
    p.add_argument('--gate-subtype', default=None,
                   choices=['one-one', 'inferred'], help='default inferred')
    p.add_argument('--z-dim', type=int, default=None,
                   help='latent size when non-default')
    p.add_argument('--mu', default=None,
                   help='gating-matrix .npy for fixed-mode h5 checkpoints')
    p.add_argument('--platforms', default='cpu,tpu',
                   help='comma-separated export platforms')
    from gltvae.utils.platform import add_platform_arg
    add_platform_arg(p)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from gltvae.utils.platform import apply_platform
    apply_platform(args.platform)
    import jax
    import jax.numpy as jnp
    from gltvae.models.ccvae import CCVAE, Temps
    from gltvae.utils import serving
    # checkpoint loading + config resolution shared with the batch
    # inference CLI (model_config.json is authoritative when present)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import infer

    model = CCVAE(infer.resolve_model_config(args))
    params = infer.load_params(args, model)
    platforms = tuple(p.strip() for p in args.platforms.split(',') if p)

    blob = serving.export_predict(model, params, platforms=platforms)
    # verify the round-trip against the live model before writing
    s = model.cfg.image_size
    u8 = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (4, s, s, 3), dtype=np.uint8))
    got = np.asarray(serving.load_serving(blob).call(u8))
    want = np.asarray(model.predict_probs(
        jax.tree.map(jnp.asarray, params), u8.astype(jnp.float32) / 255.0,
        None, Temps(gating=jnp.float32(1.0)), deterministic=True))
    if not np.allclose(got, want, atol=1e-5):
        raise SystemExit('round-trip verification FAILED '
                         f'(max abs diff {np.abs(got - want).max():.3e})')
    with open(args.output, 'wb') as f:
        f.write(blob)
    print(f'predict artifact: {args.output} ({len(blob)} bytes, '
          f'platforms {platforms}, verified max diff '
          f'{np.abs(got - want).max():.2e})')

    if args.with_reconstruct:
        rblob = serving.export_reconstruct(model, params,
                                           platforms=platforms)
        rpath = args.output + '.recon'
        rec = np.asarray(serving.load_serving(rblob).call(u8))
        assert rec.shape == u8.shape
        with open(rpath, 'wb') as f:
            f.write(rblob)
        print(f'reconstruct artifact: {rpath} ({len(rblob)} bytes)')


if __name__ == '__main__':
    main()
