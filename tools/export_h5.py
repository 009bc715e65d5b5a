"""Export a train.py Orbax run to the reference's Keras .h5 format.

Completes the checkpoint interchange in the train->reference direction:
models trained on TPU drop back into the original TF2 codebase
(`Learner.load_model`, /root/reference/gated_ccvae.py:146-165 — verified
consumable by tf.keras load_weights in tests/test_generation_export.py).
μ is written as learned_gating_matrix_{id}.npy + labeled .csv, matching
the reference artifacts.

Example:
  python tools/export_h5.py --checkpoint models/params_1.0_learnable \
      --out /tmp/for_reference
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--checkpoint', required=True,
                   help='train.py run dir (contains orbax/)')
    p.add_argument('--model-id', default='best', choices=['best', 'last'],
                   help="which slot to export ('best' = best_step)")
    p.add_argument('--out', default=None,
                   help='output dir (default: the checkpoint dir itself)')
    p.add_argument('--image-size', type=int, default=None,
                   choices=[64, 128], help='default 64')
    p.add_argument('--gate-type', default=None,
                   choices=['learnable', 'fixed'],
                   help='must match the trained run (optimizer-state '
                        'tree); default learnable')
    p.add_argument('--gate-subtype', default=None,
                   choices=['one-one', 'inferred'], help='default inferred')
    p.add_argument('--z-dim', type=int, default=None,
                   help='latent size of the trained run when non-default '
                        '(ignored when the run dir carries '
                        'model_config.json)')
    from gltvae.utils.platform import add_platform_arg
    add_platform_arg(p)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from gltvae.utils.platform import apply_platform
    apply_platform(args.platform)
    from gltvae.config import CELEBA_LABELS, CELEBA_EASY_LABELS
    from gltvae.models.ccvae import CCVAE
    from gltvae.utils.h5_export import export_reference_checkpoint
    from tools.infer import load_params, resolve_model_config

    if not os.path.isdir(os.path.join(args.checkpoint, 'orbax')):
        raise SystemExit(f'{args.checkpoint} has no orbax/ subdir — this '
                         'tool exports train.py runs (reference .h5 dirs '
                         'are already in the target format)')
    cfg = resolve_model_config(args)
    model = CCVAE(cfg)
    args.mu = None  # load_params h5-branch compat (unused for Orbax)
    params = load_params(args, model)

    out = args.out or args.checkpoint
    names = (CELEBA_EASY_LABELS if cfg.y_dim == len(CELEBA_EASY_LABELS)
             else list(CELEBA_LABELS)[:cfg.y_dim])
    export_reference_checkpoint(params, out, args.model_id,
                                label_names=names)
    print(f'exported {args.model_id} -> {out}')
    return out


if __name__ == '__main__':
    main()
