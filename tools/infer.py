"""Batch attribute inference: images in, per-attribute predictions out.

The model's end purpose is attribute prediction, but the reference offers
no inference entry point at all — `classifier_accuracy`
(/root/reference/gated_ccvae.py:421-446) needs ground-truth labels and
only prints a mean. This tool serves the trained model: point it at a
checkpoint (an Orbax run directory from train.py OR a reference-format
.h5 directory) and a folder of JPEGs, get a CSV of per-image attribute
probabilities and 0/1 predictions from one jit-compiled batched forward.

Examples:
  python tools/infer.py --checkpoint models/params_1.0_learnable \
      --images /data/celeba/img_align_celeba --output preds.csv
  python tools/infer.py --checkpoint /root/reference/models/params_1.0_learnable \
      --images ./photos --stochastic --temp 0.3   # reference eval protocol
"""

import argparse
import csv
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
    p.add_argument('--images', required=True,
                   help='directory of JPEG/PNG images')
    p.add_argument('--output', default='predictions.csv')
    p.add_argument('--batch-size', type=int, default=256)
    p.add_argument('--image-size', type=int, default=None,
                   choices=[64, 128],
                   help='default 64 (ignored when the run dir carries '
                        'model_config.json)')
    p.add_argument('--gate-type', default=None,
                   choices=['learnable', 'fixed'],
                   help='must match the trained run for Orbax checkpoints '
                        '(the optimizer-state tree differs between '
                        'learnable and fixed gating); default learnable')
    p.add_argument('--gate-subtype', default=None,
                   choices=['one-one', 'inferred'],
                   help='default inferred')
    p.add_argument('--z-dim', type=int, default=None,
                   help='latent size of the trained run when it differs '
                        'from the config default (ignored when the run '
                        'dir carries model_config.json — train.py '
                        'records it automatically)')
    p.add_argument('--num-workers', type=int, default=4,
                   help='decode worker threads (overlap JPEG decode with '
                        'device inference)')
    p.add_argument('--stochastic', action='store_true',
                   help='sampled z and gates (the reference eval protocol); '
                        'default is the deterministic mean-z/expected-gate '
                        'path')
    p.add_argument('--temp', type=float, default=0.3,
                   help='gating temperature for --stochastic '
                        '(reference test protocol: 0.3)')
    p.add_argument('--mu', default=None,
                   help='gating-matrix .npy for fixed-mode h5 checkpoints '
                        'that store no learned_gating_matrix')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--mesh', action='store_true',
                   help='data-parallel inference over all visible devices '
                        '(1-D mesh, params replicated, batch sharded — '
                        'the serving counterpart of train.py --mesh); '
                        '--batch-size must be a multiple of the device '
                        'count')
    from gltvae.utils.platform import add_platform_arg
    add_platform_arg(p)
    return p.parse_args(argv)


def load_params(args, model):
    """Params pytree from either checkpoint layout. The restore template's
    optimizer-state tree follows model.cfg.gate_type, so --gate-type must
    match the trained run for Orbax checkpoints."""
    import jax
    ckpt = args.checkpoint
    if os.path.isdir(os.path.join(ckpt, 'orbax')):
        from gltvae.config import TrainConfig
        from gltvae.train.checkpoint import CheckpointManager
        from gltvae.train.state import create_train_state
        c = model.cfg
        template = create_train_state(
            model, TrainConfig(), jax.random.key(0),
            mu_init=np.eye(c.z_classify, c.y_dim, dtype=np.float32))
        mgr = CheckpointManager(os.path.join(ckpt, 'orbax'))
        # 'best' -> best_step (restore default); 'last' -> latest_step
        step = mgr.latest_step() if args.model_id == 'last' else None
        try:
            state = mgr.restore(template, step=step)
        except Exception as e:
            raise SystemExit(
                f'Orbax restore failed for {ckpt}: {e}\n'
                'This usually means the restore template does not match '
                'the trained architecture — check --z-dim/--gate-type/'
                '--gate-subtype/--image-size against the run (newer runs '
                'record them in model_config.json and need no flags).')
        return state.params
    from gltvae.utils.h5_import import load_reference_checkpoint
    mu = np.load(args.mu) if args.mu else None
    return load_reference_checkpoint(ckpt, args.model_id, mu=mu)


def resolve_model_config(args):
    """ModelConfig for a checkpoint: the model_config.json train.py wrote
    into the run dir when present (authoritative — a flag/recorded-config
    mismatch would otherwise surface as an opaque Orbax restore error),
    else rebuilt from the CLI flags."""
    import dataclasses
    from gltvae.config import ModelConfig, celeba128, load_model_config
    recorded = load_model_config(args.checkpoint)
    if recorded is not None:
        # Every model flag defaults to None so an explicitly typed value
        # is distinguishable from a defaulted one: conflict notes fire
        # only when the user actually passed a flag that disagrees with
        # the recorded config (the recorded value wins either way).
        for flag, val in (('image-size', args.image_size),
                          ('gate-type', args.gate_type),
                          ('gate-subtype', args.gate_subtype),
                          ('z-dim', getattr(args, 'z_dim', None))):
            rec = getattr(recorded, flag.replace('-', '_'))
            if val is not None and rec != val:
                print(f'note: run dir records --{flag}={rec}; ignoring '
                      f'the conflicting CLI value {val}')
        return recorded
    cfg = (celeba128()[0] if args.image_size == 128 else ModelConfig())
    overrides = {}
    if args.gate_type is not None:
        overrides['gate_type'] = args.gate_type
    if args.gate_subtype is not None:
        overrides['gate_subtype'] = args.gate_subtype
    if getattr(args, 'z_dim', None) is not None:
        overrides['z_dim'] = args.z_dim
    return dataclasses.replace(cfg, **overrides)


def make_predict(model, stochastic: bool, temp: float, mesh=None):
    """One jitted call into the SHARED eval protocol
    (CCVAE.predict_probs — the same path Trainer.evaluate rounds).

    With a mesh: params/key replicated, batch sharded over 'data', probs
    replicated back — XLA inserts the gathers; numerically identical to
    single-device (the model is deterministic given (params, x, key))."""
    import jax
    import jax.numpy as jnp
    from gltvae.models.ccvae import Temps

    def fn(params, x, key):
        x = x.astype(jnp.float32) / 255.0
        return model.predict_probs(params, x, key,
                                   Temps(gating=jnp.float32(temp)),
                                   deterministic=not stochastic)

    if mesh is None:
        return jax.jit(fn)
    from gltvae.parallel.dp import batch_sharding, replicated_sharding
    repl = replicated_sharding(mesh)
    return jax.jit(fn, in_shardings=(repl, batch_sharding(mesh), repl),
                   out_shardings=repl)


def main(argv=None):
    args = parse_args(argv)
    from gltvae.utils.platform import apply_platform
    apply_platform(args.platform)
    import jax
    from gltvae.config import CELEBA_LABELS, CELEBA_EASY_LABELS
    from gltvae.models.ccvae import CCVAE
    from gltvae.data.celeba import ImageFolderDataset, _SplitData
    from gltvae.utils.compile_cache import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()

    cfg = resolve_model_config(args)
    model = CCVAE(cfg)
    params = load_params(args, model)

    names = sorted(f for f in os.listdir(args.images)
                   if f.lower().endswith(('.jpg', '.jpeg', '.png')))
    if not names:
        raise SystemExit(f'no images found in {args.images}')
    # preprocessing must match training: train.py center-crops for 128px
    # models and direct-resizes (reference quirk) for 64px
    ds = ImageFolderDataset(args.images,
                            _SplitData(names, np.zeros((len(names), 1))),
                            cfg.image_size,
                            center_crop=(cfg.image_size == 128))
    # worker-thread decode overlapping device inference; shuffle=False so
    # batch order is names order, and the wrap-around tail padding keeps
    # every dispatch on the one compiled shape (excess rows discarded)
    mesh = None
    if args.mesh:
        from gltvae.parallel.mesh import create_mesh
        mesh = create_mesh()
        n = mesh.devices.size
        if args.batch_size % n:
            raise SystemExit(f'--batch-size {args.batch_size} must be a '
                             f'multiple of the {n}-device mesh')
        from gltvae.parallel.dp import replicated_sharding
        # explicit placement: Orbax restores commit to one device, and a
        # committed array that disagrees with in_shardings is an error
        params = jax.device_put(params, replicated_sharding(mesh))
        print(f'mesh inference over {n} devices')

    from gltvae.data.pipeline import BatchLoader
    loader = BatchLoader(ds, args.batch_size, shuffle=False,
                         num_workers=args.num_workers)
    predict = make_predict(model, args.stochastic, args.temp, mesh=mesh)
    key = jax.random.key(args.seed)

    labels = (list(CELEBA_EASY_LABELS) if cfg.y_dim == 18
              else list(CELEBA_LABELS)[:cfg.y_dim])
    it = iter(loader)
    idx = 0
    with open(args.output, 'w', newline='') as f:
        w = csv.writer(f)
        w.writerow(['image_id'] + labels
                   + [f'p_{name}' for name in labels])
        for b in range(loader.epoch_batches):
            x, _ = next(it)
            probs = np.asarray(jax.device_get(
                predict(params, x, jax.random.fold_in(key, b))))
            # hard labels use the SAME semantics as the shared eval path
            # (predict_labels: jnp.round is round-half-to-even, so p=0.5
            # maps to 0 — i.e. 1 iff p > 0.5); the 4-decimal rounding is
            # display-only, so a printed 0.5000 can rarely sit next to a
            # hard 1 (true p was in (0.5, 0.50005))
            hard_all = (probs > 0.5).astype(int)
            p4 = np.round(probs, 4)
            for row in range(len(p4)):
                if idx >= len(names):
                    break
                w.writerow([names[idx]] + hard_all[row].tolist()
                           + [f'{p:.4f}' for p in p4[row]])
                idx += 1
    if hasattr(it, 'close'):
        it.close()
    print(f'{len(names)} images -> {args.output}')
    return args.output


if __name__ == '__main__':
    main()
