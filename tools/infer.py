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
    p.add_argument('--image-size', type=int, default=64, choices=[64, 128])
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
    return p.parse_args(argv)


def load_params(args, model):
    """Params pytree from either checkpoint layout."""
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
        state = CheckpointManager(os.path.join(ckpt, 'orbax')).restore(
            template)
        return state.params
    from gltvae.utils.h5_import import load_reference_checkpoint
    mu = np.load(args.mu) if args.mu else None
    return load_reference_checkpoint(ckpt, args.model_id, mu=mu)


def make_predict(model, stochastic: bool, temp: float):
    import jax
    import jax.numpy as jnp
    from gltvae.ops.sampling import (sample_normal, sample_gating,
                                     sample_gating_deterministic)

    def fn(params, x, key):
        x = x.astype(jnp.float32) / 255.0
        locs, scales = model.encode(params, x)
        if stochastic:
            kz, kg = jax.random.split(key)
            z = sample_normal(kz, locs, scales)
            c = sample_gating(kg, params['mu'], jnp.float32(temp))
        else:
            z = locs
            c = sample_gating_deterministic(params['mu'])
        _, zc = model.split_z(z)
        return jax.nn.sigmoid(model.classify(params, zc, c))

    return jax.jit(fn)


def main(argv=None):
    args = parse_args(argv)
    import jax
    from gltvae.config import (ModelConfig, CELEBA_LABELS,
                               CELEBA_EASY_LABELS, celeba128)
    from gltvae.models.ccvae import CCVAE
    from gltvae.data.celeba import ImageFolderDataset, _SplitData
    from gltvae.utils.compile_cache import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()

    cfg = (celeba128()[0] if args.image_size == 128 else ModelConfig())
    model = CCVAE(cfg)
    params = load_params(args, model)

    names = sorted(f for f in os.listdir(args.images)
                   if f.lower().endswith(('.jpg', '.jpeg', '.png')))
    if not names:
        raise SystemExit(f'no images found in {args.images}')
    ds = ImageFolderDataset(args.images,
                            _SplitData(names, np.zeros((len(names), 1))),
                            cfg.image_size)
    predict = make_predict(model, args.stochastic, args.temp)
    key = jax.random.key(args.seed)

    labels = (list(CELEBA_EASY_LABELS) if cfg.y_dim == 18
              else list(CELEBA_LABELS)[:cfg.y_dim])
    bs = args.batch_size
    with open(args.output, 'w', newline='') as f:
        w = csv.writer(f)
        w.writerow(['image_id'] + labels
                   + [f'p_{name}' for name in labels])
        for start in range(0, len(names), bs):
            idxs = np.arange(start, min(start + bs, len(names)))
            x, _ = ds.fetch(idxs)
            # pad the tail so every dispatch reuses the one compiled shape
            pad = bs - len(idxs)
            if pad:
                x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
            probs = np.asarray(jax.device_get(
                predict(params, x, jax.random.fold_in(key, start))))
            probs = probs[:len(idxs)]
            for i, n in zip(range(len(idxs)), names[start:start + bs]):
                hard = (probs[i] >= 0.5).astype(int)
                w.writerow([n] + hard.tolist()
                           + [f'{p:.4f}' for p in probs[i]])
    print(f'{len(names)} images -> {args.output}')
    return args.output


if __name__ == '__main__':
    main()
