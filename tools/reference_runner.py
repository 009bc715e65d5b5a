"""Run the UNMODIFIED reference trainer on a mini corpus (subprocess leg
of the head-to-head parity harness).

Executes /root/reference/gated_ccvae.py's own `run()` driver — its real
PIL data path, TF2 losses, Keras Adam, h5 checkpointing — against a
corpus produced by tools/parity_corpus.py. Two environmental shims, no
reference-code edits:
- split sizes: the reference hardcodes the official CelebA split
  (utils_data.py:87-91); a mini corpus needs them overridden, done by
  wrapping CelebAReader.__init__ at runtime;
- tensorflow_probability is absent from this image; tools/tfp_shim
  provides the four distribution primitives with TFP-exact math.

The reference reports results only through its ./logs file
(gated_ccvae.py:386 val acc per epoch, :537 test accuracy); this runner
chdirs into an isolated root, parses that file and writes a JSON result.

Run in a FRESH process (it chdirs and reconfigures global logging):
  python tools/reference_runner.py --root /tmp/h2h/ref --epochs 15 \
      --gate-type learnable --sup 1.0 --n-train 2000 --n-valid 400 \
      --n-test 400 --out-json /tmp/h2h/ref_learnable.json
"""

import argparse
import json
import os
import re
import sys
import time

REFERENCE = '/root/reference'


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--root', required=True,
                   help='isolated run root; corpus must be at <root>/data')
    p.add_argument('--epochs', type=int, default=15)
    p.add_argument('--bs', type=int, default=64)
    p.add_argument('--gate-type', default='learnable',
                   choices=['learnable', 'fixed'])
    p.add_argument('--gate-subtype', default='inferred',
                   choices=['one-one', 'inferred'])
    p.add_argument('--sup', type=float, default=1.0)
    p.add_argument('--n-train', type=int, required=True)
    p.add_argument('--n-valid', type=int, required=True)
    p.add_argument('--n-test', type=int, required=True)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--out-json', required=True)
    return p.parse_args(argv)


def parse_reference_logs(path):
    """Val-acc trajectory + test accuracy from the reference's log format
    (gated_ccvae.py:386 '[Epoch %03d] Val Acc %.3f', :537
    'Test Accuracy (best model): %.3f')."""
    val_re = re.compile(r'\[Epoch (\d+)\] Val Acc ([\d.+-einf]+)')
    test_re = re.compile(r'Test Accuracy \(best model\): ([\d.]+)')
    vals, test = [], None
    with open(path) as f:
        for line in f:
            m = val_re.search(line)
            if m:
                vals.append(float(m.group(2)))
            m = test_re.search(line)
            if m:
                test = float(m.group(1))
    return vals, test


def main(argv=None):
    args = parse_args(argv)
    root = os.path.abspath(args.root)
    out_json = os.path.abspath(args.out_json)
    assert os.path.exists(os.path.join(root, 'data', 'list_attr_celeba.csv')), \
        f'corpus missing at {root}/data (run tools/parity_corpus.py)'

    import numpy as np
    np.random.seed(args.seed)
    import tensorflow as tf
    tf.random.set_seed(args.seed)

    # the reference writes ./logs and ./models relative to CWD
    os.chdir(root)
    try:
        import tensorflow_probability  # noqa: F401
    except ImportError:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), 'tfp_shim'))
    sys.path.insert(0, REFERENCE)

    # Keras 3 (TF 2.21) insists weight files end in '.weights.h5'; the
    # reference names them '*_best.h5' (Keras 2 era, gated_ccvae.py:391-
    # 394). Redirect the filenames transparently — save and load agree
    # within the run, which is all the best-checkpoint protocol needs.
    import keras

    def _redirect(path):
        if path.endswith('.h5') and not path.endswith('.weights.h5'):
            return path[:-3] + '.weights.h5'
        return path

    _orig_save = keras.Model.save_weights
    _orig_load = keras.Model.load_weights

    def _save_weights(self, filepath, overwrite=True, **kw):
        return _orig_save(self, _redirect(filepath), overwrite=overwrite)

    def _load_weights(self, filepath, **kw):
        return _orig_load(self, _redirect(filepath), **kw)

    keras.Model.save_weights = _save_weights
    keras.Model.load_weights = _load_weights

    import utils_data
    split = {'train': args.n_train, 'valid': args.n_valid,
             'test': args.n_test}
    orig_init = utils_data.CelebAReader.__init__

    def patched_init(self, r, sup_frac, batch_size):
        orig_init(self, r, sup_frac, batch_size)
        self.split_map = dict(split)

    utils_data.CelebAReader.__init__ = patched_init

    import gated_ccvae
    ns = argparse.Namespace(
        n=args.epochs, z_dim=45, lr=1e-4, anneal_rate=3e-5, bs=args.bs,
        data_dir=root, l1_reg=0.2, gate_type=args.gate_type,
        gate_subtype=args.gate_subtype, do_train=True, do_test=True)
    t0 = time.perf_counter()
    gated_ccvae.run(ns, sup=args.sup)
    wall = time.perf_counter() - t0

    vals, test = parse_reference_logs(os.path.join(root, 'logs'))
    n_imgs = args.n_train   # all train images pass each epoch
    result = {
        'framework': 'reference-tf',
        'gate_type': args.gate_type, 'gate_subtype': args.gate_subtype,
        'sup': args.sup, 'epochs': args.epochs, 'batch_size': args.bs,
        'val_accuracy': vals, 'test_accuracy': test,
        'wall_seconds': wall,
        'images_per_sec': args.epochs * n_imgs / wall,
    }
    with open(out_json, 'w') as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return result


if __name__ == '__main__':
    main()
