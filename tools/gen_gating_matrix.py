"""Standalone gating-matrix generator — counterpart of the reference's
gen_intial_gating_matrix.py (whole file): compute the label co-occurrence
matrix over the FULL attribute CSV (all rows, not the sup/valid subset the
in-pipeline init uses) and save npy + labeled csv.

Usage:
  python tools/gen_gating_matrix.py --attr-csv ./data/list_attr_celeba.csv \
      [--out-dir ./data] [--all-labels]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from gltvae.config import CELEBA_EASY_LABELS, CELEBA_LABELS  # noqa: E402
from gltvae.data.celeba import load_attr_csv  # noqa: E402
from gltvae.ops.gating import cooccurrence_gating_matrix  # noqa: E402
from gltvae.ops.gating import _save_labeled_csv  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--attr-csv', required=True)
    p.add_argument('--out-dir', default=None,
                   help='defaults to the CSV directory')
    p.add_argument('--all-labels', action='store_true',
                   help='use all 40 attributes instead of the 18 easy ones')
    args = p.parse_args()

    _, labels = load_attr_csv(args.attr_csv,
                              use_easy_labels=not args.all_labels)
    mu = cooccurrence_gating_matrix(labels)
    names = CELEBA_LABELS if args.all_labels else CELEBA_EASY_LABELS

    out_dir = args.out_dir or os.path.dirname(os.path.abspath(args.attr_csv))
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, 'gating_matrix.npy'), mu)
    _save_labeled_csv(mu, names, os.path.join(out_dir, 'gating_matrix.csv'))
    print(mu)
    print(f'saved gating_matrix.npy/.csv to {out_dir} '
          f'({labels.shape[0]} samples, {labels.shape[1]} labels)')


if __name__ == '__main__':
    main()
