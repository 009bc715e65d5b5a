"""Full reference-protocol reproduction on real CelebA.

Runs the reference's complete experiment matrix (Final_Report Table 1 /
BASELINE.md): {fixed one-one, fixed inferred, learnable} × sup {1.0, 0.5,
0.2}, 75 epochs, bs 256, and prints a Table-1-comparable accuracy matrix
plus per-config throughput. Requires the CelebA dataset
(list_attr_celeba.csv + img_align_celeba/) under --data-dir.

Usage:
  python tools/repro_reference.py --data-dir /data/celeba \
      [--epochs 75] [--mesh] [--parity]   # --parity: shuffle-once loader,
                                          # stochastic eval (reference-exact)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

BASELINE_TABLE1 = {  # Final_Report.pdf Table 1 (BASELINE.md)
    ('fixed', 'one-one'): {1.0: 0.814, 0.5: 0.748, 0.2: 0.680},
    ('fixed', 'inferred'): {1.0: 0.762, 0.5: 0.746, 0.2: 0.659},
    ('learnable', 'inferred'): {1.0: 0.755, 0.5: 0.740, 0.2: 0.728},
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data-dir', required=True)
    p.add_argument('--epochs', type=int, default=75)
    p.add_argument('--batch-size', type=int, default=256)
    p.add_argument('--mesh', action='store_true')
    p.add_argument('--parity', action='store_true',
                   help='reference-exact quirks: shuffle-once loader, '
                        'stochastic eval')
    p.add_argument('--output-dir', default='./models')
    p.add_argument('--dtype', default='bfloat16')
    args = p.parse_args()

    import train as cli

    results = {}
    for gate_type, gate_subtype in BASELINE_TABLE1:
        for sup in (1.0, 0.5, 0.2):
            argv = ['--do-train', '--epochs', str(args.epochs),
                    '-bs', str(args.batch_size),
                    '--data-dir', args.data_dir,
                    '--output-dir', args.output_dir,
                    '--gate-type', gate_type,
                    '--gate-subtype', gate_subtype,
                    '--compute-dtype', args.dtype,
                    '--sup', str(sup)]
            if args.mesh:
                argv.append('--mesh')
            if args.parity:
                argv.append('--parity')
            else:
                argv.append('--deterministic-eval')
            acc = cli.main(argv)[sup]
            results[f'{gate_type}/{gate_subtype}/sup={sup}'] = {
                'test_accuracy': acc,
                'reference': BASELINE_TABLE1[(gate_type, gate_subtype)][sup],
            }
            print(json.dumps(results, indent=2))

    print('\n=== Final comparison vs Final_Report Table 1 ===')
    print(json.dumps(results, indent=2))


if __name__ == '__main__':
    main()
