"""Where do the train step's HBM bytes go?  Static HLO traffic breakdown.

bench.py's roofline says the supervised train step moves ~530 MB/step at
~84% of v5e HBM speed-of-light — i.e. the step is bandwidth-bound and the
only perf lever left is moving FEWER bytes.  This tool compiles the exact
bench step (scanned sup chunk, bs 256, bf16) and attributes the bytes: it
parses the optimized HLO, finds the scan-body computation, and lists every
instruction whose output buffer is large, grouped by op kind.  Each listed
buffer is (at least) one HBM write plus one read by its consumer, so the
top of this list is the fusion-boundary traffic XLA could not elide.

Usage:  python tools/hlo_memory.py [--scan 32] [--batch-size 256]
        [--dtype bfloat16] [--top 30]

Output: a table of the top-N output buffers in the hottest computation,
plus per-opcode byte totals — the worklist for remat/fusion experiments.
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {
    'pred': 1, 'u8': 1, 's8': 1, 'u16': 2, 's16': 2, 'bf16': 2, 'f16': 2,
    'u32': 4, 's32': 4, 'f32': 4, 'u64': 8, 's64': 8, 'f64': 8,
}

# e.g.  bf16[256,32,32,32]{3,2,1,0}
_SHAPE_RE = re.compile(r'\b(%s)\[([\d,]*)\]' % '|'.join(_DTYPE_BYTES))
_INSTR_RE = re.compile(
    r'^\s*(?:ROOT\s+)?([%\w.\-]+)\s*=\s*(\(?)(.*?)\s+'
    r'([a-z][\w\-]*)\(', re.ASCII)


def shape_bytes(shape_text: str) -> int:
    """Total bytes of all array shapes appearing in `shape_text`
    (handles tuple shapes by summing elements)."""
    total = 0
    for m in _SHAPE_RE.finditer(shape_text):
        dt, dims = m.group(1), m.group(2)
        n = 1
        for d in dims.split(','):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def parse_computations(hlo: str):
    """Split optimized HLO text into {computation_name: [instr lines]}."""
    comps, cur, name = {}, None, None
    for line in hlo.splitlines():
        stripped = line.strip()
        # header: `%name (args...) -> ret {` — args may nest parens
        # (tuple-shaped params), so don't try to match them structurally
        m = re.match(r'^(?:ENTRY\s+)?([%\w.\-]+)\s*\(.*->.*{$', stripped)
        if m:
            name = m.group(1)
            cur = []
            comps[name] = cur
            continue
        if stripped.startswith('}'):
            name, cur = None, None
            continue
        if cur is not None and '=' in stripped:
            cur.append(stripped)
    return comps


def analyze(hlo: str, top: int):
    comps = parse_computations(hlo)
    # Only top-level computations count: buffers inside a %fused_computation
    # live in registers/VMEM and never touch HBM.  The scan body is the
    # top-level computation with the most total output bytes (the entry
    # computation mostly just calls the while loop).
    scored = []
    for name, lines in comps.items():
        if 'fused_computation' in name:
            continue
        rows = []
        for ln in lines:
            m = _INSTR_RE.match(ln)
            if not m:
                continue
            iname, _, shape_text, opcode = m.groups()
            b = shape_bytes(shape_text)
            if b:
                rows.append((b, opcode, iname, shape_text[:60]))
        total = sum(r[0] for r in rows)
        scored.append((total, name, rows))
    scored.sort(reverse=True)

    total, name, rows = scored[0]
    print(f'hottest computation: {name}  '
          f'(sum of instruction output buffers: {total/2**20:.1f} MiB)')
    print()
    by_op = {}
    for b, opcode, _, _ in rows:
        by_op[opcode] = by_op.get(opcode, 0) + b
    print('bytes by opcode (output buffers):')
    for op, b in sorted(by_op.items(), key=lambda kv: -kv[1]):
        print(f'  {op:28s} {b/2**20:10.2f} MiB')
    print()
    print(f'top {top} output buffers:')
    rows.sort(reverse=True)
    for b, opcode, iname, shape in rows[:top]:
        print(f'  {b/2**20:8.2f} MiB  {opcode:24s} {iname:28s} {shape}')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch-size', type=int, default=256)
    p.add_argument('--scan', type=int, default=32)
    p.add_argument('--dtype', default='bfloat16')
    p.add_argument('--top', type=int, default=30)
    p.add_argument('--unsup', action='store_true')
    from gltvae.utils.platform import add_platform_arg, apply_platform
    add_platform_arg(p)
    args = p.parse_args()
    apply_platform(args.platform)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from gltvae.utils.compile_cache import (
        enable_persistent_compilation_cache)
    enable_persistent_compilation_cache()
    from gltvae.config import ModelConfig, TrainConfig
    from gltvae.models.ccvae import CCVAE
    from gltvae.train.state import create_train_state
    from gltvae.train.steps import make_scan_train_steps

    cfg = ModelConfig(compute_dtype=args.dtype)
    tc = TrainConfig(batch_size=args.batch_size)
    model = CCVAE(cfg)
    rng = np.random.RandomState(0)
    mu = rng.rand(18, 18).astype(np.float32)
    np.fill_diagonal(mu, 1.0)
    state = create_train_state(model, tc, jax.random.key(0), mu_init=mu)
    xs = jnp.asarray(rng.randint(
        0, 256, (args.scan, args.batch_size, 64, 64, 3)), jnp.uint8)
    ys = jnp.asarray((rng.rand(args.scan, args.batch_size, 18) > 0.5)
                     .astype(np.float32))
    sup, unsup = make_scan_train_steps(model, tc)
    fn = unsup if args.unsup else sup
    compiled = fn.lower(state, xs, ys, 1.0).compile()
    analyze(compiled.as_text(), args.top)


if __name__ == '__main__':
    main()
