"""jax.profiler TPU trace + per-op attribution (SURVEY.md §5 tracing).

Captures a device trace of the HEADLINE compute paths (the same
configurations bench.py measures) and post-processes the xplane into a
per-op time attribution, so the perf walls are attributed by MEASURED
device time instead of XLA's cost model (which round 4 showed reporting
above-physical bandwidth on this chip — docs/BENCH_NOTES.md).

Modes:
  train-scan     scanned supervised train step (bench_train_step config:
                 bf16, s2d on, n inner steps per dispatch)
  train-step     single unscanned supervised step (the round-2 tool)
  eval-resident  device-resident eval dispatch (gather + scan)
  eval-chunked   scan-eval on pre-staged batches (bench_eval config)

The capture is fenced by a host fetch of a data-dependent scalar —
`jax.block_until_ready` returns at enqueue on the axon backend, so an
unfenced trace would close before the device work runs.

Post-processing uses the xprof (TensorBoard profiler plugin) converter
when available: writes `<summary>.json` with the top ops by self time
from the `hlo_stats` tool (fallback: `framework_op_stats`), plus the
total device time. The raw TensorBoard-loadable trace stays under
--logdir either way.

Usage:
  python tools/profile_train.py --mode train-scan --scan 8 \
      --logdir /tmp/gltvae-trace --summary docs/artifacts/trace_train.json
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def build_train_scan(args):
    import jax.numpy as jnp
    from gltvae.config import ModelConfig, TrainConfig
    from gltvae.models.ccvae import CCVAE
    from gltvae.train.state import create_train_state, make_key
    from gltvae.train.steps import make_scan_train_steps, make_train_steps

    cfg = ModelConfig(compute_dtype=args.dtype, input_s2d=args.s2d,
                      output_s2d=args.s2d)
    tc = TrainConfig(batch_size=args.batch_size)
    model = CCVAE(cfg)
    rng = np.random.RandomState(0)
    mu = rng.rand(18, 18).astype(np.float32)
    np.fill_diagonal(mu, 1.0)
    state = create_train_state(model, tc, make_key(0, 'rbg'), mu_init=mu)
    n = max(args.scan, 1)
    xs = jnp.asarray(rng.randint(
        0, 256, (n, args.batch_size, 64, 64, 3)), jnp.uint8)
    ys = jnp.asarray((rng.rand(n, args.batch_size, 18) > 0.5)
                     .astype(np.float32))
    if args.scan > 1:
        sup, _ = make_scan_train_steps(model, tc, donate=False)
        step_args = (xs, ys, 1.0)
    else:
        sup, _ = make_train_steps(model, tc, donate=False)
        step_args = (xs[0], ys[0], 1.0)

    def run(s):
        s, m = sup(s, *step_args)
        return s, m['loss']
    return state, run


def build_train_step(args):
    args.scan = 1
    return build_train_scan(args)


def _eval_fixtures(args):
    from gltvae.config import ModelConfig, TrainConfig
    from gltvae.models.ccvae import CCVAE
    from gltvae.train.state import create_train_state, make_key

    cfg = ModelConfig(compute_dtype=args.dtype, input_s2d=args.s2d,
                      output_s2d=args.s2d)
    tc = TrainConfig(batch_size=args.batch_size)
    model = CCVAE(cfg)
    rng = np.random.RandomState(0)
    mu = rng.rand(18, 18).astype(np.float32)
    state = create_train_state(model, tc, make_key(0, 'rbg'), mu_init=mu)
    return model, tc, state, rng


def build_eval_resident(args):
    import jax
    import jax.numpy as jnp
    from gltvae.train.steps import (make_resident_eval_step,
                                    pack_resident_images)

    model, tc, state, rng = _eval_fixtures(args)
    n_images = args.eval_images
    images = rng.randint(0, 256, (n_images, 64, 64, 3)).astype(np.uint8)
    labels = (rng.rand(n_images, 18) > 0.5).astype(np.float32)
    x_dev = jax.device_put(pack_resident_images(images))
    y_dev = jax.device_put(labels)
    fn = make_resident_eval_step(model, tc, image_shape=images.shape[1:])
    nb = n_images // args.batch_size
    idxs = jnp.asarray(
        rng.permutation(n_images)[:nb * args.batch_size]
        .reshape(nb, args.batch_size).astype(np.int32))
    key = jax.random.key(0)
    params = state.params

    def run(k):
        accs, k = fn(params, x_dev, y_dev, idxs, k, 0.3)
        return k, accs
    return key, run


def build_eval_chunked(args):
    import jax
    import jax.numpy as jnp
    from gltvae.train.steps import make_scan_eval_step

    model, tc, state, rng = _eval_fixtures(args)
    nb = args.eval_images // args.batch_size
    xs = jnp.asarray(rng.randint(
        0, 256, (nb, args.batch_size, 64, 64, 3)), jnp.uint8)
    ys = jnp.asarray((rng.rand(nb, args.batch_size, 18) > 0.5)
                     .astype(np.float32))
    fn = make_scan_eval_step(model, tc)
    key = jax.random.key(0)
    params = state.params

    def run(k):
        k, sub = jax.random.split(k)
        accs = fn(params, xs, ys, jax.random.split(sub, nb), 0.3)
        return k, accs
    return key, run


BUILDERS = {'train-scan': build_train_scan,
            'train-step': build_train_step,
            'eval-resident': build_eval_resident,
            'eval-chunked': build_eval_chunked}


def fence(out):
    """Host-fetch a data-dependent scalar (axon's block_until_ready
    returns at enqueue; this actually waits for the device)."""
    import jax
    return float(jax.device_get(jax.numpy.ravel(out)[-1]))


def summarize(logdir, summary_path, top_k=40):
    """Parse the captured xplane into a per-op attribution JSON."""
    paths = sorted(glob.glob(
        os.path.join(logdir, 'plugins', 'profile', '*', '*.xplane.pb')))
    if not paths:
        print('no xplane.pb captured under', logdir)
        return None
    xspace = paths[-1:]
    try:
        from xprof.convert import raw_to_tool_data as r2t
    except Exception as e:
        print('xprof converter unavailable (%r) — raw trace kept at %s'
              % (e, xspace[0]))
        return None
    try:
        names = r2t.xspace_to_tool_names(xspace)
    except Exception:
        names = []
    out = {'xplane': xspace[0], 'tools_available': names}
    keep = ('category', 'hlo_op_name', 'tf_op_name', 'occurrences',
            'total_time', 'avg_time', 'total_self_time',
            'total_self_time_percent', 'cumulative_total_self_time_percent',
            'dma_stall_percent', 'model_flop_rate', 'measured_memory_bw',
            'hbm_bw', 'operational_intensity', 'bound_by')
    for tool in ('hlo_stats', 'framework_op_stats'):
        try:
            data, _ = r2t.xspace_to_tool_data(xspace, tool, {})
        except Exception as e:
            out[tool] = f'failed: {e!r}'
            continue
        if isinstance(data, bytes):
            data = data.decode('utf-8', 'replace')
        try:
            rows = json.loads(data)
        except Exception:
            out[tool] = 'unparseable (kept raw trace)'
            continue
        if isinstance(rows, dict) and 'cols' in rows and 'rows' in rows:
            # Google DataTable -> compact top-K records by self time
            ids = [c['id'] for c in rows['cols']]
            recs = [dict(zip(ids, [c.get('v') for c in r['c']]))
                    for r in rows['rows']]
            recs.sort(key=lambda r: -(r.get('total_self_time') or 0))
            out['total_self_time_us'] = round(sum(
                r.get('total_self_time') or 0 for r in recs), 1)
            out[tool] = [{k: r.get(k) for k in keep if k in r}
                         for r in recs[:top_k]]
            # roll up device time by op category
            cat = {}
            for r in recs:
                c = r.get('category') or '?'
                cat[c] = cat.get(c, 0) + (r.get('total_self_time') or 0)
            out['by_category_us'] = {
                k: round(v, 1)
                for k, v in sorted(cat.items(), key=lambda kv: -kv[1])}
        else:
            out[tool] = rows if not isinstance(rows, list) else rows[:top_k]
        break
    if summary_path:
        os.makedirs(os.path.dirname(summary_path) or '.', exist_ok=True)
        with open(summary_path, 'w') as f:
            json.dump(out, f, indent=1)
        print('summary ->', summary_path)
    return out


def main():
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument('--logdir', default='/tmp/gltvae-trace')
    p.add_argument('--mode', default='train-scan', choices=sorted(BUILDERS))
    p.add_argument('--steps', type=int, default=10,
                   help='dispatches inside the trace window')
    p.add_argument('--scan', type=int, default=8,
                   help='inner steps per dispatch (train-scan)')
    p.add_argument('--batch-size', type=int, default=256)
    p.add_argument('--eval-images', type=int, default=16384)
    p.add_argument('--dtype', default='bfloat16')
    p.add_argument('--s2d', default='on', choices=['on', 'off'])
    p.add_argument('--summary', default=None,
                   help='write per-op attribution JSON here')
    from gltvae.utils.platform import add_platform_arg, apply_platform
    add_platform_arg(p)
    args = p.parse_args()
    apply_platform(args.platform)
    args.s2d = args.s2d == 'on'

    from gltvae.utils.compile_cache import \
        enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    import jax
    carry, run = BUILDERS[args.mode](args)

    print('compiling (first time: 3-5 min on this host)...', flush=True)
    carry, out = run(carry)          # compile outside the trace
    fence(out)
    print('compiled; tracing...', flush=True)

    jax.profiler.start_trace(args.logdir)
    for _ in range(args.steps):
        carry, out = run(carry)
    fenced = fence(out)
    jax.profiler.stop_trace()
    print(f'trace written to {args.logdir} (mode={args.mode}, '
          f'steps={args.steps}, fence={fenced:.3f})')
    summarize(args.logdir, args.summary)


if __name__ == '__main__':
    main()
