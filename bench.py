"""Benchmark harness: ELBO train images/sec/chip on CelebA-64 (+ traversal
latency), printed as ONE JSON line.

Timing fences are HOST FETCHES of a terminal scalar, not
jax.block_until_ready: on some experimental backends (e.g. the axon TPU
tunnel) block_until_ready returns at enqueue, which silently inflates
throughput by >10x. A device_get of a value data-dependent on the last
step cannot return before the device finishes, on any backend.

Baseline (BASELINE.md): the reference trains at ~700 images/sec
(162,770 imgs / ~233 s epoch, sup=1.0 learnable, bs 256, hardware
unspecified) — vs_baseline is measured against that number.

The measured step is the FULL supervised train step (encoder, z/gate
sampling, classifier, k=100 MC marginal, conditional prior KL, decoder,
Laplace LL, backward, Adam update) at batch 256, data resident on device
as uint8 (the input pipeline is benched separately by tools/bench_data.py).
"""

import argparse
import json
import os
import time

import numpy as np


def bench_train_step(batch_size: int, steps: int, warmup: int,
                     compute_dtype: str, supervised: bool = True,
                     scan: int = 0, image_size: int = 64,
                     semi_sup_period: int = 0, prng: str = 'rbg',
                     remat: str = 'none', input_s2d: bool = False,
                     output_s2d: bool = False):
    import dataclasses

    import jax
    import jax.numpy as jnp
    from gltvae.config import ModelConfig, TrainConfig, celeba128
    from gltvae.models.ccvae import CCVAE
    from gltvae.train.state import create_train_state, make_key
    from gltvae.train.steps import (make_train_steps, make_scan_train_steps,
                                    make_mixed_scan_train_step)

    if image_size == 128:
        cfg, _ = celeba128()
        cfg = dataclasses.replace(cfg, compute_dtype=compute_dtype)
    else:
        cfg = ModelConfig(compute_dtype=compute_dtype)
    cfg = dataclasses.replace(cfg, input_s2d=input_s2d,
                              output_s2d=output_s2d)
    train_cfg = TrainConfig(batch_size=batch_size, prng_impl=prng,
                            remat=remat)
    model = CCVAE(cfg)
    rng = np.random.RandomState(0)
    yd = cfg.y_dim
    mu = rng.rand(yd, yd).astype(np.float32)
    np.fill_diagonal(mu, 1.0)
    state = create_train_state(model, train_cfg, make_key(0, prng),
                               mu_init=mu)

    x = jnp.asarray(rng.randint(0, 256,
                                (batch_size, image_size, image_size, 3)),
                    jnp.uint8)
    y = jnp.asarray((rng.rand(batch_size, yd) > 0.5).astype(np.float32))

    if scan > 1:
        # n_inner steps per dispatch (amortizes host overhead);
        # distinct per-slot batches so nothing is hoistable
        xs = jnp.asarray(rng.randint(
            0, 256, (scan, batch_size, image_size, image_size, 3)),
            jnp.uint8)
        ys = jnp.asarray((rng.rand(scan, batch_size, yd) > 0.5)
                         .astype(np.float32))
        if semi_sup_period > 1:
            # the reference's semi-sup interleave as one mixed chunk:
            # step i supervised iff i % period == 0 (e.g. period 5 for
            # sup=0.2) — the exact dispatch Trainer uses for the paper's
            # headline schedules
            mixed = make_mixed_scan_train_step(model, train_cfg)
            mask = jnp.asarray(
                np.arange(scan) % semi_sup_period == 0)
            step_fn = mixed

            def step(s):
                s, ms = step_fn(s, xs, ys, mask, 1.0)
                return s, ms['loss'][-1]
        else:
            sup_step, unsup_step = make_scan_train_steps(model, train_cfg)
            step_fn = sup_step if supervised else unsup_step

            def step(s):
                s, ms = step_fn(s, xs, ys, 1.0)
                return s, ms['loss'][-1]
        per_call = scan
    else:
        sup_step, unsup_step = make_train_steps(model, train_cfg)
        fn = sup_step if supervised else unsup_step

        def step(s):
            s, m = fn(s, x, y, 1.0)
            return s, m['loss']
        per_call = 1

    for _ in range(warmup):
        state, loss = step(state)
    float(jax.device_get(loss))  # completion fence (see module docstring)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(state)
    final_loss = float(jax.device_get(loss))  # fence: data-dependent fetch
    dt = time.perf_counter() - t0

    # compiled-program HBM footprint (estimate; used when the backend has
    # no runtime memory_stats — e.g. the axon tunnel) + roofline, both
    # read from ONE AOT lower+compile (it is a fresh executable build,
    # minutes at 128px — never pay it twice)
    if scan > 1:
        a_args = ((state, xs, ys, mask, 1.0) if semi_sup_period > 1
                  else (state, xs, ys, 1.0))
        hbm, roof = _compiled_analyses(step_fn, a_args, dt / (steps * scan))
    else:
        hbm, roof = _compiled_analyses(fn, (state, x, y, 1.0), dt / steps)
    return batch_size * steps * per_call / dt, final_loss, hbm, roof


def _compiled_analyses(jitted, args, secs_per_step):
    """(hbm_estimate_mb, roofline_dict) from ONE AOT compile of the step.

    HBM: memory_analysis temp + args + output MiB (an upper-bound style
    static estimate, not a runtime peak).

    Roofline: achieved TFLOP/s and HBM GB/s from XLA cost_analysis of the
    compiled program (static estimates) divided by the measured, fenced
    per-step time. XLA counts a lax.scan/while body ONCE (not x trip
    count), so the program totals ARE per-step figures for the scanned
    train program (out-of-loop ops contribute <1/scan extra). On a
    memory-bound model (this one: arithmetic intensity ~50 FLOP/byte vs
    the v5e ridge ~240) the GB/s figure is the speed-of-light yardstick,
    not MXU utilization."""
    try:
        compiled = jitted.lower(*args).compile()
    except Exception:
        return None, None

    hbm = None
    try:
        ma = compiled.memory_analysis()
        if ma is not None:
            total = (getattr(ma, 'temp_size_in_bytes', 0)
                     + getattr(ma, 'argument_size_in_bytes', 0)
                     + getattr(ma, 'output_size_in_bytes', 0))
            hbm = round(total / 2 ** 20, 1) if total else None
    except Exception:
        pass

    roof = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get('flops', 0.0)
        byts = ca.get('bytes accessed', 0.0)
        if flops and byts:
            roof = {
                'step_gflops': round(flops / 1e9, 2),
                'step_mbytes_accessed': round(byts / 2**20, 1),
                'achieved_tflops_per_sec':
                    round(flops / secs_per_step / 1e12, 1),
                'achieved_hbm_gbytes_per_sec':
                    round(byts / secs_per_step / 1e9, 0),
            }
    except Exception:
        pass
    return hbm, roof


def bench_eval(batch_size: int, iters: int = 20, scan: int = 64,
               prng: str = 'rbg', input_s2d: bool = False,
               output_s2d: bool = False):
    """Stochastic eval throughput via the scanned eval path — the same
    make_scan_eval_step Trainer.evaluate dispatches (reference baseline:
    ~400-450 img/s, BASELINE.md eval rows). Round 1 measured the
    per-dispatch path at ~9.5k img/s, tunnel-RPC bound; scanning batches
    amortizes the host round-trip. Fenced by a host fetch.

    Defaults from the round-3 scan-length sweep (BENCH_NOTES): 32→64
    batches/dispatch lifted the measured rate 1.94M→2.09M img/s (the
    remaining per-dispatch host cost halves); 128/256 add only ~1-4%
    more for 2-4x the HBM working set, so 64 is the knee."""
    import jax
    import jax.numpy as jnp
    from gltvae.config import ModelConfig, TrainConfig
    from gltvae.models.ccvae import CCVAE
    from gltvae.train.state import create_train_state, make_key
    from gltvae.train.steps import make_scan_eval_step

    cfg = ModelConfig(compute_dtype='bfloat16', input_s2d=input_s2d,
                      output_s2d=output_s2d)
    tc = TrainConfig(batch_size=batch_size, prng_impl=prng)
    model = CCVAE(cfg)
    rng = np.random.RandomState(0)
    mu = rng.rand(18, 18).astype(np.float32)
    state = create_train_state(model, tc, make_key(0, prng), mu_init=mu)
    ev = make_scan_eval_step(model, tc)
    # distinct per-slot batches so nothing is hoistable out of the scan
    xs = jnp.asarray(rng.randint(0, 256, (scan, batch_size, 64, 64, 3)),
                     jnp.uint8)
    ys = jnp.asarray((rng.rand(scan, batch_size, 18) > 0.5)
                     .astype(np.float32))
    key = make_key(1, prng)
    # key derivation happens OUTSIDE the timed loop: each eager
    # fold_in/split is its own device dispatch (~5 ms through the axon
    # tunnel), which would meter RPC latency, not the eval path
    all_keys = [jax.random.split(jax.random.fold_in(key, i), scan)
                for i in range(iters + 1)]
    accs = ev(state.params, xs, ys, all_keys[0], 0.3)
    # warmup mirrors the timed loop exactly so every executable (eval scan,
    # sum, accumulate-add) is compiled before t0 — a cold in-loop compile
    # once deflated this number >10x
    total = accs.sum() * 0.0
    total = total + ev(state.params, xs, ys, all_keys[iters], 0.3).sum()
    float(jax.device_get(total))  # compile + completion fence
    t0 = time.perf_counter()
    total = total * 0.0
    for i in range(iters):
        total = total + ev(state.params, xs, ys, all_keys[i], 0.3).sum()
    float(jax.device_get(total))  # fence: depends on every iteration
    dt = time.perf_counter() - t0
    # roofline for the eval program too (cost_analysis counts the scan
    # body once, i.e. per batch) — an earlier note eyeballed the eval
    # ceiling from the train step's byte mix and landed 2.4x low
    _, roof = _compiled_analyses(ev, (state.params, xs, ys, all_keys[0],
                                      0.3), dt / (iters * scan))
    return batch_size * scan * iters / dt, roof


def bench_eval_resident(batch_size: int = 256, n_images: int = 16384,
                        dispatches: int = 5, batches_per_dispatch: int = 384,
                        prng: str = 'rbg', input_s2d: bool = False,
                        output_s2d: bool = False):
    """Device-RESIDENT eval throughput: the split lives on device as
    packed int32 rows (shipped once, outside the timed loop) and each
    dispatch scans batches_per_dispatch batches by on-device row gather —
    the same make_resident_eval_step Trainer.evaluate/test take for
    splits that fit (VERDICT r3 item 4).

    Measured v5e hierarchy (BENCH_NOTES round 4): this path ~1.81M
    img/s; bench_eval's stacked-scan 2.15-2.25M; a no-gather no-host-arg
    resident-stack bound 2.19M. The gather costs ~18% of pure device
    rate and the r3 hypothesis that host arg serialization was the
    roofline residual is disproved (the bound barely moves) — but in
    REAL use the scan formulation pays a per-epoch host fetch + ~805 MB
    host->device re-ship per 64-batch chunk epoch that this bench's
    pre-resident args exclude, which the resident path eliminates
    entirely. Fenced by a host fetch data-dependent on every dispatch."""
    import jax
    import jax.numpy as jnp
    from gltvae.config import ModelConfig, TrainConfig
    from gltvae.models.ccvae import CCVAE
    from gltvae.train.state import create_train_state, make_key
    from gltvae.train.steps import (make_resident_eval_step,
                                    pack_resident_images)

    cfg = ModelConfig(compute_dtype='bfloat16', input_s2d=input_s2d,
                      output_s2d=output_s2d)
    tc = TrainConfig(batch_size=batch_size, prng_impl=prng)
    model = CCVAE(cfg)
    rng = np.random.RandomState(0)
    mu = rng.rand(18, 18).astype(np.float32)
    state = create_train_state(model, tc, make_key(0, prng), mu_init=mu)
    ev = make_resident_eval_step(model, tc, image_shape=(64, 64, 3))
    images = jnp.asarray(pack_resident_images(
        rng.randint(0, 256, (n_images, 64, 64, 3)).astype(np.uint8)))
    labels = jnp.asarray((rng.rand(n_images, 18) > 0.5).astype(np.float32))
    nb = batches_per_dispatch
    idxs = jnp.asarray(rng.randint(0, n_images, (nb, batch_size)), jnp.int32)
    key = make_key(1, prng)
    accs, key = ev(state.params, images, labels, idxs, key, 0.3)
    # warmup mirrors the timed loop (compiles the accumulate-add too)
    total = accs.sum() * 0.0
    accs, key = ev(state.params, images, labels, idxs, key, 0.3)
    total = total + accs.sum()
    float(jax.device_get(total))      # compile + completion fence
    t0 = time.perf_counter()
    total = total * 0.0
    for _ in range(dispatches):       # key chains the calls; total fences
        accs, key = ev(state.params, images, labels, idxs, key, 0.3)
        total = total + accs.sum()
    float(jax.device_get(total))
    dt = time.perf_counter() - t0
    _, roof = _compiled_analyses(
        ev, (state.params, images, labels, idxs, key, 0.3),
        dt / (dispatches * nb))
    return batch_size * nb * dispatches / dt, roof


def bench_trainer_eval(batch_size: int = 256, n_images: int = 16384,
                       epochs: int = 3, prng: str = 'rbg',
                       input_s2d: bool = False, output_s2d: bool = False):
    """(resident_img_per_sec, chunked_img_per_sec): REAL
    `Trainer.evaluate()` wall time, both formulations — the measurement
    that decides the resident-eval default (VERDICT r4 weak #1). Unlike
    bench_eval/bench_eval_resident (pure device dispatch rates on
    pre-staged args), this pays everything each path actually pays per
    eval epoch: the chunked path's host batch fetch + host->device
    re-ship of the whole split, the resident path's [n, B] int32 index
    ship — through the same Trainer entry point train.py uses
    (gated_ccvae.py:448-455 protocol). The chunked leg gets its BEST
    config (steps_per_dispatch=64 -> scan-eval, the rate bench_eval
    measures) so the resident-default decision isn't won by handicapping
    the alternative."""
    import jax
    from gltvae.config import ModelConfig, TrainConfig
    from gltvae.data.pipeline import ArrayDataset, BatchLoader
    from gltvae.train.loop import Trainer

    cfg = ModelConfig(compute_dtype='bfloat16', input_s2d=input_s2d,
                      output_s2d=output_s2d)
    tc = TrainConfig(batch_size=batch_size, prng_impl=prng)
    rng = np.random.RandomState(0)
    mu = rng.rand(18, 18).astype(np.float32)
    images = rng.randint(0, 256, (n_images, 64, 64, 3)).astype(np.uint8)
    labels = (rng.rand(n_images, 18) > 0.5).astype(np.float32)

    out = []
    for mode in ('auto', 'off'):
        t = Trainer(cfg, tc, mu_init=mu, resident_eval=mode,
                    steps_per_dispatch=64)
        loader = BatchLoader(ArrayDataset(images, labels), batch_size,
                             seed=0)
        t.evaluate(loader)            # compile + (resident) split ship
        t0 = time.perf_counter()
        for _ in range(epochs):
            t.evaluate(loader)        # returns a host float: self-fencing
        out.append(epochs * n_images / (time.perf_counter() - t0))
    return tuple(out)


def bench_e2e(batch_size: int = 256, n_train: int = 2048,
              prng: str = 'rbg', compute_dtype: str = 'bfloat16'):
    """(cold, cached, resident) img/sec: END-TO-END training rate
    through the REAL input stack — JPEG decode (the CelebAReader->
    BatchLoader stack train.py dispatches) -> host->device uint8 ship ->
    scanned supervised train step — measured per epoch, fenced by a host
    fetch. 'cold' decodes every image (epoch-1 / cache-off behavior);
    'cached' is epoch 2+ with the in-RAM uint8 cache (--cache-decoded);
    'resident' is the device-resident training path (Trainer default for
    fitting splits): split shipped once, epochs dispatch index arrays.
    Generates its own CelebA-format JPEG corpus (218x178, q90) so it runs
    anywhere. This is the headline's honest companion: the device-step
    number above it excludes the host pipeline by design (BASELINE's
    metric), this one includes it."""
    import sys
    import tempfile
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'tools'))
    import bench_data
    import jax
    import jax.numpy as jnp
    from gltvae.config import DataConfig, ModelConfig, TrainConfig
    from gltvae.data.celeba import CelebAReader
    from gltvae.models.ccvae import CCVAE
    from gltvae.train.state import create_train_state, make_key
    from gltvae.train.steps import make_scan_train_steps

    nv = max(batch_size, n_train // 8)
    with tempfile.TemporaryDirectory() as d:
        bench_data.make_corpus(d, n_train + 2 * nv)
        dcfg = DataConfig(data_dir=d, n_train=n_train, n_valid=nv,
                          n_test=nv, num_workers=os.cpu_count() or 1,
                          cache_decoded=True)
        reader = CelebAReader(dcfg, sup_frac=1.0, batch_size=batch_size)
        loader = reader.setup_data_loaders()['sup']
        nb = loader.epoch_batches

        cfg = ModelConfig(compute_dtype=compute_dtype)
        tc = TrainConfig(batch_size=batch_size, prng_impl=prng)
        model = CCVAE(cfg)
        rng = np.random.RandomState(0)
        mu = rng.rand(cfg.y_dim, cfg.y_dim).astype(np.float32)
        np.fill_diagonal(mu, 1.0)
        state = create_train_state(model, tc, make_key(0, prng),
                                   mu_init=mu)
        sup, _ = make_scan_train_steps(model, tc)

        # compile on synthetic arrays of the real shapes so epoch-1 timing
        # is decode+ship+step, not XLA compile (the decode cache stays
        # cold: nothing below touches the loader)
        wx = jnp.asarray(rng.randint(0, 256, (nb, batch_size, 64, 64, 3)),
                         jnp.uint8)
        wy = jnp.asarray((rng.rand(nb, batch_size, cfg.y_dim) > 0.5)
                         .astype(np.float32))
        state, ms = sup(state, wx, wy, 1.0)
        float(jax.device_get(ms['loss'][-1]))

        it = iter(loader)   # created inside the timed region's scope:
        # worker prefetch starts here, so epoch-1 decode is paid below

        def one_epoch(s):
            bx, by = zip(*(next(it) for _ in range(nb)))
            s, m = sup(s, jnp.asarray(np.stack(bx)),
                       jnp.asarray(np.stack(by)), 1.0)
            return s, m

        t0 = time.perf_counter()
        state, ms = one_epoch(state)        # epoch 1: decodes every JPEG
        float(jax.device_get(ms['loss'][-1]))
        t1 = time.perf_counter()
        warm_epochs = 3
        for _ in range(warm_epochs):        # epoch 2+: in-RAM uint8 cache
            state, ms = one_epoch(state)
        float(jax.device_get(ms['loss'][-1]))
        t2 = time.perf_counter()

        # DEVICE-RESIDENT training (the Trainer's default for fitting
        # splits): the split ships ONCE, each epoch dispatches only a
        # [nb, B] int32 index array. The cached row above is ship-bound
        # (~44 MB/s effective on this host's tunnel; multi-GB/epoch on
        # any host) — this is the path that removes the ship entirely.
        from gltvae.train.steps import (make_resident_scan_train_steps,
                                        pack_resident_images)
        ds = loader.dataset
        x_all, y_all = ds.fetch(np.arange(len(ds)))   # warm: pure gather
        images = jax.device_put(
            pack_resident_images(np.ascontiguousarray(x_all)))
        labels = jax.device_put(np.asarray(y_all, np.float32))
        res_sup, _ = make_resident_scan_train_steps(
            model, tc, image_shape=x_all.shape[1:])

        def one_epoch_resident(s):
            idxs = np.stack([loader._next_batch_idxs()
                             for _ in range(nb)]).astype(np.int32)
            return res_sup(s, images, labels, jnp.asarray(idxs), 1.0)

        state, ms = one_epoch_resident(state)         # compile
        float(jax.device_get(ms['loss'][-1]))
        res_epochs = 3
        t3 = time.perf_counter()
        for _ in range(res_epochs):
            state, ms = one_epoch_resident(state)
        float(jax.device_get(ms['loss'][-1]))
        t4 = time.perf_counter()
        if hasattr(it, 'close'):
            it.close()
    return (nb * batch_size / (t1 - t0),
            warm_epochs * nb * batch_size / (t2 - t1),
            res_epochs * nb * batch_size / (t4 - t3))


def bench_traversal(n_steps: int = 8, iters: int = 20):
    import jax
    import jax.numpy as jnp
    from gltvae.config import ModelConfig
    from gltvae.models.ccvae import CCVAE
    from gltvae.eval.traversal import make_traversal_fn

    model = CCVAE(ModelConfig())
    mu = np.eye(18, dtype=np.float32)
    params = model.init(jax.random.key(0), mu_init=mu)
    fn = make_traversal_fn(model, n_steps=n_steps)  # 45 dims x 8 = 360 imgs
    checksum = jax.jit(jnp.sum)
    z = jnp.zeros((45,), jnp.float32)
    out = fn(params, z)
    float(jax.device_get(checksum(out)))  # compile + completion fence
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, z)
    # device work is stream-ordered: fencing the last grid fences all
    float(jax.device_get(checksum(out)))
    return (time.perf_counter() - t0) / iters * 1000.0  # ms per grid


def _watchdog_backend_init(args):
    """Initialize the jax backend under a deadline.

    A dead axon tunnel blocks the first device call forever (no error,
    no timeout at the jax layer). Run the init in a daemon thread; if the
    deadline passes, print one self-describing JSON error line in the
    bench's output schema and exit nonzero — the run record then says
    WHY there is no number instead of the process being killed silently.
    """
    import threading
    done = threading.Event()
    box = {}

    def _init():
        try:
            import jax
            box['backend'] = jax.default_backend()
        except Exception as e:               # init failed fast: also legible
            box['error'] = f'{type(e).__name__}: {e}'
        done.set()

    t = threading.Thread(target=_init, daemon=True)
    t.start()
    if not done.wait(args.init_timeout) or 'error' in box:
        err = box.get('error',
                      f'jax backend init still blocked after '
                      f'{args.init_timeout:.0f}s (axon tunnel down?)')
        # same label shape as the success row (incl. the kind segment) so
        # tooling that keys run records by metric string files the error
        # under the series it belongs to
        kind = ('semi-sup 1/%d mix' % args.semi_sup_period
                if args.semi_sup_period > 1 else 'sup step')
        print(json.dumps({
            'metric': 'ELBO train images/sec/chip (CelebA-%d, %s, bs %d, %s)'
                      % (args.image_size, kind, args.batch_size, args.dtype),
            'value': None, 'unit': 'images/sec', 'vs_baseline': None,
            'error': err,
        }))
        import os
        os._exit(1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--batch-size', type=int, default=256)
    p.add_argument('--steps', type=int, default=50)
    p.add_argument('--warmup', type=int, default=5)
    p.add_argument('--dtype', default='bfloat16',
                   choices=['float32', 'bfloat16'])
    p.add_argument('--scan', type=int, default=32,
                   help='inner steps per dispatch via lax.scan '
                        '(1 = plain per-step dispatch)')
    p.add_argument('--image-size', type=int, default=64, choices=[64, 128])
    p.add_argument('--semi-sup-period', type=int, default=0, metavar='P',
                   help='bench the MIXED semi-sup scan chunk instead of '
                        'the uniform sup scan: 1 supervised step per P '
                        '(e.g. 5 ~= the sup=0.2 schedule); requires '
                        '--scan > 1')
    p.add_argument('--remat', default='none',
                   choices=['none', 'full', 'dots'],
                   help='rematerialize the loss forward in the backward '
                        'pass (jax.checkpoint): the step is HBM-bound, '
                        'so trading activation traffic for recompute '
                        'FLOPs can beat storing (TrainConfig.remat)')
    p.add_argument('--prng', default='rbg', choices=['threefry', 'rbg'],
                   help='PRNG implementation for the benched step. rbg '
                        '(XLA RngBitGenerator, the TPU-fast partitionable '
                        'generator; train.py --prng rbg) is ~6%% faster '
                        'than threefry on v5e because threefry\'s bitwise '
                        'chains compete for issue slots on this '
                        'bandwidth-bound step. threefry benches the '
                        'bit-reproducible parity default.')
    p.add_argument('--input-s2d', default='on', choices=['on', 'off'],
                   help='space-to-depth input conv (ModelConfig.input_s2d):'
                        ' an EXACT regrouping of the encoder\'s first conv'
                        ' (pad1 + 4x4/s2 -> s2d(2) + 2x2/s1) that cuts the'
                        ' padded HBM traffic of the 3-channel input '
                        '(tests/test_s2d.py pins the equivalence). '
                        'Measured +6%% train / +11%% chunked eval on v5e '
                        '(BENCH_NOTES round 4); default on like --prng rbg '
                        '(the production config — train.py keeps it off '
                        'for reference-identical float summation order)')
    p.add_argument('--output-s2d', default='on', choices=['on', 'off'],
                   help='space-to-depth output conv (ModelConfig.output_s2d)'
                        ": the decoder's final conv-transpose emits the "
                        'image in s2d form and the recon loss compares in '
                        's2d space — same pixels, half the padded traffic '
                        'of the 3-channel output write+read '
                        '(tests/test_s2d.py pins the equivalence). '
                        'Measured +3%% train on v5e (BENCH_NOTES round 4); '
                        'default on like --input-s2d (production config)')
    p.add_argument('--skip-traversal', action='store_true')
    p.add_argument('--skip-e2e', action='store_true',
                   help='skip the end-to-end (JPEG decode included) rows')
    p.add_argument('--e2e-train-images', type=int, default=2048,
                   help='train-corpus size for the e2e rows (whole epochs '
                        'are timed; must be a multiple of --batch-size)')
    p.add_argument('--no-compilation-cache', action='store_true',
                   help='disable the persistent XLA executable cache '
                        '(cache only cuts compile wall time; the timed '
                        'loops are steady-state either way)')
    p.add_argument('--init-timeout', type=float, default=600.0,
                   help='seconds to wait for jax backend init before '
                        'emitting an explicit error JSON line (the axon '
                        'TPU tunnel hangs indefinitely at init when it '
                        'is down; an eternal hang is illegible to '
                        'whoever runs the bench)')
    from gltvae.utils.platform import add_platform_arg, apply_platform
    add_platform_arg(p)
    args = p.parse_args()
    apply_platform(args.platform)

    _watchdog_backend_init(args)

    import jax
    if not args.no_compilation_cache:
        from gltvae.utils.compile_cache import (
            enable_persistent_compilation_cache)
        enable_persistent_compilation_cache()
    backend = jax.default_backend()

    def peak_mb():
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            v = stats.get('peak_bytes_in_use', 0)
            # some backends (e.g. the axon tunnel) report no stats
            return round(v / 2**20, 1) if v else None
        except Exception:
            return None

    if args.semi_sup_period > 1 and args.scan <= 1:
        raise SystemExit('--semi-sup-period benches the MIXED scan chunk '
                         'and requires --scan > 1 (with scan<=1 the plain '
                         'sup per-step path would run but be labeled '
                         'semi-sup)')
    s2d = args.input_s2d == 'on'
    os2d = args.output_s2d == 'on'
    imgs_per_sec, loss, hbm_est, roofline = bench_train_step(
        args.batch_size, args.steps, args.warmup, args.dtype,
        scan=args.scan, image_size=args.image_size,
        semi_sup_period=args.semi_sup_period, prng=args.prng,
        remat=args.remat, input_s2d=s2d, output_s2d=os2d)
    peak_hbm = peak_mb()
    traversal_ms = (None if args.skip_traversal else bench_traversal())
    # the eval benches build the hardcoded 64px model — at --image-size
    # 128 their rows would silently describe a different model than the
    # headline train row, so they are gated like the e2e rows
    skip_eval = args.skip_traversal or args.image_size != 64
    eval_ips, eval_roof = (
        (None, None) if skip_eval
        else bench_eval(args.batch_size, prng=args.prng, input_s2d=s2d,
                        output_s2d=os2d))
    eval_res_ips, eval_res_roof = (
        (None, None) if skip_eval
        else bench_eval_resident(args.batch_size, prng=args.prng,
                                 input_s2d=s2d, output_s2d=os2d))
    tr_eval_res, tr_eval_chk = (
        (None, None) if skip_eval
        else bench_trainer_eval(args.batch_size, prng=args.prng,
                                input_s2d=s2d, output_s2d=os2d))
    e2e_cold = e2e_cached = e2e_resident = None
    if not args.skip_e2e and args.image_size == 64:
        try:
            e2e_cold, e2e_cached, e2e_resident = bench_e2e(
                args.batch_size, n_train=args.e2e_train_images,
                prng=args.prng, compute_dtype=args.dtype)
        except Exception as e:   # e2e needs PIL+cv2 and scratch disk;
            e2e_cold = e2e_cached = e2e_resident = None  # absence must
            print(f'# e2e bench skipped: {type(e).__name__}: {e}',
                  flush=True)                            # not kill bench

    baseline = 700.0  # reference images/sec (BASELINE.md, derived)
    kind = ('semi-sup 1/%d mix' % args.semi_sup_period
            if args.semi_sup_period > 1 else 'sup step')
    result = {
        'metric': 'ELBO train images/sec/chip (CelebA-%d, %s, bs %d, %s)'
                  % (args.image_size, kind, args.batch_size, args.dtype),
        'value': round(imgs_per_sec, 1),
        'unit': 'images/sec',
        'vs_baseline': round(imgs_per_sec / baseline, 2),
        'backend': backend,
        'prng': args.prng,
        'remat': args.remat,
        'input_s2d': args.input_s2d,
        'output_s2d': args.output_s2d,
        'final_loss': round(loss, 2),
        'traversal_ms_per_grid': (None if traversal_ms is None
                                  else round(traversal_ms, 2)),
        'peak_hbm_mb': peak_hbm if peak_hbm is not None else hbm_est,
        'peak_hbm_source': ('memory_stats' if peak_hbm is not None
                            else 'compiled_memory_analysis_estimate'),
        # eval_images_per_sec = the stacked-scan formulation (the r01-r03
        # metric, kept comparable across rounds; args pre-resident).
        # _resident = the path Trainer.evaluate/test actually take for
        # fitting splits: ~18% lower pure-device rate (the per-batch row
        # gather), but it eliminates the per-epoch host fetch + 805 MB/
        # chunk host->device re-ship the scan formulation pays in real
        # use — strictly faster end-to-end (BENCH_NOTES round 4).
        'eval_images_per_sec': (None if eval_ips is None
                                else round(eval_ips, 1)),
        'eval_images_per_sec_resident': (None if eval_res_ips is None
                                         else round(eval_res_ips, 1)),
        # trainer_eval = REAL Trainer.evaluate() wall epochs (16,384-row
        # split), each path paying what it actually pays: chunked's host
        # fetch + whole-split re-ship vs resident's index-only ship —
        # the measurement behind the resident default.
        'trainer_eval_images_per_sec_resident': (
            None if tr_eval_res is None else round(tr_eval_res, 1)),
        'trainer_eval_images_per_sec_chunked': (
            None if tr_eval_chk is None else round(tr_eval_chk, 1)),
        # e2e = JPEG decode -> host->device ship -> train step through
        # the real loader stack (whole timed epochs). cold decodes every
        # image; cached is epoch 2+ with the in-RAM uint8 cache;
        # _resident is the Trainer's default for fitting splits — the
        # split shipped once, epochs dispatch only [nb, B] int32 indices
        # (no per-step image ship).
        'e2e_images_per_sec': (None if e2e_cold is None
                               else round(e2e_cold, 1)),
        'e2e_images_per_sec_cached': (None if e2e_cached is None
                                      else round(e2e_cached, 1)),
        'e2e_images_per_sec_resident': (None if e2e_resident is None
                                        else round(e2e_resident, 1)),
        'roofline': roofline,
        'eval_roofline': eval_roof,
        'eval_roofline_resident': eval_res_roof,
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()
