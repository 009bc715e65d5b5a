"""CLI experiment driver.

The TPU-era counterpart of /root/reference/gated_ccvae.py:458-546 +
configs.py: per-supervision runs (default sweep {1.0, 0.5, 0.2} exactly
like the reference __main__), building data loaders, gating init, Trainer,
then train and/or test. Adds: device mesh selection, synthetic-data mode,
Orbax checkpointing, structured metrics.

Examples:
  python train.py --epochs 75 --batch-size 256 --gate-type learnable \
      --data-dir /data/celeba
  python train.py --synthetic --epochs 2 --sup 0.5        # smoke run
  python train.py --mesh                                  # DP over all chips
"""

import argparse
import json
import logging
import os
import sys

import numpy as np

logging.basicConfig(level=logging.INFO,
                    format='%(asctime)s %(levelname)s %(name)s %(message)s')
logger = logging.getLogger('gltvae.train')


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('-n', '--epochs', type=int, default=75)
    p.add_argument('--z-dim', type=int, default=45)
    p.add_argument('-lr', '--lr', type=float, default=1e-4)
    p.add_argument('-bs', '--batch-size', type=int, default=256)
    p.add_argument('--data-dir', default='./data')
    p.add_argument('--l1-reg', type=float, default=0.2)
    # reference configs.py:22-23 had broken choices lists; fixed here
    p.add_argument('--gate-type', default='learnable',
                   choices=['learnable', 'fixed'])
    p.add_argument('--gate-subtype', default='inferred',
                   choices=['one-one', 'inferred'])
    p.add_argument('--sup', type=float, nargs='*', default=[1.0, 0.5, 0.2],
                   help='supervision fractions to sweep (reference '
                        'gated_ccvae.py:544)')
    p.add_argument('--do-train', action='store_true', default=False)
    p.add_argument('--do-test', action='store_true', default=True)
    p.add_argument('--no-test', dest='do_test', action='store_false')
    p.add_argument('--image-size', type=int, default=64,
                   choices=[64, 128])
    p.add_argument('--synthetic', action='store_true',
                   help='use the synthetic fixture instead of CelebA')
    p.add_argument('--synthetic-n', type=int, default=512,
                   help='synthetic train-set size')
    p.add_argument('--synthetic-signal', action='store_true',
                   help='image-correlated synthetic labels (learnable)')
    p.add_argument('--mesh', action='store_true',
                   help='data-parallel over all visible devices')
    p.add_argument('--dist-coordinator', default=None,
                   help='multi-host (DCN) coordinator address host:port; '
                        'requires --dist-num-processes/--dist-process-id '
                        '(jax.distributed over the reference\'s empty '
                        'distribution slot, SURVEY.md §2)')
    p.add_argument('--dist-num-processes', type=int, default=None)
    p.add_argument('--dist-process-id', type=int, default=None)
    p.add_argument('--compute-dtype', default='float32',
                   choices=['float32', 'bfloat16'])
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--prng', default='threefry',
                   choices=['threefry', 'rbg'],
                   help='PRNG implementation: threefry (default; '
                        'bit-reproducible across backends) or rbg (XLA '
                        'RngBitGenerator — ~6%% faster train step on '
                        'TPU, same accuracy)')
    p.add_argument('--remat', default='none',
                   choices=['none', 'full', 'dots'],
                   help='rematerialize the loss forward in the backward '
                        'pass (jax.checkpoint; the HBM-bound train step '
                        'can trade activation traffic for spare MXU '
                        'FLOPs — bench both on your chip). Same math; '
                        'float-association-level differences only')
    p.add_argument('--debug-nans', action='store_true',
                   help='enable jax debug_nans (replaces the reference '
                        'NaN-gate sys.exit guard with precise tracing)')
    p.add_argument('--augment-pad', type=int, default=0, metavar='P',
                   help='train-time augmentation (framework extension): '
                        'host decodes train images to S+2P; the device '
                        'does a fused random-crop+hflip+normalize back '
                        'to S (ops/pallas fused_augment). 0 = off '
                        '(reference semantics)')
    p.add_argument('--posterior-locs', default='relu',
                   choices=['relu', 'linear'],
                   help="posterior-mean head: 'relu' = the reference's "
                        'nonnegative means (networks.py:17, parity '
                        "default); 'linear' drops the ReLU — removes the "
                        'sup=1.0 one-one seed-fragility basin that the '
                        'nonnegativity constraint causes (measured, '
                        'docs/HEAD2HEAD.md)')
    p.add_argument('--input-s2d', default='off', choices=['on', 'off'],
                   help='space-to-depth input conv: an EXACT regrouping '
                        "of the encoder's first conv (pad1 + 4x4/s2 -> "
                        's2d(2) + 2x2/s1) that cuts the padded HBM '
                        'traffic of the 3-channel input on TPU. Same '
                        'params, same math, same checkpoints '
                        '(tests/test_s2d.py); off = reference-identical '
                        'float summation order')
    p.add_argument('--output-s2d', default='off', choices=['on', 'off'],
                   help="space-to-depth output conv: the decoder's final "
                        'conv-transpose emits the image in s2d form and '
                        'recon losses compare in s2d space — same pixels, '
                        'half the padded HBM traffic of the 3-channel '
                        'output write+read. Same params, same math, same '
                        'checkpoints (tests/test_s2d.py)')
    p.add_argument('--deterministic-eval', action='store_true',
                   help='mean-z / expected-gate eval instead of the '
                        'reference stochastic eval')
    p.add_argument('--init-from-h5', default=None, metavar='DIR',
                   help='warm-start from a reference-format .h5 checkpoint '
                        'directory (utils/h5_import); fixed gate modes take '
                        'mu from the computed gating init when the dir has '
                        'no learned_gating_matrix npy')
    p.add_argument('--resume', action='store_true',
                   help='resume from the latest Orbax checkpoint if one '
                        'exists (full state: params, Adam moments, step, '
                        'RNG, temperature schedule)')
    p.add_argument('--parity', action='store_true',
                   help='reference-exact loader quirks (shuffle indices '
                        'once at init instead of every epoch, '
                        'utils_data.py:39-40). For byte-identical pixels '
                        'add --decode-backend pil: PIL\'s resize is '
                        'antialiased, cv2 INTER_LINEAR is not')
    p.add_argument('--steps-per-dispatch', type=int, default=1,
                   help='lax.scan N steps per device dispatch; uniform '
                        'schedules scan same-kind chunks, the semi-sup '
                        'interleave (sup 0.2/0.5) scans mixed chunks '
                        'with a static per-step sup mask — semantics '
                        'identical to per-step dispatch either way')
    p.add_argument('--resident-eval', default='auto',
                   choices=['auto', 'off'],
                   help="device-resident eval: 'auto' ships a fitting "
                        "val/test split to the device once and scans each "
                        "eval epoch in ONE dispatch by on-device row "
                        "gather (bit-identical results to the chunked "
                        "path); 'off' always streams batches from host")
    p.add_argument('--resident-train', default='auto',
                   choices=['auto', 'off'],
                   help="device-resident training: 'auto' ships a fitting "
                        "train split (CelebA-64 uint8 is ~2 GB) to the "
                        "device ONCE, after which every dispatch sends "
                        "only a [n, B] int32 index array — no per-step "
                        "image ship (bit-identical params to the host-"
                        "shipped path); 'off' always streams batches. "
                        "Auto-disabled under a mesh, with --augment-pad, "
                        "or when the split exceeds the HBM budget")
    p.add_argument('--num-workers', type=int, default=8)
    p.add_argument('--decode-backend', default='auto',
                   choices=['auto', 'cv2', 'pil', 'native', 'grain'],
                   help="host decode path: 'native' = the C++ libjpeg "
                        "pool (make -C native), 'grain' = Google Grain; "
                        "'auto' = cv2 with PIL fallback")
    p.add_argument('--cache-decoded', action='store_true',
                   help='keep every decoded uint8 image in host RAM after '
                        'its first decode (CelebA-64 ~1.9 GB): epoch 1 '
                        'pays JPEG decode, later epochs are memcpy-fast')
    p.add_argument('--cache-dir', default=None, metavar='DIR',
                   help='disk-PERSISTENT decoded cache: decoded uint8 '
                        'rows stream into np.memmap files under DIR '
                        '(keyed by split image list + decode size); '
                        'later RUNS serve from the page cache with zero '
                        'JPEG work — the cross-process counterpart of '
                        '--cache-decoded')
    p.add_argument('--n-train', type=int, default=None,
                   help='train-split size (default: official 162770, '
                        'utils_data.py:87-91); set for dataset subsets')
    p.add_argument('--n-valid', type=int, default=None)
    p.add_argument('--n-test', type=int, default=None)
    p.add_argument('--split-file', default=None, metavar='CSV',
                   help='split by the official partition file (e.g. '
                        'list_eval_partition.csv, relative to --data-dir; '
                        '0=train 1=valid 2=test) instead of prefix sizes. '
                        'The reference ships this file but ignores it '
                        '(utils_data.py:87-91)')
    p.add_argument('--output-dir', default='./models')
    p.add_argument('--tensorboard', default=None, metavar='DIR',
                   help='also write TensorBoard scalar events under '
                        'DIR/<run_name> (CSV metrics are always written)')
    from gltvae.utils.platform import add_platform_arg
    add_platform_arg(p)
    p.add_argument('--compilation-cache', default='auto', metavar='DIR',
                   help="persistent XLA executable cache dir ('auto' = "
                        "~/.cache/gltvae/xla; 'off' disables); first "
                        "compile of the train step is minutes, cached "
                        "loads are seconds")
    p.add_argument('--no-compilation-cache', dest='compilation_cache',
                   action='store_const', const='off')
    return p.parse_args(argv)


def build_configs(args, sup):
    import dataclasses
    from gltvae.config import ModelConfig, TrainConfig, DataConfig, celeba128
    if args.image_size == 128:
        model_cfg, _ = celeba128(gate_type=args.gate_type, sup=sup,
                                 gate_subtype=args.gate_subtype)
        model_cfg = dataclasses.replace(
            model_cfg, compute_dtype=args.compute_dtype,
            posterior_locs=args.posterior_locs,
            input_s2d=args.input_s2d == 'on',
            output_s2d=args.output_s2d == 'on')
    else:
        model_cfg = ModelConfig(z_dim=args.z_dim,
                                gate_type=args.gate_type,
                                gate_subtype=args.gate_subtype,
                                compute_dtype=args.compute_dtype,
                                posterior_locs=args.posterior_locs,
                                input_s2d=args.input_s2d == 'on',
                                output_s2d=args.output_s2d == 'on')
    train_cfg = TrainConfig(n_epochs=args.epochs, batch_size=args.batch_size,
                            lr=args.lr, perc_supervision=sup,
                            gating_reg=args.l1_reg, seed=args.seed,
                            prng_impl=args.prng,
                            deterministic_eval=args.deterministic_eval,
                            augment_pad=args.augment_pad,
                            remat=args.remat)
    split_overrides = {k: v for k, v in
                       (('n_train', args.n_train), ('n_valid', args.n_valid),
                        ('n_test', args.n_test)) if v is not None}
    data_cfg = DataConfig(data_dir=args.data_dir,
                          image_size=args.image_size,
                          use_easy_labels=(args.image_size == 64),
                          center_crop=(args.image_size == 128),
                          num_workers=args.num_workers,
                          decode_backend=args.decode_backend,
                          augment_pad=args.augment_pad,
                          cache_decoded=args.cache_decoded,
                          cache_dir=args.cache_dir,
                          split_file=args.split_file,
                          **split_overrides)
    return model_cfg, train_cfg, data_cfg


def make_loaders(args, data_cfg, train_cfg, y_dim):
    from gltvae.data.pipeline import BatchLoader
    # Multi-host: host-shard the input — each process decodes only 1/N
    # of every global batch, paired with Trainer(local_batches=True).
    # BatchLoader slices a seed-coordinated global index stream (batches
    # identical to the single-host run); the grain backend slices the
    # corpus per host via grain.ShardOptions (celeba._make_loader) —
    # valid DP but not mesh-shape-invariant batch composition.
    import jax
    shard = ((jax.process_index(), jax.process_count())
             if jax.process_count() > 1 else None)
    if args.synthetic:
        from gltvae.data.synthetic import synthetic_splits
        from gltvae.ops.gating import gating_matrix_from_labels
        splits = synthetic_splits(
            n_train=args.synthetic_n, n_valid=max(64, args.synthetic_n // 8),
            n_test=max(64, args.synthetic_n // 8),
            sup_frac=train_cfg.perc_supervision,
            image_size=data_cfg.image_size, y_dim=y_dim, seed=args.seed,
            learnable_signal=args.synthetic_signal,
            train_pad=data_cfg.augment_pad)
        loaders = {k: BatchLoader(v, train_cfg.batch_size, seed=args.seed,
                                  reshuffle_each_epoch=not args.parity,
                                  shard=shard)
                   for k, v in splits.items()}
        sup_lbl = splits['sup'].labels if 'sup' in splits else None
        mu = gating_matrix_from_labels(sup_lbl, splits['valid'].labels,
                                       y_dim, train_cfg.perc_supervision)
        return loaders, mu, shard is not None
    from gltvae.data.celeba import CelebAReader
    reader = CelebAReader(data_cfg, train_cfg.perc_supervision,
                          train_cfg.batch_size, seed=args.seed,
                          reshuffle_each_epoch=not args.parity,
                          shard=shard)
    return reader.setup_data_loaders(), reader.init_gating_prob, \
        shard is not None


def run(args, sup: float):
    import dataclasses
    logger.info('----- supervision %.1f -----', sup)
    model_cfg, train_cfg, data_cfg = build_configs(args, sup)

    if args.gate_type == 'learnable':
        run_name = f'params_{sup}_{args.gate_type}'
    else:
        run_name = f'params_{sup}_{args.gate_type}_{args.gate_subtype}'
    param_dir = os.path.join(args.output_dir, run_name)

    # The model_config.json a training run records is the authoritative
    # architecture of the stored checkpoint. Training runs (re)write it;
    # a test-only rerun ADOPTS it instead of trusting possibly-defaulted
    # CLI flags (which would both clobber the record and build a
    # mismatched restore template).
    from gltvae.config import save_model_config, load_model_config
    recorded = load_model_config(param_dir)
    if not args.do_train and recorded is not None and recorded != model_cfg:
        logger.info('test-only rerun: using the recorded architecture '
                    'from %s/model_config.json (CLI flags differ)',
                    param_dir)
        model_cfg = recorded
        data_cfg = dataclasses.replace(
            data_cfg, image_size=recorded.image_size,
            use_easy_labels=(recorded.y_dim == 18),
            center_crop=(recorded.image_size == 128))
    logger.info('config: %s', json.dumps({
        'model': model_cfg.__dict__, 'train': train_cfg.__dict__}, default=str))

    loaders, mu_init, local_batches = make_loaders(args, data_cfg, train_cfg,
                                                   model_cfg.y_dim)

    mesh = None
    if args.mesh:
        from gltvae.parallel.mesh import create_mesh
        mesh = create_mesh()
        logger.info('mesh: %d devices', mesh.devices.size)

    os.makedirs(param_dir, exist_ok=True)
    if args.do_train or recorded is None:
        save_model_config(model_cfg, param_dir)

    from gltvae.train.loop import Trainer
    trainer = Trainer(model_cfg, train_cfg, mu_init=mu_init, mesh=mesh,
                      checkpoint_dir=os.path.join(param_dir, 'orbax'),
                      metrics_path=os.path.join(param_dir, 'metrics.csv'),
                      tensorboard_dir=(os.path.join(args.tensorboard,
                                                    run_name)
                                       if args.tensorboard else None),
                      steps_per_dispatch=args.steps_per_dispatch,
                      local_batches=local_batches,
                      resident_eval=args.resident_eval,
                      resident_train=args.resident_train)

    if args.init_from_h5:
        from gltvae.utils.h5_import import load_reference_checkpoint
        # fixed-mode h5 dirs carry no learned_gating_matrix npy; the μ
        # fallback must match the gate scheme (one-one = identity,
        # ccvae.py:108-109 — NOT the inferred co-occurrence matrix)
        if args.gate_type == 'fixed' and args.gate_subtype == 'one-one':
            from gltvae.ops.gating import identity_gating_matrix
            fallback_mu = identity_gating_matrix(model_cfg.z_classify,
                                                 model_cfg.y_dim)
        else:
            fallback_mu = mu_init
        trainer.load_params(load_reference_checkpoint(
            args.init_from_h5, mu=fallback_mu))
        logger.info('warm-started from %s', args.init_from_h5)

    result = None
    if args.do_train:
        result = trainer.train(loaders, param_dir=param_dir,
                               resume=args.resume)
        logger.info('train done: best val acc %.3f, %.0f img/s',
                    result['best_val_accuracy'], result['images_per_sec'])

    if args.do_test:
        # Test the BEST checkpoint (reference: load_model(param_dir,'best'),
        # gated_ccvae.py:531-533) — not the last training state.
        if args.init_from_h5 and not args.do_train:
            # test-only warm start: the user asked for exactly these h5
            # weights — do NOT let a stale Orbax checkpoint in the default
            # param_dir silently replace them
            logger.info('testing the --init-from-h5 weights directly')
        else:
            try:
                trainer.restore()
            except FileNotFoundError:
                logger.warning('no checkpoint to restore; testing fresh init')
        acc = trainer.test(loaders['test'])
        logger.info('Test Accuracy (best model): %.3f', acc)
        _write_result_json(param_dir, result, acc)
        return acc
    _write_result_json(param_dir, result, None)
    return None


def _write_result_json(param_dir, result, test_accuracy):
    """Machine-readable run record (epoch history + test accuracy) next
    to the checkpoints — consumed by tools/parity_head2head.py and handy
    for any offline analysis; the reference leaves this only in its
    free-text ./logs."""
    path = os.path.join(param_dir, 'result.json')
    if result is None and test_accuracy is None:
        return                               # nothing ran; keep any record
    payload = {'test_accuracy': test_accuracy}
    if result is not None:
        payload.update(result)
    elif os.path.exists(path):
        # test-only rerun: keep the original training run's history /
        # throughput record, only refresh the test accuracy
        try:
            with open(path) as f:
                prior = json.load(f)
        except (OSError, json.JSONDecodeError):
            prior = {}
        prior.update(payload)
        payload = prior
    with open(path, 'w') as f:
        json.dump(payload, f, indent=2, default=float)


def main(argv=None):
    args = parse_args(argv)
    from gltvae.utils.platform import apply_platform
    apply_platform(args.platform)   # before ANY backend touch
                                    # (incl. jax.distributed below)
    dist_flags = (args.dist_coordinator, args.dist_num_processes,
                  args.dist_process_id)
    if any(f is not None for f in dist_flags) and \
            (args.dist_coordinator is None or
             args.dist_num_processes is None or
             args.dist_process_id is None):
        raise SystemExit(
            'multi-host runs need all three of --dist-coordinator, '
            '--dist-num-processes, --dist-process-id '
            f'(got {dist_flags}); a partial set would silently run '
            'single-host or crash inside jax.distributed')
    if args.dist_num_processes and args.dist_num_processes > 1:
        # must run before any other jax backend touch
        from gltvae.parallel.mesh import initialize_multihost
        initialize_multihost(coordinator_address=args.dist_coordinator,
                            num_processes=args.dist_num_processes,
                            process_id=args.dist_process_id)
        args.mesh = True  # a multi-host run is by definition a mesh run
    if args.debug_nans:
        import jax
        jax.config.update('jax_debug_nans', True)
    if args.compilation_cache != 'off':
        from gltvae.utils.compile_cache import (
            enable_persistent_compilation_cache)
        d = enable_persistent_compilation_cache(
            None if args.compilation_cache == 'auto'
            else args.compilation_cache)
        logger.info('persistent compilation cache: %s', d)
    results = {}
    for sup in args.sup:
        results[sup] = run(args, sup)
    logger.info('sweep results: %s', results)
    return results


if __name__ == '__main__':
    main()
