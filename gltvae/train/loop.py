"""Training engine: epoch loop with supervised/unsupervised interleave.

Schedule semantics reproduce the reference Learner.train exactly
(/root/reference/gated_ccvae.py:313-419):
- batches/epoch = ceil(n_sup/bs) [+ ceil(n_unsup/bs) if semi-supervised];
- a supervised batch every `period_sup_batches` = floor(total/sup) steps,
  capped at sup_batches per epoch;
- validation accuracy after each epoch, best-checkpointing on it;
- gating temperature ×0.99/epoch for learnable gating.

Engine-level differences (performance, not semantics):
- the hot loop never syncs: metrics are queued as device arrays and
  fetched in batches (the reference's per-step .numpy() + NaN-guard sync,
  gated_ccvae.py:364-375, cost it a device round-trip every batch);
- the NaN guard runs asynchronously every `nan_check_every` steps;
- checkpoints carry the full state (resume-capable), exported μ artifacts
  stay reference-compatible.
"""

from __future__ import annotations

import logging
import math
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gltvae.config import (CELEBA_EASY_LABELS, CELEBA_LABELS, ModelConfig,
                           TrainConfig)
from gltvae.models.ccvae import CCVAE
from gltvae.train.state import TrainState, create_train_state, make_key
from gltvae.train.steps import make_train_steps, make_eval_step
from gltvae.train.checkpoint import CheckpointManager, export_gating_matrix
from gltvae.train.metrics import MetricsLogger, Throughput

logger = logging.getLogger(__name__)


class NanGateError(RuntimeError):
    """Raised when sampled gates go NaN (reference exits the process,
    gated_ccvae.py:371-375; we raise so callers can handle it)."""


class Trainer:
    def __init__(self, model_cfg: ModelConfig, train_cfg: TrainConfig,
                 mu_init: Optional[np.ndarray] = None,
                 mesh=None,
                 checkpoint_dir: Optional[str] = None,
                 metrics_path: Optional[str] = None,
                 tensorboard_dir: Optional[str] = None,
                 nan_check_every: int = 50,
                 steps_per_dispatch: int = 1,
                 local_batches: bool = False,
                 resident_eval: str = 'auto',
                 resident_eval_max_bytes: int = 768 * 2**20,
                 resident_train: str = 'auto',
                 resident_train_max_bytes: int = 3 * 2**30):
        self.model = CCVAE(model_cfg)
        self.cfg = train_cfg
        self.mesh = mesh
        self.nan_check_every = nan_check_every
        # >1: lax.scan N steps per dispatch. Uniform schedules scan
        # same-kind chunks; the semi-sup interleave scans mixed chunks
        # with a static per-step sup mask (make_mixed_scan_train_step).
        # Semantics identical to per-step dispatch either way.
        self.steps_per_dispatch = max(1, steps_per_dispatch)

        key = make_key(train_cfg.seed, train_cfg.prng_impl)
        self.state = create_train_state(self.model, train_cfg, key,
                                        mu_init=mu_init)
        self._scan_sup = self._scan_unsup = self._scan_eval = None
        self._mixed_scan_fn = None
        if mesh is not None:
            from gltvae.parallel.dp import (make_parallel_train_steps,
                                            make_parallel_scan_train_steps,
                                            make_parallel_eval_step,
                                            make_parallel_scan_eval_step,
                                            shard_state, shard_batch,
                                            shard_stacked_batch)
            self.state = shard_state(self.state, mesh)
            self._sup_step, self._unsup_step = make_parallel_train_steps(
                self.model, train_cfg, mesh)
            if self.steps_per_dispatch > 1:
                self._scan_sup, self._scan_unsup = \
                    make_parallel_scan_train_steps(self.model, train_cfg,
                                                   mesh)
                self._scan_eval = make_parallel_scan_eval_step(
                    self.model, train_cfg, mesh)
            self._eval_step = make_parallel_eval_step(self.model, train_cfg,
                                                      mesh)
            # local_batches: loaders are host-sharded (BatchLoader shard=
            # (pid, pc)) — each process supplies only its own 1/N rows
            self._place = lambda b: shard_batch(b, mesh,
                                                local=local_batches)
            self._place_stacked = lambda b: shard_stacked_batch(
                b, mesh, local=local_batches)
        else:
            from gltvae.train.steps import (make_scan_train_steps,
                                            make_scan_eval_step)
            self._sup_step, self._unsup_step = make_train_steps(
                self.model, train_cfg)
            if self.steps_per_dispatch > 1:
                self._scan_sup, self._scan_unsup = make_scan_train_steps(
                    self.model, train_cfg)
                self._scan_eval = make_scan_eval_step(self.model, train_cfg)
            self._eval_step = make_eval_step(self.model, train_cfg)
            # explicit ASYNC ship (double-buffering): device_put returns
            # while the transfer runs in the background, so chunk k+1's
            # host->device ship overlaps chunk k's still-running compute
            # (dispatch is already async) — overlapped wall approaches
            # max(ship, compute) instead of ship + compute. Passing raw
            # numpy into the jit instead would ship at argument-
            # conversion time on the dispatch's critical path. Fitting
            # splits skip the ship entirely (resident training below).
            self._place = jax.device_put
            self._place_stacked = jax.device_put

        # Train-time fused augmentation (random crop + hflip + normalize,
        # ops/pallas/preprocess.fused_augment). Opt-in framework
        # extension; eval batches are never augmented.
        self._augment = (self._build_augment(model_cfg.image_size)
                         if train_cfg.augment_pad > 0 else None)
        self._augment_key = make_key(train_cfg.seed + 2,
                                     train_cfg.prng_impl)

        self.gating_temp = train_cfg.gating_temp_for(model_cfg)
        self.ckpt = (CheckpointManager(checkpoint_dir)
                     if checkpoint_dir else None)
        self._steps_saved: set = set()  # steps persisted by THIS run
        self._gating_hist = None        # lazy {epoch: mu} snapshot store
        self.metrics = MetricsLogger(metrics_path,
                                     tensorboard_dir=tensorboard_dir)
        self.throughput = Throughput()
        self._eval_key = make_key(train_cfg.seed + 1, train_cfg.prng_impl)
        # Device-resident eval: when a split fits the byte budget, ship
        # it ONCE and scan each epoch's batches on device by index
        # gather — one dispatch per eval, no per-epoch re-ship. On a mesh
        # the split's rows live sharded over 'data' (parallel/dp.py
        # resident wrappers), so per-device HBM holds only N/D rows and
        # multi-device eval stops paying the chunked re-ship too.
        # 'auto' = on when it fits; 'off' = always chunked.
        if resident_eval not in ('auto', 'off'):
            raise ValueError("resident_eval must be 'auto' or 'off'")
        self._resident_mode = resident_eval
        self._resident_budget = resident_eval_max_bytes
        self._resident_data: dict = {}   # id(loader) -> (loader, x, y)
        self._resident_eval_fns: dict = {}    # image_shape -> step fn
        self._resident_elbo_fns: dict = {}
        # Device-resident TRAINING (single-device, un-augmented runs):
        # ship the train split(s) ONCE, then every dispatch gathers its
        # batches on device by index — only a [n, B] int32 array crosses
        # the host boundary per dispatch. The per-step image ship is the
        # end-to-end wall once decode is cached (BENCH_r04: 3.6k img/s
        # shipped vs 371k device rate); a CelebA-64 train split is ~2 GB
        # uint8 and fits HBM next to this ~1M-param model.
        # 'auto' = on when the splits fit the byte budget; 'off' = always
        # host-shipped. Numerics are bit-identical either way
        # (tests/test_resident_train.py).
        if resident_train not in ('auto', 'off'):
            raise ValueError("resident_train must be 'auto' or 'off'")
        self._resident_train_mode = resident_train
        self._resident_train_budget = resident_train_max_bytes
        self._resident_train_fns: dict = {}   # (kind, shape) -> step fn

    def load_params(self, params) -> None:
        """Swap in an externally-loaded params pytree (e.g. a reference .h5
        checkpoint via utils/h5_import) keeping step/opt state — the
        TPU-era counterpart of the reference's load_model-then-train
        (gated_ccvae.py:146-165 has no such path: it can only load for
        eval). Fresh Adam moments are correct for a warm start: the
        reference cannot resume its optimizer either."""
        params = jax.tree.map(jnp.asarray, params)
        if self.mesh is not None:
            from gltvae.parallel.mesh import replicated_sharding
            params = jax.device_put(params, replicated_sharding(self.mesh))
        self.state = self.state.replace(params=params)

    # ------------------------------ schedule ------------------------------
    def epoch_schedule(self, loaders) -> tuple[int, int, int]:
        """(batches_per_epoch, period_sup_batches, sup_batches) —
        reference gated_ccvae.py:320-334."""
        sup = self.cfg.perc_supervision
        bs = self.cfg.batch_size
        if sup == 1.0:
            n = math.ceil(loaders['sup'].n_s / bs)
            return n, 1, n
        if sup > 0.0:
            sup_b = math.ceil(loaders['sup'].n_s / bs)
            unsup_b = math.ceil(loaders['unsup'].n_s / bs)
            total = sup_b + unsup_b
            return total, int(total / sup_b), sup_b
        if sup == 0.0:
            return math.ceil(loaders['unsup'].n_s / bs), 0, 0
        raise ValueError(f'bad supervision fraction {sup}')

    @staticmethod
    def _schedule_flags(total: int, period: int, sup_batches: int):
        """The reference's sup/unsup interleave (gated_ccvae.py:320-334)
        materialized as a static per-epoch bool list: step i is supervised
        iff i % period == 0 and the supervised quota is unspent. Being
        static is what lets whole chunks of it compile into one scanned
        XLA program (make_mixed_scan_train_step)."""
        flags, ctr = [], 0
        for i in range(total):
            f = period > 0 and i % period == 0 and ctr < sup_batches
            ctr += int(f)
            flags.append(bool(f))
        return flags

    def _build_augment(self, out_size: int):
        """Jitted device-side augmentation for per-step [B,...] and
        stacked [n,B,...] uint8 batches. Keys are derived INSIDE the jit
        by folding the (device-resident) train step count into a constant
        base key — one fold PER INNER STEP for stacked chunks, so the
        augmentation noise stream is invariant to --steps-per-dispatch.
        (An eager host-side jax.random.split here would cost one extra
        tiny-dispatch per training dispatch, the exact overhead the scan
        path amortizes away.) Under a mesh the kernel runs per-shard via
        shard_map (a Pallas call is not auto-partitioned); every shard
        draws the GLOBAL batch's (dy, dx, flip) vectors from the
        replicated key and keeps only its own rows, so augmented training
        is bit-identical across mesh shapes AND to the single-device run
        (the scalar draw is trivially cheap next to the image kernel)."""
        from gltvae.ops.pallas.preprocess import (fused_augment,
                                                  fused_augment_stacked,
                                                  fused_augment_given,
                                                  fused_augment_stacked_given,
                                                  draw_crop_flip)
        import jax.numpy as jnp

        pad = self.cfg.augment_pad

        def aug(u8, base_key, step):
            # TrainConfig.augment_pad and DataConfig.augment_pad are wired
            # from one CLI flag but are independent fields for programmatic
            # users; a desync would silently degrade the crop to offset-0
            # (flip-only). Shapes are static, so this raises at trace time
            # of the first augmented batch.
            expect = out_size + 2 * pad
            if u8.shape[-3] != expect or u8.shape[-2] != expect:
                raise ValueError(
                    f'augment_pad desync: TrainConfig.augment_pad={pad} '
                    f'expects {expect}x{expect} train images but the '
                    f'loader produced {u8.shape[-3]}x{u8.shape[-2]} — set '
                    f'DataConfig.augment_pad to the same value')
            # stacked scan chunks fold one key PER INNER STEP (step+i), so
            # the noise stream — and therefore params and metrics.csv —
            # is invariant to --steps-per-dispatch (bit-identical to the
            # per-step path; fused_augment_stacked shares its draw)
            if u8.ndim == 5:                     # stacked scan chunk
                n = u8.shape[0]
                keys = jax.vmap(
                    lambda i: jax.random.fold_in(base_key, step + i)
                )(jnp.arange(n))
                return fused_augment_stacked(u8, keys, out_size)
            return fused_augment(
                u8, jax.random.fold_in(base_key, step), out_size)

        if self.mesh is None:
            return jax.jit(aug)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from gltvae.parallel.mesh import DATA_AXIS
        n_shards = self.mesh.shape[DATA_AXIS]

        def sharded(u8, base_key, step):
            spec = P(None, DATA_AXIS) if u8.ndim == 5 else P(DATA_AXIS)
            expect = out_size + 2 * pad
            if u8.shape[-3] != expect or u8.shape[-2] != expect:
                raise ValueError(
                    f'augment_pad desync: TrainConfig.augment_pad={pad} '
                    f'expects {expect}x{expect} train images but the '
                    f'loader produced {u8.shape[-3]}x{u8.shape[-2]} — set '
                    f'DataConfig.augment_pad to the same value')

            def body(u8s, bk, st):
                # mesh-shape-invariant noise: draw the GLOBAL batch's
                # (dy, dx, flip) on every shard from the replicated key
                # (folded per inner step, so --steps-per-dispatch stays
                # invariant too), then keep this shard's contiguous rows
                # — shard ax of batch_sharding owns global rows
                # [ax*B_local, (ax+1)*B_local)
                ax = jax.lax.axis_index(DATA_AXIS)
                H, W = u8s.shape[-3], u8s.shape[-2]
                if u8s.ndim == 5:                  # stacked scan chunk
                    n, b_local = u8s.shape[0], u8s.shape[1]
                    keys = jax.vmap(
                        lambda i: jax.random.fold_in(bk, st + i)
                    )(jnp.arange(n))
                    dy, dx, fl = jax.vmap(
                        lambda k: draw_crop_flip(k, b_local * n_shards,
                                                 H, W, out_size, True)
                    )(keys)
                    sl = lambda v: jax.lax.dynamic_slice_in_dim(
                        v, ax * b_local, b_local, axis=1)
                    return fused_augment_stacked_given(
                        u8s, sl(dy), sl(dx), sl(fl), out_size)
                b_local = u8s.shape[0]
                dy, dx, fl = draw_crop_flip(
                    jax.random.fold_in(bk, st), b_local * n_shards,
                    H, W, out_size, True)
                sl = lambda v: jax.lax.dynamic_slice_in_dim(
                    v, ax * b_local, b_local, axis=0)
                return fused_augment_given(u8s, sl(dy), sl(dx), sl(fl),
                                           out_size)
            # a pallas_call inside shard_map needs the varying-across-
            # mesh-axes check disabled (its out_shape carries no vma)
            sm = shard_map(body, mesh=self.mesh, in_specs=(spec, P(), P()),
                           out_specs=spec, check_vma=False)
            return sm(u8, base_key, step)
        return jax.jit(sharded)

    def _get_mixed_scan(self):
        """Lazily-compiled mixed-schedule scan step (semi-sup runs only)."""
        if self._mixed_scan_fn is None:
            if self.mesh is not None:
                from gltvae.parallel.dp import (
                    make_parallel_mixed_scan_train_step)
                self._mixed_scan_fn = make_parallel_mixed_scan_train_step(
                    self.model, self.cfg, self.mesh)
            else:
                from gltvae.train.steps import make_mixed_scan_train_step
                self._mixed_scan_fn = make_mixed_scan_train_step(
                    self.model, self.cfg)
        return self._mixed_scan_fn

    # ------------------------------- train -------------------------------
    def train(self, loaders: Dict, param_dir: Optional[str] = None,
              epochs: Optional[int] = None,
              log_every: int = 50,
              resume: bool = False) -> Dict:
        cfg = self.cfg
        epochs = cfg.n_epochs if epochs is None else epochs
        best_metric = -np.inf   # val accuracy (sup) or val ELBO (unsup)
        best_val_acc = -np.inf
        history = []
        start_epoch = 0

        if resume and self.ckpt is not None and \
                self.ckpt.latest_step() is not None:
            # Preemption-safe resume: restore the full state (params, Adam
            # moments, step, RNG) and fast-forward the epoch/temperature
            # schedule. The reference cannot do this (weights-only saves,
            # gated_ccvae.py:388-419).
            self.state = self.ckpt.restore(self.state,
                                           step=self.ckpt.latest_step())
            # The restored step already exists on disk with its recorded
            # metrics; if no training happens (run already complete), the
            # final _save('last') must NOT delete/re-save it — the re-save
            # would drop the stored val_accuracy and let Orbax's
            # best_fn-driven GC collect the run's best state.
            self._steps_saved.add(int(self.state.step))
            total, _, _ = self.epoch_schedule(loaders)
            start_epoch = int(self.state.step) // total
            if self.model.cfg.gate_type == 'learnable':
                self.gating_temp = (
                    self.cfg.gating_temp_for(self.model.cfg)
                    * cfg.gating_temp_decay ** start_epoch)
            logger.info('resumed at step %d (epoch %d), gating temp %.4f',
                        int(self.state.step), start_epoch, self.gating_temp)

        # Device-resident training: ship the train split(s) once, then
        # every dispatch below sends only a [n, B] int32 index array.
        # None (didn't fit / gated off) -> the host-shipped path.
        res_train = self._resident_train_splits(loaders)

        for epoch in range(start_epoch, epochs):
            total, period, sup_batches = self.epoch_schedule(loaders)
            flags = self._schedule_flags(total, period, sup_batches)
            # resident runs advance the loader cursors directly
            # (_next_batch_idxs yields the identical index stream the
            # host iterators would have consumed) — no decode threads
            sup_iter = (iter(loaders['sup'])
                        if 'sup' in loaders and res_train is None else None)
            unsup_iter = (iter(loaders['unsup'])
                          if 'unsup' in loaders and res_train is None
                          else None)
            pending_gates = []
            t_epoch = time.perf_counter()
            epoch_imgs0 = self.throughput.images_total

            scan_on = self._scan_sup is not None or res_train is not None
            # semi-sup interleaves (period >= 2, i.e. sup <= 0.5 — the
            # paper's headline schedules) dispatch whole mixed chunks
            # through the lax.cond scan; uniform/period<=1 schedules keep
            # the cheaper single-kind scans
            mixed = scan_on and period > 1
            i = 0
            while i < total:
                n = min(self.steps_per_dispatch, total - i) if scan_on else 1
                chunk = flags[i:i + n]
                semi_res = (res_train is not None and 'sup' in res_train
                            and 'unsup' in res_train)
                if not mixed and not semi_res and n > 1:
                    # single-kind scans need a uniform chunk; stop at the
                    # first kind flip (a period==1 semi-sup schedule flips
                    # once per epoch when the sup quota is spent)
                    run = 1
                    while run < n and chunk[run] == chunk[0]:
                        run += 1
                    n, chunk = run, chunk[:run]
                if res_train is not None:
                    idx_rows = np.stack([
                        (loaders['sup'] if f else
                         loaders['unsup'])._next_batch_idxs()
                        for f in chunk]).astype(np.int32)
                    idxs = jnp.asarray(idx_rows)
                    if semi_res:
                        xs_s, ys_s, shape = res_train['sup']
                        xs_u, ys_u, _ = res_train['unsup']
                        fn = self._get_resident_train_fn('mixed', shape)
                        self.state, ms = fn(
                            self.state, xs_s, ys_s, xs_u, ys_u, idxs,
                            np.asarray(chunk, dtype=bool), self.gating_temp)
                    else:
                        kind = 'sup' if chunk[0] else 'unsup'
                        x_r, y_r, shape = res_train[kind]
                        fn = self._get_resident_train_fn(kind, shape)
                        self.state, ms = fn(self.state, x_r, y_r, idxs,
                                            self.gating_temp)
                    nan_flag = ms['c_nan'].any()
                    self.throughput.step(n * idx_rows.shape[1])
                elif n > 1:
                    bx, by = zip(*(next(sup_iter if f else unsup_iter)
                                   for f in chunk))
                    xs, ys = self._place_stacked((np.stack(bx),
                                                  np.stack(by)))
                    if self._augment is not None:
                        xs = self._augment(xs, self._augment_key,
                                           self.state.step)
                    if mixed:
                        self.state, ms = self._get_mixed_scan()(
                            self.state, xs, ys,
                            np.asarray(chunk, dtype=bool), self.gating_temp)
                    else:
                        step_fn = (self._scan_sup if chunk[0]
                                   else self._scan_unsup)
                        self.state, ms = step_fn(self.state, xs, ys,
                                                 self.gating_temp)
                    nan_flag = ms['c_nan'].any()  # over the whole chunk
                    self.throughput.step(n * bx[0].shape[0])
                else:
                    x, y = self._place(
                        next(sup_iter if chunk[0] else unsup_iter))
                    if self._augment is not None:
                        x = self._augment(x, self._augment_key,
                                          self.state.step)
                    step_fn = (self._sup_step if chunk[0]
                               else self._unsup_step)
                    self.state, ms = step_fn(self.state, x, y,
                                             self.gating_temp)
                    nan_flag = ms['c_nan']
                    self.throughput.step(len(x))
                pending_gates.append(nan_flag)
                # Full-fidelity metrics: every inner step on the log_every
                # cadence gets its OWN row (lazy device indexing, no sync),
                # so metrics.csv is identical for any steps_per_dispatch.
                stacked = n > 1 or res_train is not None
                for j in range(n):
                    if (i + j) % log_every == 0:
                        self.metrics.log(
                            int(i + j + epoch * total),
                            {k: (v[j] if stacked else v)
                             for k, v in ms.items() if k != 'c_nan'},
                            epoch=epoch, supervised=int(chunk[j]))
                i += n
                if i % self.nan_check_every < n or i == total:
                    if any(np.any(v) for v in jax.device_get(pending_gates)):
                        raise NanGateError(
                            f'NaN gates at epoch {epoch} step {i}')
                    pending_gates.clear()

            # ----------------------- validation -----------------------
            # Best-checkpoint criterion: validation accuracy (reference
            # gated_ccvae.py:384-401). Unsupervised runs (sup=0.0) have no
            # accuracy — fall back to validation ELBO so they still get a
            # genuine 'best' slot (the reference's sup=0.0 path never saves
            # one at all).
            if cfg.perc_supervision and 'valid' in loaders:
                val_acc = self.evaluate(loaders['valid'])
                val_metric = val_acc
            elif 'valid' in loaders:
                val_acc = -np.inf
                val_metric = self.test_elbo(loaders['valid'])
            else:
                val_acc = val_metric = -np.inf
            epoch_time = time.perf_counter() - t_epoch
            # per-EPOCH e2e rate (train images this epoch / epoch wall
            # incl. eval+ckpt) — the cumulative meter decays as fixed
            # per-epoch costs accrue and misreads next to the epoch time
            epoch_imgs = self.throughput.images_total - epoch_imgs0
            logger.info('[Epoch %03d] Val Acc %.3f (%.1fs, %.0f img/s)',
                        epoch, val_acc, epoch_time,
                        epoch_imgs / epoch_time if epoch_time > 0 else 0.0)
            history.append({'epoch': epoch, 'val_accuracy': val_acc,
                            'val_metric': val_metric,
                            'epoch_time': epoch_time})

            if val_metric > best_metric:
                best_metric = val_metric
                best_val_acc = val_acc
                self._save(param_dir, 'best', {'val_accuracy': val_metric})

            # gating temperature decay (learnable only; gated_ccvae.py:403-406)
            if self.model.cfg.gate_type == 'learnable':
                self.gating_temp *= cfg.gating_temp_decay
                # per-epoch μ snapshot (SURVEY §5 metrics plan:
                # 'gate-matrix snapshots') — one [epochs, zc, y] stack for
                # offline gate-evolution analysis; best/last exports stay
                # the reference-compatible npy/csv
                if param_dir is not None:
                    self._snapshot_gating(param_dir, epoch)

        # 'last' carries the FINAL epoch's metric (not the best one), so
        # Orbax best_step() keeps pointing at the genuinely best state and
        # the reference's load_model('best') test protocol is honored.
        last_metric = history[-1]['val_metric'] if history else -np.inf
        self._save(param_dir, 'last', {'val_accuracy': last_metric})
        if self.ckpt is not None:
            # async save must land before the interpreter can exit (a
            # --no-test run otherwise races Orbax's executor shutdown:
            # 'cannot schedule new futures after shutdown')
            self.ckpt.wait_until_finished()
        self.metrics.flush()
        return {'best_val_accuracy': best_val_acc,
                'best_val_metric': best_metric, 'history': history,
                'images_per_sec': self.throughput.images_per_sec}

    def _snapshot_gating(self, param_dir: str, epoch: int) -> None:
        """Append this epoch's μ to gating_history.npz ([n, zc, y] stack
        + epoch index). Rewritten whole each epoch (an 18×18 f32 matrix
        is ~1.3 KB); on --resume the existing stack is extended, and a
        re-run epoch simply overwrites its slot."""
        path = os.path.join(param_dir, 'gating_history.npz')
        if self._gating_hist is None:
            self._gating_hist = {}
            if os.path.exists(path):
                try:
                    with np.load(path) as z:
                        self._gating_hist = {int(e): m for e, m in
                                             zip(z['epochs'], z['mu'])}
                except Exception:   # torn write from a prior crash:
                    pass            # restart the history, don't kill resume
        self._gating_hist[epoch] = np.asarray(
            jax.device_get(self.state.params['mu']), np.float32)
        eps = sorted(self._gating_hist)
        tmp = path + '.tmp.npz'     # .npz suffix: stops savez renaming it
        np.savez(tmp, epochs=np.asarray(eps, np.int32),
                 mu=np.stack([self._gating_hist[e] for e in eps]))
        os.replace(tmp, path)       # atomic: never a half-written npz

    def _save(self, param_dir: Optional[str], model_id: str, metrics: dict):
        metrics = {k: v for k, v in metrics.items() if np.isfinite(v)}
        step = int(self.state.step)
        if self.ckpt is not None and step not in self._steps_saved:
            # A step saved by THIS run (e.g. 'best' then 'last' on the same
            # final state) is skipped — a second Orbax save would raise
            # StepAlreadyExistsError and the bytes are identical. A step
            # left over from a PREVIOUS run into the same directory is
            # stale — delete it so this run's state actually persists.
            if step in self.ckpt.all_steps():
                self.ckpt.delete(step)
            self.ckpt.save(self.state, metrics=metrics)
            self._steps_saved.add(step)
        if param_dir and self.model.cfg.gate_type == 'learnable':
            names = (CELEBA_EASY_LABELS
                     if self.model.cfg.y_dim == len(CELEBA_EASY_LABELS)
                     else list(CELEBA_LABELS)[:self.model.cfg.y_dim])
            export_gating_matrix(self.state.params['mu'], param_dir,
                                 model_id, names)

    # ------------------------------- eval -------------------------------
    def _resident_split(self, loader, budget: Optional[int] = None):
        """(images_dev, labels_dev, image_shape) for a split small enough
        to live on device, else None. Decoded/shipped ONCE per loader and
        cached; a later use of the same loader costs one [n, B] int32
        index ship. Gated off for host-sharded loaders (their fetch()
        only serves this process's rows) and when the loader lacks the
        index-stream API."""
        if getattr(loader, 'shard', None) is not None \
                or not hasattr(loader, 'epoch_indices'):
            return None
        ent = self._resident_data.get(id(loader))
        if ent is not None:
            return ent[1], ent[2], ent[3]
        budget = self._resident_budget if budget is None else budget
        ds = loader.dataset
        try:
            x0, y0 = ds.fetch(np.asarray([0]))
        except Exception:
            return None
        if (x0.nbytes + y0.nbytes) * len(ds) > budget:
            return None
        x, y = ds.fetch(np.arange(len(ds)))
        from gltvae.train.steps import pack_resident_images
        shape = x.shape[1:]                  # static for the step builders
        packed = pack_resident_images(np.ascontiguousarray(x))
        if self.mesh is not None:
            # rows SHARDED over 'data' (per-device HBM holds N/D rows);
            # the resident step fns re-slice each gathered batch to the
            # chunked mesh path's DP sharding (parallel/dp.py)
            from gltvae.parallel.dp import place_resident_split
            x, y = place_resident_split(packed,
                                        np.asarray(y, np.float32),
                                        self.mesh)
        else:
            x = jax.device_put(packed)
            y = jax.device_put(np.asarray(y, np.float32))
        self._resident_data[id(loader)] = (loader, x, y, shape)
        return x, y, shape

    def _resident_eval_split(self, loader):
        if self._resident_mode == 'off':
            return None
        return self._resident_split(loader)

    def _resident_train_splits(self, loaders) -> Optional[dict]:
        """{'sup'/'unsup': (images, labels, shape)} when ALL train splits
        fit the combined resident-train budget, else None. Augmented runs
        stay host-shipped (the crop/flip kernel consumes padded host
        batches). On a mesh the splits' rows shard over 'data'
        (place_resident_split); host-SHARDED loaders (multi-host input)
        are excluded by the shard check below — their fetch() only
        serves this process's rows — so multi-host keeps streaming."""
        if self._resident_train_mode == 'off' or self._augment is not None:
            return None
        modes = [m for m in ('sup', 'unsup') if m in loaders]
        if not modes:
            return None
        total = 0
        for m in modes:
            loader = loaders[m]
            if getattr(loader, 'shard', None) is not None \
                    or not hasattr(loader, '_next_batch_idxs'):
                return None
            try:
                x0, y0 = loader.dataset.fetch(np.asarray([0]))
            except Exception:
                return None
            total += (x0.nbytes + y0.nbytes) * len(loader.dataset)
        if total > self._resident_train_budget:
            return None
        out = {m: self._resident_split(loaders[m], budget=total)
               for m in modes}
        if any(v is None for v in out.values()):
            return None
        shapes = {v[2] for v in out.values()}
        if len(shapes) != 1:                 # sup/unsup must agree
            return None
        logger.info('resident train: %d MB shipped once (%s)',
                    total >> 20, '+'.join(modes))
        return out

    def _get_resident_train_fn(self, kind: str, shape):
        fn = self._resident_train_fns.get((kind, shape))
        if fn is None:
            if self.mesh is not None:
                from gltvae.parallel.dp import (
                    make_parallel_resident_mixed_scan_train_step as mk_mixed,
                    make_parallel_resident_scan_train_steps as mk_pair)
                extra = (self.mesh,)
            else:
                from gltvae.train.steps import (
                    make_resident_mixed_scan_train_step as mk_mixed,
                    make_resident_scan_train_steps as mk_pair)
                extra = ()
            if kind == 'mixed':
                fn = mk_mixed(self.model, self.cfg, *extra,
                              image_shape=shape)
            else:
                sup_fn, unsup_fn = mk_pair(self.model, self.cfg, *extra,
                                           image_shape=shape)
                self._resident_train_fns[('sup', shape)] = sup_fn
                self._resident_train_fns[('unsup', shape)] = unsup_fn
                fn = self._resident_train_fns[(kind, shape)]
            self._resident_train_fns[(kind, shape)] = fn
        return fn

    def evaluate(self, loader, gating_temp: Optional[float] = None) -> float:
        """Mean accuracy over ceil(n/bs) batches (gated_ccvae.py:448-455).

        Splits that fit on device take the RESIDENT path: the split ships
        once, each eval is ONE dispatch scanning the epoch's batches by
        index gather (train/steps.py::make_resident_eval_step) — the key
        chain and per-batch accuracies are bit-identical to the chunked
        path below. Otherwise, with steps_per_dispatch>1 batches are
        chunked through the scan-eval step (one dispatch per chunk); the
        key sequence and the resulting per-batch accuracies are identical
        to the per-batch path."""
        temp = self.gating_temp if gating_temp is None else gating_temp
        res = self._resident_eval_split(loader)
        if res is not None:
            x, y, shape = res
            fn = self._resident_eval_fns.get(shape)
            if fn is None:
                if self.mesh is not None:
                    from gltvae.parallel.dp import \
                        make_parallel_resident_eval_step
                    fn = make_parallel_resident_eval_step(
                        self.model, self.cfg, self.mesh, image_shape=shape)
                else:
                    from gltvae.train.steps import make_resident_eval_step
                    fn = make_resident_eval_step(self.model, self.cfg,
                                                 image_shape=shape)
                self._resident_eval_fns[shape] = fn
            idxs = jnp.asarray(loader.epoch_indices(), jnp.int32)
            accs, self._eval_key = fn(self.state.params, x, y, idxs,
                                      self._eval_key, temp)
            return float(np.mean(jax.device_get(accs)))
        n_batches = loader.epoch_batches
        it = iter(loader)
        accs = []
        chunk = self.steps_per_dispatch if self._scan_eval is not None else 1
        i = 0
        while i < n_batches:
            n = min(chunk, n_batches - i)
            if n > 1:
                bx, by = zip(*(next(it) for _ in range(n)))
                subs = []
                for _ in range(n):
                    self._eval_key, sub = jax.random.split(self._eval_key)
                    subs.append(sub)
                xs, ys = self._place_stacked((np.stack(bx), np.stack(by)))
                accs.append(self._scan_eval(self.state.params, xs, ys,
                                            jnp.stack(subs), temp))
            else:
                x, y = self._place(next(it))
                self._eval_key, sub = jax.random.split(self._eval_key)
                accs.append(self._eval_step(self.state.params, x, y, sub,
                                            temp))
            i += n
        accs = [np.atleast_1d(a) for a in jax.device_get(accs)]
        return float(np.mean(np.concatenate(accs)))

    def test(self, loader) -> float:
        """Test protocol: gating temp forced to eval temperature
        (gated_ccvae.py:534-536)."""
        return self.evaluate(loader, gating_temp=self.cfg.eval_gating_temp)

    def test_elbo(self, loader, gating_temp: Optional[float] = None) -> float:
        """Mean unsupervised test ELBO — the BASELINE 'matched test ELBO'
        meter (framework addition; the reference reports only accuracy).

        With steps_per_dispatch>1 batches chunk through the scan-ELBO step
        (one dispatch per chunk) — a sup=0.0 run evaluates this on the
        whole valid split every epoch, so it must not be per-dispatch
        bound. Key sequence and per-batch values identical to the
        per-batch path."""
        if not hasattr(self, '_elbo_step'):
            if self.mesh is not None:
                from gltvae.parallel.dp import (make_parallel_elbo_step,
                                                make_parallel_scan_elbo_step)
                self._elbo_step = make_parallel_elbo_step(
                    self.model, self.cfg, self.mesh)
                self._scan_elbo = (
                    make_parallel_scan_elbo_step(self.model, self.cfg,
                                                 self.mesh)
                    if self.steps_per_dispatch > 1 else None)
            else:
                from gltvae.train.steps import (make_elbo_eval_step,
                                                make_scan_elbo_step)
                self._elbo_step = make_elbo_eval_step(self.model, self.cfg)
                self._scan_elbo = (
                    make_scan_elbo_step(self.model, self.cfg)
                    if self.steps_per_dispatch > 1 else None)
        temp = self.gating_temp if gating_temp is None else gating_temp
        res = self._resident_eval_split(loader)
        if res is not None:
            x, _, shape = res
            fn = self._resident_elbo_fns.get(shape)
            if fn is None:
                if self.mesh is not None:
                    from gltvae.parallel.dp import \
                        make_parallel_resident_elbo_step
                    fn = make_parallel_resident_elbo_step(
                        self.model, self.cfg, self.mesh, image_shape=shape)
                else:
                    from gltvae.train.steps import make_resident_elbo_step
                    fn = make_resident_elbo_step(self.model, self.cfg,
                                                 image_shape=shape)
                self._resident_elbo_fns[shape] = fn
            idxs = jnp.asarray(loader.epoch_indices(), jnp.int32)
            elbos, self._eval_key = fn(self.state.params, x, idxs,
                                       self._eval_key, temp)
            return float(np.mean(jax.device_get(elbos)))
        n_batches = loader.epoch_batches
        it = iter(loader)
        vals = []
        chunk = self.steps_per_dispatch if self._scan_elbo is not None else 1
        i = 0
        while i < n_batches:
            n = min(chunk, n_batches - i)
            if n > 1:
                bx = [next(it)[0] for _ in range(n)]
                subs = []
                for _ in range(n):
                    self._eval_key, sub = jax.random.split(self._eval_key)
                    subs.append(sub)
                xs = self._place_stacked(np.stack(bx))
                vals.append(self._scan_elbo(self.state.params, xs,
                                            jnp.stack(subs), temp))
            else:
                x, _ = self._place(next(it))
                self._eval_key, sub = jax.random.split(self._eval_key)
                vals.append(self._elbo_step(self.state.params, x, sub, temp))
            i += n
        vals = [np.atleast_1d(v) for v in jax.device_get(vals)]
        return float(np.mean(np.concatenate(vals)))

    def restore(self, step: Optional[int] = None):
        if self.ckpt is None:
            raise ValueError('no checkpoint_dir configured')
        self.state = self.ckpt.restore(self.state, step=step)
        return self.state
