"""Jit-compiled train/eval steps.

The reference's `@tf.function train_step(x, y, supervised)` traces two
graphs for the Python bool (SURVEY.md §2 quirk); here that is explicit:
`make_train_steps` returns two compiled functions (sup/unsup) sharing the
state pytree. The gating temperature is a TRACED scalar so the per-epoch
×0.99 decay (gated_ccvae.py:403-406) never triggers a recompile.

Device-parallel variants of these steps are built in gltvae.parallel.dp by
wrapping the same pure functions in shardings — the loss code is identical
on 1 chip and on a v5p pod.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gltvae.config import TrainConfig
from gltvae.models.ccvae import CCVAE, Temps
from gltvae.train.state import TrainState, make_optimizer


def make_train_steps(model: CCVAE, train_cfg: TrainConfig,
                     jit: bool = True,
                     donate: bool = True) -> Tuple[Callable, Callable]:
    """Build (sup_step, unsup_step): (state, x, y, gating_temp) -> (state,
    metrics). x may be uint8 (device-side normalize, see ops/pallas) or f32.
    """
    tx = make_optimizer(model.cfg, train_cfg)
    gating_reg = (train_cfg.gating_reg if model.cfg.mu_trainable else 0.0)
    k = train_cfg.classifier_mc_samples

    # Optional forward rematerialization (TrainConfig.remat): the step is
    # HBM-bound, so recomputing activations in the backward pass instead
    # of storing them trades spare MXU FLOPs for the bottleneck resource.
    def _loss_fns():
        def sup_loss(params, x, y, key, temps):
            return model.sup_loss(params, x, y, key, temps,
                                  gating_reg=gating_reg, k=k)

        def unsup_loss(params, x, key, temps):
            return model.unsup_loss(params, x, key, temps,
                                    gating_reg=gating_reg)
        if train_cfg.remat == 'none':
            return sup_loss, unsup_loss
        if train_cfg.remat == 'full':
            return jax.checkpoint(sup_loss), jax.checkpoint(unsup_loss)
        if train_cfg.remat == 'dots':
            pol = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            return (jax.checkpoint(sup_loss, policy=pol),
                    jax.checkpoint(unsup_loss, policy=pol))
        raise ValueError(f'unknown remat mode {train_cfg.remat!r} '
                         "(choices: 'none', 'full', 'dots')")

    sup_loss_fn, unsup_loss_fn = _loss_fns()

    def _apply(state: TrainState, grads, loss, aux):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        metrics = {
            'loss': loss, 'elbo': aux.elbo, 'log_pxz': aux.log_pxz,
            'kl': aux.kl, 'log_qy_zc': aux.log_qy_zc,
            'log_qy_x': aux.log_qy_x,
            'c_sum': jnp.sum(aux.gates),
            'c_nan': jnp.any(jnp.isnan(aux.gates)),
        }
        return new_state, metrics

    def sup_step(state: TrainState, x, y, gating_temp):
        x = _prep_image(x, model.cfg.image_size)
        key = state.next_rng()
        temps = Temps(gating=jnp.asarray(gating_temp, jnp.float32))
        (loss, aux), grads = jax.value_and_grad(
            sup_loss_fn, has_aux=True)(
                state.params, x, y.astype(jnp.float32), key, temps)
        return _apply(state, grads, loss, aux)

    def unsup_step(state: TrainState, x, y, gating_temp):
        del y  # unsupervised: labels unused (reference passes them anyway)
        x = _prep_image(x, model.cfg.image_size)
        key = state.next_rng()
        temps = Temps(gating=jnp.asarray(gating_temp, jnp.float32))
        (loss, aux), grads = jax.value_and_grad(
            unsup_loss_fn, has_aux=True)(
                state.params, x, key, temps)
        return _apply(state, grads, loss, aux)

    if jit:
        donate_args = (0,) if donate else ()
        sup_step = jax.jit(sup_step, donate_argnums=donate_args)
        unsup_step = jax.jit(unsup_step, donate_argnums=donate_args)
    return sup_step, unsup_step


def make_eval_step(model: CCVAE, train_cfg: TrainConfig, jit: bool = True):
    """(params, x, y, key, gating_temp) -> per-batch accuracy scalar.

    Stochastic by default (reference parity, gated_ccvae.py:421-446);
    set train_cfg.deterministic_eval for the mean-z/expected-gate variant.
    """
    det = train_cfg.deterministic_eval

    def eval_step(params, x, y, key, gating_temp):
        x = _prep_image(x, model.cfg.image_size)
        temps = Temps(gating=jnp.asarray(gating_temp, jnp.float32))
        return model.classifier_accuracy(params, x, y.astype(jnp.float32),
                                         key, temps, deterministic=det)

    return jax.jit(eval_step) if jit else eval_step


def make_elbo_eval_step(model: CCVAE, train_cfg: TrainConfig,
                        jit: bool = True):
    """Test-ELBO meter (unsupervised bound) for the BASELINE 'matched test
    ELBO' criterion — a framework addition; the reference only reports
    accuracy."""
    def elbo_step(params, x, key, gating_temp):
        x = _prep_image(x, model.cfg.image_size)
        temps = Temps(gating=jnp.asarray(gating_temp, jnp.float32))
        _, aux = model.unsup_loss(params, x, key, temps)
        return aux.elbo
    return jax.jit(elbo_step) if jit else elbo_step


def make_scan_eval_step(model: CCVAE, train_cfg: TrainConfig,
                        jit: bool = True):
    """Multi-batch eval: (params, xs, ys, keys, gating_temp) -> accs [n]
    where xs/ys are stacked [n, B, ...] batches and keys is a stacked
    [n]-key array; n per-batch accuracies come back from ONE dispatch.

    The per-dispatch eval loop was the round-1 eval bottleneck (tunnel-RPC
    bound at ~9.5k img/s while the device sustains ~280k on the train
    step); scanning batches amortizes the host round-trip exactly like
    make_scan_train_steps does for training. Semantics identical to
    calling make_eval_step per batch with the same key sequence."""
    ev = make_eval_step(model, train_cfg, jit=False)

    def scan_fn(params, xs, ys, keys, gating_temp):
        def body(carry, xyk):
            x, y, k = xyk
            return carry, ev(params, x, y, k, gating_temp)
        _, accs = jax.lax.scan(body, None, (xs, ys, keys))
        return accs

    return jax.jit(scan_fn) if jit else scan_fn


def pack_resident_images(images_u8: np.ndarray) -> np.ndarray:
    """Host-side, zero-copy: uint8 [N, H, W, C] -> int32 [N, H*W*C/4]
    view for device-resident eval. Row-gathering 4-byte lanes instead of
    single bytes measured +6% end-to-end eval throughput on v5e (the
    per-row gather is descriptor-bound, not bandwidth-bound), and
    packing ONCE at ship time is free — bitcasting inside the dispatch
    cost a measured 6 ms/dispatch (201 MB repack). Returns the input
    unchanged when the row byte-count doesn't divide by 4."""
    n = images_u8.shape[0]
    flat = images_u8.reshape(n, -1)
    if images_u8.dtype == np.uint8 and flat.shape[1] % 4 == 0:
        return flat.view(np.int32)
    return images_u8


def _make_image_taker(images, image_shape, constrain=None):
    """Row-gather closure for a device-resident image split: plain
    jnp.take for raw [N, H, W, C] arrays, gather + bit-exact uint8
    bitcast for `pack_resident_images`-packed int32 rows (the bitcast
    round-trip preserves bytes, so resident results stay identical to
    the chunked path — tests/test_resident_eval.py).

    `constrain` (a NamedSharding) pins the GATHERED batch's sharding on a
    mesh: the resident split is stored row-sharded over 'data'
    (parallel/dp.py resident wrappers), the partitioner materializes the
    gather (hoisting the loop-invariant operand all-gather out of the
    scan — ICI bytes once per dispatch, not per batch), and the
    constraint immediately re-slices the batch so every op downstream of
    the gather runs data-parallel, exactly like the chunked mesh path."""
    def take_raw(idx):
        rows = jnp.take(images, idx, axis=0)
        if constrain is not None:
            rows = jax.lax.with_sharding_constraint(rows, constrain)
        return rows

    if images.dtype != jnp.int32:
        return take_raw

    def take(idx):
        return jax.lax.bitcast_convert_type(take_raw(idx), jnp.uint8) \
            .reshape((idx.shape[0],) + tuple(image_shape))

    return take


def make_resident_eval_step(model: CCVAE, train_cfg: TrainConfig,
                            image_shape=None, jit: bool = True,
                            constrain=None):
    """Device-RESIDENT eval: the whole split lives on device; one dispatch
    scans an epoch's batches, gathering rows by index instead of shipping
    them.

    (params, images [N, H, W, C] u8, labels [N, y], idxs [n, B] i32,
     key, gating_temp) -> (accs [n], key_out)

    The key chain inside the scan is the SAME sequential
    `key, sub = jax.random.split(key)` the chunked Trainer.evaluate path
    runs on host per batch, and `key_out` is the advanced carry — so
    per-batch accuracies (and every later draw) are bit-identical to the
    chunked path. This removes the per-epoch host->device re-ship of the
    split AND the per-chunk dispatch overhead: eval becomes one dispatch
    per epoch with only a [n, B] int32 index ship (reference protocol
    being accelerated: gated_ccvae.py:448-455).

    `constrain`: gathered-batch sharding on a mesh (see
    _make_image_taker) — set by parallel/dp.py's resident wrappers."""
    ev = make_eval_step(model, train_cfg, jit=False)

    def resident_fn(params, images, labels, idxs, key, gating_temp):
        take_image = _make_image_taker(images, image_shape, constrain)

        def body(key, idx):
            key, sub = jax.random.split(key)
            y = jnp.take(labels, idx, axis=0)
            if constrain is not None:
                y = jax.lax.with_sharding_constraint(y, constrain)
            acc = ev(params, take_image(idx), y, sub, gating_temp)
            return key, acc
        key_out, accs = jax.lax.scan(body, key, idxs)
        return accs, key_out

    return jax.jit(resident_fn) if jit else resident_fn


def make_resident_elbo_step(model: CCVAE, train_cfg: TrainConfig,
                            image_shape=None, jit: bool = True,
                            constrain=None):
    """Device-resident twin of make_elbo_eval_step (same contract as
    make_resident_eval_step; labels unused by the unsupervised bound):
    (params, images, idxs, key, gating_temp) -> (elbos [n], key_out)."""
    el = make_elbo_eval_step(model, train_cfg, jit=False)

    def resident_fn(params, images, idxs, key, gating_temp):
        take_image = _make_image_taker(images, image_shape, constrain)

        def body(key, idx):
            key, sub = jax.random.split(key)
            return key, el(params, take_image(idx), sub, gating_temp)
        key_out, elbos = jax.lax.scan(body, key, idxs)
        return elbos, key_out

    return jax.jit(resident_fn) if jit else resident_fn


def make_resident_scan_train_steps(model: CCVAE, train_cfg: TrainConfig,
                                   image_shape=None, donate: bool = True,
                                   jit: bool = True, constrain=None
                                   ) -> Tuple[Callable, Callable]:
    """Device-RESIDENT training: the whole train split lives on device;
    each dispatch scans n inner steps, gathering its batches by index
    instead of shipping them.

    (state, images [N, row] i32-packed (or [N, H, W, C] u8),
     labels [N, y] f32, idxs [n, B] i32, gating_temp) -> (state, metrics)

    Why: the per-step host->device image ship is the END-TO-END wall once
    decode is cached (BENCH_r04 e2e_images_per_sec_cached 3,576 vs the
    371k device step rate — measured ~44 MB/s effective ship on this
    host's TPU tunnel, and still multi-GB/epoch on a real host NIC). A
    CelebA-64 train split is ~2 GB uint8 — it FITS in HBM next to this
    ~1M-param model, so the TPU-native move is to ship the corpus ONCE
    and make every later epoch pure device work: per dispatch only a
    [n, B] int32 index array (a few KB) crosses the host boundary. The
    reference re-ships (and re-decodes) every image every epoch
    (utils_data.py:48-63, gated_ccvae.py:302-311).

    Numerics are bit-identical to the host-shipped scan path: the gather
    + uint8 bitcast returns the exact bytes fetch() would have shipped
    (pack_resident_images round-trip), the index stream is the same
    loader cursor, and per-step RNG folds the state's step counter either
    way — asserted in tests/test_resident_train.py.

    `constrain`: gathered-batch sharding on a mesh (see
    _make_image_taker) — set by parallel/dp.py's resident wrappers.
    """
    sup, unsup = make_train_steps(model, train_cfg, jit=False)

    def make(fn):
        def scan_fn(state, images, labels, idxs, gating_temp):
            take_image = _make_image_taker(images, image_shape, constrain)

            def body(s, idx):
                y = jnp.take(labels, idx, axis=0)
                if constrain is not None:
                    y = jax.lax.with_sharding_constraint(y, constrain)
                return fn(s, take_image(idx), y, gating_temp)
            return jax.lax.scan(body, state, idxs)
        if not jit:
            return scan_fn
        # donate only the state: the resident images/labels persist
        return jax.jit(scan_fn, donate_argnums=(0,) if donate else ())

    return make(sup), make(unsup)


def make_resident_mixed_scan_train_step(model: CCVAE,
                                        train_cfg: TrainConfig,
                                        image_shape=None,
                                        donate: bool = True,
                                        jit: bool = True,
                                        constrain=None) -> Callable:
    """Semi-supervised twin of make_resident_scan_train_steps: both the
    sup and unsup splits live on device; each inner step gathers from the
    split its (static-per-chunk) schedule flag selects.

    (state, images_sup, labels_sup, images_unsup, labels_unsup,
     idxs [n, B] i32, sup_mask [n] bool, gating_temp) -> (state, metrics)

    Row j of `idxs` indexes images_sup/labels_sup when sup_mask[j] else
    images_unsup/labels_unsup — exactly the row stream the host path's
    `next(sup_iter if flag else unsup_iter)` consumes
    (reference interleave: gated_ccvae.py:320-334). lax.cond executes
    only the selected branch's gather + loss at runtime."""
    sup, unsup = make_train_steps(model, train_cfg, jit=False)

    def scan_fn(state, images_sup, labels_sup, images_unsup, labels_unsup,
                idxs, sup_mask, gating_temp):
        take_s = _make_image_taker(images_sup, image_shape, constrain)
        take_u = _make_image_taker(images_unsup, image_shape, constrain)

        def take_y(labels, idx):
            y = jnp.take(labels, idx, axis=0)
            if constrain is not None:
                y = jax.lax.with_sharding_constraint(y, constrain)
            return y

        def body(s, im):
            idx, m = im
            return jax.lax.cond(
                m,
                lambda s_: sup(s_, take_s(idx), take_y(labels_sup, idx),
                               gating_temp),
                lambda s_: unsup(s_, take_u(idx),
                                 take_y(labels_unsup, idx), gating_temp),
                s)
        return jax.lax.scan(body, state, (idxs, sup_mask))

    if not jit:
        return scan_fn
    return jax.jit(scan_fn, donate_argnums=(0,) if donate else ())


def make_scan_train_steps(model: CCVAE, train_cfg: TrainConfig,
                          donate: bool = True,
                          jit: bool = True) -> Tuple[Callable, Callable]:
    """Multi-step trainers: (state, xs, ys, gating_temp) -> (state, metrics)
    where xs/ys are stacked [n_inner, B, ...] batches, run via lax.scan
    inside ONE jit call; each metrics leaf gains a leading n_inner axis.

    For a ~1M-param model the per-step host dispatch is a measurable slice
    of the 0.5ms step; scanning N steps per dispatch amortizes it and lets
    XLA overlap the uint8 batch uploads with compute. The semantics are
    identical to calling the per-step function N times (same per-step
    fold_in RNG stream) — verified in tests/test_learning.py.
    """
    sup, unsup = make_train_steps(model, train_cfg, jit=False)

    def make(fn):
        def scan_fn(state, xs, ys, gating_temp):
            def body(s, xy):
                x, y = xy
                s, m = fn(s, x, y, gating_temp)
                return s, m
            return jax.lax.scan(body, state, (xs, ys))
        if not jit:
            return scan_fn
        return jax.jit(scan_fn, donate_argnums=(0,) if donate else ())

    return make(sup), make(unsup)


def make_mixed_scan_train_step(model: CCVAE, train_cfg: TrainConfig,
                               donate: bool = True,
                               jit: bool = True) -> Callable:
    """Semi-supervised multi-step trainer:
    (state, xs, ys, sup_mask, gating_temp) -> (state, metrics).

    xs/ys are stacked [n_inner, B, ...] batches; sup_mask is a [n_inner]
    bool array marking which inner steps are supervised. The reference's
    deterministic sup/unsup interleave (gated_ccvae.py:320-334) is a
    STATIC pattern per chunk, so the whole chunk compiles to one XLA
    program: a lax.scan whose body selects the supervised or unsupervised
    loss with lax.cond (only the taken branch executes at runtime).

    This is what lets the paper's headline sup=0.2/0.5 schedules ride the
    scan dispatch path (round 2 restricted scanning to uniform schedules
    and paid ~6x dispatch overhead on semi-sup runs). Per-step RNG
    (TrainState.next_rng folds the step counter) is branch-independent,
    so results are bit-identical to per-step dispatch of the same
    schedule — verified in tests/test_trainer_scan.py.
    """
    sup, unsup = make_train_steps(model, train_cfg, jit=False)

    def scan_fn(state, xs, ys, sup_mask, gating_temp):
        def body(s, xym):
            x, y, m = xym
            return jax.lax.cond(m,
                                lambda s_: sup(s_, x, y, gating_temp),
                                lambda s_: unsup(s_, x, y, gating_temp),
                                s)
        return jax.lax.scan(body, state, (xs, ys, sup_mask))

    if not jit:
        return scan_fn
    return jax.jit(scan_fn, donate_argnums=(0,) if donate else ())


def make_scan_elbo_step(model: CCVAE, train_cfg: TrainConfig,
                        jit: bool = True) -> Callable:
    """Multi-batch test-ELBO meter: (params, xs, keys, gating_temp) ->
    elbos [n]. Same dispatch-amortization story as make_scan_eval_step —
    the per-batch ELBO loop was the last per-dispatch-bound eval path
    (sup=0.0 runs pay it over the whole valid split every epoch)."""
    el = make_elbo_eval_step(model, train_cfg, jit=False)

    def scan_fn(params, xs, keys, gating_temp):
        def body(carry, xk):
            x, k = xk
            return carry, el(params, x, k, gating_temp)
        _, elbos = jax.lax.scan(body, None, (xs, keys))
        return elbos

    return jax.jit(scan_fn) if jit else scan_fn


def _as_f32_image(x):
    """uint8 [0,255] -> f32 [0,1] on device; f32 passes through.

    Keeping the host->device transfer in uint8 quarters PCIe/DCN bytes;
    the divide fuses into the first conv via XLA (and the Pallas
    preprocessing path in ops/pallas/preprocess.py for the fused
    crop+flip+normalize variant)."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x


def _prep_image(x, image_size: int):
    """Device-side input stage: normalize + (when the batch arrives at a
    different resolution, i.e. DataConfig.device_resize full-res shipping)
    bilinear resize to the model resolution inside the same jit.

    The resize lowers to two separable interpolation GEMMs on the MXU
    (gltvae.ops.resize); the reference resizes per-image with PIL on the
    host training thread (utils_data.py:48-63).

    Only a genuine full-res ship (both dims strictly larger than the
    model resolution, e.g. CelebA's 218x178) is resized; any other
    mismatch is a miswired loader and raises rather than silently
    coercing the data.

    A SQUARE batch less than 2x the model resolution is refused even
    though it is technically downscalable: that shape is exactly what a
    padded augmentation loader ships (image_size + 2*pad), and reaching
    this function with it means TrainConfig.augment_pad=0 while
    DataConfig.augment_pad>0 — the crop never ran, and a silent bilinear
    downscale would train on blurrier, geometry-shifted images than the
    eval split. Legitimate device_resize ships are either non-square
    (CelebA 218x178) or comfortably larger than 2x; a square source
    below that should be host-resized instead."""
    x = _as_f32_image(x)
    h, w = x.shape[-3], x.shape[-2]
    if h == image_size and w == image_size:
        return x
    if h > image_size and w > image_size:
        if h == w and h < 2 * image_size:
            raise ValueError(
                f'square {h}x{h} train batch at under 2x the model '
                f'resolution {image_size}: this looks like a padded '
                f'augmentation loader (DataConfig.augment_pad='
                f'{(h - image_size) // 2}) feeding a step built with '
                f'TrainConfig.augment_pad=0 — set both pads to the same '
                f'value (train.py wires them from one --augment-pad '
                f'flag). If this really is a square full-res ship, '
                f'host-resize it instead of device_resize')
        from gltvae.ops.resize import resize_bilinear
        return resize_bilinear(x, image_size, image_size)
    raise ValueError(
        f'batch resolution {h}x{w} is neither the model resolution '
        f'{image_size}x{image_size} nor a full-res ship to downscale')
