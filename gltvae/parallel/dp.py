"""Data-parallel train/eval steps over a device mesh.

Same pure loss functions as the single-chip path (gltvae.train.steps);
parallelism is pure annotation: batch sharded over the 'data' axis,
state replicated, jit emits one SPMD program with an ICI all-reduce for
the gradients. Global batch 4096 on a v5p-8 (BASELINE.json config 5) is
this module with batch_size=4096 on an 8-chip mesh: 512 images/chip.

RNG: each step folds the step counter into the state key (TrainState.
next_rng). The key is REPLICATED — every chip computes the same per-batch
key, but noise tensors are batch-sharded, so each chip materializes only
its own slice of the (identical global) noise. This keeps loss values
bit-identical to the single-chip run at the same global batch.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gltvae.config import TrainConfig
from gltvae.models.ccvae import CCVAE
from gltvae.parallel.mesh import (batch_sharding, replicated_sharding,
                                  stacked_batch_sharding)
from gltvae.train.state import TrainState
from gltvae.train import steps as _steps


def _multiprocess(mesh: Mesh) -> bool:
    """True when the mesh spans devices of more than one process (DCN
    multi-host): device_put cannot address remote shards, so arrays must
    be assembled from per-process local data."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


def shard_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Replicate the train state onto every chip of the mesh. On a
    multi-host mesh every process passes the same full values (they are —
    same seed, same init) and jax assembles the global replicated array."""
    repl = replicated_sharding(mesh)
    if _multiprocess(mesh):
        import numpy as np
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(
                repl, np.asarray(a)), state)
    return jax.device_put(state, repl)


def _place(batch, sharding, mesh: Mesh, batch_axis: int,
           local: bool = False):
    if not _multiprocess(mesh):
        return jax.device_put(batch, sharding)
    # Multi-host, two input conventions:
    # - local=False (replicate-then-slice): every process passes the
    #   IDENTICAL global batch (all processes run the same seeded loader);
    #   each keeps the slice its devices own and jax assembles the global
    #   array. Simple, but every host decodes N-x redundant data.
    # - local=True (host-sharded): each process passes ONLY its own 1/N
    #   rows (BatchLoader(shard=(pid, pc)) produces exactly these — the
    #   same contiguous slice of the same seed-coordinated global stream),
    #   so host decode work scales down with the process count.
    # Batch order within the global array follows mesh device order —
    # irrelevant for DP semantics (the loss mean is permutation-invariant).
    import numpy as np
    pc, pid = jax.process_count(), jax.process_index()

    def one(a):
        a = np.asarray(a)
        if local:
            return jax.make_array_from_process_local_data(sharding, a)
        if a.shape[batch_axis] % pc:
            raise ValueError(
                f'global batch dim {a.shape[batch_axis]} not divisible by '
                f'process_count {pc}: rows would be silently dropped')
        ls = a.shape[batch_axis] // pc
        idx = [slice(None)] * a.ndim
        idx[batch_axis] = slice(pid * ls, (pid + 1) * ls)
        return jax.make_array_from_process_local_data(sharding, a[tuple(idx)])

    return jax.tree.map(one, batch)


def shard_batch(batch, mesh: Mesh, local: bool = False):
    """Place a host batch onto the mesh, split along the leading dim.
    local=True: on a multi-host mesh, `batch` holds only THIS process's
    rows (a host-sharded loader's output) instead of the global batch."""
    return _place(batch, batch_sharding(mesh), mesh, batch_axis=0,
                  local=local)


def shard_stacked_batch(batch, mesh: Mesh, local: bool = False):
    """Place stacked [n_inner, B, ...] scan batches onto the mesh: the
    scan axis stays whole, B splits across 'data' (matches the
    in_shardings of the scan step functions — placing with plain
    shard_batch would trigger an on-device reshard at dispatch).
    local=True as in shard_batch (per-process rows on axis 1)."""
    return _place(batch, stacked_batch_sharding(mesh), mesh, batch_axis=1,
                  local=local)


def make_parallel_train_steps(model: CCVAE, train_cfg: TrainConfig,
                              mesh: Mesh,
                              donate: bool = True) -> Tuple[Callable, Callable]:
    """(sup_step, unsup_step) compiled for the mesh.

    in/out shardings: state replicated, batch sharded on 'data', metrics
    replicated. XLA turns the `jax.value_and_grad` mean-loss into a
    per-chip partial reduction + one psum over ICI — the TPU-native
    equivalent of a NCCL all-reduce, inserted by the compiler.
    """
    sup, unsup = _steps.make_train_steps(model, train_cfg, jit=False)
    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    kwargs = dict(
        in_shardings=(repl, bsh, bsh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
    return jax.jit(sup, **kwargs), jax.jit(unsup, **kwargs)


def make_parallel_scan_train_steps(model: CCVAE, train_cfg: TrainConfig,
                                   mesh: Mesh,
                                   donate: bool = True
                                   ) -> Tuple[Callable, Callable]:
    """Scan variant on the mesh: stacked [n_inner, B, ...] batches sharded
    over 'data' on axis 1; n_inner steps run per dispatch with the
    gradient psum inside the scan body (one compiled SPMD program)."""
    from gltvae.train.steps import make_scan_train_steps
    sup, unsup = make_scan_train_steps(model, train_cfg, jit=False)
    repl = replicated_sharding(mesh)
    bsh = NamedSharding(mesh, P(None, 'data'))
    kwargs = dict(
        in_shardings=(repl, bsh, bsh, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
    return jax.jit(sup, **kwargs), jax.jit(unsup, **kwargs)


def make_parallel_mixed_scan_train_step(model: CCVAE,
                                        train_cfg: TrainConfig,
                                        mesh: Mesh,
                                        donate: bool = True) -> Callable:
    """Mixed (semi-supervised interleave) scan step on the mesh: stacked
    batches sharded P(None, 'data'), the per-step sup mask replicated.
    The lax.cond branches carry identical gradient-psum patterns, so the
    SPMD partitioner emits one collective schedule for both."""
    fn = _steps.make_mixed_scan_train_step(model, train_cfg, jit=False)
    repl = replicated_sharding(mesh)
    bsh = stacked_batch_sharding(mesh)
    return jax.jit(fn, in_shardings=(repl, bsh, bsh, repl, repl),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,) if donate else ())


def make_parallel_scan_elbo_step(model: CCVAE, train_cfg: TrainConfig,
                                 mesh: Mesh) -> Callable:
    """Scan test-ELBO meter on the mesh (batches sharded, keys/params
    replicated, per-batch ELBOs replicated back)."""
    fn = _steps.make_scan_elbo_step(model, train_cfg, jit=False)
    repl = replicated_sharding(mesh)
    bsh = stacked_batch_sharding(mesh)
    return jax.jit(fn, in_shardings=(repl, bsh, repl, repl),
                   out_shardings=repl)


def make_parallel_elbo_step(model: CCVAE, train_cfg: TrainConfig,
                            mesh: Mesh) -> Callable:
    """Per-batch test-ELBO meter on the mesh."""
    fn = _steps.make_elbo_eval_step(model, train_cfg, jit=False)
    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(fn, in_shardings=(repl, bsh, repl, repl),
                   out_shardings=repl)


def make_parallel_eval_step(model: CCVAE, train_cfg: TrainConfig,
                            mesh: Mesh) -> Callable:
    ev = _steps.make_eval_step(model, train_cfg, jit=False)
    repl = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(ev, in_shardings=(repl, bsh, bsh, repl, repl),
                   out_shardings=repl)


def resident_rows_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a device-RESIDENT split's rows: split over 'data' so
    per-device HBM holds only N/D rows (the resident byte budget scales
    with the mesh instead of replicating the corpus D times)."""
    return NamedSharding(mesh, P('data'))


def place_resident_split(x_packed, labels, mesh: Mesh):
    """Ship a resident split onto the mesh ONCE: rows sharded over
    'data' (padded to the device count with zero rows — loader indices
    never reference the padding), labels replicated (small; the per-batch
    label gather re-slices them anyway).

    Works on multi-host meshes too via make_array_from_callback — every
    process passes the full split (host-sharded loaders are excluded
    upstream: their fetch() only serves this process's rows)."""
    import numpy as np
    d = mesh.devices.size
    pad = (-x_packed.shape[0]) % d
    if pad:
        x_packed = np.concatenate(
            [x_packed, np.zeros((pad,) + x_packed.shape[1:],
                                x_packed.dtype)])
    rows = resident_rows_sharding(mesh)
    repl = replicated_sharding(mesh)
    if _multiprocess(mesh):
        x_dev = jax.make_array_from_callback(
            x_packed.shape, rows, lambda idx: x_packed[idx])
        y_dev = jax.make_array_from_callback(
            labels.shape, repl, lambda idx: labels[idx])
        return x_dev, y_dev
    return jax.device_put(x_packed, rows), jax.device_put(labels, repl)


def make_parallel_resident_eval_step(model: CCVAE, train_cfg: TrainConfig,
                                     mesh: Mesh,
                                     image_shape=None) -> Callable:
    """Device-resident eval on the mesh: the split's rows live SHARDED
    over 'data'; each eval is one dispatch scanning the epoch's batches.
    The partitioner hoists the loop-invariant operand all-gather out of
    the scan (split bytes cross ICI once per dispatch — at ICI bandwidth
    that is orders cheaper than the per-epoch host->device re-ship the
    chunked mesh path pays), and the with_sharding_constraint inside the
    gather immediately re-slices each batch to P('data'), so every op
    downstream runs the same DP schedule as make_parallel_eval_step —
    results bit-identical to the chunked path (tests/test_resident_eval
    .py::test_mesh_resident_*)."""
    fn = _steps.make_resident_eval_step(
        model, train_cfg, image_shape=image_shape, jit=False,
        constrain=batch_sharding(mesh))
    repl = replicated_sharding(mesh)
    rows = resident_rows_sharding(mesh)
    return jax.jit(fn, in_shardings=(repl, rows, repl, repl, repl, repl),
                   out_shardings=(repl, repl))


def make_parallel_resident_elbo_step(model: CCVAE, train_cfg: TrainConfig,
                                     mesh: Mesh,
                                     image_shape=None) -> Callable:
    """Mesh twin of make_resident_elbo_step (see
    make_parallel_resident_eval_step for the sharding story)."""
    fn = _steps.make_resident_elbo_step(
        model, train_cfg, image_shape=image_shape, jit=False,
        constrain=batch_sharding(mesh))
    repl = replicated_sharding(mesh)
    rows = resident_rows_sharding(mesh)
    return jax.jit(fn, in_shardings=(repl, rows, repl, repl, repl),
                   out_shardings=(repl, repl))


def make_parallel_resident_scan_train_steps(
        model: CCVAE, train_cfg: TrainConfig, mesh: Mesh,
        image_shape=None, donate: bool = True) -> Tuple[Callable, Callable]:
    """Device-resident TRAINING on the mesh: the train split's rows live
    SHARDED over 'data' (place_resident_split), each dispatch scans n
    inner steps whose row gathers the partitioner materializes from a
    hoisted loop-invariant all-gather; the with_sharding_constraint
    inside the gather re-slices every batch to P('data'), so the loss,
    grads, and psum run exactly the chunked mesh schedule
    (make_parallel_scan_train_steps). Params stay bit-identical to the
    single-device resident run and to the host-shipped mesh run
    (tests/test_resident_train.py::test_mesh_resident_*)."""
    sup, unsup = _steps.make_resident_scan_train_steps(
        model, train_cfg, image_shape=image_shape, jit=False,
        constrain=batch_sharding(mesh))
    repl = replicated_sharding(mesh)
    rows = resident_rows_sharding(mesh)
    kwargs = dict(in_shardings=(repl, rows, repl, repl, repl),
                  out_shardings=(repl, repl),
                  donate_argnums=(0,) if donate else ())
    return jax.jit(sup, **kwargs), jax.jit(unsup, **kwargs)


def make_parallel_resident_mixed_scan_train_step(
        model: CCVAE, train_cfg: TrainConfig, mesh: Mesh,
        image_shape=None, donate: bool = True) -> Callable:
    """Semi-supervised mesh twin (see
    make_parallel_resident_scan_train_steps): both resident splits'
    rows sharded over 'data', the per-step sup mask replicated."""
    fn = _steps.make_resident_mixed_scan_train_step(
        model, train_cfg, image_shape=image_shape, jit=False,
        constrain=batch_sharding(mesh))
    repl = replicated_sharding(mesh)
    rows = resident_rows_sharding(mesh)
    return jax.jit(
        fn,
        in_shardings=(repl, rows, repl, rows, repl, repl, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else ())


def make_parallel_scan_eval_step(model: CCVAE, train_cfg: TrainConfig,
                                 mesh: Mesh) -> Callable:
    """Scan-eval on the mesh: stacked batches sharded P(None, 'data'),
    stacked keys replicated, per-batch accuracies replicated back."""
    ev = _steps.make_scan_eval_step(model, train_cfg, jit=False)
    repl = replicated_sharding(mesh)
    bsh = stacked_batch_sharding(mesh)
    return jax.jit(ev, in_shardings=(repl, bsh, bsh, repl, repl),
                   out_shardings=repl)
