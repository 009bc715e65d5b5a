"""Device mesh layer: the TPU-native slot the reference leaves empty.

The reference is single-process/single-device TF with no distribution
backend at all (SURVEY.md §2: no NCCL/MPI/tf.distribute). Here scaling is
expressed the JAX way: a 1-D `Mesh` over the chips of a slice (gradient
all-reduce rides ICI), extended to multi-host over DCN via
`jax.distributed.initialize`. XLA inserts the psum — there is no hand-rolled
collective anywhere in the framework; for a DP-only workload XLA's own
all-reduce is already the right schedule.

The model is ~1M params (BASELINE.md), so DP over the batch is the only
profitable axis; TP/PP/EP/SP are declared out of scope (SURVEY.md §2) —
the model always fits in one chip's VMEM-adjacent working set.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def create_mesh(devices: Optional[Sequence[jax.Device]] = None,
                axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def stacked_batch_sharding(mesh: Mesh,
                           axis_name: str = DATA_AXIS) -> NamedSharding:
    """For [n_inner, B, ...] scan-stacked batches: keep the scan axis
    whole, shard the batch axis across the mesh."""
    return NamedSharding(mesh, P(None, axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params / opt state / scalars)."""
    return NamedSharding(mesh, P())


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host (DCN) bring-up. On a single host this is a no-op; on a
    multi-host slice call once per process before building the mesh
    (jax.distributed handles the TPU coordination service)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
