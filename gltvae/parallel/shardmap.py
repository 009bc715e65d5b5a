"""Explicit-collective data parallelism via shard_map + psum.

The canonical path (gltvae.parallel.dp) lets XLA's SPMD partitioner insert
the gradient all-reduce from sharding annotations. This module is the
explicit formulation of the same program: each device computes the loss
and gradients on its batch shard, then `jax.lax.psum` averages them over
the 'data' axis — the hand-written form of the collective, useful when
you need manual control of what crosses ICI (e.g. to overlap or quantize
the all-reduce later).

Numerically this differs from the annotation path only in reduction
order: the per-device mean-loss is over B/n samples, psum-averaged —
identical in expectation, bit-different in f32. Equivalence is tested to
~1e-5 in tests/test_shardmap.py.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gltvae.config import TrainConfig
from gltvae.models.ccvae import CCVAE, Temps
from gltvae.train.state import TrainState, make_optimizer
from gltvae.train.steps import _as_f32_image
from gltvae.parallel.mesh import DATA_AXIS


def make_shardmap_train_steps(model: CCVAE, train_cfg: TrainConfig,
                              mesh: Mesh,
                              donate: bool = True) -> Tuple[Callable, Callable]:
    """(sup_step, unsup_step) with explicit psum gradient averaging."""
    tx = make_optimizer(model.cfg, train_cfg)
    gating_reg = (train_cfg.gating_reg if model.cfg.mu_trainable else 0.0)
    k = train_cfg.classifier_mc_samples

    def make(loss_kind: str):
        def per_device(state: TrainState, x, y, gating_temp):
            # x, y are the LOCAL shard; state is replicated.
            x = _as_f32_image(x)
            key = state.next_rng()  # replicated key; see note below
            # fold in the device index so each shard draws independent
            # noise (the annotation path shards one global noise tensor
            # instead — both are valid DP samplings; this one is the
            # classic per-replica-RNG scheme)
            key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
            temps = Temps(gating=jnp.asarray(gating_temp, jnp.float32))

            if loss_kind == 'sup':
                def loss_fn(p):
                    return model.sup_loss(p, x, y.astype(jnp.float32), key,
                                          temps, gating_reg=gating_reg, k=k)
            else:
                def loss_fn(p):
                    return model.unsup_loss(p, x, key, temps,
                                            gating_reg=gating_reg)

            (loss, aux), grads = jax.value_and_grad(loss_fn,
                                                    has_aux=True)(
                state.params)
            # THE collective: average grads (and loss) over the mesh.
            grads = jax.lax.pmean(grads, DATA_AXIS)
            loss = jax.lax.pmean(loss, DATA_AXIS)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            new_state = state.replace(step=state.step + 1, params=params,
                                      opt_state=opt_state)
            metrics = {'loss': loss,
                       'elbo': jax.lax.pmean(aux.elbo, DATA_AXIS),
                       'c_nan': jnp.any(jnp.isnan(aux.gates))}
            return new_state, metrics

        smapped = shard_map(
            per_device, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(smapped, donate_argnums=(0,) if donate else ())

    return make('sup'), make('unsup')
