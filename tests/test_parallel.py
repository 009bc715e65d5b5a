"""Data-parallel mesh tests on the 8-virtual-device CPU platform
(conftest sets xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gltvae.config import ModelConfig, TrainConfig
from gltvae.models.ccvae import CCVAE
from gltvae.parallel.mesh import create_mesh, batch_sharding
from gltvae.parallel.dp import (make_parallel_train_steps, shard_state,
                                shard_batch, make_parallel_eval_step)
from gltvae.train.state import create_train_state
from gltvae.train.steps import make_train_steps

MODEL = ModelConfig(image_size=16, z_dim=8, y_dim=4,
                    enc_features=(8, 8), enc_hidden=16,
                    dec_features=(16, 8))
TRAIN = TrainConfig(batch_size=16, lr=1e-3, classifier_mc_samples=4)


def mu_init():
    m = np.full((4, 4), 0.5, np.float32)
    np.fill_diagonal(m, 1.0)
    return m


def batch(n=16, seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.array(rng.randint(0, 256, (n, 16, 16, 3), dtype=np.uint8)),
            jnp.array((rng.rand(n, 4) > 0.5).astype(np.float32)))


@pytest.fixture(scope='module')
def mesh():
    assert len(jax.devices()) == 8, 'conftest must force 8 CPU devices'
    return create_mesh()


def test_mesh_has_8_devices(mesh):
    assert mesh.devices.size == 8


def test_batch_is_sharded(mesh):
    x, _ = batch(16)
    xs = shard_batch(x, mesh)
    # each device holds 16/8 = 2 images
    assert xs.sharding.num_devices == 8
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(2, 16, 16, 3)}


def test_parallel_step_runs_and_stays_sharded(mesh):
    model = CCVAE(MODEL)
    state = create_train_state(model, TRAIN, jax.random.key(0),
                               mu_init=mu_init())
    state = shard_state(state, mesh)
    sup, unsup = make_parallel_train_steps(model, TRAIN, mesh, donate=False)
    x, y = shard_batch(batch(), mesh)
    new_state, m = sup(state, x, y, 1.0)
    assert np.isfinite(float(m['loss']))
    new_state, m = unsup(new_state, x, y, 1.0)
    assert np.isfinite(float(m['loss']))
    # params remain replicated after the update
    leaf = jax.tree.leaves(new_state.params['encoder'])[0]
    assert leaf.sharding.is_fully_replicated


def test_parallel_matches_single_device_gradients(mesh):
    """The mesh run must be numerically equivalent to the single-device
    run on the same global batch (same replicated key -> same global
    noise -> same loss and same updated params)."""
    model = CCVAE(MODEL)
    state = create_train_state(model, TRAIN, jax.random.key(0),
                               mu_init=mu_init())
    x, y = batch()

    sup_1, _ = make_train_steps(model, TRAIN, donate=False)
    s_single, m_single = sup_1(state, x, y, 1.0)

    sup_p, _ = make_parallel_train_steps(model, TRAIN, mesh, donate=False)
    s_par, m_par = sup_p(shard_state(state, mesh),
                         *shard_batch((x, y), mesh), 1.0)

    np.testing.assert_allclose(float(m_single['loss']),
                               float(m_par['loss']), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_single.params),
                    jax.tree.leaves(s_par.params)):
        np.testing.assert_allclose(np.array(a), np.array(b), rtol=2e-4,
                                   atol=1e-6)


def test_parallel_eval(mesh):
    model = CCVAE(MODEL)
    state = create_train_state(model, TRAIN, jax.random.key(0),
                               mu_init=mu_init())
    state = shard_state(state, mesh)
    ev = make_parallel_eval_step(model, TRAIN, mesh)
    x, y = shard_batch(batch(), mesh)
    acc = ev(state.params, x, y, jax.random.key(1), 0.3)
    assert 0.0 <= float(acc) <= 1.0


def test_global_batch_4096_step_executes(mesh):
    """BASELINE config 5: EXECUTE (not just AOT-compile) one global-batch
    4096 sup step over the 8 devices — 512/device — and assert the update
    is finite and stays sharded (VERDICT r3 item 3; tiny 16x16 model keeps
    the CPU-mesh run to seconds)."""
    model = CCVAE(MODEL)
    cfg = TrainConfig(batch_size=4096, classifier_mc_samples=4)
    state = create_train_state(model, cfg, jax.random.key(0),
                               mu_init=mu_init())
    sup, _ = make_parallel_train_steps(model, cfg, mesh, donate=False)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 256, (4096, 16, 16, 3)), jnp.uint8)
    y = jnp.asarray((rng.rand(4096, 4) > 0.5).astype(np.float32))
    state2, metrics = sup(shard_state(state, mesh),
                          *shard_batch((x, y), mesh), 1.0)
    assert np.isfinite(float(metrics['loss']))
    assert len(state2.params['mu'].sharding.device_set) == 8
    # params actually moved (the step did compute, not a no-op)
    delta = np.abs(np.asarray(state2.params['mu'])
                   - np.asarray(state.params['mu'])).max()
    assert delta > 0


def test_parallel_step_with_rbg_prng(mesh):
    """--prng rbg on the mesh: RngBitGenerator is the partitionable
    TPU-fast generator, so the sharded step must compile and run with a
    4-word key threaded through state. rbg draws are not guaranteed
    sharding-invariant (unlike threefry), so this asserts execution and
    replication, not bit-equality with the single-device run."""
    from gltvae.train.state import make_key
    from gltvae.parallel.dp import (make_parallel_mixed_scan_train_step,
                                    shard_stacked_batch)
    model = CCVAE(MODEL)
    cfg = TrainConfig(batch_size=16, lr=1e-3, classifier_mc_samples=4,
                      prng_impl='rbg')
    state = create_train_state(model, cfg, make_key(0, 'rbg'),
                               mu_init=mu_init())
    assert state.rng.shape[-1] == 4
    state = shard_state(state, mesh)
    sup, unsup = make_parallel_train_steps(model, cfg, mesh, donate=False)
    x, y = shard_batch(batch(), mesh)
    state, m = sup(state, x, y, 1.0)
    assert np.isfinite(float(m['loss']))
    state, m = unsup(state, x, y, 1.0)
    assert np.isfinite(float(m['loss']))
    leaf = jax.tree.leaves(state.params['encoder'])[0]
    assert leaf.sharding.is_fully_replicated

    # the semi-sup mixed lax.cond scan — the flagship sup=0.2/0.5
    # dispatch — must also carry the rbg key through its scan body
    mixed = make_parallel_mixed_scan_train_step(model, cfg, mesh,
                                                donate=False)
    rng = np.random.RandomState(3)
    xs = jnp.asarray(rng.randint(0, 256, (4, 16, 16, 16, 3)), jnp.uint8)
    ys = jnp.asarray((rng.rand(4, 16, 4) > 0.5).astype(np.float32))
    xs, ys = shard_stacked_batch((xs, ys), mesh)
    mask = np.asarray([True, False, False, True])
    state, ms = mixed(state, xs, ys, mask, 1.0)
    assert np.isfinite(float(ms['loss'][-1]))
