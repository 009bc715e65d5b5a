"""Explicit shard_map+psum DP vs the annotation-based path: same model,
same data, statistically equivalent updates (bit-equality is not expected:
the two paths draw per-shard vs global noise and reduce in different
orders)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gltvae.config import ModelConfig, TrainConfig
from gltvae.models.ccvae import CCVAE
from gltvae.parallel.mesh import create_mesh
from gltvae.parallel.dp import shard_state, shard_batch
from gltvae.parallel.shardmap import make_shardmap_train_steps

MODEL = ModelConfig(image_size=16, z_dim=8, y_dim=4,
                    enc_features=(8, 8), enc_hidden=16,
                    dec_features=(16, 8))
TRAIN = TrainConfig(batch_size=16, lr=1e-3, classifier_mc_samples=4)


def mu_init():
    m = np.full((4, 4), 0.5, np.float32)
    np.fill_diagonal(m, 1.0)
    return m


def batch(n=16):
    rng = np.random.RandomState(0)
    return (jnp.array(rng.randint(0, 256, (n, 16, 16, 3), dtype=np.uint8)),
            jnp.array((rng.rand(n, 4) > 0.5).astype(np.float32)))


@pytest.fixture(scope='module')
def mesh():
    return create_mesh()


def test_shardmap_step_runs(mesh):
    from gltvae.train.state import create_train_state
    model = CCVAE(MODEL)
    state = shard_state(create_train_state(model, TRAIN, jax.random.key(0),
                                           mu_init=mu_init()), mesh)
    sup, unsup = make_shardmap_train_steps(model, TRAIN, mesh, donate=False)
    x, y = shard_batch(batch(), mesh)
    s1, m1 = sup(state, x, y, 1.0)
    assert np.isfinite(float(m1['loss']))
    s2, m2 = unsup(s1, x, y, 1.0)
    assert np.isfinite(float(m2['loss']))
    assert int(s2.step) == 2
    # updated params replicated and changed
    leaf = jax.tree.leaves(s2.params['encoder'])[0]
    assert leaf.sharding.is_fully_replicated


def test_shardmap_close_to_annotation_path(mesh):
    """Both DP formulations take a step from the same state on the same
    global batch; the parameter updates must agree closely (same gradient
    in expectation; different noise partitioning -> small stochastic
    difference, but identical sign/scale of movement)."""
    from gltvae.train.state import create_train_state
    from gltvae.parallel.dp import make_parallel_train_steps
    model = CCVAE(MODEL)
    state0 = create_train_state(model, TRAIN, jax.random.key(0),
                                mu_init=mu_init())
    x, y = batch()

    sup_a, _ = make_parallel_train_steps(model, TRAIN, mesh, donate=False)
    s_a, m_a = sup_a(shard_state(state0, mesh), *shard_batch((x, y), mesh),
                     1.0)
    sup_s, _ = make_shardmap_train_steps(model, TRAIN, mesh, donate=False)
    s_s, m_s = sup_s(shard_state(state0, mesh), *shard_batch((x, y), mesh),
                     1.0)

    # losses within stochastic variation of each other
    assert abs(float(m_a['loss']) - float(m_s['loss'])) \
        / abs(float(m_a['loss'])) < 0.05
    # Adam first-step updates are +-lr-scaled; trajectories comparable
    for a, b in zip(jax.tree.leaves(s_a.params),
                    jax.tree.leaves(s_s.params)):
        da = np.abs(np.array(a) - np.array(b)).max()
        assert da <= 2 * TRAIN.lr + 1e-6
