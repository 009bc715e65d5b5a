"""Golden pins for the FIXED gating modes against the reference's real
trained checkpoints (VERDICT r1 gap: fixed modes were only ever tested with
synthetic weights).

- params_1.0_fixed_one-one  + μ = I            (gated_ccvae.py:53-57)
- params_1.0_fixed_inferred + μ = data/gating_matrix_1.0.npy
                                               (gated_ccvae.py:48-52)

Both full ELBOs are pinned value-for-value against the TF twin with
identical injected noise, and a short twin TRAINING trajectory pins the
frozen-μ optimizer masking (reference: trainable=False tf.Variable;
ours: optax.multi_transform set_to_zero, train/state.py) composed with
Keras-Adam updates of everything else.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gltvae.config import ModelConfig, TrainConfig
from gltvae.models.ccvae import CCVAE, Temps
from gltvae.train.state import create_train_state
from gltvae.train.steps import make_train_steps
from gltvae.utils.h5_import import load_reference_checkpoint
from tests.conftest import requires_tf

B, K, TEMP, LR = 2, 4, 0.5, 1e-4

pytestmark = pytest.mark.slow

ONE_ONE_DIR = '/root/reference/models/params_1.0_fixed_one-one'
INFERRED_DIR = '/root/reference/models/params_1.0_fixed_inferred'
GATING_NPY = '/root/reference/data/gating_matrix_1.0.npy'


def _np(a):
    return np.asarray(jax.device_get(a), np.float32)


def _load(param_dir, mu):
    if not os.path.isdir(param_dir):
        pytest.skip(f'{param_dir} not available')
    return load_reference_checkpoint(param_dir, 'best', mu=mu)


@pytest.fixture(scope='module')
def one_one():
    cfg = ModelConfig(gate_type='fixed', gate_subtype='one-one')
    return CCVAE(cfg), _load(ONE_ONE_DIR, np.eye(18, dtype=np.float32))


@pytest.fixture(scope='module')
def inferred():
    if not os.path.exists(GATING_NPY):
        pytest.skip('reference gating matrix artifact unavailable')
    cfg = ModelConfig(gate_type='fixed', gate_subtype='inferred')
    return CCVAE(cfg), _load(INFERRED_DIR, np.load(GATING_NPY))


def _loss_golden(model, params, supervised, seed):
    """jax loss vs TF-twin loss, identical noise, fixed μ (gating_reg=0 —
    steps.py applies the L1 penalty only when μ is trainable)."""
    from tests.tf_twin import TFTwinLearner, reconstruct_noise

    rng = np.random.RandomState(seed)
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = (rng.rand(B, 18) > 0.5).astype(np.float32)
    key = jax.random.key(seed)
    temps = Temps(gating=jnp.float32(TEMP))
    if supervised:
        loss, _ = model.sup_loss(params, jnp.asarray(x), jnp.asarray(y),
                                 key, temps, gating_reg=0.0, k=K)
    else:
        loss, _ = model.unsup_loss(params, jnp.asarray(x), key, temps,
                                   gating_reg=0.0)

    twin = TFTwinLearner(jax.tree.map(_np, params), gating_reg=0.0,
                         train_mu=False)
    noise = reconstruct_noise(key, supervised, B, K)
    if supervised:
        want = float(twin.sup_loss(twin.tf.constant(x),
                                   twin.tf.constant(y), noise, TEMP))
    else:
        want = float(twin.unsup_loss(twin.tf.constant(x), noise, TEMP))
    np.testing.assert_allclose(float(loss), want, rtol=5e-4)


@requires_tf
def test_one_one_sup_loss_golden(one_one):
    _loss_golden(*one_one, supervised=True, seed=31)


@requires_tf
def test_one_one_unsup_loss_golden(one_one):
    _loss_golden(*one_one, supervised=False, seed=32)


@requires_tf
def test_inferred_sup_loss_golden(inferred):
    _loss_golden(*inferred, supervised=True, seed=33)


@requires_tf
def test_inferred_unsup_loss_golden(inferred):
    _loss_golden(*inferred, supervised=False, seed=34)


@requires_tf
def test_fixed_inferred_twin_trajectory(inferred):
    """10-step sup/unsup twin trajectory in the fixed-inferred mode: μ must
    stay EXACTLY at the reference gating matrix on both sides while every
    other parameter tracks the TF twin."""
    from tests.tf_twin import TFTwinLearner, reconstruct_noise

    model, params0 = inferred
    cfg = TrainConfig(batch_size=B, lr=LR, classifier_mc_samples=K,
                      perc_supervision=0.5, gating_reg=0.2)
    state = create_train_state(model, cfg, jax.random.key(0), params=params0)
    sup_step, unsup_step = make_train_steps(model, cfg, donate=False)
    twin = TFTwinLearner(jax.tree.map(_np, params0), lr=LR, gating_reg=0.0,
                         train_mu=False)

    base_key = jax.random.wrap_key_data(state.rng)
    rng = np.random.RandomState(5)
    for t in range(10):
        x = rng.rand(B, 64, 64, 3).astype(np.float32)
        y = (rng.rand(B, 18) > 0.5).astype(np.float32)
        supervised = (t % 2 == 0)
        noise = reconstruct_noise(jax.random.fold_in(base_key, t),
                                  supervised, B, K)
        step_fn = sup_step if supervised else unsup_step
        state, m = step_fn(state, jnp.asarray(x), jnp.asarray(y), TEMP)
        tf_loss = twin.train_step(x, y, noise, TEMP, supervised)
        np.testing.assert_allclose(float(m['loss']), tf_loss, rtol=2e-3,
                                   err_msg=f'step {t} loss diverged')

    # μ frozen bit-exactly on both sides
    np.testing.assert_array_equal(_np(state.params['mu']), _np(params0['mu']))
    np.testing.assert_array_equal(twin.params_np()['mu'], _np(params0['mu']))
    # everything else moved and tracks the twin
    tf_params = twin.params_np()
    moved = _np(state.params['classifier']['kernel'])
    assert np.abs(moved - _np(params0['classifier']['kernel'])).max() > 0
    np.testing.assert_allclose(moved, tf_params['classifier/kernel'],
                               rtol=5e-3, atol=1e-5)
