"""Twin-trajectory training golden: the strongest data-free accuracy-parity
evidence. Both frameworks start from the reference's trained
params_1.0_learnable weights, consume IDENTICAL synthetic batches and
IDENTICAL injected noise, and run 50 optimizer steps covering a sup/unsup
interleave with the per-epoch gating-temperature decay
(gated_ccvae.py:302-311, 313-419). Per-step losses and the final parameter
trees must agree to f32 tolerance — this pins the optimizer (tf.keras Adam
vs our keras_adam), the RNG-per-step discipline, the stop-gradient
placement, and the schedule, composed over time.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gltvae.config import ModelConfig, TrainConfig
from gltvae.models.ccvae import CCVAE
from gltvae.train.state import create_train_state, keras_adam
from gltvae.train.steps import make_train_steps
from gltvae.utils.h5_import import load_reference_checkpoint
from tests.conftest import requires_tf

B, K, REG, LR = 2, 4, 0.2, 1e-4
N_STEPS, STEPS_PER_EPOCH = 50, 10
TEMP0, TEMP_DECAY = 0.7, 0.99

pytestmark = pytest.mark.slow


def _np(a):
    return np.asarray(jax.device_get(a), np.float32)


@requires_tf
def test_keras_adam_matches_tf_exactly():
    """Unit pin: our optax keras_adam == tf.keras.optimizers.Adam update
    for update, including the early-step epsilon placement where it differs
    most from optax.adam."""
    import tensorflow as tf
    rng = np.random.RandomState(0)
    w0 = rng.randn(7, 3).astype(np.float32)
    grads_seq = [rng.randn(7, 3).astype(np.float32) * 10.0 ** rng.randint(-6, 2)
                 for _ in range(12)]

    var = tf.Variable(w0)
    opt = tf.keras.optimizers.Adam(LR)
    for g in grads_seq:
        opt.apply_gradients([(tf.constant(g), var)])
    want = var.numpy()

    tx = keras_adam(LR)
    p = jnp.asarray(w0)
    s = tx.init(p)
    for g in grads_seq:
        u, s = tx.update(jnp.asarray(g), s)
        p = p + u
    np.testing.assert_allclose(_np(p), want, rtol=1e-6, atol=1e-7)


@requires_tf
def test_twin_training_trajectory(ref_param_dir):
    from tests.tf_twin import TFTwinLearner, reconstruct_noise

    model = CCVAE(ModelConfig())
    params0 = load_reference_checkpoint(ref_param_dir, 'best')
    cfg = TrainConfig(batch_size=B, lr=LR, classifier_mc_samples=K,
                      perc_supervision=0.5, gating_reg=REG)
    state = create_train_state(model, cfg, jax.random.key(0), params=params0)
    sup_step, unsup_step = make_train_steps(model, cfg, donate=False)

    twin = TFTwinLearner(jax.tree.map(_np, params0), lr=LR, gating_reg=REG)

    base_key = jax.random.wrap_key_data(state.rng)
    rng = np.random.RandomState(7)
    temp = TEMP0
    losses_jax, losses_tf = [], []
    for t in range(N_STEPS):
        x = rng.rand(B, 64, 64, 3).astype(np.float32)
        y = (rng.rand(B, 18) > 0.5).astype(np.float32)
        supervised = (t % 2 == 0)  # period-2 interleave (sup=0.5 schedule)

        # reconstruct the exact noise the jax step will draw:
        # steps.py next_rng = fold_in(base, step); ccvae.py splits 3-way
        noise = reconstruct_noise(jax.random.fold_in(base_key, t),
                                  supervised, B, K)

        step_fn = sup_step if supervised else unsup_step
        state, m = step_fn(state, jnp.asarray(x), jnp.asarray(y), temp)
        losses_jax.append(float(m['loss']))
        losses_tf.append(twin.train_step(x, y, noise, temp, supervised))

        if (t + 1) % STEPS_PER_EPOCH == 0:
            temp *= TEMP_DECAY  # learnable-gating decay, gated_ccvae:403-406

    losses_jax = np.asarray(losses_jax)
    losses_tf = np.asarray(losses_tf)
    np.testing.assert_allclose(losses_jax, losses_tf, rtol=5e-3,
                               err_msg='per-step loss trajectories diverged')

    # Final parameter trees track each other: the twin divergence must be a
    # small fraction of how far the parameters MOVED during training (f32
    # conv nondeterminism between TF-CPU and XLA accumulates ~1% of the
    # movement over 50 steps; a semantic divergence — wrong optimizer, bad
    # stop-grad, RNG drift — shows up at 100%+ of movement immediately).
    tf_params = twin.params_np()
    init_np = {}

    def flatten(prefix, tree, out):
        for k_, v in tree.items():
            if isinstance(v, dict):
                flatten(f'{prefix}{k_}/', v, out)
            else:
                out[f'{prefix}{k_}'] = _np(v)

    flatten('', params0, init_np)

    def check(path, ours):
        ours, theirs = _np(ours), tf_params[path]
        movement = np.linalg.norm(theirs - init_np[path])
        drift = np.linalg.norm(ours - theirs)
        floor = 1e-6 * max(np.linalg.norm(theirs), 1.0)
        assert drift <= max(0.1 * movement, floor), \
            (f'{path}: twin drift ‖Δ‖₂={drift:.3e} exceeds 10% of parameter '
             f'movement ‖θ_final−θ₀‖₂={movement:.3e}')

    check('mu', state.params['mu'])
    for k_ in state.params['classifier']:
        check(f'classifier/{k_}', state.params['classifier'][k_])
    for k_ in state.params['cond_prior']:
        check(f'cond_prior/{k_}', state.params['cond_prior'][k_])
    for layer, sub in state.params['encoder'].items():
        for k_, a in sub.items():
            check(f'encoder/{layer}/{k_}', a)
    for layer, sub in state.params['decoder'].items():
        for k_, a in sub.items():
            check(f'decoder/{layer}/{k_}', a)
