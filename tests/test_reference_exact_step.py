"""Bit-level parity against the ACTUAL reference program (not the TF
twin): same weights, same injected noise -> the supervised loss and
gradients must match to float tolerance.

This is the top rung of the golden ladder (docs/PARITY.md §7): the
earlier goldens compare against a re-derived TF twin, which could in
principle share a misreading of the reference; this test executes
/root/reference/gated_ccvae.py's own Learner.sup_loss (eager, samplers
monkeypatched with queued draws) with fresh Keras-3 init weights copied
into a gltvae pytree. Round-3 head-to-head context: docs/HEAD2HEAD.md.
"""

import os

import numpy as np
import pytest

REFERENCE = '/root/reference'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason='reference not mounted')


def test_sup_loss_and_grads_match_reference_program(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)   # the reference writes ./logs on import
    import jax
    import jax.numpy as jnp
    import tensorflow as tf
    from tools.diag_ref_compare import (build_reference_learner,
                                        ref_weights_to_pytree,
                                        NoiseInjector)
    from gltvae.config import ModelConfig, TrainConfig
    from gltvae.models.ccvae import CCVAE, Temps
    from tests.tf_twin import reconstruct_noise

    B, K = 4, 100   # K=100 is the reference classifier_loss default
    mu0 = np.eye(18, dtype=np.float32)
    learner = build_reference_learner('fixed', 'one-one', mu_init=mu0,
                                      workdir=None)
    params = ref_weights_to_pytree(learner)

    model_cfg = ModelConfig(gate_type='fixed', gate_subtype='one-one')
    model = CCVAE(model_cfg)
    temp = TrainConfig().gating_temp_for(model_cfg)     # 0.3 fixed

    rng = np.random.RandomState(0)
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = (rng.rand(B, 18) > 0.5).astype(np.float32)
    key = jax.random.key(123)
    noise = reconstruct_noise(key, True, B, K)

    inj = NoiseInjector(learner.model)
    inj.load(noise)
    with tf.GradientTape() as tape:
        ref_loss, _ = learner.sup_loss(tf.constant(x), tf.constant(y))
    ref_grads = tape.gradient(ref_loss, learner.model.trainable_variables)
    ref_gnorm = float(tf.linalg.global_norm(
        [g for g in ref_grads if g is not None]))

    params_j = jax.tree.map(jnp.asarray, params)
    (our_loss, _), our_grads = jax.value_and_grad(
        model.sup_loss, has_aux=True)(
            params_j, jnp.asarray(x), jnp.asarray(y), key,
            Temps(gating=jnp.float32(temp)), gating_reg=0.0, k=K)
    g = dict(our_grads)
    g['mu'] = jax.tree.map(jnp.zeros_like, g['mu'])   # μ non-trainable
    our_gnorm = float(jnp.sqrt(sum(
        jnp.sum(v * v) for v in jax.tree.leaves(g))))

    np.testing.assert_allclose(float(our_loss), float(ref_loss),
                               rtol=1e-5)
    np.testing.assert_allclose(our_gnorm, ref_gnorm, rtol=1e-4)

    # the classifier kernel gradient, element for element (pins the
    # stop-gradient numerator + importance-weight plumbing)
    for v, gr in zip(learner.model.trainable_variables, ref_grads):
        if gr is not None and 'kernel' in v.path and \
                tuple(v.shape) == (18, 18) and \
                np.allclose(v.numpy(), params['classifier']['kernel']):
            np.testing.assert_allclose(
                np.asarray(our_grads['classifier']['kernel']), gr.numpy(),
                rtol=5e-3, atol=2e-3)
            break
    else:
        pytest.fail('classifier kernel variable not found')


def test_h5_export_loads_through_reference_load_model(tmp_path,
                                                      monkeypatch):
    """gltvae -> reference interchange on MODERN Keras: our legacy-format
    h5 export must load through the reference's own Learner.load_model
    (gated_ccvae.py:146-165; Keras 3 still reads the Keras-2 h5 weight
    layout) and reproduce our forward pass."""
    monkeypatch.chdir(tmp_path)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tools.diag_ref_compare import build_reference_learner
    from gltvae.config import ModelConfig
    from gltvae.models.ccvae import CCVAE
    from gltvae.utils.h5_export import export_reference_checkpoint

    model = CCVAE(ModelConfig())
    mu = np.eye(18, dtype=np.float32)
    params = model.init(jax.random.key(3), mu_init=mu)
    export_reference_checkpoint(params, str(tmp_path / 'exp'), 'best')

    learner = build_reference_learner('fixed', 'one-one', mu_init=mu,
                                      workdir=None)
    learner.load_model(str(tmp_path / 'exp'), 'best')

    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    locs_tf, scale_tf = learner.model.encoder(x)
    locs_j, scale_j = model.encode(jax.tree.map(jnp.asarray, params),
                                   jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(locs_j), locs_tf.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(scale_j), scale_tf.numpy(),
                               atol=1e-5)
    recon_tf = learner.model.decoder(np.ones((1, 45), np.float32))
    recon_j = model.decode(jax.tree.map(jnp.asarray, params),
                           jnp.ones((1, 45), jnp.float32))
    np.testing.assert_allclose(np.asarray(recon_j), recon_tf.numpy(),
                               atol=1e-5)
