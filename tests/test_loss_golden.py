"""Full-ELBO golden test: the complete supervised and unsupervised loss
values, computed with the reference's trained weights, must match an
independent TensorFlow evaluation of the reference's loss formulas
(gated_ccvae.py:184-300) with the SAME noise realizations.

Noise is drawn once from our explicit-key samplers and the VALUES are fed
to the TF side, so the comparison isolates the loss composition (term
signs, reductions, importance weight, k-sample marginal) from RNG
differences.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from gltvae.config import ModelConfig
from gltvae.models.ccvae import CCVAE, Temps
from gltvae.ops.sampling import sample_normal, sample_gating
from gltvae.utils.h5_import import load_reference_checkpoint
from tests.conftest import requires_tf

B, K, TEMP = 4, 8, 0.7


@pytest.fixture(scope='module')
def setup(ref_param_dir, rng):
    model = CCVAE(ModelConfig())
    params = load_reference_checkpoint(ref_param_dir, 'best')
    x = jnp.asarray(rng.rand(B, 64, 64, 3), jnp.float32)
    y = jnp.asarray((rng.rand(B, 18) > 0.5).astype(np.float32))
    return model, params, x, y


def _np(a):
    return np.asarray(jax.device_get(a), np.float64)


def _tf_loss_from_pieces(model, params, x, y, z, c, eps_k, y_unsup=None):
    """Reference loss formulas evaluated with TF ops in float64, taking
    the stochastic draws (z, c, eps_k, sampled y) as given."""
    import tensorflow as tf

    x64 = tf.constant(_np(x))
    z64 = tf.constant(_np(z))
    c64 = tf.constant(_np(c))

    # encoder outputs via OUR encoder (itself golden-tested vs TF):
    locs, scales = model.encode(params, x)
    locs64, scales64 = tf.constant(_np(locs)), tf.constant(_np(scales))

    zc = z64[:, 27:]

    w_clf = {k: _np(v) for k, v in params['classifier'].items()}
    logits = tf.reduce_sum(zc[:, :, None] * c64[None] * w_clf['kernel'][None],
                           axis=1) + w_clf['bias']

    y_obs = tf.constant(_np(y if y_unsup is None else y_unsup))

    def bern_lp(lgts, lbl):
        return -tf.math.softplus((1.0 - 2.0 * lbl) * lgts)

    log_qy_zc = tf.reduce_sum(bern_lp(logits, y_obs), axis=-1)
    log_py = tf.cast(18.0 * np.log(0.5), tf.float64) \
        * tf.ones([B], tf.float64)

    # conditional prior
    cp = {k: _np(v) for k, v in params['cond_prior'].items()}
    ct = tf.transpose(c64)
    prior_locs = y_obs @ (ct * cp['loc_true']) \
        + (1.0 - y_obs) @ (ct * cp['loc_false'])
    prior_scale_raw = y_obs @ (ct * cp['scale_true']) \
        + (1.0 - y_obs) @ (ct * cp['scale_false'])
    prior_scales = tf.clip_by_value(tf.math.softplus(prior_scale_raw),
                                    1e-3, 1e3)
    prior_locs = tf.concat([tf.zeros([B, 27], tf.float64), prior_locs], -1)
    prior_scales = tf.concat([tf.ones([B, 27], tf.float64), prior_scales],
                             -1)
    kl = tf.reduce_sum(
        tf.math.log(prior_scales / scales64)
        + (scales64 ** 2 + (locs64 - prior_locs) ** 2)
        / (2.0 * prior_scales ** 2) - 0.5, axis=-1)

    # reconstruction via OUR decoder (golden-tested), Laplace LL in TF
    recon = tf.constant(_np(model.decode(params, z)))
    log_pxz = tf.reduce_sum(-tf.abs(x64 - recon) - np.log(2.0),
                            axis=[1, 2, 3])

    if y_unsup is not None:  # unsupervised ELBO (gated_ccvae.py:225)
        elbo = log_pxz + log_py - kl - log_qy_zc
        return float(tf.reduce_mean(-elbo))

    # supervised: k-sample marginal with the given eps_k
    z_k = locs64[None] + scales64[None] * tf.constant(_np(eps_k))
    zc_k = tf.reshape(z_k[:, :, 27:], [-1, 18])
    logits_k = tf.reduce_sum(
        zc_k[:, :, None] * c64[None] * w_clf['kernel'][None], axis=1) \
        + w_clf['bias']
    logits_k = tf.reshape(logits_k, [K, B, 18])
    lq_k = tf.reduce_sum(bern_lp(logits_k, y_obs[None]), axis=-1)
    log_qy_x = tf.reduce_logsumexp(lq_k, axis=0) - np.log(float(K))

    w = tf.exp(log_qy_zc - log_qy_x)  # value-equal to the detached form
    elbo = w * (log_pxz - kl - log_qy_zc) + log_py + log_qy_x
    return float(tf.reduce_mean(-elbo))


@requires_tf
def test_sup_loss_golden(setup):
    model, params, x, y = setup
    key = jax.random.key(11)
    temps = Temps(gating=jnp.float32(TEMP))
    loss, aux = model.sup_loss(params, x, y, key, temps, gating_reg=0.0,
                               k=K)

    # reconstruct the exact same draws from the key splits (ccvae.py)
    key_z, key_gate, key_k = jax.random.split(key, 3)
    locs, scales = model.encode(params, x)
    z = sample_normal(key_z, locs, scales)
    c = sample_gating(key_gate, params['mu'], jnp.float32(TEMP))
    eps_k = jax.random.normal(key_k, (K, B, 45), dtype=jnp.float32)

    want = _tf_loss_from_pieces(model, params, x, y, z, c, eps_k)
    np.testing.assert_allclose(float(loss), want, rtol=5e-4)


@requires_tf
def test_unsup_loss_golden(setup):
    model, params, x, y = setup
    key = jax.random.key(12)
    temps = Temps(gating=jnp.float32(TEMP))
    loss, aux = model.unsup_loss(params, x, key, temps, gating_reg=0.0)

    key_z, key_gate, key_y = jax.random.split(key, 3)
    locs, scales = model.encode(params, x)
    z = sample_normal(key_z, locs, scales)
    c = sample_gating(key_gate, params['mu'], jnp.float32(TEMP))
    # reconstruct the sampled y exactly as unsup_loss does
    from gltvae.ops.distributions import bernoulli_sample
    _, zc = model.split_z(z)
    logits = model.classify(params, zc, c)
    y_sampled = bernoulli_sample(key_y, logits)

    want = _tf_loss_from_pieces(model, params, x, y, z, c, None,
                                y_unsup=y_sampled)
    np.testing.assert_allclose(float(loss), want, rtol=5e-4)
