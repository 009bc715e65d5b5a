"""Gradient-level golden test: d(loss)/d(params) of the FULL supervised
ELBO must match a TensorFlow GradientTape over an independently-built TF
graph of the reference's formulas (gated_ccvae.py:234-300), with the
reference's trained weights and identical injected noise.

This pins what value-level tests cannot: the stop-gradient placement in
the importance weight (z detached in the numerator only), the gradient
routes through the BinConcrete gates and clip boundaries (μ sits exactly
at 1.0 on the diagonal), and every backward conv.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from gltvae.config import ModelConfig
from gltvae.models.ccvae import CCVAE, Temps
from gltvae.ops.sampling import sample_gumbel
from gltvae.utils.h5_import import load_reference_checkpoint
from tests.conftest import requires_tf

B, K, T, REG = 2, 4, 0.7, 0.2


def _np(a):
    return np.asarray(jax.device_get(a), np.float32)


def _tf_sup_loss_and_grads(params_np, x, y, eps_z, g1, g2, eps_k):
    """Reference supervised loss as a differentiable TF graph."""
    import tensorflow as tf

    v = {}  # flat var dict

    def var(path, arr):
        v[path] = tf.Variable(arr, dtype=tf.float32)
        return v[path]

    enc = {k: {k2: var(f'encoder/{k}/{k2}', a2) for k2, a2 in a.items()}
           for k, a in params_np['encoder'].items()}
    dec = {k: {k2: var(f'decoder/{k}/{k2}', a2) for k2, a2 in a.items()}
           for k, a in params_np['decoder'].items()}
    clf = {k: var(f'classifier/{k}', a)
           for k, a in params_np['classifier'].items()}
    cp = {k: var(f'cond_prior/{k}', a)
          for k, a in params_np['cond_prior'].items()}
    mu = var('mu', params_np['mu'])

    xc = tf.constant(x)
    yc = tf.constant(y)

    def bern_lp(lgts, lbl):
        return -tf.math.softplus((1.0 - 2.0 * lbl) * lgts)

    with tf.GradientTape() as tape:
        # encoder
        h = xc
        for i in range(1, 6):
            if i < 5:
                h = tf.pad(h, [[0, 0], [1, 1], [1, 1], [0, 0]])
                s = 2
            else:
                s = 1
            w = enc[f'conv{i}']
            h = tf.nn.relu(tf.nn.conv2d(h, w['kernel'], strides=s,
                                        padding='VALID') + w['bias'])
        h = tf.reshape(h, [B, -1])
        locs = tf.nn.relu(h @ enc['locs']['kernel'] + enc['locs']['bias'])
        scales = tf.clip_by_value(
            tf.math.softplus(h @ enc['scale']['kernel']
                             + enc['scale']['bias']), 1e-3, 1e3)

        z = locs + scales * eps_z
        zc = z[:, 27:]

        # BinConcrete gates (gated_ccvae.py:102-111)
        mu_c = tf.clip_by_value(mu, 0.0, 1.0)
        num = tf.exp((g2 - g1) / T)
        t1 = tf.pow(mu_c, 1.0 / T)
        t2 = tf.pow(1.0 - mu_c, 1.0 / T) * num
        c = t1 / (t1 + t2 + 1e-20)

        logits = tf.reduce_sum(zc[:, :, None] * c[None] * clf['kernel'][None],
                               axis=1) + clf['bias']
        log_qy_zc = tf.reduce_sum(bern_lp(logits, yc), axis=-1)
        log_py = tf.constant(18.0 * np.log(0.5), tf.float32) \
            * tf.ones([B])

        ct = tf.transpose(c)
        prior_locs = yc @ (ct * cp['loc_true']) \
            + (1.0 - yc) @ (ct * cp['loc_false'])
        prior_scales = tf.clip_by_value(tf.math.softplus(
            yc @ (ct * cp['scale_true'])
            + (1.0 - yc) @ (ct * cp['scale_false'])), 1e-3, 1e3)
        prior_locs = tf.concat([tf.zeros([B, 27]), prior_locs], -1)
        prior_scales = tf.concat([tf.ones([B, 27]), prior_scales], -1)
        kl = tf.reduce_sum(
            tf.math.log(prior_scales) - tf.math.log(scales)
            + (scales ** 2 + (locs - prior_locs) ** 2)
            / (2.0 * prior_scales ** 2) - 0.5, axis=-1)

        # decoder
        hd = tf.nn.relu(z @ dec['fc1']['kernel'] + dec['fc1']['bias'])
        hd = tf.reshape(hd, [B, 1, 1, 45])
        specs = [('conv1t', 1, 'VALID', tf.nn.relu),
                 ('conv2t', 2, 'SAME', tf.nn.relu),
                 ('conv3t', 2, 'SAME', tf.nn.relu),
                 ('conv4t', 2, 'SAME', tf.nn.relu),
                 ('conv5t', 2, 'SAME', tf.sigmoid)]
        for name, s, pad, act in specs:
            k = dec[name]['kernel']
            in_sp = hd.shape[1]
            out_sp = in_sp * s if pad == 'SAME' else (in_sp - 1) * s + 4
            hd = act(tf.nn.conv2d_transpose(
                hd, k, output_shape=[B, out_sp, out_sp, k.shape[2]],
                strides=s, padding=pad) + dec[name]['bias'])
        log_pxz = tf.reduce_sum(-tf.abs(xc - hd) - np.log(2.0),
                                axis=[1, 2, 3])

        # k-sample marginal
        z_k = locs[None] + scales[None] * eps_k
        zc_k = tf.reshape(z_k[:, :, 27:], [-1, 18])
        logits_k = tf.reduce_sum(
            zc_k[:, :, None] * c[None] * clf['kernel'][None], axis=1) \
            + clf['bias']
        logits_k = tf.reshape(logits_k, [K, B, 18])
        lq_k = tf.reduce_sum(bern_lp(logits_k, yc[None]), axis=-1)
        log_qy_x = tf.reduce_logsumexp(lq_k, axis=0) \
            - tf.constant(np.log(float(K)), tf.float32)

        # detached numerator (gated_ccvae.py:280-287)
        zc_det = tf.stop_gradient(zc)
        logits_det = tf.reduce_sum(
            zc_det[:, :, None] * c[None] * clf['kernel'][None], axis=1) \
            + clf['bias']
        log_qy_zc_det = tf.reduce_sum(bern_lp(logits_det, yc), axis=-1)
        w_imp = tf.exp(log_qy_zc_det - log_qy_x)

        elbo = w_imp * (log_pxz - kl - log_qy_zc) + log_py + log_qy_x
        loss = tf.reduce_mean(-elbo) + REG * tf.reduce_mean(tf.abs(mu))

    grads = tape.gradient(loss, v)
    return float(loss), {k: np.asarray(g) for k, g in grads.items()}


@requires_tf
def test_sup_gradients_golden(ref_param_dir):
    # local RNG: the comparison tolerance is tuned for a fixed draw, so
    # don't inherit the session fixture's order-dependent state
    rng = np.random.RandomState(123)
    model = CCVAE(ModelConfig())
    params = load_reference_checkpoint(ref_param_dir, 'best')
    x = rng.rand(B, 64, 64, 3).astype(np.float32)
    y = (rng.rand(B, 18) > 0.5).astype(np.float32)

    key = jax.random.key(21)
    temps = Temps(gating=jnp.float32(T))
    (loss, _), grads = jax.value_and_grad(model.sup_loss, has_aux=True)(
        params, jnp.asarray(x), jnp.asarray(y), key, temps,
        gating_reg=REG, k=K)

    # reconstruct the exact noise the jax loss drew
    key_z, key_gate, key_k = jax.random.split(key, 3)
    eps_z = _np(jax.random.normal(key_z, (B, 45), dtype=jnp.float32))
    k1, k2 = jax.random.split(key_gate)
    g1 = _np(sample_gumbel(k1, (18, 18)))
    g2 = _np(sample_gumbel(k2, (18, 18)))
    eps_k = _np(jax.random.normal(key_k, (K, B, 45), dtype=jnp.float32))

    params_np = jax.tree.map(_np, params)
    tf_loss, tf_grads = _tf_sup_loss_and_grads(params_np, x, y, eps_z,
                                               g1, g2, eps_k)

    np.testing.assert_allclose(float(loss), tf_loss, rtol=5e-4)

    def check(path, ours, theirs):
        ours, theirs = _np(ours), np.asarray(theirs)
        scale = max(np.abs(theirs).max(), 1e-6)
        np.testing.assert_allclose(
            ours, theirs, rtol=2e-2, atol=2e-3 * scale,
            err_msg=f'gradient mismatch at {path}')

    check('mu', grads['mu'], tf_grads['mu'])
    for k_ in ['kernel', 'bias']:
        check(f'classifier/{k_}', grads['classifier'][k_],
              tf_grads[f'classifier/{k_}'])
    for k_ in ['loc_true', 'loc_false', 'scale_true', 'scale_false']:
        check(f'cond_prior/{k_}', grads['cond_prior'][k_],
              tf_grads[f'cond_prior/{k_}'])
    for layer, sub in grads['encoder'].items():
        for k_, g in sub.items():
            check(f'encoder/{layer}/{k_}', g,
                  tf_grads[f'encoder/{layer}/{k_}'])
    for layer, sub in grads['decoder'].items():
        for k_, g in sub.items():
            check(f'decoder/{layer}/{k_}', g,
                  tf_grads[f'decoder/{layer}/{k_}'])
