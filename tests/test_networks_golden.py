"""Golden-equivalence tests: our Flax networks, loaded with the reference's
trained .h5 weights, must produce the same outputs as an independent
TensorFlow evaluation of the reference architecture (networks.py). This is
the strongest parity check available (SURVEY.md §4 implication: the .h5
checkpoints are golden fixtures)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from gltvae.config import ModelConfig
from gltvae.models.ccvae import CCVAE
from gltvae.utils.h5_import import (load_encoder_params, load_decoder_params,
                                    load_classifier_params,
                                    load_cond_prior_params,
                                    load_reference_checkpoint)
from tests.conftest import requires_tf


@pytest.fixture(scope='module')
def model():
    return CCVAE(ModelConfig())


@pytest.fixture(scope='module')
def ref_params(ref_param_dir):
    return load_reference_checkpoint(ref_param_dir, 'best')


def _tf_encoder(weights, x):
    """Independent TF oracle for the reference encoder architecture
    (networks.py:7-37): pad1+valid 4x4 s2 convs (32,32,64,128), valid 4x4
    s1 conv(256), flatten, relu-locs / softplus-clip-scale heads."""
    import tensorflow as tf
    h = tf.constant(x)
    convs = [weights[f'conv{i}'] for i in range(1, 6)]
    for i, wb in enumerate(convs):
        if i < 4:
            h = tf.pad(h, [[0, 0], [1, 1], [1, 1], [0, 0]])
            stride = 2
        else:
            stride = 1
        h = tf.nn.conv2d(h, np.array(wb['kernel']), strides=stride,
                         padding='VALID') + np.array(wb['bias'])
        h = tf.nn.relu(h)
    h = tf.reshape(h, [h.shape[0], -1])
    locs = tf.nn.relu(h @ np.array(weights['locs']['kernel'])
                      + np.array(weights['locs']['bias']))
    scale = tf.nn.softplus(h @ np.array(weights['scale']['kernel'])
                           + np.array(weights['scale']['bias']))
    scale = tf.clip_by_value(scale, 1e-3, 1e3)
    return np.array(locs), np.array(scale)


def _tf_decoder(weights, z):
    """Independent TF oracle for the reference decoder (networks.py:40-59)."""
    import tensorflow as tf
    h = tf.nn.relu(tf.constant(z) @ np.array(weights['fc1']['kernel'])
                   + np.array(weights['fc1']['bias']))
    h = tf.reshape(h, [-1, 1, 1, h.shape[-1]])
    specs = [  # (name, stride, padding, activation)
        ('conv1t', 1, 'VALID', tf.nn.relu),
        ('conv2t', 2, 'SAME', tf.nn.relu),
        ('conv3t', 2, 'SAME', tf.nn.relu),
        ('conv4t', 2, 'SAME', tf.nn.relu),
        ('conv5t', 2, 'SAME', tf.sigmoid),
    ]
    for name, s, pad, act in specs:
        k = np.array(weights[name]['kernel'])  # (kh, kw, out, in)
        b = np.array(weights[name]['bias'])
        in_sp = h.shape[1]
        out_sp = in_sp * s if pad == 'SAME' else (in_sp - 1) * s + k.shape[0]
        h = tf.nn.conv2d_transpose(
            h, k, output_shape=[h.shape[0], out_sp, out_sp, k.shape[2]],
            strides=s, padding=pad) + b
        h = act(h)
    return np.array(h)


@requires_tf
def test_encoder_golden(model, ref_params, ref_param_dir, rng):
    x = rng.rand(4, 64, 64, 3).astype(np.float32)
    locs, scale = jax.jit(model.encode)(ref_params, jnp.array(x))
    w = load_encoder_params(f'{ref_param_dir}/encoder_model_best.h5')
    locs_tf, scale_tf = _tf_encoder(w, x)
    np.testing.assert_allclose(np.array(locs), locs_tf, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.array(scale), scale_tf, rtol=2e-4, atol=2e-4)


@requires_tf
def test_decoder_golden(model, ref_params, ref_param_dir, rng):
    z = rng.randn(4, 45).astype(np.float32)
    recon = jax.jit(model.decode)(ref_params, jnp.array(z))
    w = load_decoder_params(f'{ref_param_dir}/decoder_model_best.h5')
    recon_tf = _tf_decoder(w, z)
    assert recon.shape == (4, 64, 64, 3)
    np.testing.assert_allclose(np.array(recon), recon_tf, rtol=2e-4, atol=2e-4)


def test_classifier_golden(model, ref_params, ref_param_dir, rng):
    """Oracle: the reference's tile-mask-reduce formula evaluated in numpy
    (networks.py:72-74, 83-86)."""
    zc = rng.randn(6, 18).astype(np.float32)
    c = rng.rand(18, 18).astype(np.float32)
    logits = model.classify(ref_params, jnp.array(zc), jnp.array(c))
    w = load_classifier_params(f'{ref_param_dir}/classifier_best.h5')
    z_tiled = np.repeat(zc[:, :, None], 18, axis=2)
    gated = z_tiled * c[None]
    want = (gated * w['kernel'][None]).sum(1) + w['bias']
    np.testing.assert_allclose(np.array(logits), want, rtol=1e-4, atol=1e-5)


def test_cond_prior_golden(model, ref_params, ref_param_dir, rng):
    """Oracle: reference formula in numpy (networks.py:89-127)."""
    y = (rng.rand(6, 18) > 0.5).astype(np.float32)
    c = rng.rand(18, 18).astype(np.float32)
    locs, scale = model.prior_zc(ref_params, jnp.array(y), jnp.array(c))
    w = load_cond_prior_params(f'{ref_param_dir}/cond_prior_best.h5')
    ct = c.T
    y_t = np.repeat(y[:, :, None], 18, axis=2)
    want_locs = ((y_t * ct[None]) * w['loc_true'][None]).sum(1) \
        + (((1 - y_t) * ct[None]) * w['loc_false'][None]).sum(1)

    def softplus(v):
        return np.log1p(np.exp(-np.abs(v))) + np.maximum(v, 0)

    raw = ((y_t * ct[None]) * w['scale_true'][None]).sum(1) \
        + (((1 - y_t) * ct[None]) * w['scale_false'][None]).sum(1)
    want_scale = np.clip(softplus(raw), 1e-3, 1e3)
    np.testing.assert_allclose(np.array(locs), want_locs, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.array(scale), want_scale, rtol=1e-4,
                               atol=1e-5)


def test_param_count_matches_reference(model):
    """Per-submodule parameter counts recomputed from the verified h5
    weight shapes. (SURVEY.md/BASELINE.md quote encoder 739,690 / total
    1,017,901 — an arithmetic slip; the h5 shapes sum to encoder 729,690:
    convs 1,568+16,416+32,832+131,200+524,544 + two dense heads 11,565
    each.)"""
    params = model.init(jax.random.key(0),
                        mu_init=np.eye(18, dtype=np.float32))
    counts = {k: sum(int(np.prod(x.shape))
                     for x in jax.tree.leaves(v))
              for k, v in params.items()}
    assert counts['encoder'] == 729_690
    assert counts['decoder'] == 276_249
    assert counts['classifier'] == 342
    assert counts['cond_prior'] == 1_296
    assert counts['mu'] == 324
    assert sum(counts.values()) == 1_007_901


def test_init_shapes_match_h5(model, ref_params):
    """Freshly-initialized pytree is congruent with the imported reference
    checkpoint (same treedef, same leaf shapes)."""
    fresh = model.init(jax.random.key(1), mu_init=np.eye(18))
    ref_shapes = jax.tree.map(lambda a: a.shape, ref_params)
    fresh_shapes = jax.tree.map(lambda a: a.shape, fresh)
    assert ref_shapes == fresh_shapes


def test_encoder_output_1x1_spatial(model):
    """64x64 input must reach exactly 1x1 before the dense heads
    (the reference's conv geometry: 64->32->16->8->4->1)."""
    params = model.init(jax.random.key(0), mu_init=np.eye(18))
    x = jnp.ones((2, 64, 64, 3))
    locs, scale = model.encode(params, x)
    assert locs.shape == (2, 45)
    assert scale.shape == (2, 45)
    assert float(scale.min()) >= 1e-3
    assert float(locs.min()) >= 0.0  # ReLU'd posterior means


def test_128px_config_shapes():
    from gltvae.config import celeba128
    cfg, _ = celeba128()
    m = CCVAE(cfg)
    params = m.init(jax.random.key(0), mu_init=np.eye(40))
    x = jnp.ones((2, 128, 128, 3))
    locs, scale = m.encode(params, x)
    assert locs.shape == (2, 100)
    recon = m.decode(params, jnp.ones((2, 100)))
    assert recon.shape == (2, 128, 128, 3)
