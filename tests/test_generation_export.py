"""Conditional generation, reconstruction, and h5 export round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from gltvae.config import ModelConfig
from gltvae.models.ccvae import CCVAE, Temps
from gltvae.utils.h5_export import export_reference_checkpoint
from gltvae.utils.h5_import import load_reference_checkpoint

MODEL = ModelConfig(image_size=16, z_dim=8, y_dim=4,
                    enc_features=(8, 8), enc_hidden=16,
                    dec_features=(16, 8))


@pytest.fixture(scope='module')
def setup():
    model = CCVAE(MODEL)
    mu = np.full((4, 4), 0.5, np.float32)
    np.fill_diagonal(mu, 1.0)
    params = model.init(jax.random.key(0), mu_init=mu)
    return model, params


def test_reconstruct_shapes(setup):
    model, params = setup
    x = jnp.array(np.random.RandomState(0)
                  .rand(3, 16, 16, 3).astype(np.float32))
    r_mean = model.reconstruct(params, x)
    r_samp = model.reconstruct(params, x, key=jax.random.key(1))
    assert r_mean.shape == x.shape and r_samp.shape == x.shape
    assert not np.allclose(np.array(r_mean), np.array(r_samp))


def test_conditional_generation(setup):
    model, params = setup
    # NOTE: at init the conditional prior is y-INDEPENDENT (loc kernels
    # zeros, scale true/false kernels both ones — reference init,
    # networks.py:113-116), so give the loc kernels signal first.
    params = dict(params)
    params['cond_prior'] = dict(params['cond_prior'])
    params['cond_prior']['loc_true'] = jnp.array(
        np.random.RandomState(3).randn(4, 4).astype(np.float32))
    y = jnp.array([[1., 0., 0., 1.], [0., 1., 1., 0.]])
    imgs = model.sample_conditional(params, y, jax.random.key(2),
                                    Temps(gating=jnp.float32(0.5)))
    assert imgs.shape == (2, 16, 16, 3)
    assert float(imgs.min()) >= 0.0 and float(imgs.max()) <= 1.0
    # different labels with the same keys -> different images
    imgs2 = model.sample_conditional(params, 1.0 - y, jax.random.key(2),
                                     Temps(gating=jnp.float32(0.5)))
    assert not np.allclose(np.array(imgs), np.array(imgs2))


def test_h5_export_import_roundtrip(setup, tmp_path):
    model, params = setup
    export_reference_checkpoint(params, str(tmp_path), 'best')
    for f in ['encoder_model_best.h5', 'decoder_model_best.h5',
              'classifier_best.h5', 'cond_prior_best.h5',
              'learned_gating_matrix_best.npy']:
        assert os.path.exists(tmp_path / f), f
    re = load_reference_checkpoint(str(tmp_path), 'best')
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(params),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(re),
                   key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_h5_export_matches_reference_layout(setup, tmp_path):
    """Exported metadata must be byte-compatible with what Keras
    load_weights expects (attrs verified against the shipped files)."""
    import h5py
    model, params = setup
    export_reference_checkpoint(params, str(tmp_path), 'best')
    with h5py.File(tmp_path / 'encoder_model_best.h5', 'r') as f:
        assert 'layer_names' in f.attrs
        names = [n for n in f.attrs['layer_names']]
        assert names[0] == 'conv2d'
        assert 'flatten' in names
        g = f['conv2d']
        assert list(g.attrs['weight_names']) == [
            'encoder/conv2d/kernel:0', 'encoder/conv2d/bias:0']
        assert f['conv2d/encoder/conv2d/kernel:0'].shape == (4, 4, 3, 8)
