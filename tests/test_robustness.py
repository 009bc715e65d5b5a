"""Robustness: losses and samplers stay finite at input/parameter
extremes, the ELBO meter works, and the 40-attribute data path holds."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gltvae.config import ModelConfig, TrainConfig, CELEBA_LABELS
from gltvae.models.ccvae import CCVAE, Temps

MODEL = ModelConfig(image_size=16, z_dim=8, y_dim=4,
                    enc_features=(8, 8), enc_hidden=16,
                    dec_features=(16, 8))
TEMPS = Temps(gating=jnp.float32(0.5))


@pytest.fixture(scope='module')
def setup():
    model = CCVAE(MODEL)
    mu = np.full((4, 4), 0.5, np.float32)
    np.fill_diagonal(mu, 1.0)
    return model, model.init(jax.random.key(0), mu_init=mu)


@pytest.mark.parametrize('fill', [0.0, 1.0])
def test_loss_finite_at_constant_images(setup, fill):
    model, params = setup
    x = jnp.full((2, 16, 16, 3), fill)
    y = jnp.array([[0., 0., 0., 0.], [1., 1., 1., 1.]])
    ls, _ = model.sup_loss(params, x, y, jax.random.key(1), TEMPS, k=4)
    lu, _ = model.unsup_loss(params, x, jax.random.key(2), TEMPS)
    assert np.isfinite(float(ls)) and np.isfinite(float(lu))


def test_loss_finite_with_extreme_mu(setup):
    model, params = setup
    for mu_val in [-5.0, 0.0, 1.0, 7.0]:
        p = dict(params)
        p['mu'] = jnp.full((4, 4), mu_val)
        loss, aux = model.sup_loss(p, jnp.zeros((2, 16, 16, 3)),
                                   jnp.ones((2, 4)), jax.random.key(3),
                                   TEMPS, k=4)
        assert np.isfinite(float(loss)), mu_val
        assert np.isfinite(np.asarray(aux.gates)).all(), mu_val


def test_grads_finite_with_extreme_mu(setup):
    model, params = setup
    p = dict(params)
    p['mu'] = jnp.array([[0.0, 1.0, -2.0, 3.0]] * 4)

    def f(p):
        loss, _ = model.sup_loss(p, jnp.zeros((2, 16, 16, 3)),
                                 jnp.ones((2, 4)), jax.random.key(4),
                                 TEMPS, gating_reg=0.2, k=4)
        return loss
    g = jax.grad(f)(p)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_very_low_gating_temperature(setup):
    model, params = setup
    temps = Temps(gating=jnp.float32(0.01))
    loss, aux = model.unsup_loss(params, jnp.zeros((2, 16, 16, 3)),
                                 jax.random.key(5), temps)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(aux.gates)).all()


def test_trainer_test_elbo_meter():
    from gltvae.data.pipeline import BatchLoader
    from gltvae.data.synthetic import synthetic_celeba
    from gltvae.train.loop import Trainer
    mu = np.eye(4, dtype=np.float32)
    t = Trainer(MODEL, TrainConfig(batch_size=8, classifier_mc_samples=2),
                mu_init=mu)
    loader = BatchLoader(synthetic_celeba(24, 16, 4), 8, seed=0)
    elbo = t.test_elbo(loader)
    assert np.isfinite(elbo)
    assert elbo < 0  # ELBO of untrained model on [0,1] images is negative


def test_full_40_label_space():
    """BASELINE config 4's label space: 40 attributes end to end."""
    cfg = ModelConfig(image_size=16, z_dim=48, y_dim=40,
                      enc_features=(8, 8), enc_hidden=32,
                      dec_features=(16, 8))
    assert cfg.z_classify == 40 and cfg.z_style == 8
    model = CCVAE(cfg)
    mu = np.full((40, 40), 0.3, np.float32)
    np.fill_diagonal(mu, 1.0)
    params = model.init(jax.random.key(0), mu_init=mu)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32)
    y = jnp.asarray((rng.rand(2, 40) > 0.5).astype(np.float32))
    loss, aux = model.sup_loss(params, x, y, jax.random.key(1), TEMPS, k=4)
    assert np.isfinite(float(loss))
    assert aux.gates.shape == (40, 40)
    assert len(CELEBA_LABELS) == 40
