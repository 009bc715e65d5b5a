"""ELBO loss semantics: structure, gradient flow, and the reference's exact
term relationships (gated_ccvae.py:184-300)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gltvae.config import ModelConfig
from gltvae.models.ccvae import CCVAE, Temps


@pytest.fixture(scope='module')
def small_model():
    # Small config for fast CPU tests; same code path as CelebA-64.
    return CCVAE(ModelConfig(image_size=32, z_dim=12, y_dim=5,
                             enc_features=(8, 8, 16), enc_hidden=32,
                             dec_features=(16, 8, 8)))


@pytest.fixture(scope='module')
def setup(small_model):
    key = jax.random.key(0)
    mu = np.full((5, 5), 0.5, np.float32)
    np.fill_diagonal(mu, 1.0)
    params = small_model.init(key, mu_init=mu)
    rng = np.random.RandomState(0)
    x = jnp.array(rng.rand(4, 32, 32, 3).astype(np.float32))
    y = jnp.array((rng.rand(4, 5) > 0.5).astype(np.float32))
    return params, x, y


TEMPS = Temps(gating=jnp.float32(0.5))


def test_unsup_loss_finite_scalar(small_model, setup):
    params, x, _ = setup
    loss, aux = small_model.unsup_loss(params, x, jax.random.key(1), TEMPS)
    assert loss.shape == ()
    assert np.isfinite(float(loss))
    assert aux.gates.shape == (5, 5)


def test_unsup_loss_is_negative_mean_elbo(small_model, setup):
    params, x, _ = setup
    loss, aux = small_model.unsup_loss(params, x, jax.random.key(1), TEMPS,
                                       gating_reg=0.0)
    np.testing.assert_allclose(float(loss), -float(aux.elbo), rtol=1e-5)


def test_unsup_elbo_decomposition(small_model, setup):
    # elbo = log_pxz + log_py - kl - log_qy_zc (gated_ccvae.py:225)
    params, x, _ = setup
    _, aux = small_model.unsup_loss(params, x, jax.random.key(2), TEMPS)
    np.testing.assert_allclose(
        float(aux.elbo),
        float(aux.log_pxz + aux.log_py - aux.kl - aux.log_qy_zc), rtol=1e-4)


def test_l1_reg_added_exactly(small_model, setup):
    params, x, _ = setup
    l0, _ = small_model.unsup_loss(params, x, jax.random.key(3), TEMPS,
                                   gating_reg=0.0)
    l1, _ = small_model.unsup_loss(params, x, jax.random.key(3), TEMPS,
                                   gating_reg=0.2)
    want = 0.2 * float(jnp.mean(jnp.abs(params['mu'])))
    # loose tolerance: the reg term is recovered by subtracting two
    # ~1e3-magnitude f32 losses (catastrophic cancellation)
    np.testing.assert_allclose(float(l1 - l0), want, atol=5e-3)


def test_sup_loss_finite_and_grads_cover_all_params(small_model, setup):
    params, x, y = setup
    def f(p):
        loss, _ = small_model.sup_loss(p, x, y, jax.random.key(4), TEMPS,
                                       gating_reg=0.1, k=8)
        return loss
    loss, grads = jax.value_and_grad(f)(params)
    assert np.isfinite(float(loss))
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        assert np.isfinite(np.asarray(g)).all(), path
    # every submodule receives gradient signal
    for name in ['encoder', 'decoder', 'classifier', 'cond_prior', 'mu']:
        total = sum(float(jnp.abs(g).sum())
                    for g in jax.tree.leaves(grads[name]))
        assert total > 0, f'no gradient reached {name}'


def test_unsup_grads_cover_all_params(small_model, setup):
    params, x, _ = setup
    def f(p):
        loss, _ = small_model.unsup_loss(p, x, jax.random.key(5), TEMPS,
                                         gating_reg=0.1)
        return loss
    grads = jax.grad(f)(params)
    for name in ['encoder', 'decoder', 'classifier', 'cond_prior', 'mu']:
        total = sum(float(jnp.abs(g).sum())
                    for g in jax.tree.leaves(grads[name]))
        assert total > 0, f'no gradient reached {name}'


def test_log_qy_x_converges_to_exact_marginal(small_model, setup):
    """With a near-deterministic posterior the MC marginal must equal the
    single-point classifier log-prob."""
    params, x, y = setup
    locs = jnp.ones((4, 12)) * 0.3
    scales = jnp.full((4, 12), 1e-5)
    c = jnp.eye(5)
    got = small_model.log_qy_x(params, jax.random.key(6), locs, scales, y,
                               c, k=64)
    from gltvae.ops.distributions import bernoulli_log_prob
    _, zc = small_model.split_z(locs)
    logits = small_model.classify(params, zc, c)
    want = jnp.sum(bernoulli_log_prob(logits, y), -1)
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-3,
                               atol=1e-3)


def test_log_qy_x_matches_loop_oracle(small_model, setup):
    """Vectorized k-sample marginal == explicit per-sample loop with the
    same noise (the reference's loop at gated_ccvae.py:171-181, oracle
    built from the identical eps draw)."""
    params, x, y = setup
    locs = jnp.array(np.random.RandomState(1).rand(4, 12), jnp.float32)
    scales = jnp.array(0.5 + np.random.RandomState(2).rand(4, 12),
                       jnp.float32)
    c = jnp.array(np.random.RandomState(3).rand(5, 5), jnp.float32)
    k = 16
    key = jax.random.key(7)
    got = small_model.log_qy_x(params, key, locs, scales, y, c, k=k)

    eps = jax.random.normal(key, (k,) + locs.shape, dtype=jnp.float32)
    from gltvae.ops.distributions import bernoulli_log_prob
    per = []
    for i in range(k):
        z = locs + scales * eps[i]
        _, zc = small_model.split_z(z)
        logits = small_model.classify(params, zc, c)
        per.append(jnp.sum(bernoulli_log_prob(logits, y), -1))
    want = jax.nn.logsumexp(jnp.stack(per), axis=0) - jnp.log(float(k))
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-4,
                               atol=1e-5)


def test_sup_importance_weight_stop_gradient(small_model, setup):
    """The w-numerator detaches z_classify: perturbing the encoder output
    path via z must not change w's gradient contribution through that
    route. We verify indirectly: sup_loss gradients to the encoder differ
    when the stop_gradient is removed (guards against silently dropping
    the detach, reference gated_ccvae.py:280-287)."""
    params, x, y = setup
    key = jax.random.key(8)

    def loss_with(p, detach: bool):
        model = small_model
        from gltvae.ops.sampling import sample_normal, sample_gating
        from gltvae.ops.distributions import bernoulli_log_prob
        key_z, key_gate, key_k = jax.random.split(key, 3)
        locs, scales = model.encode(p, x)
        z = sample_normal(key_z, locs, scales)
        _, zc = model.split_z(z)
        c = sample_gating(key_gate, p['mu'], TEMPS.gating)
        log_qy_x = model.log_qy_x(p, key_k, locs, scales, y, c, k=8)
        zc_n = jax.lax.stop_gradient(zc) if detach else zc
        logits = model.classify(p, zc_n, c)
        log_q = jnp.sum(bernoulli_log_prob(logits, y), -1)
        w = jnp.exp(log_q - log_qy_x)
        return jnp.mean(w)

    g_det = jax.grad(lambda p: loss_with(p, True))(params)
    g_nodet = jax.grad(lambda p: loss_with(p, False))(params)
    d = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree.leaves(g_det['encoder']),
        jax.tree.leaves(g_nodet['encoder'])))
    assert d > 1e-8


def test_eval_accuracy_bounds(small_model, setup):
    params, x, y = setup
    acc = small_model.classifier_accuracy(params, x, y, jax.random.key(9),
                                          TEMPS)
    assert 0.0 <= float(acc) <= 1.0


def test_deterministic_eval_is_reproducible(small_model, setup):
    params, x, y = setup
    a1 = small_model.classifier_accuracy(params, x, y, jax.random.key(1),
                                         TEMPS, deterministic=True)
    a2 = small_model.classifier_accuracy(params, x, y, jax.random.key(2),
                                         TEMPS, deterministic=True)
    assert float(a1) == float(a2)
