"""Unit tests for gltvae.ops.distributions / sampling against independent
oracles (scipy closed forms and hand-derived values). These pin the
semantic heart of the framework (SURVEY.md §7 step 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from gltvae.ops import (gaussian_kl, laplace_log_prob, img_log_likelihood,
                        bernoulli_log_prob, bernoulli_log_prob_probs,
                        bernoulli_sample, sample_gumbel, sample_normal,
                        sample_gating)


def test_gaussian_kl_matches_scipy_monte_carlo(rng):
    loc_q = rng.randn(4, 7).astype(np.float32)
    scale_q = np.abs(rng.randn(4, 7)).astype(np.float32) + 0.1
    loc_p = rng.randn(4, 7).astype(np.float32)
    scale_p = np.abs(rng.randn(4, 7)).astype(np.float32) + 0.1
    got = np.array(gaussian_kl(loc_q, scale_q, loc_p, scale_p))
    # closed form per-dim KL for univariate normals
    want = (np.log(scale_p / scale_q)
            + (scale_q ** 2 + (loc_q - loc_p) ** 2) / (2 * scale_p ** 2)
            - 0.5).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_gaussian_kl_standard_prior_defaults(rng):
    loc = rng.randn(3, 5).astype(np.float32)
    scale = np.abs(rng.randn(3, 5)).astype(np.float32) + 0.2
    got = np.array(gaussian_kl(loc, scale))
    want = (-np.log(scale) + 0.5 * (scale ** 2 + loc ** 2 - 1)).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_gaussian_kl_zero_for_identical():
    loc = jnp.ones((2, 4))
    scale = jnp.full((2, 4), 0.7)
    np.testing.assert_allclose(np.array(gaussian_kl(loc, scale, loc, scale)),
                               0.0, atol=1e-6)


def test_laplace_log_prob_matches_scipy(rng):
    loc = rng.randn(10).astype(np.float32)
    x = rng.randn(10).astype(np.float32)
    got = np.array(laplace_log_prob(loc, x))
    want = scipy.stats.laplace(loc=loc, scale=1.0).logpdf(x)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_img_log_likelihood_sums_hwc(rng):
    recon = rng.rand(2, 8, 8, 3).astype(np.float32)
    x = rng.rand(2, 8, 8, 3).astype(np.float32)
    got = np.array(img_log_likelihood(jnp.array(recon), jnp.array(x)))
    want = scipy.stats.laplace(loc=recon, scale=1.0).logpdf(x).sum((1, 2, 3))
    np.testing.assert_allclose(got, want, rtol=1e-4)
    assert got.shape == (2,)


def test_bernoulli_log_prob_matches_scipy(rng):
    logits = rng.randn(6, 5).astype(np.float32) * 3
    y = (rng.rand(6, 5) > 0.5).astype(np.float32)
    got = np.array(bernoulli_log_prob(jnp.array(logits), jnp.array(y)))
    p = 1.0 / (1.0 + np.exp(-logits))
    want = scipy.stats.bernoulli(p).logpmf(y.astype(int))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_bernoulli_log_prob_probs_uniform_prior():
    # p(y)=0.5 prior: every 18-bit label scores 18*log(0.5)
    # (reference gated_ccvae.py:210).
    y = jnp.array([[0., 1.] * 9])
    got = bernoulli_log_prob_probs(jnp.full((18,), 0.5), y).sum(-1)
    np.testing.assert_allclose(np.array(got), 18 * np.log(0.5), rtol=1e-6)


def test_sample_normal_moments():
    key = jax.random.key(0)
    loc = jnp.array([1.0, -2.0])
    scale = jnp.array([0.5, 2.0])
    z = sample_normal(key, jnp.broadcast_to(loc, (20000, 2)),
                      jnp.broadcast_to(scale, (20000, 2)))
    np.testing.assert_allclose(np.array(z.mean(0)), loc, atol=0.05)
    np.testing.assert_allclose(np.array(z.std(0)), scale, atol=0.05)


def test_sample_gumbel_moments():
    g = sample_gumbel(jax.random.key(1), (100000,))
    # Gumbel(0,1): mean = Euler-Mascheroni, var = pi^2/6
    assert abs(float(g.mean()) - 0.5772) < 0.02
    assert abs(float(g.var()) - np.pi ** 2 / 6) < 0.05


class TestGatingSampler:
    """BinConcrete gate sampler (gated_ccvae.py:102-111 semantics)."""

    def test_extreme_mu_saturates(self):
        key = jax.random.key(0)
        mu = jnp.array([[0.0, 1.0]])
        c = sample_gating(key, mu, temperature=0.3)
        assert float(c[0, 0]) < 1e-6
        assert float(c[0, 1]) > 1 - 1e-6

    def test_clips_mu_outside_unit_interval(self):
        key = jax.random.key(0)
        c_clip = sample_gating(key, jnp.array([[-3.0, 5.0]]), 0.5)
        c_unit = sample_gating(key, jnp.array([[0.0, 1.0]]), 0.5)
        np.testing.assert_allclose(np.array(c_clip), np.array(c_unit))

    def test_low_temperature_hardens(self):
        keys = jax.random.split(jax.random.key(2), 2000)
        mu = jnp.full((1, 1), 0.7)
        cs = jax.vmap(lambda k: sample_gating(k, mu, 0.05))(keys)
        frac_on = float((cs > 0.5).mean())
        # At low T the relaxation approaches Bernoulli(0.7)
        assert abs(frac_on - 0.7) < 0.05
        # Analytically ~90% of draws land outside (0.01, 0.99) at T=0.05
        # for mu=0.7 (the logistic-difference window is ~0.10 wide).
        hard = float(((cs < 0.01) | (cs > 0.99)).mean())
        assert hard > 0.85

    def test_mean_tracks_mu_at_moderate_temp(self):
        keys = jax.random.split(jax.random.key(3), 4000)
        mu = jnp.array([[0.2, 0.5, 0.9]])
        cs = jax.vmap(lambda k: sample_gating(k, mu, 0.3))(keys)
        np.testing.assert_allclose(np.array(cs.mean(0)[0]),
                                   [0.2, 0.5, 0.9], atol=0.04)

    def test_matches_reference_formula_with_fixed_gumbels(self, rng):
        # Independently evaluate the published formula with the same
        # Gumbel noise the sampler drew (reconstructed from the key).
        key = jax.random.key(7)
        mu = jnp.array(rng.rand(4, 4).astype(np.float32))
        T = 0.47
        c = sample_gating(key, mu, T)
        k1, k2 = jax.random.split(key)
        g1 = sample_gumbel(k1, mu.shape)
        g2 = sample_gumbel(k2, mu.shape)
        mu_c = np.clip(np.array(mu), 0, 1)
        num = np.exp((np.array(g2) - np.array(g1)) / T)
        t1 = mu_c ** (1 / T)
        t2 = (1 - mu_c) ** (1 / T) * num
        want = t1 / (t1 + t2 + 1e-20)
        np.testing.assert_allclose(np.array(c), want, rtol=1e-5)

    def test_gradients_flow_to_mu(self):
        def f(mu):
            return sample_gating(jax.random.key(0), mu, 0.5).sum()
        g = jax.grad(f)(jnp.full((3, 3), 0.5))
        assert np.isfinite(np.array(g)).all()
        assert float(jnp.abs(g).sum()) > 0


def test_bernoulli_sample_rate():
    key = jax.random.key(4)
    logits = jnp.zeros((50000,))
    y = bernoulli_sample(key, logits)
    assert abs(float(y.mean()) - 0.5) < 0.01
    assert set(np.unique(np.array(y))) <= {0.0, 1.0}
