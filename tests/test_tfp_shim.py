"""The tools/tfp_shim distributions must match scipy exactly — they stand
in for tensorflow_probability when the head-to-head harness runs the
unmodified reference code (which imports TFP; absent in this image)."""

import os
import sys

import numpy as np
import pytest

scipy_stats = pytest.importorskip('scipy.stats')

SHIM = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tools', 'tfp_shim')


@pytest.fixture(scope='module')
def shim():
    try:
        import tensorflow_probability as tfp   # real TFP? use it — the
        return tfp                             # harness would too
    except ImportError:
        sys.path.insert(0, SHIM)
        import tensorflow_probability as tfp
        return tfp


def test_normal_kl_matches_closed_form(shim, rng):
    from tensorflow_probability.python.distributions import Normal
    from tensorflow_probability.python.distributions.kullback_leibler \
        import kl_divergence
    mq, sq = rng.randn(64).astype(np.float32), \
        rng.rand(64).astype(np.float32) + 0.1
    mp, sp = rng.randn(64).astype(np.float32), \
        rng.rand(64).astype(np.float32) + 0.1
    got = np.asarray(kl_divergence(Normal(mq, sq), Normal(mp, sp)))
    want = (np.log(sp / sq) + (sq ** 2 + (mq - mp) ** 2) / (2 * sp ** 2)
            - 0.5)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_laplace_log_prob_matches_scipy(shim, rng):
    from tensorflow_probability.python.distributions import Laplace
    loc = rng.randn(32).astype(np.float32)
    x = rng.randn(32).astype(np.float32)
    got = np.asarray(Laplace(loc, np.ones(32, np.float32)).log_prob(x))
    want = scipy_stats.laplace(loc, 1.0).logpdf(x)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bernoulli_log_prob_logits_and_probs(shim, rng):
    from tensorflow_probability.python.distributions import Bernoulli
    logits = rng.randn(16, 8).astype(np.float32) * 3
    y = (rng.rand(16, 8) > 0.5).astype(np.float32)
    got = np.asarray(Bernoulli(logits=logits).log_prob(y))
    p = 1.0 / (1.0 + np.exp(-logits))
    want = y * np.log(p) + (1 - y) * np.log1p(-p)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
    # probs parameterization (the reference's p_Y prior, p=0.5 exactly)
    got2 = np.asarray(Bernoulli(probs=np.full((16, 8), 0.5, np.float32))
                      .log_prob(y))
    np.testing.assert_allclose(got2, np.log(0.5), rtol=1e-6)


def test_bernoulli_sample_rate(shim):
    from tensorflow_probability.python.distributions import Bernoulli
    import tensorflow as tf
    tf.random.set_seed(0)
    logits = np.full((10000,), 1.0, np.float32)
    s = np.asarray(Bernoulli(logits=logits).sample())
    assert s.dtype == np.int32
    want = 1.0 / (1.0 + np.exp(-1.0))
    assert abs(s.mean() - want) < 0.02
