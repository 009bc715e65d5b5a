"""Space-to-depth input conv (networks.py::S2DConv) is an EXACT
regrouping of the encoder's first conv — same params, same math.

The reference's pad-1 + VALID 4x4/s2 first conv (reference networks.py:
21-24) reads a 3-channel image that pads to TPU lane tiles; ModelConfig
.input_s2d regroups it as s2d(2) + 2x2/s1 VALID. These tests pin the
equivalence at full-model granularity (forward, loss, gradients) so the
flag stays a pure execution strategy: flipping it may never change
semantics, checkpoints, or golden parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gltvae.config import ModelConfig
from gltvae.models.ccvae import CCVAE, Temps


def _models(**kw):
    cfg0 = ModelConfig(**kw)
    cfg1 = ModelConfig(input_s2d=True, **kw)
    return CCVAE(cfg0), CCVAE(cfg1)


def _init_pair(m0, m1, seed=0):
    rng = np.random.RandomState(seed)
    mu = rng.rand(m0.cfg.z_classify, m0.cfg.y_dim).astype(np.float32)
    p0 = m0.init(jax.random.key(0), mu_init=mu)
    p1 = m1.init(jax.random.key(0), mu_init=mu)
    return p0, p1, rng


def test_param_tree_identical():
    """The flag does not touch the parameter tree: same names, shapes,
    and init values (the kernel stays canonical (4,4,C,F))."""
    m0, m1 = _models()
    p0, p1, _ = _init_pair(m0, m1)
    jax.tree.map(np.testing.assert_array_equal, p0, p1)


def test_encoder_forward_exact():
    m0, m1 = _models()
    p0, p1, rng = _init_pair(m0, m1)
    x = jnp.asarray(rng.rand(8, 64, 64, 3), jnp.float32)
    l0, s0 = m0.encoder.apply({'params': p0['encoder']}, x)
    l1, s1 = m1.encoder.apply({'params': p1['encoder']}, x)
    np.testing.assert_allclose(l0, l1, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(s0, s1, rtol=1e-6, atol=1e-6)


def test_sup_loss_and_grads_match():
    """Same loss and same gradients through the full supervised ELBO
    (incl. the k-sample classifier marginal) — the train step is
    equivalent, not just the forward pass."""
    m0, m1 = _models()
    p0, p1, rng = _init_pair(m0, m1)
    x = jnp.asarray(rng.rand(4, 64, 64, 3), jnp.float32)
    y = jnp.asarray((rng.rand(4, m0.cfg.y_dim) > 0.5).astype(np.float32))
    key = jax.random.key(2)
    temps = Temps(gating=jnp.float32(1.0))

    def loss_fn(model):
        def f(p):
            loss, _ = model.sup_loss(p, x, y, key, temps,
                                     gating_reg=0.2, k=8)
            return loss
        return f

    (v0, g0) = jax.value_and_grad(loss_fn(m0))(p0)
    (v1, g1) = jax.value_and_grad(loss_fn(m1))(p1)
    np.testing.assert_allclose(v0, v1, rtol=1e-6)
    # Summation-order tolerance: the regrouped conv accumulates the same
    # 48 products per output in a different order.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-5),
        g0, g1)


def test_128px_config():
    """The regrouping holds on the deeper 128px model (extra stride-2
    stage; first conv input is 128x128x3)."""
    import dataclasses

    from gltvae.config import celeba128
    c, _ = celeba128()
    m0 = CCVAE(c)
    m1 = CCVAE(dataclasses.replace(c, input_s2d=True))
    rng = np.random.RandomState(1)
    mu = rng.rand(c.z_classify, c.y_dim).astype(np.float32)
    p0 = m0.init(jax.random.key(0), mu_init=mu)
    x = jnp.asarray(rng.rand(2, 128, 128, 3), jnp.float32)
    l0, _ = m0.encoder.apply({'params': p0['encoder']}, x)
    l1, _ = m1.encoder.apply({'params': p0['encoder']}, x)
    np.testing.assert_allclose(l0, l1, rtol=1e-5, atol=1e-5)


def test_odd_image_size_rejected():
    with pytest.raises(ValueError, match='even image_size'):
        ModelConfig(image_size=63, input_s2d=True)
