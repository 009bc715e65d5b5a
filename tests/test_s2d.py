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


# ---- output-side twin: S2DTransposeLast (ModelConfig.output_s2d) ----

def _models_out(**kw):
    cfg0 = ModelConfig(**kw)
    cfg1 = ModelConfig(output_s2d=True, **kw)
    return CCVAE(cfg0), CCVAE(cfg1)


def test_output_param_tree_identical():
    """output_s2d keeps the canonical (4,4,out,in) kernel param: same
    names, shapes, and init values as the direct conv-transpose."""
    m0, m1 = _models_out()
    p0, p1, _ = _init_pair(m0, m1)
    jax.tree.map(np.testing.assert_array_equal, p0, p1)


def test_decode_exact():
    """decode() returns the SAME (S, S, C) image either way — the s2d
    form is a pure regrouping of the stride-2 transpose, and
    depth_to_space re-indexes it back."""
    m0, m1 = _models_out()
    p0, p1, rng = _init_pair(m0, m1)
    z = jnp.asarray(rng.randn(8, m0.cfg.z_dim), jnp.float32)
    x0 = m0.decode(p0, z)
    x1 = m1.decode(p1, z)
    assert x0.shape == x1.shape == (8, 64, 64, 3)
    np.testing.assert_allclose(x0, x1, rtol=1e-6, atol=1e-6)


def test_s2d_roundtrip():
    from gltvae.models.networks import depth_to_space, space_to_depth
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 8, 6, 3), jnp.float32)
    np.testing.assert_array_equal(depth_to_space(space_to_depth(x)), x)


def test_output_sup_loss_and_grads_match():
    """Same loss and same gradients through the full supervised ELBO:
    the recon term compares in s2d space, a re-index-invariant sum."""
    m0, m1 = _models_out()
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
    # Wider than the input-s2d grad tolerance: the Laplace recon term's
    # gradient is sign(x - recon), so wherever recon ~= x a ~1e-7
    # summation-order forward diff flips the subgradient sign — bounded
    # but larger than pure accumulation noise.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-3, atol=5e-4),
        g0, g1)


def test_output_unsup_loss_matches():
    m0, m1 = _models_out()
    p0, p1, rng = _init_pair(m0, m1)
    x = jnp.asarray(rng.rand(4, 64, 64, 3), jnp.float32)
    key = jax.random.key(5)
    temps = Temps(gating=jnp.float32(1.0))
    l0, _ = m0.unsup_loss(p0, x, key, temps, gating_reg=0.2)
    l1, _ = m1.unsup_loss(p1, x, key, temps, gating_reg=0.2)
    np.testing.assert_allclose(l0, l1, rtol=1e-6)


def test_output_128px_config():
    """The regrouping holds on the deeper 128px decoder (final
    transpose writes 128x128x3)."""
    import dataclasses

    from gltvae.config import celeba128
    c, _ = celeba128()
    m0 = CCVAE(c)
    m1 = CCVAE(dataclasses.replace(c, output_s2d=True))
    rng = np.random.RandomState(1)
    mu = rng.rand(c.z_classify, c.y_dim).astype(np.float32)
    p0 = m0.init(jax.random.key(0), mu_init=mu)
    z = jnp.asarray(rng.randn(2, c.z_dim), jnp.float32)
    np.testing.assert_allclose(m0.decode(p0, z), m1.decode(p0, z),
                               rtol=1e-5, atol=1e-6)


def test_output_odd_image_size_rejected():
    with pytest.raises(ValueError, match='even'):
        ModelConfig(image_size=63, output_s2d=True)


def test_both_s2d_compose():
    """input_s2d and output_s2d compose: full sup loss still matches the
    direct model bit-for-near-bit."""
    m0 = CCVAE(ModelConfig())
    m1 = CCVAE(ModelConfig(input_s2d=True, output_s2d=True))
    p0, p1, rng = _init_pair(m0, m1)
    x = jnp.asarray(rng.rand(4, 64, 64, 3), jnp.float32)
    y = jnp.asarray((rng.rand(4, m0.cfg.y_dim) > 0.5).astype(np.float32))
    key = jax.random.key(7)
    temps = Temps(gating=jnp.float32(1.0))
    l0, _ = m0.sup_loss(p0, x, y, key, temps, gating_reg=0.2, k=8)
    l1, _ = m1.sup_loss(p1, x, y, key, temps, gating_reg=0.2, k=8)
    np.testing.assert_allclose(l0, l1, rtol=3e-6)


def test_s2d_under_mesh():
    """Both s2d flags are pure per-example regroupings, so they must
    compose with batch-dim sharding: one sup step on the 8-device mesh
    (conftest forces 8 virtual CPU devices) matches the direct model's
    single-device step."""
    from gltvae.parallel.dp import (make_parallel_train_steps, shard_batch,
                                    shard_state)
    from gltvae.parallel.mesh import create_mesh
    from gltvae.train.state import create_train_state
    from gltvae.train.steps import make_train_steps
    from gltvae.config import TrainConfig

    kw = dict(image_size=16, z_dim=8, y_dim=4, enc_features=(8, 8),
              enc_hidden=16, dec_features=(16, 8))
    m0 = CCVAE(ModelConfig(**kw))
    m1 = CCVAE(ModelConfig(input_s2d=True, output_s2d=True, **kw))
    tc = TrainConfig(batch_size=16, classifier_mc_samples=4)
    rng = np.random.RandomState(0)
    mu = rng.rand(4, 4).astype(np.float32)
    x = jnp.asarray(rng.randint(0, 256, (16, 16, 16, 3)), jnp.uint8)
    y = jnp.asarray((rng.rand(16, 4) > 0.5).astype(np.float32))

    s0 = create_train_state(m0, tc, jax.random.key(0), mu_init=mu)
    sup0, _ = make_train_steps(m0, tc, donate=False)
    _, met0 = sup0(s0, x, y, 1.0)

    mesh = create_mesh()
    s1 = shard_state(create_train_state(m1, tc, jax.random.key(0),
                                        mu_init=mu), mesh)
    sup1, _ = make_parallel_train_steps(m1, tc, mesh, donate=False)
    _, met1 = sup1(s1, shard_batch(x, mesh), shard_batch(y, mesh), 1.0)
    np.testing.assert_allclose(float(met0['loss']), float(met1['loss']),
                               rtol=1e-5)
