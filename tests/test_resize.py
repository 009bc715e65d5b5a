"""Device-side bilinear resize (gltvae.ops.resize): numerical equivalence
with the host resizers it replaces, and the full-res-ship train path
(DataConfig.device_resize)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gltvae.ops.resize import resize_bilinear, _linear_weights


def test_weights_rows_sum_to_one():
    for src, dst in [(218, 64), (178, 64), (218, 128), (64, 64), (32, 64)]:
        w = _linear_weights(src, dst)
        assert w.shape == (dst, src)
        np.testing.assert_allclose(w.sum(1), 1.0, rtol=1e-6)
        assert (w >= 0).all()


def test_identity_when_same_size():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    assert resize_bilinear(x, 64, 64) is x


def test_matches_jax_image_resize_antialias():
    """jax.image.resize(method='bilinear', antialias=True) implements the
    same triangle-filter resampling — the separable-GEMM form must agree."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 218, 178, 3), jnp.float32)
    ours = resize_bilinear(x, 64, 64)
    want = jax.image.resize(x, (2, 64, 64, 3), 'bilinear', antialias=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_close_to_pil_bilinear():
    """PIL BILINEAR (the reference's resizer, utils_data.py:55-58 modulo
    its default-filter quirk) uses the identical adaptive triangle filter;
    agreement up to uint8 quantization of PIL's output."""
    PIL = pytest.importorskip('PIL.Image')
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (218, 178, 3), dtype=np.uint8)
    want = np.asarray(
        PIL.fromarray(img).resize((64, 64), PIL.BILINEAR), np.float32)
    ours = resize_bilinear(
        jnp.asarray(img, jnp.float32)[None], 64, 64)[0]
    # PIL rounds to uint8 between the horizontal and vertical passes; the
    # f32 pipeline agrees within one quantization step on the [0,255] scale
    assert np.abs(np.asarray(ours) - want).max() <= 1.0


def test_upscale_path():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
    up = resize_bilinear(x, 128, 128)
    assert up.shape == (1, 128, 128, 3)
    # mean preserved by interpolation up to boundary effects
    np.testing.assert_allclose(float(up.mean()), float(x.mean()), atol=5e-3)


def test_train_step_accepts_full_res_input():
    """The device_resize pipeline: a (B, 218, 178, 3) uint8 batch trains a
    64px model — resize happens inside the jit (steps._prep_image)."""
    from gltvae.config import ModelConfig, TrainConfig
    from gltvae.models.ccvae import CCVAE
    from gltvae.train.state import create_train_state
    from gltvae.train.steps import make_train_steps, make_eval_step

    cfg = ModelConfig(image_size=64, z_dim=12, y_dim=6,
                      enc_features=(8, 8, 8, 8), enc_hidden=16,
                      dec_features=(16, 8, 8, 8))
    tc = TrainConfig(batch_size=4, classifier_mc_samples=2)
    model = CCVAE(cfg)
    mu = np.eye(6, dtype=np.float32)
    state = create_train_state(model, tc, jax.random.key(0), mu_init=mu)
    sup, _ = make_train_steps(model, tc, donate=False)
    rng = np.random.RandomState(0)
    x_full = jnp.asarray(rng.randint(0, 256, (4, 218, 178, 3)), jnp.uint8)
    y = jnp.asarray((rng.rand(4, 6) > 0.5).astype(np.float32))
    new_state, m = sup(state, x_full, y, 1.0)
    assert np.isfinite(float(m['loss']))

    # equivalence: full-res step == host-resized step (same resampling)
    x_64 = resize_bilinear(x_full.astype(jnp.float32) / 255.0, 64, 64)
    _, m2 = sup(state, x_64, y, 1.0)
    np.testing.assert_allclose(float(m['loss']), float(m2['loss']),
                               rtol=1e-5)

    ev = make_eval_step(model, tc)
    acc = ev(state.params, x_full, y, jax.random.key(1), 0.3)
    assert 0.0 <= float(acc) <= 1.0


def test_prep_image_rejects_non_fullres_mismatch():
    """_prep_image only downscales a genuine full-res ship; any other
    resolution mismatch is a miswired loader and must raise, not silently
    coerce the data."""
    import jax.numpy as jnp
    import pytest
    from gltvae.train.steps import _prep_image
    ok = _prep_image(jnp.zeros((2, 218, 178, 3), jnp.uint8), 64)
    assert ok.shape == (2, 64, 64, 3)
    with pytest.raises(ValueError, match='resolution'):
        _prep_image(jnp.zeros((2, 32, 32, 3), jnp.uint8), 64)
    with pytest.raises(ValueError, match='resolution'):
        _prep_image(jnp.zeros((2, 64, 32, 3), jnp.uint8), 64)


def test_prep_image_rejects_padded_looking_square_batch():
    """A square batch under 2x the model resolution is exactly what a
    padded augmentation loader ships (image_size + 2*pad). Reaching
    _prep_image with one means DataConfig.augment_pad > 0 while
    TrainConfig.augment_pad == 0 (the crop never ran) — this must raise
    the desync error, not silently bilinear-downscale the train split.
    Square ships at >= 2x remain a legitimate full-res resize."""
    import jax.numpy as jnp
    import pytest
    from gltvae.train.steps import _prep_image
    with pytest.raises(ValueError, match='augment_pad'):
        _prep_image(jnp.zeros((2, 72, 72, 3), jnp.uint8), 64)
    ok = _prep_image(jnp.zeros((2, 128, 128, 3), jnp.uint8), 64)
    assert ok.shape == (2, 64, 64, 3)
