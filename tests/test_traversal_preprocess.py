"""Latent-traversal renderer and Pallas preprocessing tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gltvae.config import ModelConfig
from gltvae.models.ccvae import CCVAE
from gltvae.eval.traversal import _build_grid, make_traversal_fn, \
    latent_traversal
from gltvae.ops.pallas.preprocess import normalize_images, preprocess_batch

MODEL = ModelConfig(image_size=16, z_dim=8, y_dim=4,
                    enc_features=(8, 8), enc_hidden=16,
                    dec_features=(16, 8))


def mu_init():
    m = np.full((4, 4), 0.5, np.float32)
    np.fill_diagonal(m, 1.0)
    return m


class TestTraversalGrid:
    def test_grid_rows_sweep_one_dim(self):
        z = jnp.arange(8.0)
        dims = jnp.array([1, 5], jnp.int32)
        vals = jnp.array([-2.0, 0.0, 2.0])
        grid = _build_grid(z, dims, vals)
        assert grid.shape == (6, 8)
        g = np.array(grid).reshape(2, 3, 8)
        # dim 1 swept, others untouched
        np.testing.assert_array_equal(g[0, :, 1], [-2.0, 0.0, 2.0])
        for s in range(3):
            row = g[0, s].copy()
            row[1] = z[1]
            np.testing.assert_array_equal(row, np.array(z))
        np.testing.assert_array_equal(g[1, :, 5], [-2.0, 0.0, 2.0])

    def test_traversal_output_shape(self):
        model = CCVAE(MODEL)
        params = model.init(jax.random.key(0), mu_init=mu_init())
        fn = make_traversal_fn(model, n_steps=4)
        out = fn(params, jnp.zeros((8,)))
        assert out.shape == (8, 4, 16, 16, 3)
        assert np.isfinite(np.array(out)).all()
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_traversal_from_image_anchor(self):
        model = CCVAE(MODEL)
        params = model.init(jax.random.key(0), mu_init=mu_init())
        x = jnp.array(np.random.RandomState(0)
                      .rand(1, 16, 16, 3).astype(np.float32))
        out = latent_traversal(model, params, x=x, n_steps=3, dims=[0, 2])
        assert out.shape == (2, 3, 16, 16, 3)


class TestPreprocess:
    def test_normalize_matches_xla(self, rng):
        u8 = rng.randint(0, 256, (4, 16, 16, 3)).astype(np.uint8)
        got = normalize_images(jnp.array(u8))
        np.testing.assert_allclose(np.array(got), u8 / 255.0, rtol=1e-6)

    def test_normalize_lane_aligned_large(self, rng):
        # CelebA-64-shaped batch: 2 x 64 x 64 x 3 = 24576 = 192*128 bytes
        u8 = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
        got = normalize_images(jnp.array(u8))
        np.testing.assert_allclose(np.array(got), u8 / 255.0, rtol=1e-6)

    def test_unaligned_fallback(self, rng):
        u8 = rng.randint(0, 256, (1, 3, 3, 3)).astype(np.uint8)  # 27 bytes
        got = normalize_images(jnp.array(u8))
        np.testing.assert_allclose(np.array(got), u8 / 255.0, rtol=1e-6)

    def test_standardize(self, rng):
        u8 = rng.randint(0, 256, (2, 16, 16, 3)).astype(np.uint8)
        got = preprocess_batch(jnp.array(u8), mean=(0.5, 0.5, 0.5),
                               std=(0.25, 0.25, 0.25))
        want = (u8 / 255.0 - 0.5) / 0.25
        np.testing.assert_allclose(np.array(got), want, rtol=1e-5,
                                   atol=1e-5)

    def test_flip_is_exact_mirror_for_flipped_rows(self, rng):
        u8 = rng.randint(0, 256, (16, 16, 16, 3)).astype(np.uint8)
        key = jax.random.key(0)  # verified: yields both flipped & unflipped
        got = np.array(preprocess_batch(jnp.array(u8), key=key, flip=True))
        base = u8 / 255.0
        flipped = base[:, :, ::-1, :]
        kinds = set()
        for i in range(16):
            ok_same = np.allclose(got[i], base[i], rtol=1e-6)
            ok_flip = np.allclose(got[i], flipped[i], rtol=1e-6)
            assert ok_same or ok_flip
            kinds.add(ok_same)
        assert len(kinds) == 2


class TestFusedAugment:
    """fused_augment (Pallas random-crop+hflip+normalize) must be
    BIT-identical to its XLA twin for the same key — the selection
    matmul is exact 0/1 arithmetic."""

    def _u8(self, rng, shape):
        return jnp.asarray(rng.randint(0, 256, shape, dtype=np.uint8))

    def test_matches_xla_twin_64(self, rng):
        from gltvae.ops.pallas.preprocess import fused_augment, augment_xla
        u8 = self._u8(rng, (8, 72, 72, 3))
        key = jax.random.key(1)
        a = fused_augment(u8, key, 64)
        b = augment_xla(u8, key, 64)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.dtype == jnp.float32 and a.shape == (8, 64, 64, 3)

    def test_matches_xla_twin_128(self, rng):
        from gltvae.ops.pallas.preprocess import fused_augment, augment_xla
        u8 = self._u8(rng, (2, 136, 136, 3))
        key = jax.random.key(2)
        np.testing.assert_array_equal(
            np.asarray(fused_augment(u8, key, 128)),
            np.asarray(augment_xla(u8, key, 128)))

    def test_no_pad_reduces_to_flip_normalize(self, rng):
        from gltvae.ops.pallas.preprocess import fused_augment
        u8 = self._u8(rng, (4, 64, 64, 3))
        out = np.asarray(fused_augment(u8, jax.random.key(3), 64))
        # same mul-by-reciprocal the kernel applies (x/255 differs in the
        # last ulp from x*(1/255))
        src = np.asarray(u8, np.float32) * np.float32(1.0 / 255.0)
        for i in range(4):   # each image is src or its exact mirror
            assert (np.array_equal(out[i], src[i])
                    or np.array_equal(out[i], src[i][:, ::-1]))

    def test_crop_offsets_cover_range(self, rng):
        from gltvae.ops.pallas.preprocess import fused_augment
        # a ramp image: the crop offset is recoverable from pixel [0,0,0]
        ramp = np.zeros((16, 68, 68, 3), np.uint8)
        ramp += np.arange(68, dtype=np.uint8)[None, :, None, None]
        out = np.asarray(fused_augment(jnp.asarray(ramp),
                                       jax.random.key(4), 64, flip=False))
        dys = np.round(out[:, 0, 0, 0] * 255).astype(int)
        assert dys.min() >= 0 and dys.max() <= 4 and len(set(dys)) > 1

    def test_trainer_augment_path(self):
        """Trainer with augment_pad: padded uint8 batches are cropped to
        the model size on device, and the train loop runs end-to-end."""
        from gltvae.config import ModelConfig, TrainConfig
        from gltvae.data.pipeline import BatchLoader
        from gltvae.data.synthetic import synthetic_splits
        from gltvae.train.loop import Trainer
        model = ModelConfig(image_size=16, z_dim=8, y_dim=4,
                            enc_features=(8, 8), enc_hidden=16,
                            dec_features=(16, 8))
        cfg = TrainConfig(batch_size=8, perc_supervision=1.0,
                          classifier_mc_samples=2, n_epochs=1,
                          augment_pad=2)
        # loaders yield PADDED (20px) train images
        from gltvae.data.pipeline import ArrayDataset
        splits = synthetic_splits(n_train=16, n_valid=8, n_test=8,
                                  sup_frac=1.0, image_size=20, y_dim=4)
        for mode in ('valid', 'test'):   # eval splits at model size
            splits[mode] = ArrayDataset(
                images=splits[mode].images[:, 2:18, 2:18],
                labels=splits[mode].labels)
        lds = {k: BatchLoader(v, 8, seed=0) for k, v in splits.items()}
        t = Trainer(model, cfg, mu_init=np.eye(4, dtype=np.float32))
        assert t._augment is not None
        res = t.train(lds)
        assert int(t.state.step) == 2
        assert np.isfinite(res['best_val_accuracy'])

    def test_trainer_augment_pad_desync_fails_fast(self):
        """TrainConfig.augment_pad with loaders at the UNPADDED size must
        raise a clear error at the first augmented batch, not silently
        degrade the random crop to offset-0 (flip-only)."""
        from gltvae.config import ModelConfig, TrainConfig
        from gltvae.data.pipeline import BatchLoader
        from gltvae.data.synthetic import synthetic_splits
        from gltvae.train.loop import Trainer
        model = ModelConfig(image_size=16, z_dim=8, y_dim=4,
                            enc_features=(8, 8), enc_hidden=16,
                            dec_features=(16, 8))
        cfg = TrainConfig(batch_size=8, perc_supervision=1.0,
                          classifier_mc_samples=2, n_epochs=1,
                          augment_pad=2)
        # desync: loaders yield 16px images (DataConfig.augment_pad=0)
        splits = synthetic_splits(n_train=16, n_valid=8, n_test=8,
                                  sup_frac=1.0, image_size=16, y_dim=4)
        lds = {k: BatchLoader(v, 8, seed=0) for k, v in splits.items()}
        t = Trainer(model, cfg, mu_init=np.eye(4, dtype=np.float32))
        with pytest.raises(ValueError, match='augment_pad desync'):
            t.train(lds)

    def test_trainer_augment_on_mesh(self):
        """The shard_map augmentation leg (per-shard Pallas call, key
        decorrelated by axis_index) must compile and run over the
        8-device CPU mesh inside a real Trainer epoch."""
        import numpy as np
        from gltvae.config import ModelConfig, TrainConfig
        from gltvae.data.pipeline import BatchLoader, ArrayDataset
        from gltvae.data.synthetic import synthetic_splits
        from gltvae.parallel.mesh import create_mesh
        from gltvae.train.loop import Trainer
        model = ModelConfig(image_size=16, z_dim=8, y_dim=4,
                            enc_features=(8, 8), enc_hidden=16,
                            dec_features=(16, 8))
        cfg = TrainConfig(batch_size=8, perc_supervision=1.0,
                          classifier_mc_samples=2, n_epochs=1,
                          augment_pad=2)
        splits = synthetic_splits(n_train=16, n_valid=8, n_test=8,
                                  sup_frac=1.0, image_size=20, y_dim=4)
        for mode in ('valid', 'test'):
            splits[mode] = ArrayDataset(
                images=splits[mode].images[:, 2:18, 2:18],
                labels=splits[mode].labels)
        lds = {k: BatchLoader(v, 8, seed=0) for k, v in splits.items()}
        t = Trainer(model, cfg, mu_init=np.eye(4, dtype=np.float32),
                    mesh=create_mesh(), steps_per_dispatch=2)
        res = t.train(lds)
        assert int(t.state.step) == 2
        assert np.isfinite(res['best_val_accuracy'])


class TestStackedAugment:
    """fused_augment_stacked: the scan-chunk augmentation path must keep
    the per-step noise stream — results invariant to steps-per-dispatch."""

    def test_stacked_equals_per_step_calls(self, rng):
        from gltvae.ops.pallas.preprocess import (fused_augment,
                                                  fused_augment_stacked)
        u8 = jnp.asarray(rng.randint(0, 256, (3, 4, 20, 20, 3),
                                     dtype=np.uint8))
        keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(7), i)
                        )(jnp.arange(3))
        stacked = np.asarray(fused_augment_stacked(u8, keys, 16))
        for i in range(3):
            np.testing.assert_array_equal(
                stacked[i], np.asarray(fused_augment(u8[i], keys[i], 16)))

    def test_trainer_scan_matches_per_step_with_augment(self):
        """END-TO-END: equivalent params after an augmented epoch whether
        dispatched per-step or as one scan chunk — the SAME crops/flips
        per step (stacked folds one key per inner step), so the only
        remaining delta is scan-vs-per-step float association (the
        tests/test_trainer_scan.py tolerance). Before the per-step key
        fix the crops themselves differed and this fails wildly."""
        from gltvae.config import ModelConfig, TrainConfig
        from gltvae.data.pipeline import BatchLoader, ArrayDataset
        from gltvae.data.synthetic import synthetic_splits
        from gltvae.train.loop import Trainer

        def run(spd):
            model = ModelConfig(image_size=16, z_dim=8, y_dim=4,
                                enc_features=(8, 8), enc_hidden=16,
                                dec_features=(16, 8))
            cfg = TrainConfig(batch_size=8, perc_supervision=1.0,
                              classifier_mc_samples=2, n_epochs=1,
                              augment_pad=2)
            splits = synthetic_splits(n_train=32, n_valid=8, n_test=8,
                                      sup_frac=1.0, image_size=20, y_dim=4)
            for mode in ('valid', 'test'):
                splits[mode] = ArrayDataset(
                    images=splits[mode].images[:, 2:18, 2:18],
                    labels=splits[mode].labels)
            lds = {k: BatchLoader(v, 8, seed=0) for k, v in splits.items()}
            t = Trainer(model, cfg, mu_init=np.eye(4, dtype=np.float32),
                        steps_per_dispatch=spd)
            t.train(lds)
            return jax.device_get(t.state.params)
        a, b = run(1), run(4)
        jax.tree.map(lambda x, y: np.testing.assert_allclose(
            x, y, rtol=1e-5, atol=1e-7), a, b)

    def test_non_rgb_channel_count(self, rng):
        from gltvae.ops.pallas.preprocess import fused_augment, augment_xla
        u8 = jnp.asarray(rng.randint(0, 256, (4, 20, 20, 1),
                                     dtype=np.uint8))
        key = jax.random.key(9)
        np.testing.assert_array_equal(
            np.asarray(fused_augment(u8, key, 16)),
            np.asarray(augment_xla(u8, key, 16)))
