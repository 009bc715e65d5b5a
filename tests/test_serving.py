"""StableHLO serving export (gltvae/utils/serving.py): the artifact must
reproduce the live deterministic predict protocol bit-close, accept any
batch size through its symbolic batch dim, and work after a pure
bytes round-trip (no gltvae model objects at serving time)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gltvae.config import ModelConfig
from gltvae.models.ccvae import CCVAE, Temps
from gltvae.utils import serving


@pytest.fixture(scope='module')
def small_model():
    cfg = ModelConfig(image_size=16, z_dim=8, y_dim=4, enc_features=(8, 8),
                      enc_hidden=16, dec_features=(16, 8))
    model = CCVAE(cfg)
    params = model.init(jax.random.key(0),
                        mu_init=np.eye(4, dtype=np.float32))
    return model, params


class TestServingExport:
    def test_predict_roundtrip_matches_live(self, small_model):
        model, params = small_model
        blob = serving.export_predict(model, params, platforms=('cpu',))
        assert isinstance(blob, bytes) and len(blob) > 0
        served = serving.load_serving(blob)
        u8 = jnp.asarray(np.random.RandomState(0).randint(
            0, 256, (5, 16, 16, 3), dtype=np.uint8))
        got = np.asarray(served.call(u8))
        want = np.asarray(model.predict_probs(
            jax.tree.map(jnp.asarray, params),
            u8.astype(jnp.float32) / 255.0, None,
            Temps(gating=jnp.float32(1.0)), deterministic=True))
        np.testing.assert_allclose(got, want, atol=1e-6)
        assert got.shape == (5, 4)
        assert np.all((got >= 0) & (got <= 1))

    def test_symbolic_batch_dim(self, small_model):
        model, params = small_model
        served = serving.load_serving(
            serving.export_predict(model, params, platforms=('cpu',)))
        for b in (1, 3, 8):
            u8 = jnp.zeros((b, 16, 16, 3), jnp.uint8)
            assert served.call(u8).shape == (b, 4)

    def test_reconstruct_artifact(self, small_model):
        model, params = small_model
        served = serving.load_serving(
            serving.export_reconstruct(model, params, platforms=('cpu',)))
        u8 = jnp.asarray(np.random.RandomState(1).randint(
            0, 256, (2, 16, 16, 3), dtype=np.uint8))
        rec = np.asarray(served.call(u8))
        assert rec.shape == (2, 16, 16, 3)
        assert np.all((rec >= 0) & (rec <= 1))      # sigmoid output

    def test_file_roundtrip(self, small_model, tmp_path):
        model, params = small_model
        blob = serving.export_predict(model, params, platforms=('cpu',))
        p = tmp_path / 'm.shlo'
        p.write_bytes(blob)
        served = serving.load_serving(str(p))
        u8 = jnp.zeros((2, 16, 16, 3), jnp.uint8)
        assert served.call(u8).shape == (2, 4)

    def test_cli_end_to_end(self, small_model, tmp_path, monkeypatch):
        """tools/export_serving.py against a real Orbax run dir written
        by the Trainer (incl. its round-trip verification gate)."""
        import sys
        sys.path.insert(0, 'tools')
        from gltvae.config import TrainConfig, save_model_config
        from gltvae.data.pipeline import BatchLoader
        from gltvae.data.synthetic import synthetic_splits
        from gltvae.train.loop import Trainer
        model_cfg = ModelConfig()            # flagship shape: CLI defaults
        cfg = TrainConfig(batch_size=8, perc_supervision=1.0,
                          classifier_mc_samples=2, n_epochs=1)
        splits = synthetic_splits(n_train=16, n_valid=8, n_test=8,
                                  sup_frac=1.0, image_size=64, y_dim=18)
        lds = {k: BatchLoader(v, 8, seed=0) for k, v in splits.items()}
        run = str(tmp_path / 'run')
        mu = np.eye(18, dtype=np.float32)
        t = Trainer(model_cfg, cfg, mu_init=mu,
                    checkpoint_dir=f'{run}/orbax')
        t.train(lds, param_dir=run)
        save_model_config(model_cfg, run)
        import export_serving
        out = str(tmp_path / 'm.shlo')
        export_serving.main(['--checkpoint', run, '--output', out])
        served = serving.load_serving(out)
        u8 = jnp.zeros((2, 64, 64, 3), jnp.uint8)
        assert served.call(u8).shape == (2, 18)
