"""End-to-end learning test: on image-correlated synthetic labels the
classifier accuracy must climb well above the label marginal within a
few hundred steps. This is the 'does the whole ELBO actually train'
check the reference never had."""

import jax
import numpy as np
import pytest

from gltvae.config import ModelConfig, TrainConfig
from gltvae.data.pipeline import BatchLoader
from gltvae.data.synthetic import synthetic_celeba
from gltvae.models.ccvae import CCVAE
from gltvae.train.loop import Trainer
from gltvae.train.steps import make_scan_train_steps, make_train_steps
from gltvae.train.state import create_train_state


MODEL = ModelConfig(image_size=16, z_dim=8, y_dim=4,
                    enc_features=(16, 32), enc_hidden=32,
                    dec_features=(32, 16))


def test_supervised_training_learns_labels():
    ds = synthetic_celeba(n=256, image_size=16, y_dim=4, seed=0,
                          learnable_signal=True)
    cfg = TrainConfig(batch_size=32, lr=3e-3, classifier_mc_samples=4,
                      perc_supervision=1.0, n_epochs=150,
                      deterministic_eval=True)
    trainer = Trainer(MODEL, cfg,
                      mu_init=np.eye(4, dtype=np.float32))
    loaders = {'sup': BatchLoader(ds, 32, seed=0),
               'valid': BatchLoader(ds, 32, seed=1)}
    result = trainer.train(loaders)
    # label marginal is ~0.5; a learning model must beat it clearly
    assert result['best_val_accuracy'] > 0.70, result


def test_scan_steps_match_per_step_dispatch():
    """N scanned inner steps == N sequential step calls (same RNG fold-in
    stream, same final params)."""
    model = CCVAE(MODEL)
    cfg = TrainConfig(batch_size=8, lr=1e-3, classifier_mc_samples=2)
    state0 = create_train_state(model, cfg, jax.random.key(0),
                                mu_init=np.eye(4, dtype=np.float32))
    rng = np.random.RandomState(0)
    xs = rng.randint(0, 256, (4, 8, 16, 16, 3)).astype(np.uint8)
    ys = (rng.rand(4, 8, 4) > 0.5).astype(np.float32)

    sup, _ = make_train_steps(model, cfg, donate=False)
    s_seq = state0
    losses_seq = []
    for i in range(4):
        s_seq, m = sup(s_seq, xs[i], ys[i], 1.0)
        losses_seq.append(float(m['loss']))

    scan_sup, _ = make_scan_train_steps(model, cfg, donate=False)
    s_scan, ms_scan = scan_sup(state0, xs, ys, 1.0)

    np.testing.assert_allclose(np.array(ms_scan['loss']), losses_seq,
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_seq.params),
                    jax.tree.leaves(s_scan.params)):
        np.testing.assert_allclose(np.array(a), np.array(b), rtol=1e-5,
                                   atol=1e-7)
