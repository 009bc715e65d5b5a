"""Preemption-safe auto-resume: interrupt training, rebuild the Trainer
from scratch, resume — the run completes with the right epoch count and
annealed temperature."""

import numpy as np

from gltvae.config import ModelConfig, TrainConfig
from gltvae.data.pipeline import BatchLoader
from gltvae.data.synthetic import synthetic_splits
from gltvae.train.loop import Trainer

MODEL = ModelConfig(image_size=16, z_dim=8, y_dim=4,
                    enc_features=(8, 8), enc_hidden=16,
                    dec_features=(16, 8))
CFG = TrainConfig(batch_size=8, perc_supervision=1.0,
                  classifier_mc_samples=2, n_epochs=4)


def make_loaders():
    splits = synthetic_splits(n_train=32, n_valid=8, n_test=8,
                              sup_frac=1.0, image_size=16, y_dim=4)
    return {k: BatchLoader(v, 8, seed=0) for k, v in splits.items()}


def test_resume_continues_schedule(tmp_path):
    mu = np.eye(4, dtype=np.float32)
    ckpt_dir = str(tmp_path / 'ckpt')

    # phase 1: train 2 of 4 epochs, then "die"
    t1 = Trainer(MODEL, CFG, mu_init=mu, checkpoint_dir=ckpt_dir)
    t1.train(make_loaders(), epochs=2)
    step_after_2 = int(t1.state.step)
    t1.ckpt.close()
    assert step_after_2 == 2 * 4  # 32/8 = 4 batches/epoch

    # phase 2: fresh process/Trainer, resume to the full 4 epochs
    t2 = Trainer(MODEL, CFG, mu_init=mu, checkpoint_dir=ckpt_dir)
    result = t2.train(make_loaders(), resume=True)
    assert int(t2.state.step) == 4 * 4
    # only the remaining 2 epochs were run
    assert len(result['history']) == 2
    # learnable temp schedule fast-forwarded: 1.0 * 0.99^2 at resume,
    # decayed twice more during phase 2
    np.testing.assert_allclose(t2.gating_temp, 0.99 ** 4, rtol=1e-6)


def test_resume_without_checkpoint_is_fresh(tmp_path):
    t = Trainer(MODEL, CFG, mu_init=np.eye(4, dtype=np.float32),
                checkpoint_dir=str(tmp_path / 'empty'))
    result = t.train(make_loaders(), epochs=1, resume=True)
    assert len(result['history']) == 1
