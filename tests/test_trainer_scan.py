"""Trainer multi-step dispatch: a scanned run must match the per-step run
exactly (same RNG stream, same final state) and fall back to per-step for
the semi-supervised interleave."""

import jax
import numpy as np

from gltvae.config import ModelConfig, TrainConfig
from gltvae.data.pipeline import BatchLoader
from gltvae.data.synthetic import synthetic_splits
from gltvae.train.loop import Trainer

MODEL = ModelConfig(image_size=16, z_dim=8, y_dim=4,
                    enc_features=(8, 8), enc_hidden=16,
                    dec_features=(16, 8))


def loaders(sup_frac):
    splits = synthetic_splits(n_train=48, n_valid=8, n_test=8,
                              sup_frac=sup_frac, image_size=16, y_dim=4)
    return {k: BatchLoader(v, 8, seed=0) for k, v in splits.items()}


def mu():
    return np.eye(4, dtype=np.float32)


def _final_params(trainer):
    return jax.device_get(trainer.state.params)


def test_scan_matches_per_step_fully_supervised():
    cfg = TrainConfig(batch_size=8, perc_supervision=1.0,
                      classifier_mc_samples=2, n_epochs=2)
    t1 = Trainer(MODEL, cfg, mu_init=mu())
    t1.train(loaders(1.0))
    t4 = Trainer(MODEL, cfg, mu_init=mu(), steps_per_dispatch=4)
    t4.train(loaders(1.0))
    assert int(t1.state.step) == int(t4.state.step) == 12
    for a, b in zip(jax.tree.leaves(_final_params(t1)),
                    jax.tree.leaves(_final_params(t4))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_scan_handles_remainder_chunks():
    # 48/8 = 6 batches/epoch, spd=4 -> chunks of 4 + 2
    cfg = TrainConfig(batch_size=8, perc_supervision=0.0,
                      classifier_mc_samples=2, n_epochs=1)
    t = Trainer(MODEL, cfg, mu_init=mu(), steps_per_dispatch=4)
    t.train(loaders(0.0))
    assert int(t.state.step) == 6


def test_semi_supervised_falls_back_to_per_step():
    cfg = TrainConfig(batch_size=8, perc_supervision=0.5,
                      classifier_mc_samples=2, n_epochs=1)
    t = Trainer(MODEL, cfg, mu_init=mu(), steps_per_dispatch=4)
    result = t.train(loaders(0.5))
    # 3 sup + 3 unsup batches
    assert int(t.state.step) == 6
    assert np.isfinite(result['best_val_accuracy'])


def test_scan_eval_matches_per_batch_eval():
    """Trainer.evaluate through the scan-eval dispatch must produce the
    IDENTICAL accuracy as the per-batch path (same key chain, same
    per-batch values), including a remainder chunk (3 batches, spd=2)."""
    cfg = TrainConfig(batch_size=8, perc_supervision=1.0,
                      classifier_mc_samples=2)
    # 24 valid images -> 3 batches: one full spd=2 chunk + a remainder
    from gltvae.data.synthetic import synthetic_splits
    splits = synthetic_splits(n_train=48, n_valid=24, n_test=8,
                              sup_frac=1.0, image_size=16, y_dim=4)
    lds = {k: BatchLoader(v, 8, seed=0) for k, v in splits.items()}

    t1 = Trainer(MODEL, cfg, mu_init=mu())
    t2 = Trainer(MODEL, cfg, mu_init=mu(), steps_per_dispatch=2)
    assert t2._scan_eval is not None
    acc1 = t1.evaluate(lds['valid'])
    lds['valid'].reset()
    acc2 = t2.evaluate(lds['valid'])
    np.testing.assert_allclose(acc1, acc2, rtol=1e-6)


def test_scan_eval_on_mesh_matches_single():
    from gltvae.parallel.mesh import create_mesh
    cfg = TrainConfig(batch_size=8, perc_supervision=1.0,
                      classifier_mc_samples=2)
    from gltvae.data.synthetic import synthetic_splits
    splits = synthetic_splits(n_train=48, n_valid=32, n_test=8,
                              sup_frac=1.0, image_size=16, y_dim=4)
    lds = {k: BatchLoader(v, 8, seed=0) for k, v in splits.items()}
    t1 = Trainer(MODEL, cfg, mu_init=mu(), steps_per_dispatch=2)
    acc1 = t1.evaluate(lds['valid'])
    lds['valid'].reset()
    tm = Trainer(MODEL, cfg, mu_init=mu(), steps_per_dispatch=2,
                 mesh=create_mesh())
    accm = tm.evaluate(lds['valid'])
    np.testing.assert_allclose(acc1, accm, rtol=1e-5)
