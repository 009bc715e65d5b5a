"""Trainer multi-step dispatch: a scanned run must match the per-step run
exactly (same RNG stream, same final state) — including the
semi-supervised interleave, which dispatches mixed sup/unsup chunks
through the lax.cond scan (make_mixed_scan_train_step).

Every Trainer here pins resident_train='off': this suite tests the
HOST-shipped scan dispatch; the device-resident path has its own
parity suite (test_resident_train.py)."""

import jax
import numpy as np
import pytest

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
    t1 = Trainer(MODEL, cfg, mu_init=mu(), resident_train='off')
    t1.train(loaders(1.0))
    t4 = Trainer(MODEL, cfg, mu_init=mu(), resident_train='off', steps_per_dispatch=4)
    t4.train(loaders(1.0))
    assert int(t1.state.step) == int(t4.state.step) == 12
    for a, b in zip(jax.tree.leaves(_final_params(t1)),
                    jax.tree.leaves(_final_params(t4))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_scan_handles_remainder_chunks():
    # 48/8 = 6 batches/epoch, spd=4 -> chunks of 4 + 2
    cfg = TrainConfig(batch_size=8, perc_supervision=0.0,
                      classifier_mc_samples=2, n_epochs=1)
    t = Trainer(MODEL, cfg, mu_init=mu(), resident_train='off', steps_per_dispatch=4)
    t.train(loaders(0.0))
    assert int(t.state.step) == 6


def test_mixed_scan_matches_per_step_semi_sup():
    """sup=0.5 -> period 2: every spd=4 chunk interleaves sup and unsup
    steps. The mixed lax.cond scan must reproduce the per-step run's final
    params exactly (same schedule, same per-step RNG stream)."""
    cfg = TrainConfig(batch_size=8, perc_supervision=0.5,
                      classifier_mc_samples=2, n_epochs=2)
    t1 = Trainer(MODEL, cfg, mu_init=mu(), resident_train='off')
    t1.train(loaders(0.5))
    t4 = Trainer(MODEL, cfg, mu_init=mu(), resident_train='off', steps_per_dispatch=4)
    result = t4.train(loaders(0.5))
    # 3 sup + 3 unsup batches per epoch
    assert int(t1.state.step) == int(t4.state.step) == 12
    assert t4._mixed_scan_fn is not None   # the mixed path actually ran
    assert np.isfinite(result['best_val_accuracy'])
    for a, b in zip(jax.tree.leaves(_final_params(t1)),
                    jax.tree.leaves(_final_params(t4))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_mixed_scan_matches_per_step_sup02():
    """sup=0.2 (the paper's hardest headline schedule) -> period 4 over
    2 sup + 7 unsup batches: chunk boundaries fall mid-period."""
    splits = synthetic_splits(n_train=68, n_valid=8, n_test=8,
                              sup_frac=0.2, image_size=16, y_dim=4)
    cfg = TrainConfig(batch_size=8, perc_supervision=0.2,
                      classifier_mc_samples=2, n_epochs=1)
    lds1 = {k: BatchLoader(v, 8, seed=0) for k, v in splits.items()}
    lds4 = {k: BatchLoader(v, 8, seed=0) for k, v in splits.items()}
    t1 = Trainer(MODEL, cfg, mu_init=mu(), resident_train='off')
    t1.train(lds1)
    t4 = Trainer(MODEL, cfg, mu_init=mu(), resident_train='off', steps_per_dispatch=4)
    t4.train(lds4)
    assert int(t1.state.step) == int(t4.state.step) == 9
    for a, b in zip(jax.tree.leaves(_final_params(t1)),
                    jax.tree.leaves(_final_params(t4))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_schedule_flags_match_reference_interleave():
    """_schedule_flags must reproduce the reference's per-step decision
    (gated_ccvae.py:320-334) for every (total, period, quota) regime."""
    for total, period, quota in [(6, 2, 3), (9, 4, 2), (6, 1, 6),
                                 (10, 1, 7), (5, 0, 0)]:
        flags = Trainer._schedule_flags(total, period, quota)
        ctr = 0
        for i, f in enumerate(flags):
            expect = period > 0 and i % period == 0 and ctr < quota
            assert f == expect, (total, period, quota, i)
            ctr += int(f)
        assert sum(flags) == min(quota, sum(
            1 for i in range(total) if period > 0 and i % period == 0))


def test_scan_metrics_are_step_complete(tmp_path):
    """With log_every=1 the metrics CSV must contain one row per training
    step with the SAME values regardless of steps_per_dispatch."""
    cfg = TrainConfig(batch_size=8, perc_supervision=0.5,
                      classifier_mc_samples=2, n_epochs=1)
    rows = {}
    for spd in (1, 4):
        t = Trainer(MODEL, cfg, mu_init=mu(), resident_train='off', steps_per_dispatch=spd,
                    metrics_path=str(tmp_path / f'm{spd}.csv'))
        t.train(loaders(0.5), log_every=1)
        rows[spd] = t.metrics.rows
    assert len(rows[1]) == len(rows[4]) == 6   # one row per step
    for r1, r4 in zip(rows[1], rows[4]):
        assert r1['step'] == r4['step']
        assert r1['supervised'] == r4['supervised']
        np.testing.assert_allclose(r1['loss'], r4['loss'], rtol=1e-5)
        np.testing.assert_allclose(r1['elbo'], r4['elbo'], rtol=1e-5)


def test_scan_elbo_matches_per_batch():
    """Trainer.test_elbo through the scan dispatch: identical key chain
    and values as the per-batch path, incl. a remainder chunk."""
    cfg = TrainConfig(batch_size=8, perc_supervision=1.0,
                      classifier_mc_samples=2)
    splits = synthetic_splits(n_train=48, n_valid=24, n_test=8,
                              sup_frac=1.0, image_size=16, y_dim=4)
    lds = {k: BatchLoader(v, 8, seed=0) for k, v in splits.items()}
    t1 = Trainer(MODEL, cfg, mu_init=mu(), resident_train='off')
    t2 = Trainer(MODEL, cfg, mu_init=mu(), resident_train='off', steps_per_dispatch=2)
    e1 = t1.test_elbo(lds['valid'])
    lds['valid'].reset()
    e2 = t2.test_elbo(lds['valid'])
    assert t2._scan_elbo is not None
    np.testing.assert_allclose(e1, e2, rtol=1e-5)


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

    t1 = Trainer(MODEL, cfg, mu_init=mu(), resident_train='off')
    t2 = Trainer(MODEL, cfg, mu_init=mu(), resident_train='off', steps_per_dispatch=2)
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
    t1 = Trainer(MODEL, cfg, mu_init=mu(), resident_train='off', steps_per_dispatch=2)
    acc1 = t1.evaluate(lds['valid'])
    lds['valid'].reset()
    tm = Trainer(MODEL, cfg, mu_init=mu(), resident_train='off', steps_per_dispatch=2,
                 mesh=create_mesh())
    accm = tm.evaluate(lds['valid'])
    np.testing.assert_allclose(acc1, accm, rtol=1e-5)


@pytest.mark.parametrize('mode', ['full', 'dots'])
def test_remat_matches_plain_step(mode):
    """TrainConfig.remat (jax.checkpoint around the loss) must change
    HBM scheduling only, not math: grads/params after a sup and an unsup
    step match the store-activations path to float tolerance."""
    import jax
    import numpy as np
    from gltvae.config import ModelConfig, TrainConfig
    from gltvae.models.ccvae import CCVAE
    from gltvae.train.state import create_train_state
    from gltvae.train.steps import make_train_steps

    model_cfg = ModelConfig(image_size=16, z_dim=8, y_dim=4,
                            enc_features=(8, 8), enc_hidden=16,
                            dec_features=(16, 8))
    model = CCVAE(model_cfg)
    rng = np.random.RandomState(0)
    mu = np.eye(4, dtype=np.float32)
    x = rng.randint(0, 256, (8, 16, 16, 3)).astype(np.uint8)
    y = (rng.rand(8, 4) > 0.5).astype(np.float32)

    def run(remat):
        cfg = TrainConfig(batch_size=8, classifier_mc_samples=4,
                          remat=remat)
        state = create_train_state(model, cfg, jax.random.key(0),
                                   mu_init=mu)
        sup, unsup = make_train_steps(model, cfg, donate=False)
        state, m1 = sup(state, x, y, 1.0)
        state, m2 = unsup(state, x, y, 1.0)
        return jax.device_get(state.params), (float(m1['loss']),
                                              float(m2['loss']))

    p0, l0 = run('none')
    p1, l1 = run(mode)
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=1e-4, atol=1e-6), p0, p1)


def test_remat_invalid_mode_raises():
    from gltvae.config import ModelConfig, TrainConfig
    from gltvae.models.ccvae import CCVAE
    from gltvae.train.steps import make_train_steps
    import pytest as _pytest
    m = ModelConfig(image_size=16, z_dim=8, y_dim=4, enc_features=(8, 8),
                    enc_hidden=16, dec_features=(16, 8))
    with _pytest.raises(ValueError, match='remat'):
        make_train_steps(CCVAE(m), TrainConfig(remat='bogus'))
