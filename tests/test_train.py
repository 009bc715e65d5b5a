"""Training engine: optimizer semantics (μ freezing), interleave schedule,
loss progress, checkpoint resume."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gltvae.config import ModelConfig, TrainConfig
from gltvae.data.pipeline import ArrayDataset, BatchLoader
from gltvae.data.synthetic import synthetic_splits
from gltvae.models.ccvae import CCVAE
from gltvae.train.state import create_train_state
from gltvae.train.steps import make_train_steps, make_eval_step
from gltvae.train.loop import Trainer

MODEL = ModelConfig(image_size=16, z_dim=8, y_dim=4,
                    enc_features=(8, 8), enc_hidden=16,
                    dec_features=(16, 8))
TRAIN = TrainConfig(batch_size=8, lr=1e-3, classifier_mc_samples=4,
                    perc_supervision=0.5)


def mu_init(y=4):
    m = np.full((y, y), 0.5, np.float32)
    np.fill_diagonal(m, 1.0)
    return m


def batch(n=8, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randint(0, 256, (n, 16, 16, 3), dtype=np.uint8)
    y = (rng.rand(n, 4) > 0.5).astype(np.float32)
    return jnp.array(x), jnp.array(y)


@pytest.fixture(scope='module')
def learnable_setup():
    model = CCVAE(MODEL)
    state = create_train_state(model, TRAIN, jax.random.key(0),
                               mu_init=mu_init())
    sup, unsup = make_train_steps(model, TRAIN, donate=False)
    return model, state, sup, unsup


def test_sup_step_updates_all_params(learnable_setup):
    model, state, sup, _ = learnable_setup
    x, y = batch()
    new_state, m = sup(state, x, y, 1.0)
    assert int(new_state.step) == int(state.step) + 1
    assert np.isfinite(float(m['loss']))
    for name in ['encoder', 'decoder', 'classifier', 'cond_prior', 'mu']:
        diff = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
            jax.tree.leaves(state.params[name]),
            jax.tree.leaves(new_state.params[name])))
        assert diff > 0, f'{name} did not update'


def test_unsup_step_updates(learnable_setup):
    model, state, _, unsup = learnable_setup
    x, y = batch()
    new_state, m = unsup(state, x, y, 1.0)
    assert np.isfinite(float(m['loss']))
    assert not bool(m['c_nan'])


def test_uint8_and_f32_inputs_equivalent(learnable_setup):
    model, state, sup, _ = learnable_setup
    x, y = batch()
    s1, m1 = sup(state, x, y, 1.0)
    s2, m2 = sup(state, x.astype(jnp.float32) / 255.0, y, 1.0)
    np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                               rtol=1e-5)


def test_fixed_gating_mu_frozen():
    cfg = ModelConfig(image_size=16, z_dim=8, y_dim=4,
                      enc_features=(8, 8), enc_hidden=16,
                      dec_features=(16, 8), gate_type='fixed',
                      gate_subtype='inferred')
    model = CCVAE(cfg)
    state = create_train_state(model, TRAIN, jax.random.key(0),
                               mu_init=mu_init())
    sup, _ = make_train_steps(model, TRAIN, donate=False)
    x, y = batch()
    mu_before = np.array(state.params['mu'])
    new_state, _ = sup(state, x, y, 0.3)
    np.testing.assert_array_equal(np.array(new_state.params['mu']),
                                  mu_before)
    # but the encoder still trains
    d = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree.leaves(state.params['encoder']),
        jax.tree.leaves(new_state.params['encoder'])))
    assert d > 0


def test_one_one_gating_is_identity():
    cfg = ModelConfig(image_size=16, z_dim=8, y_dim=4,
                      enc_features=(8, 8), enc_hidden=16,
                      dec_features=(16, 8), gate_type='fixed',
                      gate_subtype='one-one')
    model = CCVAE(cfg)
    params = model.init(jax.random.key(0))  # no mu_init needed
    np.testing.assert_array_equal(np.array(params['mu']), np.eye(4))


def test_loss_decreases_over_steps(learnable_setup):
    model, state, sup, _ = learnable_setup
    x, y = batch(n=8, seed=3)
    losses = []
    s = state
    for i in range(30):
        s, m = sup(s, x, y, 1.0)
        losses.append(m['loss'])
    losses = [float(v) for v in jax.device_get(losses)]
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_rng_differs_per_step(learnable_setup):
    """Same batch, consecutive steps -> different noise -> different loss
    even with lr=0 (pure sampling variance)."""
    model, state, _, _ = learnable_setup
    cfg0 = TrainConfig(batch_size=8, lr=0.0, classifier_mc_samples=4)
    sup0, _ = make_train_steps(model, cfg0, donate=False)
    x, y = batch()
    s1, m1 = sup0(state, x, y, 1.0)
    s2, m2 = sup0(s1, x, y, 1.0)
    assert float(m1['loss']) != float(m2['loss'])


class TestSchedule:
    """Interleave schedule == reference gated_ccvae.py:320-334."""

    def _trainer(self, sup):
        return Trainer(MODEL,
                       TrainConfig(batch_size=8, perc_supervision=sup,
                                   classifier_mc_samples=2),
                       mu_init=mu_init())

    class FakeLoader:
        def __init__(self, n):
            self.n_s = n

    def test_fully_supervised(self):
        t = self._trainer(1.0)
        total, period, supb = t.epoch_schedule({'sup': self.FakeLoader(80)})
        assert (total, period, supb) == (10, 1, 10)

    def test_semi_supervised(self):
        t = self._trainer(0.5)
        total, period, supb = t.epoch_schedule(
            {'sup': self.FakeLoader(40), 'unsup': self.FakeLoader(40)})
        assert total == 10 and supb == 5 and period == 2

    def test_unsupervised(self):
        t = self._trainer(0.0)
        total, period, supb = t.epoch_schedule({'unsup': self.FakeLoader(80)})
        assert (total, period, supb) == (10, 0, 0)

    def test_sup_batch_positions(self):
        """is_supervised = (i % period == 0) and ctr < sup_batches."""
        period, sup_batches, total = 3, 4, 12
        ctr = 0
        flags = []
        for i in range(total):
            f = (i % period == 0) and ctr < sup_batches
            ctr += int(f)
            flags.append(f)
        assert flags == [True, False, False] * 4


def test_trainer_end_to_end_tiny(tmp_path):
    splits = synthetic_splits(n_train=32, n_valid=8, n_test=8,
                              sup_frac=0.5, image_size=16, y_dim=4)
    loaders = {k: BatchLoader(v, 8, seed=0) for k, v in splits.items()}
    trainer = Trainer(MODEL,
                      TrainConfig(batch_size=8, perc_supervision=0.5,
                                  classifier_mc_samples=2, n_epochs=2),
                      mu_init=mu_init(),
                      checkpoint_dir=str(tmp_path / 'ckpt'),
                      metrics_path=str(tmp_path / 'metrics.csv'))
    result = trainer.train(loaders, param_dir=str(tmp_path / 'params'))
    assert np.isfinite(result['best_val_accuracy'])
    assert len(result['history']) == 2
    test_acc = trainer.test(loaders['test'])
    assert 0.0 <= test_acc <= 1.0
    # learnable gating artifacts exported in reference format
    import os
    assert os.path.exists(tmp_path / 'params' /
                          'learned_gating_matrix_best.npy')
    assert os.path.exists(tmp_path / 'metrics.csv')
    # per-epoch μ snapshots (SURVEY §5 gate-matrix snapshots)
    with np.load(tmp_path / 'params' / 'gating_history.npz') as z:
        assert list(z['epochs']) == [0, 1]
        assert z['mu'].shape == (2, MODEL.z_classify, MODEL.y_dim)
        assert not np.array_equal(z['mu'][0], z['mu'][1])  # μ trained


def test_single_epoch_run_completes(tmp_path):
    """n_epochs=1: 'best' and 'last' land on the SAME step — the run must
    finish cleanly (no Orbax StepAlreadyExistsError) and still export the
    'last' μ artifact."""
    splits = synthetic_splits(n_train=16, n_valid=8, n_test=8,
                              sup_frac=1.0, image_size=16, y_dim=4)
    loaders = {k: BatchLoader(v, 8, seed=0) for k, v in splits.items()}
    trainer = Trainer(MODEL,
                      TrainConfig(batch_size=8, perc_supervision=1.0,
                                  classifier_mc_samples=2, n_epochs=1),
                      mu_init=mu_init(),
                      checkpoint_dir=str(tmp_path / 'ckpt'),
                      metrics_path=str(tmp_path / 'metrics.csv'))
    result = trainer.train(loaders, param_dir=str(tmp_path / 'params'))
    assert len(result['history']) == 1
    import os
    assert os.path.exists(tmp_path / 'params' /
                          'learned_gating_matrix_last.npy')
    assert os.path.exists(tmp_path / 'metrics.csv')  # flush ran


def test_best_step_survives_last_save(tmp_path):
    """The 'last' checkpoint must carry its OWN metric, not the best one:
    Orbax best_step() has to keep pointing at the genuinely best state
    (reference protocol: load_model('best'), gated_ccvae.py:531-533)."""
    model = CCVAE(MODEL)
    cfg = TrainConfig(batch_size=8, classifier_mc_samples=2)
    state = create_train_state(model, cfg, jax.random.key(0),
                               mu_init=mu_init())
    sup, _ = make_train_steps(model, cfg, donate=False)
    x, y = batch()
    from gltvae.train.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path / 'ckpt'))
    s1, _ = sup(state, x, y, 1.0)
    mgr.save(s1, metrics={'val_accuracy': 0.9}, wait=True)   # the best
    s2, _ = sup(s1, x, y, 1.0)
    mgr.save(s2, metrics={'val_accuracy': 0.3}, wait=True)   # the last
    assert mgr.best_step() == int(s1.step)
    assert mgr.latest_step() == int(s2.step)
    mgr.close()


def test_unsupervised_run_saves_best_on_elbo(tmp_path):
    """sup=0.0 has no val accuracy; the best slot falls back to validation
    ELBO so an unsupervised run still checkpoints its best state (the
    reference's sup=0.0 path exists via the uniform-gating fallback,
    utils_data.py:155-157, but never best-saves)."""
    splits = synthetic_splits(n_train=32, n_valid=8, n_test=8,
                              sup_frac=0.0, image_size=16, y_dim=4)
    loaders = {k: BatchLoader(v, 8, seed=0) for k, v in splits.items()}
    from gltvae.ops.gating import uniform_gating_matrix
    trainer = Trainer(MODEL,
                      TrainConfig(batch_size=8, perc_supervision=0.0,
                                  classifier_mc_samples=2, n_epochs=2),
                      mu_init=uniform_gating_matrix(4),
                      checkpoint_dir=str(tmp_path / 'ckpt'))
    result = trainer.train(loaders, param_dir=str(tmp_path / 'params'))
    assert len(result['history']) == 2
    assert all(np.isfinite(h['val_metric']) for h in result['history'])
    assert trainer.ckpt.best_step() is not None  # a best slot exists
    # the restore-best → test path works end to end
    trainer.restore()
    acc = trainer.test(loaders['test'])
    assert 0.0 <= acc <= 1.0


def test_checkpoint_resume_bit_exact(tmp_path):
    model = CCVAE(MODEL)
    cfg = TrainConfig(batch_size=8, classifier_mc_samples=2)
    state = create_train_state(model, cfg, jax.random.key(0),
                               mu_init=mu_init())
    sup, _ = make_train_steps(model, cfg, donate=False)
    x, y = batch()
    s1, _ = sup(state, x, y, 1.0)

    from gltvae.train.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path / 'ckpt'))
    mgr.save(s1, metrics={'val_accuracy': 0.5}, wait=True)
    restored = mgr.restore(jax.tree.map(np.zeros_like, s1))
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.array(a), np.array(b))
    # continuing from the restore reproduces the original trajectory
    s2a, m2a = sup(s1, x, y, 1.0)
    s2b, m2b = sup(restored, x, y, 1.0)
    np.testing.assert_allclose(float(m2a['loss']), float(m2b['loss']),
                               rtol=1e-6)
    mgr.close()


class TestPrngImpl:
    """--prng rbg: the TPU-fast XLA RngBitGenerator path (threefry stays
    the bit-reproducible default all goldens pin)."""

    def test_make_key_validates(self):
        from gltvae.train.state import make_key
        with pytest.raises(ValueError, match='prng_impl'):
            make_key(0, 'philox')

    def test_wrap_key_infers_impl_from_shape(self):
        from gltvae.train.state import make_key, wrap_key
        for impl in ('threefry', 'rbg'):
            k = make_key(7, impl)
            data = jax.random.key_data(k)
            rewrapped = wrap_key(data)
            np.testing.assert_array_equal(
                np.array(jax.random.key_data(jax.random.fold_in(k, 3))),
                np.array(jax.random.key_data(
                    jax.random.fold_in(rewrapped, 3))))

    def test_rbg_trains_and_resumes(self, tmp_path):
        from gltvae.train.state import make_key
        model = CCVAE(MODEL)
        cfg = TrainConfig(batch_size=8, classifier_mc_samples=2,
                          prng_impl='rbg')
        state = create_train_state(model, cfg, make_key(0, 'rbg'),
                                   mu_init=mu_init())
        assert state.rng.shape[-1] == 4  # rbg keys are 4 uint32 words
        sup, _ = make_train_steps(model, cfg, donate=False)
        x, y = batch()
        s1, m1 = sup(state, x, y, 1.0)
        assert math.isfinite(float(m1['loss']))

        from gltvae.train.checkpoint import CheckpointManager
        mgr = CheckpointManager(str(tmp_path / 'ckpt'))
        mgr.save(s1, metrics={'val_accuracy': 0.5}, wait=True)
        restored = mgr.restore(jax.tree.map(np.zeros_like, s1))
        # next_rng infers the impl from the restored raw key data, so the
        # continuation is bit-exact without any global PRNG config
        s2a, m2a = sup(s1, x, y, 1.0)
        s2b, m2b = sup(restored, x, y, 1.0)
        np.testing.assert_allclose(float(m2a['loss']), float(m2b['loss']),
                                   rtol=1e-6)
        mgr.close()

    def test_rbg_stream_differs_per_step(self):
        from gltvae.train.state import make_key
        model = CCVAE(MODEL)
        cfg = TrainConfig(batch_size=8, lr=0.0, classifier_mc_samples=2,
                          prng_impl='rbg')
        state = create_train_state(model, cfg, make_key(0, 'rbg'),
                                   mu_init=mu_init())
        sup, _ = make_train_steps(model, cfg, donate=False)
        x, y = batch()
        s1, m1 = sup(state, x, y, 1.0)
        s2, m2 = sup(s1, x, y, 1.0)
        assert float(m1['loss']) != float(m2['loss'])
