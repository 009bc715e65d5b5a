"""Device-resident training (train/steps.py::make_resident_scan_train_steps
and the Trainer wiring): the train split ships to device ONCE and every
dispatch sends only a [n, B] int32 index array.

Contract pinned here: params (and schedule position) are IDENTICAL to the
host-shipped path — same loader index stream, same bytes after the
gather+bitcast, same per-step RNG (TrainState.next_rng folds the step
counter either way). Reference being accelerated: the per-batch
host->device boundary of gated_ccvae.py:302-311 with the per-epoch
re-decode/re-ship of utils_data.py:48-63.
"""

import jax
import numpy as np

from gltvae.config import ModelConfig, TrainConfig
from gltvae.data.pipeline import BatchLoader
from gltvae.data.synthetic import synthetic_splits
from gltvae.train.loop import Trainer

MODEL = ModelConfig(image_size=16, z_dim=8, y_dim=4,
                    enc_features=(8, 8), enc_hidden=16,
                    dec_features=(16, 8))


def loaders(sup_frac, **kw):
    splits = synthetic_splits(n_train=48, n_valid=8, n_test=8,
                              sup_frac=sup_frac, image_size=16, y_dim=4,
                              **kw)
    return {k: BatchLoader(v, 8, seed=0) for k, v in splits.items()}


def mu():
    return np.eye(4, dtype=np.float32)


def _params(t):
    return jax.device_get(t.state.params)


def _assert_same(p1, p2):
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8)


def test_resident_matches_host_fully_supervised():
    cfg = TrainConfig(batch_size=8, perc_supervision=1.0,
                      classifier_mc_samples=2, n_epochs=2)
    t_off = Trainer(MODEL, cfg, mu_init=mu(), steps_per_dispatch=4,
                    resident_train='off')
    h_off = t_off.train(loaders(1.0))
    ld = loaders(1.0)
    t_res = Trainer(MODEL, cfg, mu_init=mu(), steps_per_dispatch=4)
    h_res = t_res.train(ld)
    # the resident path actually ran: the sup train loader was shipped
    assert id(ld['sup']) in t_res._resident_data
    assert any(k[0] == 'sup' for k in t_res._resident_train_fns)
    assert int(t_off.state.step) == int(t_res.state.step) == 12
    _assert_same(_params(t_off), _params(t_res))
    accs_off = [h['val_accuracy'] for h in h_off['history']]
    accs_res = [h['val_accuracy'] for h in h_res['history']]
    np.testing.assert_allclose(accs_off, accs_res)


def test_resident_matches_host_per_step_dispatch():
    """steps_per_dispatch=1: resident still scans ([1, B] index rows) and
    must match the host per-step path."""
    cfg = TrainConfig(batch_size=8, perc_supervision=1.0,
                      classifier_mc_samples=2, n_epochs=1)
    t_off = Trainer(MODEL, cfg, mu_init=mu(), resident_train='off')
    t_off.train(loaders(1.0))
    t_res = Trainer(MODEL, cfg, mu_init=mu())
    t_res.train(loaders(1.0))
    assert int(t_off.state.step) == int(t_res.state.step) == 6
    _assert_same(_params(t_off), _params(t_res))


def test_resident_mixed_semi_sup():
    """sup=0.5 -> period-2 interleave: the resident mixed scan gathers
    each inner step's batch from the split its schedule flag selects and
    must reproduce the host mixed-scan run exactly."""
    cfg = TrainConfig(batch_size=8, perc_supervision=0.5,
                      classifier_mc_samples=2, n_epochs=2)
    t_off = Trainer(MODEL, cfg, mu_init=mu(), steps_per_dispatch=4,
                    resident_train='off')
    t_off.train(loaders(0.5))
    t_res = Trainer(MODEL, cfg, mu_init=mu(), steps_per_dispatch=4)
    t_res.train(loaders(0.5))
    assert any(k[0] == 'mixed' for k in t_res._resident_train_fns)
    assert int(t_off.state.step) == int(t_res.state.step) == 12
    _assert_same(_params(t_off), _params(t_res))


def test_resident_unsupervised():
    cfg = TrainConfig(batch_size=8, perc_supervision=0.0,
                      classifier_mc_samples=2, n_epochs=1)
    t_off = Trainer(MODEL, cfg, mu_init=mu(), steps_per_dispatch=4,
                    resident_train='off')
    t_off.train(loaders(0.0))
    t_res = Trainer(MODEL, cfg, mu_init=mu(), steps_per_dispatch=4)
    t_res.train(loaders(0.0))
    assert any(k[0] == 'unsup' for k in t_res._resident_train_fns)
    _assert_same(_params(t_off), _params(t_res))


def test_budget_falls_back_to_host_path():
    """A train split over the byte budget must silently stream from host
    (auto = on only when it fits)."""
    cfg = TrainConfig(batch_size=8, perc_supervision=1.0,
                      classifier_mc_samples=2, n_epochs=1)
    ld = loaders(1.0)
    t = Trainer(MODEL, cfg, mu_init=mu(), steps_per_dispatch=4,
                resident_train_max_bytes=1)
    t.train(ld)
    assert not t._resident_train_fns          # resident never built
    assert int(t.state.step) == 6


def test_augment_disables_resident_train():
    """Augmented runs stay host-shipped: the crop/flip kernel consumes
    padded host batches (resident-augment is a later extension)."""
    cfg = TrainConfig(batch_size=8, perc_supervision=1.0,
                      classifier_mc_samples=2, n_epochs=1, augment_pad=1)
    ld = loaders(1.0, train_pad=1)
    t = Trainer(MODEL, cfg, mu_init=mu(), steps_per_dispatch=4)
    t.train(ld)
    assert not t._resident_train_fns
    assert int(t.state.step) == 6


def test_mesh_resident_matches_host_and_single():
    """Mesh-resident TRAINING (rows sharded over 'data',
    parallel/dp.py::make_parallel_resident_scan_train_steps): params
    bit-match both the host-shipped mesh run and the single-device
    resident run. sup=0.5 also exercises the mixed mesh twin."""
    from gltvae.parallel.mesh import create_mesh
    mesh = create_mesh()
    for sup_frac in (1.0, 0.5):
        cfg = TrainConfig(batch_size=8, perc_supervision=sup_frac,
                          classifier_mc_samples=2, n_epochs=2)
        t_mesh_off = Trainer(MODEL, cfg, mu_init=mu(), mesh=mesh,
                             steps_per_dispatch=4, resident_train='off')
        t_mesh_off.train(loaders(sup_frac))
        t_mesh_res = Trainer(MODEL, cfg, mu_init=mu(), mesh=mesh,
                             steps_per_dispatch=4)
        t_mesh_res.train(loaders(sup_frac))
        assert t_mesh_res._resident_train_fns     # resident path taken
        t_one_res = Trainer(MODEL, cfg, mu_init=mu(),
                            steps_per_dispatch=4)
        t_one_res.train(loaders(sup_frac))
        assert int(t_mesh_off.state.step) == int(t_mesh_res.state.step) \
            == int(t_one_res.state.step) == 12
        # same topology, resident vs host-shipped: exact parity claim
        _assert_same(_params(t_mesh_off), _params(t_mesh_res))
        # cross-topology (8-device psum vs single-device sum): float
        # reassociation drifts O(1e-8) after 12 Adam steps — not a
        # resident-path property (the host-shipped mesh run drifts from
        # the single run identically, as asserted above by transitivity)
        for a, b in zip(jax.tree.leaves(_params(t_mesh_res)),
                        jax.tree.leaves(_params(t_one_res))):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


def test_mesh_resident_rows_sharded():
    """The resident split's rows actually live sharded over 'data' on
    the mesh (per-device HBM holds only N/D rows), not replicated."""
    from gltvae.parallel.mesh import create_mesh
    mesh = create_mesh()
    cfg = TrainConfig(batch_size=8, perc_supervision=1.0,
                      classifier_mc_samples=2, n_epochs=1)
    ld = loaders(1.0)
    t = Trainer(MODEL, cfg, mu_init=mu(), mesh=mesh, steps_per_dispatch=4)
    t.train(ld)
    (_, x, _, _), = [e for e in t._resident_data.values()
                     if e[0] is ld['sup']]
    n_dev = mesh.devices.size
    assert len(x.sharding.device_set) == n_dev
    shard_rows = {s.data.shape[0] for s in x.addressable_shards}
    assert shard_rows == {-(-x.shape[0] // n_dev)}   # N/D rows per device
