"""Device-resident eval (VERDICT r3 item 4): splits that fit on device
ship ONCE, then every eval is a single dispatch scanning the epoch's
batches by on-device index gather.

Correctness contract: the resident path's key chain is the same
sequential `key, sub = split(key)` the chunked path runs on host per
batch, and `epoch_indices()` advances the loader's authoritative cursor
exactly as iteration would — so per-call results are BIT-identical to
the chunked path, across epochs, for both evaluate() and test_elbo().
(Reference protocol being accelerated: gated_ccvae.py:448-455.)
"""

import jax
import numpy as np
import pytest

from gltvae.config import ModelConfig, TrainConfig
from gltvae.data.pipeline import ArrayDataset, BatchLoader
from gltvae.train.loop import Trainer

MODEL = ModelConfig(image_size=16, z_dim=8, y_dim=4, enc_features=(8, 8),
                    enc_hidden=16, dec_features=(16, 8))


def _loader(n=20, bs=8, seed=3):
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (n, 16, 16, 3), dtype=np.uint8)
    labels = (rng.rand(n, 4) > 0.5).astype(np.float32)
    return BatchLoader(ArrayDataset(images, labels), bs, seed=seed)


def _trainer(**kw):
    cfg = TrainConfig(batch_size=8, classifier_mc_samples=2)
    return Trainer(MODEL, cfg, mu_init=np.eye(4, dtype=np.float32), **kw)


def test_resident_matches_chunked_across_epochs():
    """Same seeds, same loader stream: resident and chunked evaluate/
    test_elbo agree to float tolerance on every call (n=20, bs=8 ->
    wrap-around batches + epoch-boundary reshuffle are exercised)."""
    t_res = _trainer()                          # auto: the split fits
    t_chk = _trainer(resident_eval='off')
    l_res, l_chk = _loader(), _loader()
    for _ in range(3):                          # crosses epoch boundaries
        a = t_res.evaluate(l_res)
        b = t_chk.evaluate(l_chk)
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
        ea = t_res.test_elbo(l_res)
        eb = t_chk.test_elbo(l_chk)
        np.testing.assert_allclose(ea, eb, rtol=1e-6)
    assert id(l_res) in t_res._resident_data    # the fast path actually ran
    assert not t_chk._resident_data


def test_resident_matches_scan_chunked():
    """The steps_per_dispatch>1 chunked scan path is the third equivalent
    formulation — all three agree."""
    t_res = _trainer()
    t_scan = _trainer(resident_eval='off', steps_per_dispatch=4)
    a = t_res.evaluate(_loader())
    b = t_scan.evaluate(_loader())
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_budget_gate_falls_back_to_chunked():
    """A split over the byte budget silently takes the chunked path and
    produces the identical result."""
    t_small = _trainer(resident_eval_max_bytes=64)   # nothing fits
    t_off = _trainer(resident_eval='off')
    a = t_small.evaluate(_loader())
    b = t_off.evaluate(_loader())
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
    assert not t_small._resident_data


def test_host_sharded_loader_excluded():
    """A host-sharded loader's fetch() serves only this process's rows —
    the resident path must refuse it (it would cache a partial split)."""
    t = _trainer()
    lo = _loader()
    lo.shard = (0, 2)
    assert t._resident_split(lo) is None


def test_key_chain_continues_across_paths():
    """A resident eval advances self._eval_key exactly one epoch of
    splits; a later CHUNKED eval (budget-evicted loader) must continue
    the same chain as an all-chunked trainer."""
    big = _loader()
    t_mixed = _trainer(
        resident_eval_max_bytes=big.n_s * (16 * 16 * 3 + 16) + 1)
    t_chunk = _trainer(resident_eval='off')
    np.testing.assert_allclose(t_mixed.evaluate(_loader(seed=3)),
                               t_chunk.evaluate(_loader(seed=3)),
                               rtol=1e-6, atol=1e-7)
    # second split too large for the leftover budget -> chunked, but the
    # key chain position must match the all-chunked trainer's
    huge = _loader(n=64, bs=8, seed=9)
    t_mixed._resident_budget = 64
    np.testing.assert_allclose(t_mixed.evaluate(huge),
                               t_chunk.evaluate(_loader(n=64, bs=8, seed=9)),
                               rtol=1e-6, atol=1e-7)


def test_mesh_resident_matches_chunked():
    """Mesh-resident eval (rows SHARDED over 'data', gathered batches
    re-sliced to the DP sharding inside the scan) must agree with the
    chunked mesh path AND the single-device resident path on every call —
    n=20 on 8 devices also exercises the zero-row padding
    (parallel/dp.py::place_resident_split)."""
    from jax.sharding import PartitionSpec as P
    from gltvae.parallel.mesh import create_mesh
    mesh = create_mesh()
    t_mres = _trainer(mesh=mesh)
    t_mchk = _trainer(mesh=mesh, resident_eval='off')
    t_sres = _trainer()
    l1, l2, l3 = _loader(), _loader(), _loader()
    for _ in range(3):                  # crosses epoch boundaries
        a = t_mres.evaluate(l1)
        b = t_mchk.evaluate(l2)
        c = t_sres.evaluate(l3)
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(a, c, rtol=1e-6, atol=1e-7)
        ea = t_mres.test_elbo(l1)
        eb = t_mchk.test_elbo(l2)
        ec = t_sres.test_elbo(l3)   # keep l3's cursor + key chain in step
        np.testing.assert_allclose(ea, eb, rtol=1e-6)
        np.testing.assert_allclose(ea, ec, rtol=1e-6)
    # the fast path actually ran, rows actually sharded (not replicated)
    ent = t_mres._resident_data[id(l1)]
    x_dev = ent[1]
    assert x_dev.sharding.spec == P('data')
    assert x_dev.shape[0] == 24         # 20 rows padded to 8 devices
    per_dev = {s.data.shape[0] for s in x_dev.addressable_shards}
    assert per_dev == {3}               # N/D rows per device, not N
    assert not t_mchk._resident_data


def test_mesh_resident_test_protocol():
    """Trainer.test (eval-temp protocol) through the mesh-resident path
    equals the single-device resident result."""
    from gltvae.parallel.mesh import create_mesh
    t_m = _trainer(mesh=create_mesh())
    t_s = _trainer()
    np.testing.assert_allclose(t_m.test(_loader()), t_s.test(_loader()),
                               rtol=1e-6, atol=1e-7)
