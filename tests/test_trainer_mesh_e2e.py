"""END-TO-END Trainer.train() on a multi-device mesh (VERDICT r3 item 2).

Everything mesh-tested before this file was step-granular (parallel step
functions, scan-eval, the DCN step). Here the full ORCHESTRATION layer —
epoch schedule, mixed-chunk placement, augment-under-shard_map, per-epoch
validation, Orbax save of the sharded state, restore, test — composes in
one real `Trainer.train()` run over the 8-device CPU mesh, and the result
is asserted against the identical global config on a single device.

Equality holds because every noise stream is mesh-shape-invariant by
construction: step RNG keys are replicated (parallel/dp.py docstring),
and the augment path draws the GLOBAL batch's crop/flip vectors on every
shard then keeps its own rows (Trainer._build_augment). The only residual
is the gradient psum's float reduction order.

Reference counterpart being composed: the Learner epoch loop + eval +
checkpointing, /root/reference/gated_ccvae.py:313-419 and 448-537 — which
has no distributed story at all (SURVEY.md §2).
"""

import glob
import os

import jax
import numpy as np
import pytest

from gltvae.config import ModelConfig, TrainConfig
from gltvae.data.pipeline import BatchLoader
from gltvae.data.synthetic import synthetic_splits
from gltvae.parallel.mesh import create_mesh
from gltvae.train.loop import Trainer


def _loaders():
    # sup=0.2 over n_train=40 at bs 8: 1 sup + 4 unsup batches/epoch,
    # period 5 -> the mixed lax.cond scan path, chunked 4+1 by spd=4
    splits = synthetic_splits(n_train=40, n_valid=8, n_test=8,
                              sup_frac=0.2, image_size=16, y_dim=4,
                              train_pad=2)
    return {k: BatchLoader(v, 8, seed=0) for k, v in splits.items()}


def _trainer(mesh, ckpt_dir):
    model = ModelConfig(image_size=16, z_dim=8, y_dim=4,
                        enc_features=(8, 8), enc_hidden=16,
                        dec_features=(16, 8))
    cfg = TrainConfig(batch_size=8, perc_supervision=0.2,
                      classifier_mc_samples=2, n_epochs=2, augment_pad=2)
    return Trainer(model, cfg, mu_init=np.eye(4, dtype=np.float32),
                   mesh=mesh, checkpoint_dir=ckpt_dir,
                   steps_per_dispatch=4)


def _run(mesh, tmp, tag):
    ckpt = os.path.join(tmp, f'ckpt_{tag}')
    pd = os.path.join(tmp, f'params_{tag}')
    os.makedirs(pd)
    loaders = _loaders()
    t = _trainer(mesh, ckpt)
    res = t.train(loaders, param_dir=pd)
    # restore the (sharded) state into a FRESH trainer and run the test
    # protocol on it — the save -> restore -> test composition. Restore
    # the LATEST step (the final state) so the round-trip is checkable
    # bit-exactly; default restore() picks the best-val-acc step.
    t2 = _trainer(mesh, ckpt)
    t2.restore(step=t2.ckpt.latest_step())
    test_acc = t2.test(loaders['test'])
    restored = jax.device_get(t2.state.params)
    return res, jax.device_get(t.state.params), restored, test_acc, pd


def test_full_train_on_mesh_matches_single_device(tmp_path):
    mesh_res, mesh_p, mesh_restored, mesh_test, mesh_pd = _run(
        create_mesh(), str(tmp_path), 'mesh')
    one_res, one_p, one_restored, one_test, _ = _run(
        None, str(tmp_path), 'single')

    # same schedule executed: 2 epochs x 5 steps
    assert len(mesh_res['history']) == len(one_res['history']) == 2

    # params after the full run: identical up to psum reduction order
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6),
        mesh_p, one_p)
    # Orbax restore round-trips the sharded state bit-exactly
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 mesh_restored, mesh_p)

    # per-epoch validation accuracies and the final test protocol agree
    for hm, ho in zip(mesh_res['history'], one_res['history']):
        np.testing.assert_allclose(hm['val_accuracy'], ho['val_accuracy'],
                                   atol=1e-5)
    np.testing.assert_allclose(mesh_test, one_test, atol=1e-5)

    # learnable-gating artifacts written from the mesh run: mu exports +
    # the per-epoch gating history stack
    assert glob.glob(os.path.join(mesh_pd, '*best*')), \
        os.listdir(mesh_pd)
    hist = np.load(os.path.join(mesh_pd, 'gating_history.npz'))
    assert list(hist['epochs']) == [0, 1]
    assert hist['mu'].shape == (2, 4, 4)


def test_mesh_resume_continues_training(tmp_path):
    """Preemption-safe resume UNDER THE MESH: train 2 epochs, then resume
    into a 4-epoch schedule — the restored sharded state fast-forwards
    the epoch/temperature schedule and trains 2 more epochs."""
    ckpt = os.path.join(str(tmp_path), 'ckpt')
    loaders = _loaders()
    mesh = create_mesh()
    t = _trainer(mesh, ckpt)
    t.train(loaders)
    assert int(t.state.step) == 10

    t2 = _trainer(mesh, ckpt)
    res = t2.train(loaders, epochs=4, resume=True)
    assert int(t2.state.step) == 20
    assert [h['epoch'] for h in res['history']] == [2, 3]
    # temperature fast-forward: 2 decays applied before epoch 2 trained 2 more
    np.testing.assert_allclose(t2.gating_temp, 0.99 ** 4)
