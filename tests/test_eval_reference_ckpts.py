"""Import-and-eval composition: the reference's shipped trained .h5
checkpoints must load through utils/h5_import and score through the
framework's own Trainer.test protocol (stochastic eval, temp 0.3) —
mirroring the reference's re-evaluation runs (gated_ccvae.py:531-537).
Real-CelebA accuracy numbers stay pending the dataset; these tests prove
the protocol composes on real trained weights."""

import os

import numpy as np
import pytest

from tools.eval_reference_checkpoints import (parse_run_dir, mu_for,
                                              evaluate_checkpoint)

REF_MODELS = '/root/reference/models'

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_MODELS),
                                reason='reference checkpoints not mounted')


def test_parse_run_dir_all_shipped_names():
    assert parse_run_dir('params_1.0_learnable') == \
        ('1.0', 'learnable', 'inferred')
    assert parse_run_dir('params_0.2_fixed_one-one') == \
        ('0.2', 'fixed', 'one-one')
    assert parse_run_dir('params_0.5_fixed_inferred') == \
        ('0.5', 'fixed', 'inferred')
    # combined-sweep dirs: last fraction wins for the μ-cache lookup
    assert parse_run_dir('params_0.2_0.5_learnable') == \
        ('0.5', 'learnable', 'inferred')
    assert parse_run_dir('notes.txt') is None


def test_mu_for_modes():
    assert mu_for(REF_MODELS, '1.0', 'learnable', 'inferred') is None
    np.testing.assert_array_equal(
        mu_for(REF_MODELS, '1.0', 'fixed', 'one-one'), np.eye(18))
    mu = mu_for(REF_MODELS, '1.0', 'fixed', 'inferred')
    assert mu.shape == (18, 18)
    np.testing.assert_allclose(np.diag(mu), 1.0)


@pytest.fixture(scope='module')
def tiny_corpus(tmp_path_factory):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), 'tools'))
    from parity_corpus import generate_corpus
    root = tmp_path_factory.mktemp('eval_ref_corpus')
    generate_corpus(str(root), n=16, seed=3)
    return root


@pytest.mark.parametrize('run_dir', ['params_1.0_learnable',
                                     'params_1.0_fixed_one-one'])
def test_shipped_checkpoint_scores_through_trainer_test(tiny_corpus,
                                                        run_dir):
    from gltvae.config import DataConfig
    sup, gate_type, gate_subtype = parse_run_dir(run_dir)
    mu = mu_for(REF_MODELS, sup, gate_type, gate_subtype)
    cfg = DataConfig(data_dir=str(tiny_corpus), n_train=8, n_valid=4,
                     n_test=4, num_workers=0)
    acc = evaluate_checkpoint(os.path.join(REF_MODELS, run_dir), mu, cfg,
                              batch_size=4)
    # real trained weights on a non-CelebA corpus: any finite accuracy in
    # [0,1] proves the load->build->eval composition
    assert 0.0 <= acc <= 1.0
