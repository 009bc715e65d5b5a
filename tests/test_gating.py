"""Gating-matrix initialization: the vectorized LᵀL co-occurrence must match
the reference's triple-loop algorithm (utils.py:132-149) exactly, and the
cache protocol must reproduce the reference's artifacts."""

import os

import numpy as np

from gltvae.ops.gating import (cooccurrence_gating_matrix,
                               gating_matrix_from_labels,
                               identity_gating_matrix,
                               uniform_gating_matrix)


def reference_create_gating_matrix(grouped_indices, n_labels):
    """Verbatim reimplementation of the reference algorithm
    (utils.py:132-149) as the oracle."""
    n_elems = len(grouped_indices)
    cooccurance_matrix = np.zeros((n_labels, n_labels))
    for group in grouped_indices:
        for i in group:
            for j in group:
                if j != i:
                    cooccurance_matrix[i, j] += 1
    gating_matrix = cooccurance_matrix / n_elems
    np.fill_diagonal(gating_matrix, 1)
    return gating_matrix


def labels_to_groups(labels):
    """The reference's nonzero-grouping (utils_data.py:163-165)."""
    where_x, where_y = np.nonzero(labels)
    cut = np.flatnonzero(np.r_[True, where_x[1:] != where_x[:-1], True])
    return [where_y[i:j] for i, j in zip(cut[:-1], cut[1:])]


def test_matches_reference_triple_loop(rng):
    labels = (rng.rand(500, 18) > 0.7).astype(np.int64)
    want = reference_create_gating_matrix(labels_to_groups(labels),
                                          n_labels=18)
    got = cooccurrence_gating_matrix(labels)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_all_zero_rows_counted_consistently(rng):
    # The reference normalizes by the number of GROUPS (rows with >=1
    # positive label): all-zero rows produce no nonzero group, so they
    # vanish from n_elems. The vectorized version must agree even when the
    # label set contains all-zero rows (e.g. non-CelebA attribute subsets).
    labels = (rng.rand(300, 6) > 0.5).astype(np.int64)
    labels[::17] = 0  # guarantee all-zero rows
    assert (labels.sum(1) == 0).any()
    want = reference_create_gating_matrix(labels_to_groups(labels), 6)
    np.testing.assert_allclose(cooccurrence_gating_matrix(labels), want)


def test_identity_gating():
    eye = identity_gating_matrix(18, 18)
    np.testing.assert_array_equal(eye, np.eye(18, dtype=np.float32))
    rect = identity_gating_matrix(5, 8)
    assert rect.shape == (5, 8)
    np.testing.assert_array_equal(rect, np.eye(5, 8, dtype=np.float32))


def test_uniform_gating():
    mu = uniform_gating_matrix(4)
    np.testing.assert_array_equal(np.diag(mu), np.ones(4))
    off = mu[~np.eye(4, dtype=bool)]
    np.testing.assert_array_equal(off, np.full(12, 0.5))


def test_cache_roundtrip(tmp_path, rng):
    labels = (rng.rand(100, 18) > 0.6).astype(np.int64)
    labels[labels.sum(1) == 0, 0] = 1
    mu1 = gating_matrix_from_labels(labels[:80], labels[80:], 18, 0.5,
                                    cache_dir=str(tmp_path),
                                    label_names=[f'a{i}' for i in range(18)])
    assert os.path.exists(tmp_path / 'gating_matrix_0.5.npy')
    assert os.path.exists(tmp_path / 'gating_matrix_0.5.csv')
    # Second call loads the cache (reference utils_data.py:149-152)
    mu2 = gating_matrix_from_labels(None, None, 18, 0.5,
                                    cache_dir=str(tmp_path))
    np.testing.assert_array_equal(mu1, mu2)


def test_reproduces_reference_artifact_structure():
    """The shipped reference artifacts obey our invariants: unit diagonal,
    off-diagonal in [0,1]."""
    path = '/root/reference/data/gating_matrix_1.0.npy'
    if not os.path.exists(path):
        import pytest
        pytest.skip('reference artifact unavailable')
    mu = np.load(path)
    assert mu.shape == (18, 18)
    np.testing.assert_allclose(np.diag(mu), 1.0)
    assert (mu >= 0).all() and (mu <= 1).all()


def test_unsup_fallback_is_uniform():
    mu = gating_matrix_from_labels(None, None, 18, 0.0)
    np.testing.assert_array_equal(mu, uniform_gating_matrix(18))
