"""Gating-matrix initialization from label co-occurrence.

The reference builds the initial Bernoulli-gate means μ from the label
co-occurrence frequencies of the observed (supervised + validation) labels
with a triple Python loop (/root/reference/utils.py:132-149, driven from
utils_data.py:147-176 and duplicated in gen_intial_gating_matrix.py:52-77).

Here the same quantity is one matmul: for the 0/1 label matrix L (N × y),
co-occurrence counts are LᵀL with the diagonal removed, normalized by N⁺
(the number of samples with ≥1 positive label — the reference's np.nonzero
grouping drops all-zero rows), diagonal set to 1. Verified
element-for-element against the reference algorithm in tests/test_gating.py.

Cache protocol: gating_matrix_{sup}.npy short-circuits recomputation
(reference utils_data.py:147-176). Caches written by this code carry a
content-hash sidecar ({stem}.npy.sha256); a cache with no sidecar (written
by the TF reference, by pre-sidecar code, or hand-placed) is verified
against a fresh recomputation — adopted silently when they agree, used
with a prominent warning when they differ (the reference treats the cache
as authoritative, so we do not clobber it; delete the file to recompute).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def cooccurrence_gating_matrix(labels: np.ndarray) -> np.ndarray:
    """μ[i,j] = (# samples where labels i and j are both 1) / N⁺, i≠j;
    μ[i,i]=1, with N⁺ = # samples having ≥1 positive label.

    `labels` is an (N, y_dim) 0/1 array. Matches utils.py:132-149 exactly:
    the reference groups each sample's positive-label indices via
    np.nonzero, so all-zero rows vanish from the grouping and
    `n_elems = len(grouped_indices)` counts only samples with at least one
    positive label ("absolute frequencies" over observed groups).
    """
    labels = np.asarray(labels, dtype=np.float64)
    n_pos = int((labels.sum(axis=1) > 0).sum())
    counts = labels.T @ labels
    np.fill_diagonal(counts, 0.0)
    mu = counts / float(max(n_pos, 1))
    np.fill_diagonal(mu, 1.0)
    return mu


def identity_gating_matrix(z_classify: int, y_dim: int) -> np.ndarray:
    """Fixed one-to-one gating: μ = I (the original CCVAE of Joy et al.).

    Reference: gated_ccvae.py:53-57 (tf.eye(z_classify, y_dim))."""
    return np.eye(z_classify, y_dim, dtype=np.float32)


def uniform_gating_matrix(y_dim: int) -> np.ndarray:
    """Unsupervised fallback: all 0.5 with unit diagonal
    (utils_data.py:155-157)."""
    mu = np.full((y_dim, y_dim), 0.5, dtype=np.float64)
    np.fill_diagonal(mu, 1.0)
    return mu


def gating_matrix_from_labels(
    sup_labels: Optional[np.ndarray],
    valid_labels: Optional[np.ndarray],
    y_dim: int,
    sup_frac: float,
    cache_dir: Optional[str] = None,
    label_names: Optional[Sequence[str]] = None,
) -> np.ndarray:
    """End-to-end μ init with the reference's npy cache protocol.

    Mirrors utils_data.py:147-176: load data/gating_matrix_{sup}.npy if
    cached; else compute from sup+valid labels (the reference's mild
    valid-set leak, kept for parity), save npy + labeled csv.
    """
    def _compute() -> np.ndarray:
        if sup_frac == 0.0 or sup_labels is None:
            return uniform_gating_matrix(y_dim)
        parts = [sup_labels]
        if valid_labels is not None:
            parts.append(valid_labels)
        return cooccurrence_gating_matrix(np.concatenate(parts, axis=0))

    cache_npy = None
    if cache_dir is not None:
        # 18-label runs use the reference's exact cache filename
        # (utils_data.py:166-172, consumed by its TF code with NO shape
        # check); other label widths (the 40-attr 128px config) get a
        # width-suffixed name so the two protocols never clobber or
        # poison each other's cache in a shared data dir.
        stem = (f'gating_matrix_{sup_frac}' if y_dim == 18
                else f'gating_matrix_{sup_frac}_{y_dim}')
        cache_npy = os.path.join(cache_dir, f'{stem}.npy')
        if os.path.exists(cache_npy):
            import logging
            log = logging.getLogger(__name__)
            cached = np.load(cache_npy)
            if cached.shape != (y_dim, y_dim):
                # wrong-shaped stale file (e.g. written by pre-suffix code)
                log.warning('stale gating cache %s has shape %s, expected '
                            '%s; recomputing', cache_npy, cached.shape,
                            (y_dim, y_dim))
            elif _sidecar_valid(cache_npy):
                return cached          # written by this code: trust it
            else:
                # Unmarked cache: TF reference, pre-sidecar repo code (a
                # round-1 /N-normalized matrix would silently diverge from
                # the reference init), or hand-placed. Verify against a
                # fresh recomputation.
                mu = _compute()
                if np.allclose(cached, mu, atol=1e-8):
                    _write_sidecar(cache_npy)
                    return cached
                log.warning(
                    'cached gating matrix %s does NOT match recomputation '
                    'from the current labels (max |Δ|=%.3g) — it was '
                    'written by divergent code or different data. Using '
                    'the cache for reference-protocol parity; delete the '
                    'file to recompute.', cache_npy,
                    float(np.abs(cached - mu).max()))
                return cached

    mu = _compute()
    if cache_npy is not None:
        os.makedirs(cache_dir, exist_ok=True)
        np.save(cache_npy, mu)
        _write_sidecar(cache_npy)
        if label_names is not None:
            _save_labeled_csv(
                mu, label_names,
                os.path.join(cache_dir, f'{stem}.csv'))
    return mu


def _npy_sha256(path: str) -> str:
    import hashlib
    with open(path, 'rb') as f:
        return hashlib.sha256(f.read()).hexdigest()


def _write_sidecar(cache_npy: str) -> None:
    try:
        with open(cache_npy + '.sha256', 'w') as f:
            f.write(_npy_sha256(cache_npy) + '\n')
    except OSError:
        # read-only cache dir (e.g. a reference data mount): the sidecar
        # is an optimization — next run just re-verifies by recomputation
        pass


def _sidecar_valid(cache_npy: str) -> bool:
    side = cache_npy + '.sha256'
    if not os.path.exists(side):
        return False
    with open(side) as f:
        return f.read().strip() == _npy_sha256(cache_npy)


def _save_labeled_csv(mu: np.ndarray, label_names: Sequence[str], path: str):
    """z1..zN row index, attribute-name columns — the reference's CSV layout
    (utils_data.py:172-174)."""
    import pandas as pd
    index = [f'z{i + 1}' for i in range(mu.shape[0])]
    pd.DataFrame(mu, index=index, columns=list(label_names)).to_csv(path)
