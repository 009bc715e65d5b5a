"""Traversal rendering from genuinely TRAINED weights (VERDICT r3 item 8):
the reference-.h5-import -> prior-anchored latent_traversal composition
must produce finite, non-degenerate images that actually respond to the
swept z_classify dims. The committed artifact
docs/artifacts/traversal_ref_1.0_learnable.png is rendered by this same
path (tools/render.py --mode traversal --anchor prior).

Anchor rationale: the trained posterior-mean head is ReLU'd nonnegative
(reference networks.py:17), so z=0 is out-of-distribution for trained
weights; the in-distribution anchor is the conditional prior mean
p(z_classify|y) with z_style from ITS prior N(0,I)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gltvae.config import ModelConfig
from gltvae.models.ccvae import CCVAE
from gltvae.ops.sampling import sample_gating_deterministic
from gltvae.utils.h5_import import load_reference_checkpoint
from gltvae.eval.traversal import latent_traversal


@pytest.fixture(scope='module')
def trained(ref_param_dir):
    model = CCVAE(ModelConfig())
    return model, load_reference_checkpoint(ref_param_dir, 'best')


def _prior_anchor(model, params, y=None):
    cfg = model.cfg
    if y is None:
        y = jnp.zeros((1, cfg.y_dim), jnp.float32)
    c = sample_gating_deterministic(params['mu'])
    locs, _ = model.prior_zc(params, y, c)
    return jnp.concatenate([jnp.zeros((cfg.z_style,), jnp.float32),
                            locs[0]])


def test_import_traverse_composition(trained):
    """h5 import -> prior anchor -> one fused traversal decode: correct
    shape, finite, in [0,1]-ish decoder range, and the sweep MOVES the
    output (per-dim variance across steps is nonzero — a trained decoder
    responds to its classification latents)."""
    model, params = trained
    dims = list(range(model.cfg.z_style, model.cfg.z_dim))
    grid = np.asarray(latent_traversal(
        model, params, z_base=_prior_anchor(model, params),
        n_steps=6, dims=dims))
    assert grid.shape == (len(dims), 6, 64, 64, 3)
    assert np.isfinite(grid).all()
    assert grid.std() > 0.01                      # not a constant field
    # every traversed dim changes the rendered image along its sweep
    per_dim_motion = np.abs(np.diff(grid, axis=1)).mean(axis=(1, 2, 3, 4))
    assert (per_dim_motion > 1e-5).all()


def test_trained_anchor_beats_zero_anchor(trained):
    """The prior-mean anchor decodes a brighter, higher-contrast image
    than the out-of-distribution z=0 anchor — the regression that
    originally produced a near-blank artifact."""
    model, params = trained
    zero = np.asarray(model.decode(
        params, jnp.zeros((1, model.cfg.z_dim), jnp.float32)))
    anchored = np.asarray(model.decode(
        params, _prior_anchor(model, params)[None]))
    assert anchored.std() > zero.std()


def test_render_cli_prior_anchor(tmp_path, ref_param_dir):
    """The user-facing CLI composition writes a non-trivial PNG."""
    import subprocess
    import sys
    out = tmp_path / 'trav.png'
    r = subprocess.run(
        [sys.executable, 'tools/render.py', '--mode', 'traversal',
         '--anchor', 'prior', '--seed', '7', '--platform', 'cpu',
         '--ref-checkpoint', ref_param_dir, '--dims', '27', '28',
         '--n-steps', '4', '--out', str(out)],
        cwd='/root/repo', capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    from PIL import Image
    im = np.asarray(Image.open(out), np.float32) / 255.0
    assert im.std() > 0.01
