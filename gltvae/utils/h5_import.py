"""Import reference Keras .h5 checkpoints into gltvae param pytrees.

The reference saves per-submodel H5 weight files
(/root/reference/gated_ccvae.py:391-401) plus the learned gating matrix as
.npy. This tool maps them onto our pytree so the reference's trained models
run unchanged on TPU, and so golden-equivalence tests
(tests/test_networks_golden.py) can pin our forward passes to the
reference's exact numerics.

Layout facts (verified against models/params_1.0_learnable/*.h5):
- Keras Conv2D kernels are (kh, kw, in, out)  — identical to flax nn.Conv.
- Keras Conv2DTranspose kernels are (kh, kw, out, in) — identical to our
  TFConvTranspose parameter layout (networks.py), so no transposition at all.
- H5 dataset paths look like '<layer>/<model>/<layer>/kernel:0'.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional

import numpy as np


def _load_h5_weights(path: str) -> Dict[str, np.ndarray]:
    """Flatten an h5 weight file to {'<layer>/<var>': array}."""
    import h5py
    out = {}
    with h5py.File(path, 'r') as f:
        def visit(name, obj):
            if hasattr(obj, 'shape') and obj.shape is not None:
                # 'conv2d_1/encoder/conv2d_1/kernel:0' -> ('conv2d_1','kernel')
                parts = name.split('/')
                layer, var = parts[0], parts[-1].split(':')[0]
                out[f'{layer}/{var}'] = np.array(obj)
        f.visititems(visit)
    return out


def _ordered_layers(weights: Dict[str, np.ndarray], prefix: str):
    """Layer names '<prefix>', '<prefix>_1', ... in numeric order."""
    names = sorted(
        {k.split('/')[0] for k in weights if k.split('/')[0] == prefix
         or re.fullmatch(re.escape(prefix) + r'_\d+', k.split('/')[0])},
        key=lambda s: int(s.rsplit('_', 1)[1]) if s[len(prefix):] else -1)
    return names


def load_encoder_params(path: str) -> dict:
    w = _load_h5_weights(path)
    convs = _ordered_layers(w, 'conv2d')
    denses = _ordered_layers(w, 'dense')
    params = {}
    for i, name in enumerate(convs):
        params[f'conv{i + 1}'] = {'kernel': w[f'{name}/kernel'],
                                  'bias': w[f'{name}/bias']}
    # Declaration order in networks.py:17-18: locs first, then scale.
    params['locs'] = {'kernel': w[f'{denses[0]}/kernel'],
                      'bias': w[f'{denses[0]}/bias']}
    params['scale'] = {'kernel': w[f'{denses[1]}/kernel'],
                       'bias': w[f'{denses[1]}/bias']}
    return params


def load_decoder_params(path: str) -> dict:
    w = _load_h5_weights(path)
    deconvs = _ordered_layers(w, 'conv2d_transpose')
    denses = _ordered_layers(w, 'dense')
    params = {'fc1': {'kernel': w[f'{denses[0]}/kernel'],
                      'bias': w[f'{denses[0]}/bias']}}
    for i, name in enumerate(deconvs):
        params[f'conv{i + 1}t'] = {'kernel': w[f'{name}/kernel'],
                                   'bias': w[f'{name}/bias']}
    return params


def load_classifier_params(path: str) -> dict:
    w = _load_h5_weights(path)
    (layer,) = _ordered_layers(w, 'my_inference_layer')
    return {'kernel': w[f'{layer}/kernel'], 'bias': w[f'{layer}/bias']}


def load_cond_prior_params(path: str) -> dict:
    w = _load_h5_weights(path)
    layers = _ordered_layers(w, 'my_cond_generation_layer')
    # Declaration order (reference networks.py:113-116):
    # loc_true, loc_false, scale_true, scale_false.
    keys = ['loc_true', 'loc_false', 'scale_true', 'scale_false']
    return {k: w[f'{layer}/kernel'] for k, layer in zip(keys, layers)}


def load_reference_checkpoint(param_dir: str, model_id: str = 'best',
                              mu: Optional[np.ndarray] = None) -> dict:
    """Full params pytree from a reference checkpoint directory.

    Mirrors Learner.load_model (gated_ccvae.py:146-165): submodule h5s +
    learned_gating_matrix_{id}.npy when present; otherwise `mu` must be
    supplied (fixed modes store μ outside the checkpoint dir).
    """
    params = {
        'encoder': load_encoder_params(
            os.path.join(param_dir, f'encoder_model_{model_id}.h5')),
        'decoder': load_decoder_params(
            os.path.join(param_dir, f'decoder_model_{model_id}.h5')),
        'classifier': load_classifier_params(
            os.path.join(param_dir, f'classifier_{model_id}.h5')),
        'cond_prior': load_cond_prior_params(
            os.path.join(param_dir, f'cond_prior_{model_id}.h5')),
    }
    mu_path = os.path.join(param_dir, f'learned_gating_matrix_{model_id}.npy')
    if os.path.exists(mu_path):
        params['mu'] = np.load(mu_path).astype(np.float32)
    elif mu is not None:
        params['mu'] = np.asarray(mu, np.float32)
    else:
        raise FileNotFoundError(
            f'no learned gating matrix in {param_dir}; pass mu= explicitly')
    import jax
    import jax.numpy as jnp
    return jax.tree.map(jnp.asarray, params)
