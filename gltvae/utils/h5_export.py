"""Export gltvae params to the reference's Keras .h5 checkpoint format.

The inverse of utils/h5_import.py: writes per-submodel weight files with
the exact group layout and Keras metadata the reference's
`Model.load_weights` consumes (gated_ccvae.py:155-158), so models trained
on TPU drop back into the original TF2 codebase. μ is written as
learned_gating_matrix_{id}.npy/csv by train/checkpoint.py already.

Layout (verified against the reference's shipped files): top-level attr
`layer_names`, each layer group carries `weight_names` with
'<model>/<layer>/<var>:0' paths, datasets at
'<layer>/<model>/<layer>/<var>:0'.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np


def _write_keras_h5(path: str, model_name: str,
                    layers: List[Tuple[str, Dict[str, np.ndarray]]],
                    extra_layers: List[str] = ()):
    """layers: [(layer_name, {var_name: array})], order = Keras build order.
    extra_layers: weightless layers (e.g. 'flatten') present in
    layer_names for exactness."""
    import h5py
    sdt = h5py.string_dtype()
    names = [name for name, _ in layers] + list(extra_layers)
    with h5py.File(path, 'w') as f:
        f.attrs['backend'] = 'tensorflow'
        f.attrs['keras_version'] = '2.8.0'
        f.attrs['layer_names'] = np.array(names, dtype=sdt)
        for name, variables in layers:
            g = f.create_group(name)
            wnames = [f'{model_name}/{name}/{v}:0' for v in variables]
            g.attrs['weight_names'] = np.array(wnames, dtype=sdt)
            for v, arr in variables.items():
                g.create_dataset(f'{model_name}/{name}/{v}:0',
                                 data=np.asarray(arr, np.float32))
        for name in extra_layers:
            g = f.create_group(name)
            g.attrs['weight_names'] = np.array([], dtype=sdt)


def export_encoder(params: dict, path: str):
    n_convs = len([k for k in params if k.startswith('conv')])
    layers = []
    for i in range(n_convs):
        suffix = '' if i == 0 else f'_{i}'
        p = params[f'conv{i + 1}']
        layers.append((f'conv2d{suffix}',
                       {'kernel': p['kernel'], 'bias': p['bias']}))
    layers.append(('dense', {'kernel': params['locs']['kernel'],
                             'bias': params['locs']['bias']}))
    layers.append(('dense_1', {'kernel': params['scale']['kernel'],
                               'bias': params['scale']['bias']}))
    _write_keras_h5(path, 'encoder', layers, extra_layers=['flatten'])


def export_decoder(params: dict, path: str):
    n_deconvs = len([k for k in params if k.endswith('t')])
    layers = [('dense_2', {'kernel': params['fc1']['kernel'],
                           'bias': params['fc1']['bias']})]
    for i in range(n_deconvs):
        suffix = '' if i == 0 else f'_{i}'
        p = params[f'conv{i + 1}t']
        layers.append((f'conv2d_transpose{suffix}',
                       {'kernel': p['kernel'], 'bias': p['bias']}))
    _write_keras_h5(path, 'decoder', layers, extra_layers=['reshape'])


def export_classifier(params: dict, path: str):
    _write_keras_h5(path, 'classifier',
                    [('my_inference_layer',
                      {'kernel': params['kernel'], 'bias': params['bias']})])


def export_cond_prior(params: dict, path: str):
    keys = ['loc_true', 'loc_false', 'scale_true', 'scale_false']
    layers = [(f'my_cond_generation_layer{"" if i == 0 else f"_{i}"}',
               {'kernel': params[k]}) for i, k in enumerate(keys)]
    _write_keras_h5(path, 'conditional__prior', layers)


def export_reference_checkpoint(params: dict, param_dir: str,
                                model_id: str = 'best',
                                label_names=None):
    """Write the full per-submodel h5 set the reference's load_model
    expects (gated_ccvae.py:146-165). This function is the single owner
    of the μ artifacts: the npy always, plus the labeled CSV when
    `label_names` is given (the reference writes both,
    gated_ccvae.py:395-401)."""
    import jax
    params = jax.device_get(params)
    os.makedirs(param_dir, exist_ok=True)
    export_encoder(params['encoder'],
                   os.path.join(param_dir, f'encoder_model_{model_id}.h5'))
    export_decoder(params['decoder'],
                   os.path.join(param_dir, f'decoder_model_{model_id}.h5'))
    export_classifier(params['classifier'],
                      os.path.join(param_dir, f'classifier_{model_id}.h5'))
    export_cond_prior(params['cond_prior'],
                      os.path.join(param_dir, f'cond_prior_{model_id}.h5'))
    if label_names is not None:
        from gltvae.train.checkpoint import export_gating_matrix
        export_gating_matrix(params['mu'], param_dir, model_id, label_names)
    else:
        np.save(os.path.join(param_dir,
                             f'learned_gating_matrix_{model_id}.npy'),
                np.asarray(params['mu'], np.float32))
