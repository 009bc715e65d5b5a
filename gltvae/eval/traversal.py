"""Batched latent-traversal renderer (BASELINE.json north-star capability;
no equivalent exists in the reference).

Per-dimension sweeps are rendered as ONE fused decoder call: the full
[n_dims × n_steps, z_dim] grid is built on device with broadcasting (a
(D·S, z) tensor where row (d, s) is `z_base` with dim d replaced by the
s-th sweep value), then decoded in a single jit invocation — one MXU-dense
batch instead of D·S tiny decodes. Target: <100 ms per traversal batch.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from gltvae.models.ccvae import CCVAE


def _build_grid(z_base, dims, values):
    """[D·S, z] traversal grid, fully on device.

    z_base: (z,) anchor latent. dims: (D,) int32. values: (S,) sweep values.
    Row (d·S + s) = z_base with z[dims[d]] := values[s].
    """
    D, S = dims.shape[0], values.shape[0]
    z = jnp.broadcast_to(z_base, (D, S, z_base.shape[-1]))
    onehot = jax.nn.one_hot(dims, z_base.shape[-1],
                            dtype=z_base.dtype)          # (D, z)
    z = z * (1.0 - onehot[:, None, :]) + \
        values[None, :, None] * onehot[:, None, :]
    return z.reshape(D * S, z_base.shape[-1])


def make_traversal_fn(model: CCVAE, n_steps: int = 8,
                      lo: float = -3.0, hi: float = 3.0,
                      dims: Optional[Sequence[int]] = None):
    """Returns jitted (params, z_base) -> (D, S, H, W, C) traversal images.

    `dims` defaults to every latent dimension. The decode runs as one
    batch of D·S images — for the CelebA-64 model that is a 45·8=360-image
    decoder batch, comfortably MXU-bound.
    """
    dims_arr = jnp.asarray(
        dims if dims is not None else range(model.cfg.z_dim), jnp.int32)
    values = jnp.linspace(lo, hi, n_steps, dtype=jnp.float32)

    @jax.jit
    def traverse(params, z_base):
        grid = _build_grid(z_base, dims_arr, values)
        imgs = model.decode(params, grid)
        return imgs.reshape(dims_arr.shape[0], n_steps, *imgs.shape[1:])

    return traverse


def latent_traversal(model: CCVAE, params, x=None, z_base=None,
                     n_steps: int = 8, lo: float = -3.0, hi: float = 3.0,
                     dims: Optional[Sequence[int]] = None):
    """Convenience wrapper: anchor on an encoded image's posterior mean
    (or an explicit z_base / zeros) and render the sweep grid."""
    if z_base is None:
        if x is not None:
            locs, _ = model.encode(params, x)
            z_base = locs[0]
        else:
            z_base = jnp.zeros((model.cfg.z_dim,), jnp.float32)
    fn = make_traversal_fn(model, n_steps=n_steps, lo=lo, hi=hi, dims=dims)
    return fn(params, z_base)
