"""Closed-form distribution math for the gated CCVAE, as pure JAX.

Semantics match the reference's TFP usage:
- diagonal-Gaussian KL  (reference: /root/reference/utils.py:108-119)
- Laplace image log-likelihood, scale=1, summed over H,W,C
  (reference: /root/reference/utils.py:101-105)
- Bernoulli log-prob / sampling for labels
  (reference: gated_ccvae.py:176-181, 204-210)

Everything is elementwise VPU work that XLA fuses into the surrounding
matmul/conv graph; no TFP dependency.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG2 = 0.6931471805599453


def gaussian_kl(loc_q, scale_q, loc_p=None, scale_p=None, axis=-1):
    """KL( N(loc_q, scale_q²) ‖ N(loc_p, scale_p²) ), summed over `axis`.

    Same closed form TFP's ``kl_divergence(Normal, Normal)`` evaluates
    (reference wraps it at utils.py:108-119 and sums over the latent axis).
    Defaults p = N(0, I).
    """
    if loc_p is None:
        loc_p = jnp.zeros_like(loc_q)
    if scale_p is None:
        scale_p = jnp.ones_like(scale_q)
    log_ratio = jnp.log(scale_p) - jnp.log(scale_q)
    var_ratio = jnp.square(scale_q) / jnp.square(scale_p)
    mean_term = jnp.square(loc_q - loc_p) / jnp.square(scale_p)
    kl = log_ratio + 0.5 * (var_ratio + mean_term - 1.0)
    return jnp.sum(kl, axis=axis)


def laplace_log_prob(loc, x, scale=1.0):
    """Elementwise log Laplace(loc, scale).log_prob(x)."""
    return -jnp.abs(x - loc) / scale - jnp.log(2.0 * scale)


def img_log_likelihood(recon, x):
    """log p(x|z) under Laplace(recon, 1), summed over H, W, C.

    Reference: utils.py:101-105. With scale=1 the log-normalizer is -log 2
    per pixel, so this is -(L1 error) - HWC·log2 per image.
    """
    recon = recon.astype(jnp.float32)
    x = x.astype(jnp.float32)
    return jnp.sum(-jnp.abs(x - recon) - _LOG2, axis=(-3, -2, -1))


def bernoulli_log_prob(logits, y):
    """log Bernoulli(logits).log_prob(y) for y in {0,1} (float).

    Numerically stable: -softplus((1-2y)·logits), the same value TFP
    computes for integer-valued y.
    """
    return -jax.nn.softplus((1.0 - 2.0 * y) * logits)


def bernoulli_log_prob_probs(probs, y):
    """log Bernoulli(probs).log_prob(y); used for the label prior p(y)
    (reference keeps p_Y = 0.5 uniform; gated_ccvae.py:141, 210, 259)."""
    return y * jnp.log(probs) + (1.0 - y) * jnp.log1p(-probs)


def bernoulli_sample(key, logits, dtype=jnp.float32):
    """Sample y ~ Bernoulli(sigmoid(logits)); reference gated_ccvae.py:206."""
    return jax.random.bernoulli(key, jax.nn.sigmoid(logits)).astype(dtype)
