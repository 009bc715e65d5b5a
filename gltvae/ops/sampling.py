"""Reparameterized stochastic samplers.

The BinConcrete gate sampler is the semantic heart of the gated LT-VAE:
it relaxes the Bernoulli gates c ∈ {0,1}^{z_classify × y_dim} so the latent
graph topology is differentiable. Formula reproduced exactly from
/root/reference/gated_ccvae.py:102-111 (incl. the μ clip and ε=1e-20):

    c = μ^{1/T} / ( μ^{1/T} + (1-μ)^{1/T} · e^{(g₂-g₁)/T} + ε )

with g₁, g₂ ~ Gumbel(0,1). All samplers take explicit PRNG keys (JAX
discipline) instead of the reference's implicit global TF RNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clip_passthrough(x, lo, hi):
    """clip with TF's gradient semantics: d/dx = 1 for lo <= x <= hi
    (inclusive), 0 outside. jnp.clip is minimum(maximum(...)) whose
    gradient splits 0.5/0.5 at exact ties — and the gating means sit
    EXACTLY at 1.0 on the diagonal (co-occurrence init, utils.py:148),
    so the tie case is the common case, not a corner."""
    return jnp.where(x < lo, lo, jnp.where(x > hi, hi, x))


def sample_gumbel(key, shape, eps=1e-20, dtype=jnp.float32):
    """g = -log(-log(U + ε) + ε), U ~ Uniform[0,1).

    Reference: gated_ccvae.py:62-64.
    """
    u = jax.random.uniform(key, shape, dtype=dtype, minval=0.0, maxval=1.0)
    return -jnp.log(-jnp.log(u + eps) + eps)


def sample_normal(key, loc, scale, dtype=None):
    """Reparameterized z = loc + scale·ε, ε ~ N(0, I).

    Reference: gated_ccvae.py:90-93.
    """
    dtype = dtype or jnp.result_type(loc)
    eps = jax.random.normal(key, jnp.shape(scale), dtype=dtype)
    return loc + scale * eps


def sample_gating(key, mu, temperature, eps=1e-20):
    """BinConcrete relaxed Bernoulli gate sample.

    Reference: gated_ccvae.py:102-111 (sample_gating_parameter). μ is
    clipped to [0,1] first; two independent Gumbel noises drive the
    relaxation. Returns c with the same shape as μ, values in (0,1).
    """
    mu = clip_passthrough(mu, 0.0, 1.0)
    k1, k2 = jax.random.split(key)
    g1 = sample_gumbel(k1, mu.shape, eps=eps, dtype=mu.dtype)
    g2 = sample_gumbel(k2, mu.shape, eps=eps, dtype=mu.dtype)
    num = jnp.exp((g2 - g1) / temperature)
    t1 = jnp.power(mu, 1.0 / temperature)
    t2 = jnp.power(1.0 - mu, 1.0 / temperature) * num
    # Hardening over the reference: at μ=1 with low T, (1-μ)^{1/T}=0 and
    # the Gumbel ratio can overflow to inf, making t2 = 0·inf = NaN — the
    # exact condition the reference's NaN guard sys.exit's on
    # (gated_ccvae.py:371-375). The correct limit is t2=0 (gate surely on).
    t2 = jnp.where(mu >= 1.0, 0.0, t2)
    return t1 / (t1 + t2 + eps)


def sample_gating_deterministic(mu, temperature=None):
    """Noise-free gate: the EXPECTED gate clip(μ,0,1) — not a hard
    threshold. (Thresholding at 0.5 would be the T→0 limit with g₁=g₂;
    using the expectation keeps gradients alive and matches how μ weights
    the classifier in expectation.) Used by the deterministic eval mode, a
    framework extension — the reference's eval is always stochastic
    (gated_ccvae.py:421-446)."""
    del temperature
    return jnp.clip(mu, 0.0, 1.0)
