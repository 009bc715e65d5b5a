"""Train state: the complete, Orbax-serializable training snapshot.

The reference cannot resume training — it saves only model weights
(gated_ccvae.py:388-419; no optimizer state, no step counter). Here the
state is one pytree carrying params, Adam moments, step and PRNG key, so a
restore is bit-exact resume (SURVEY.md §5 checkpoint plan).

μ freezing: the gating means live in ``params['mu']`` for all three gate
schemes; whether they train is an OPTIMIZER property (an optax.multi_transform
mask), mirroring the reference's trainable=True/False tf.Variable flag
(gated_ccvae.py:42-60) without special-casing the loss code.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from gltvae.config import ModelConfig, TrainConfig
from gltvae.models.ccvae import CCVAE


#: CLI/config name -> jax PRNG spec name. 'threefry' is the jax default
#: (bit-reproducible everywhere — all goldens pin it); 'rbg' lowers to
#: XLA RngBitGenerator, the fast partitionable TPU generator.
PRNG_IMPLS = {'threefry': 'threefry2x32', 'rbg': 'rbg'}


def make_key(seed: int, impl: str = 'threefry') -> jax.Array:
    """Typed PRNG key for `impl` ('threefry' | 'rbg')."""
    if impl not in PRNG_IMPLS:
        raise ValueError(
            f'prng_impl must be one of {sorted(PRNG_IMPLS)}, got {impl!r}')
    return jax.random.key(seed, impl=PRNG_IMPLS[impl])


def wrap_key(data: jax.Array) -> jax.Array:
    """Re-type raw key data, inferring the impl from its shape (threefry
    keys are 2 uint32 words, rbg keys are 4) — so a checkpoint restored
    under a different default impl still resumes its own stream."""
    impl = 'threefry2x32' if data.shape[-1] == 2 else 'rbg'
    return jax.random.wrap_key_data(data, impl=impl)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray            # int32 scalar
    params: Any
    opt_state: Any
    rng: jax.Array               # raw uint32 key data (Orbax/numpy friendly)

    def next_rng(self):
        """Per-step key derivation: fold the step counter into the state
        key so every step (and every restart from a checkpoint) draws a
        deterministic, distinct stream. Stored as raw key data because
        typed PRNG keys don't serialize through Orbax/numpy."""
        return jax.random.fold_in(wrap_key(self.rng), self.step)


def keras_adam(lr: float, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-7) -> optax.GradientTransformation:
    """Adam with tf.keras update semantics, exactly.

    Keras applies epsilon to the UNCORRECTED second moment
    (var -= lr·√(1-β₂ᵗ)/(1-β₁ᵗ) · m/(√v + ε)), while optax.adam applies it
    to the bias-corrected one (m̂/(√v̂ + ε)). The two differ by a factor
    1/√(1-β₂ᵗ) on ε — up to ~30× in early steps — which is exactly the
    kind of drift the twin-trajectory golden (tests/test_twin_trajectory)
    would flag. The reference trains with tf.keras.optimizers.Adam
    (gated_ccvae.py:144), so we match it bit-for-bit.
    """
    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        del params
        mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g,
                          state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1.0 - b2) * g * g,
                          state.nu, grads)
        count = state.count + 1
        t = count.astype(jnp.float32)
        alpha = lr * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        updates = jax.tree.map(
            lambda m, v: -alpha * m / (jnp.sqrt(v) + eps), mu, nu)
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(model_cfg: ModelConfig, train_cfg: TrainConfig):
    """Keras-semantics Adam (lr constant — the reference configures
    `anneal_rate` but never applies it, a quirk we preserve by default;
    gated_ccvae.py:144, SURVEY.md §2 quirks)."""
    adam = keras_adam(train_cfg.lr, b1=0.9, b2=0.999, eps=train_cfg.adam_eps)
    if model_cfg.mu_trainable:
        return adam
    # Fixed gating: μ gets zero updates; everything else trains.
    def label_fn(params):
        return {k: ('frozen' if k == 'mu' else 'train') for k in params}
    return optax.multi_transform(
        {'train': adam, 'frozen': optax.set_to_zero()}, label_fn)


def create_train_state(model: CCVAE, train_cfg: TrainConfig, key,
                       mu_init: Optional[np.ndarray] = None,
                       params: Optional[dict] = None) -> TrainState:
    k_init, k_state = jax.random.split(key)
    if params is None:
        params = model.init(k_init, mu_init=mu_init)
    tx = make_optimizer(model.cfg, train_cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=jax.random.key_data(k_state),
    )
