"""Gated CCVAE: model bundle + supervised/unsupervised ELBO losses.

Pure-functional re-design of /root/reference/gated_ccvae.py (class CCVAE
23-111, losses in Learner 167-300): parameters are one pytree (four
submodule param trees + the gating means μ), losses are pure functions of
(params, batch, rng, temperature) so the whole train step jit-compiles to a
single XLA program on TPU.

TPU-first deviations (value-identical, compile-friendly):
- The k=100 Monte-Carlo classifier marginal q(y|x) (reference: a Python
  loop of 100 encoder-sized graphs, gated_ccvae.py:167-182) is one batched
  sample: ε ~ N(0,1)^{k×B×z}, a single [k·B, z_c] × [z_c, y] GEMM, then a
  logsumexp. Identical math, ~k× less dispatch.
- `supervised` is not a traced bool: the trainer compiles one function per
  branch (mirroring the two tf.function traces the reference creates).
- All randomness is explicit: one key per loss call, split into
  (z, gates, y/marginal) streams.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gltvae.config import ModelConfig
from gltvae.models.networks import (depth_to_space, space_to_depth,
                                    Encoder, Decoder, GatedClassifier,
                                    ConditionalPrior)
from gltvae.ops.distributions import (gaussian_kl, img_log_likelihood,
                                      bernoulli_log_prob,
                                      bernoulli_log_prob_probs,
                                      bernoulli_sample)
from gltvae.ops.sampling import (sample_normal, sample_gating,
                                 sample_gating_deterministic)
from gltvae.ops.gating import identity_gating_matrix


class LossAux(NamedTuple):
    """ELBO decomposition for structured metrics (the reference logs only
    the scalar loss; SURVEY.md §5 calls for the decomposition)."""
    elbo: jnp.ndarray
    log_pxz: jnp.ndarray
    kl: jnp.ndarray
    log_py: jnp.ndarray
    log_qy_zc: jnp.ndarray
    log_qy_x: jnp.ndarray   # 0 for unsupervised batches
    gates: jnp.ndarray      # sampled c, for the NaN guard / c_avg metric


class Temps(NamedTuple):
    """Traced temperature scalars (changed per-epoch without recompiling)."""
    gating: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class CCVAE:
    """Model bundle. Hashable (frozen) so it can ride in jit closures."""

    cfg: ModelConfig

    # ---- submodules (constructed on demand; linen modules are cheap) ----
    @property
    def encoder(self) -> Encoder:
        c = self.cfg
        return Encoder(z_dim=c.z_dim, features=c.enc_features,
                       hidden=c.enc_hidden, locs_act=c.posterior_locs,
                       input_s2d=c.input_s2d,
                       dtype=c.dtype, precision=c.matmul_precision)

    @property
    def decoder(self) -> Decoder:
        c = self.cfg
        return Decoder(hidden=c.dec_hidden or c.z_dim, features=c.dec_features,
                       out_channels=c.channels, output_s2d=c.output_s2d,
                       dtype=c.dtype, precision=c.matmul_precision)

    @property
    def classifier(self) -> GatedClassifier:
        c = self.cfg
        return GatedClassifier(y_dim=c.y_dim, z_classify=c.z_classify,
                               dtype=c.dtype, precision=c.matmul_precision)

    @property
    def cond_prior(self) -> ConditionalPrior:
        c = self.cfg
        return ConditionalPrior(z_classify=c.z_classify, y_dim=c.y_dim,
                                dtype=c.dtype)

    # ------------------------------ init ------------------------------
    def init(self, key, mu_init: Optional[np.ndarray] = None) -> dict:
        """Build the full parameter pytree.

        μ initialization mirrors gated_ccvae.py:42-60: learnable / fixed
        'inferred' take the provided co-occurrence matrix; fixed 'one-one'
        is the identity. Whether μ receives gradient updates is decided by
        the optimizer mask (train/state.py), not by the pytree.
        """
        c = self.cfg
        k_enc, k_dec, k_clf, k_cp = jax.random.split(key, 4)
        x0 = jnp.zeros((1, *c.input_shape), jnp.float32)
        z0 = jnp.zeros((1, c.z_dim), jnp.float32)
        zc0 = jnp.zeros((1, c.z_classify), jnp.float32)
        y0 = jnp.zeros((1, c.y_dim), jnp.float32)
        g0 = jnp.zeros((c.z_classify, c.y_dim), jnp.float32)

        if c.gate_type == 'fixed' and c.gate_subtype == 'one-one':
            mu = jnp.asarray(identity_gating_matrix(c.z_classify, c.y_dim))
        else:
            if mu_init is None:
                raise ValueError(
                    f"gate_type={c.gate_type}/{c.gate_subtype} requires "
                    "mu_init (co-occurrence matrix)")
            mu = jnp.asarray(mu_init, jnp.float32)
        if mu.shape != (c.z_classify, c.y_dim):
            raise ValueError(f'mu shape {mu.shape} != '
                             f'{(c.z_classify, c.y_dim)}')

        return {
            'encoder': self.encoder.init(k_enc, x0)['params'],
            'decoder': self.decoder.init(k_dec, z0)['params'],
            'classifier': self.classifier.init(k_clf, zc0, g0)['params'],
            'cond_prior': self.cond_prior.init(k_cp, y0, g0)['params'],
            'mu': mu,
        }

    # --------------------------- forward ops ---------------------------
    def encode(self, params, x):
        return self.encoder.apply({'params': params['encoder']}, x)

    def decode(self, params, z):
        """p(x|z) as an (S, S, C) image regardless of output_s2d (the
        s2d form is re-indexed back; losses use _recon_log_lik to stay
        in s2d space and skip the padded image materialization)."""
        out = self.decoder.apply({'params': params['decoder']}, z)
        return depth_to_space(out) if self.cfg.output_s2d else out

    def _recon_log_lik(self, params, z, x):
        """log p(x|z): with output_s2d both recon and target compare in
        space-to-depth form — the per-pixel Laplace sum is re-index
        invariant, and neither (S, S, 3) padded tensor is materialized."""
        out = self.decoder.apply({'params': params['decoder']}, z)
        if self.cfg.output_s2d:
            return img_log_likelihood(out, space_to_depth(x))
        return img_log_likelihood(out, x)

    def classify(self, params, z_classify, gates):
        return self.classifier.apply({'params': params['classifier']},
                                     z_classify, gates)

    def prior_zc(self, params, y, gates):
        return self.cond_prior.apply({'params': params['cond_prior']},
                                     y, gates)

    def split_z(self, z):
        """z -> (z_style, z_classify); classify dims are the LAST z_classify
        (gated_ccvae.py:191: z[:, z_style:])."""
        return z[..., :self.cfg.z_style], z[..., self.cfg.z_style:]

    def p_y_probs(self):
        """Uniform Bernoulli label prior p(y) (gated_ccvae.py:141;
        0.5 there, configurable here)."""
        return jnp.full((self.cfg.y_dim,), self.cfg.label_prior,
                        jnp.float32)

    # ------------------- MC classifier marginal q(y|x) -------------------
    def log_qy_x(self, params, key, locs, scales, y, gates, k: int):
        """log q(y|x) ≈ logsumexp_k log q(y|z_k, c) − log k, z_k ~ q(z|x).

        Replaces the reference's k-iteration Python loop
        (gated_ccvae.py:167-182) with one batched reparameterized draw and
        a single GEMM over the k·B axis. Gradients flow to the encoder
        (through locs/scales) and the classifier, exactly as in the
        reference (no stop-gradients in its classifier_loss).
        """
        eps = jax.random.normal(key, (k,) + locs.shape, dtype=jnp.float32)
        z = locs[None] + scales[None] * eps              # [k, B, z]
        _, zc = self.split_z(z)
        logits = self.classify(params, zc.reshape(-1, self.cfg.z_classify),
                               gates)
        logits = logits.reshape(k, *y.shape)             # [k, B, y]
        log_qy = jnp.sum(bernoulli_log_prob(logits, y[None]), axis=-1)
        return jax.nn.logsumexp(log_qy, axis=0) - jnp.log(float(k))

    # ----------------------------- losses -----------------------------
    def _shared_forward(self, params, x, y, key_z, key_gate, temps: Temps):
        """Encoder -> z sample -> gate sample -> classifier logits ->
        conditional-prior KL -> reconstruction LL. Common to both losses
        (gated_ccvae.py:184-222 == 234-272 modulo the y source)."""
        cfg = self.cfg
        locs, scales = self.encode(params, x)
        z = sample_normal(key_z, locs, scales)
        _, z_classify = self.split_z(z)
        c = sample_gating(key_gate, params['mu'], temps.gating)

        logits_y_zc = self.classify(params, z_classify, c)

        def finish(y_obs):
            log_qy_zc = jnp.sum(bernoulli_log_prob(logits_y_zc, y_obs),
                                axis=-1)
            log_py = jnp.sum(
                bernoulli_log_prob_probs(self.p_y_probs(), y_obs), axis=-1)
            prior_locs, prior_scales = self.prior_zc(params, y_obs, c)
            B = x.shape[0]
            prior_locs = jnp.concatenate(
                [jnp.zeros((B, cfg.z_style), jnp.float32), prior_locs], -1)
            prior_scales = jnp.concatenate(
                [jnp.ones((B, cfg.z_style), jnp.float32), prior_scales], -1)
            kl = gaussian_kl(locs, scales, prior_locs, prior_scales)
            log_pxz = self._recon_log_lik(params, z, x)
            return log_qy_zc, log_py, kl, log_pxz

        return locs, scales, z, z_classify, c, logits_y_zc, finish

    def _l1_mu(self, params, gating_reg: float):
        """L1 sparsity on the gate means, learnable mode only
        (gated_ccvae.py:229-230, 296-298; applied to the raw, unclipped μ)."""
        if gating_reg == 0.0:
            return 0.0
        return gating_reg * jnp.mean(jnp.abs(params['mu']))

    def unsup_loss(self, params, x, key, temps: Temps,
                   gating_reg: float = 0.0):
        """Unsupervised ELBO (gated_ccvae.py:184-232): y is SAMPLED from
        q(y|z,c); elbo = log p(x|z) + log p(y) − KL − log q(y|z,c)."""
        key_z, key_gate, key_y = jax.random.split(key, 3)
        (_, _, _, _, c, logits_y_zc,
         finish) = self._shared_forward(params, x, None, key_z, key_gate,
                                        temps)
        y = bernoulli_sample(key_y, logits_y_zc)
        log_qy_zc, log_py, kl, log_pxz = finish(y)
        elbo = log_pxz + log_py - kl - log_qy_zc
        loss = jnp.mean(-elbo) + self._l1_mu(params, gating_reg)
        aux = LossAux(elbo=jnp.mean(elbo), log_pxz=jnp.mean(log_pxz),
                      kl=jnp.mean(kl), log_py=jnp.mean(log_py),
                      log_qy_zc=jnp.mean(log_qy_zc),
                      log_qy_x=jnp.zeros(()), gates=c)
        return loss, aux

    def sup_loss(self, params, x, y, key, temps: Temps,
                 gating_reg: float = 0.0, k: int = 100):
        """Supervised ELBO (gated_ccvae.py:234-300).

        Uses the CCVAE importance weight w = exp(log q(y|ẑ_c,c) − log q(y|x))
        with the z_classify path stop-gradiented in the numerator only
        (gated_ccvae.py:280-287, per Joy et al. App. C.3.1 — reduces
        classifier-gradient variance):
            elbo = w·(log p(x|z) − KL − log q(y|z,c)) + log p(y) + log q(y|x)
        """
        key_z, key_gate, key_k = jax.random.split(key, 3)
        (locs, scales, _, z_classify, c, logits_y_zc,
         finish) = self._shared_forward(params, x, y, key_z, key_gate, temps)
        log_qy_zc, log_py, kl, log_pxz = finish(y)

        # Monte-Carlo marginal q(y|x) with the SAME sampled gates c
        # (classifier_loss is called with c at gated_ccvae.py:256).
        log_qy_x = self.log_qy_x(params, key_k, locs, scales, y, c, k)

        # Numerator with detached z (classifier + gates still get grads).
        logits_detached = self.classify(params,
                                        jax.lax.stop_gradient(z_classify), c)
        log_qy_zc_det = jnp.sum(bernoulli_log_prob(logits_detached, y), -1)
        w = jnp.exp(log_qy_zc_det - log_qy_x)

        elbo = w * (log_pxz - kl - log_qy_zc) + log_py + log_qy_x
        loss = jnp.mean(-elbo) + self._l1_mu(params, gating_reg)
        aux = LossAux(elbo=jnp.mean(elbo), log_pxz=jnp.mean(log_pxz),
                      kl=jnp.mean(kl), log_py=jnp.mean(log_py),
                      log_qy_zc=jnp.mean(log_qy_zc),
                      log_qy_x=jnp.mean(log_qy_x), gates=c)
        return loss, aux

    # --------------------------- generation ---------------------------
    def reconstruct(self, params, x, key=None):
        """x -> q(z|x) -> p(x|z). Posterior mean when key is None."""
        locs, scales = self.encode(params, x)
        z = locs if key is None else sample_normal(key, locs, scales)
        return self.decode(params, z)

    def sample_conditional(self, params, y, key, temps: Temps,
                           deterministic_gates: bool = False):
        """Attribute-conditioned generation (capability implied by the
        reference's conditional prior, networks.py:109-127, but never
        exposed there): z_classify ~ p(z_classify|y,c), z_style ~ N(0,I),
        x = decoder(z)."""
        key_gate, key_zc, key_zs = jax.random.split(key, 3)
        if deterministic_gates:
            c = sample_gating_deterministic(params['mu'])
        else:
            c = sample_gating(key_gate, params['mu'], temps.gating)
        locs, scales = self.prior_zc(params, y.astype(jnp.float32), c)
        zc = sample_normal(key_zc, locs, scales)
        zs = jax.random.normal(key_zs, (y.shape[0], self.cfg.z_style),
                               dtype=jnp.float32)
        return self.decode(params, jnp.concatenate([zs, zc], axis=-1))

    # ------------------------------ eval ------------------------------
    def predict_probs(self, params, x, key, temps: Temps,
                      deterministic: bool = False):
        """sigmoid(classifier(z, c)) — the one place the eval/inference
        z-and-gate protocol lives (predict_labels, Trainer eval and
        tools/infer.py all go through here).

        Stochastic by default for parity with the reference's eval
        (gated_ccvae.py:421-446: sampled z AND sampled gates — the source
        of its re-eval variance). `deterministic=True` uses the posterior
        mean and expected gates instead (framework extension)."""
        locs, scales = self.encode(params, x)
        if deterministic:
            z = locs
            c = sample_gating_deterministic(params['mu'])
        else:
            key_z, key_gate = jax.random.split(key)
            z = sample_normal(key_z, locs, scales)
            c = sample_gating(key_gate, params['mu'], temps.gating)
        _, z_classify = self.split_z(z)
        return jax.nn.sigmoid(self.classify(params, z_classify, c))

    def predict_labels(self, params, x, key, temps: Temps,
                       deterministic: bool = False):
        """ŷ = round(sigmoid(classifier(z, c))) — see predict_probs."""
        return jnp.round(self.predict_probs(params, x, key, temps,
                                            deterministic))

    def classifier_accuracy(self, params, x, y, key, temps: Temps,
                            deterministic: bool = False):
        """Mean elementwise label match (gated_ccvae.py:421-446)."""
        y_hat = self.predict_labels(params, x, key, temps, deterministic)
        return jnp.mean((y_hat == y.astype(y_hat.dtype)).astype(jnp.float32))
