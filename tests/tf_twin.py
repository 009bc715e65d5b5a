"""TensorFlow twin of the reference training loop, for trajectory goldens.

An independent TF re-derivation of the reference Learner's train_step
(/root/reference/gated_ccvae.py:234-311: both ELBOs + tf.keras Adam), with
every stochastic draw INJECTED as a constant so the jax framework and this
twin can be driven with identical noise. Used by test_twin_trajectory to
pin the only end-to-end semantics value/gradient goldens cannot: the
optimizer + schedule composed over many steps.

Flagship CelebA-64 shapes (z=45, z_style=27, y=18) with parametric batch
size and MC sample count.
"""

import numpy as np


def reconstruct_noise(key_t, supervised, B, K, z_dim=45, y_dim=18):
    """Reconstruct, as numpy values, the exact stochastic draws the gltvae
    train step makes from its per-step key (steps.py next_rng →
    ccvae.py 3-way split → samplers in ops/sampling.py)."""
    import jax
    import jax.numpy as jnp
    from gltvae.ops.sampling import sample_gumbel

    def _np(a):
        return np.asarray(jax.device_get(a), np.float32)

    k_z, k_gate, k_3 = jax.random.split(key_t, 3)
    k1, k2 = jax.random.split(k_gate)
    noise = {
        'eps_z': _np(jax.random.normal(k_z, (B, z_dim), dtype=jnp.float32)),
        'g1': _np(sample_gumbel(k1, (y_dim, y_dim))),
        'g2': _np(sample_gumbel(k2, (y_dim, y_dim))),
    }
    if supervised:
        noise['eps_k'] = _np(jax.random.normal(k_3, (K, B, z_dim),
                                               dtype=jnp.float32))
    else:
        # bernoulli_sample = uniform(key) < sigmoid(logits)
        noise['u_y'] = _np(jax.random.uniform(k_3, (B, y_dim),
                                              dtype=jnp.float32))
    return noise


class TFTwinLearner:
    """Reference-semantics learner over tf.Variables with injected noise.

    ``train_mu=False`` reproduces the fixed-gating modes: μ is a
    non-trainable variable (gated_ccvae.py:48-57), excluded from the
    optimizer exactly as keras skips trainable=False variables.
    """

    def __init__(self, params_np, lr=1e-4, gating_reg=0.2, z_style=27,
                 label_prior=0.5, train_mu=True):
        import tensorflow as tf
        self.tf = tf
        self.z_style = z_style
        self.reg = gating_reg
        self.log_prior = float(np.log(label_prior))

        self.v = {}

        def var(path, arr):
            self.v[path] = tf.Variable(np.asarray(arr, np.float32))
            return self.v[path]

        self.enc = {k: {k2: var(f'encoder/{k}/{k2}', a2)
                        for k2, a2 in a.items()}
                    for k, a in params_np['encoder'].items()}
        self.dec = {k: {k2: var(f'decoder/{k}/{k2}', a2)
                        for k2, a2 in a.items()}
                    for k, a in params_np['decoder'].items()}
        self.clf = {k: var(f'classifier/{k}', a)
                    for k, a in params_np['classifier'].items()}
        self.cp = {k: var(f'cond_prior/{k}', a)
                   for k, a in params_np['cond_prior'].items()}
        self.mu = var('mu', params_np['mu'])
        self.train_mu = train_mu
        self.opt = tf.keras.optimizers.Adam(lr)

    # ------------------------- building blocks -------------------------
    def _encode(self, x):
        tf = self.tf
        h = x
        for i in range(1, 6):
            if i < 5:
                h = tf.pad(h, [[0, 0], [1, 1], [1, 1], [0, 0]])
                s = 2
            else:
                s = 1
            w = self.enc[f'conv{i}']
            h = tf.nn.relu(tf.nn.conv2d(h, w['kernel'], strides=s,
                                        padding='VALID') + w['bias'])
        h = tf.reshape(h, [x.shape[0], -1])
        locs = tf.nn.relu(h @ self.enc['locs']['kernel']
                          + self.enc['locs']['bias'])
        scales = tf.clip_by_value(
            tf.math.softplus(h @ self.enc['scale']['kernel']
                             + self.enc['scale']['bias']), 1e-3, 1e3)
        return locs, scales

    def _decode(self, z):
        tf = self.tf
        B = z.shape[0]
        hd = tf.nn.relu(z @ self.dec['fc1']['kernel']
                        + self.dec['fc1']['bias'])
        hd = tf.reshape(hd, [B, 1, 1, hd.shape[-1]])
        specs = [('conv1t', 1, 'VALID', tf.nn.relu),
                 ('conv2t', 2, 'SAME', tf.nn.relu),
                 ('conv3t', 2, 'SAME', tf.nn.relu),
                 ('conv4t', 2, 'SAME', tf.nn.relu),
                 ('conv5t', 2, 'SAME', tf.sigmoid)]
        for name, s, pad, act in specs:
            k = self.dec[name]['kernel']
            in_sp = hd.shape[1]
            out_sp = in_sp * s if pad == 'SAME' else (in_sp - 1) * s + 4
            hd = act(tf.nn.conv2d_transpose(
                hd, k, output_shape=[B, out_sp, out_sp, k.shape[2]],
                strides=s, padding=pad) + self.dec[name]['bias'])
        return hd

    def _gates(self, g1, g2, temp):
        """BinConcrete with injected Gumbels (gated_ccvae.py:102-111)."""
        tf = self.tf
        mu_c = tf.clip_by_value(self.mu, 0.0, 1.0)
        num = tf.exp((g2 - g1) / temp)
        t1 = tf.pow(mu_c, 1.0 / temp)
        t2 = tf.pow(1.0 - mu_c, 1.0 / temp) * num
        return t1 / (t1 + t2 + 1e-20)

    def _classify(self, zc, c):
        tf = self.tf
        return tf.reduce_sum(
            zc[:, :, None] * c[None] * self.clf['kernel'][None],
            axis=1) + self.clf['bias']

    def _bern_lp(self, lgts, lbl):
        return -self.tf.math.softplus((1.0 - 2.0 * lbl) * lgts)

    def _shared(self, x, y_obs, z, locs, scales, c):
        """log q(y|zc,c), log p(y), KL, log p(x|z) for a given y."""
        tf = self.tf
        B = x.shape[0]
        y_dim = int(y_obs.shape[-1])
        zc = z[:, self.z_style:]
        logits = self._classify(zc, c)
        log_qy_zc = tf.reduce_sum(self._bern_lp(logits, y_obs), axis=-1)
        log_py = tf.constant(y_dim * self.log_prior, tf.float32) \
            * tf.ones([B])

        ct = tf.transpose(c)
        prior_locs = y_obs @ (ct * self.cp['loc_true']) \
            + (1.0 - y_obs) @ (ct * self.cp['loc_false'])
        prior_scales = tf.clip_by_value(tf.math.softplus(
            y_obs @ (ct * self.cp['scale_true'])
            + (1.0 - y_obs) @ (ct * self.cp['scale_false'])), 1e-3, 1e3)
        prior_locs = tf.concat(
            [tf.zeros([B, self.z_style]), prior_locs], -1)
        prior_scales = tf.concat(
            [tf.ones([B, self.z_style]), prior_scales], -1)
        kl = tf.reduce_sum(
            tf.math.log(prior_scales) - tf.math.log(scales)
            + (scales ** 2 + (locs - prior_locs) ** 2)
            / (2.0 * prior_scales ** 2) - 0.5, axis=-1)

        recon = self._decode(z)
        log_pxz = tf.reduce_sum(-tf.abs(x - recon) - np.log(2.0),
                                axis=[1, 2, 3])
        return logits, log_qy_zc, log_py, kl, log_pxz

    # ----------------------------- losses -----------------------------
    def sup_loss(self, x, y, noise, temp):
        """Supervised ELBO (gated_ccvae.py:234-300) with injected
        noise = dict(eps_z, g1, g2, eps_k)."""
        tf = self.tf
        locs, scales = self._encode(x)
        z = locs + scales * noise['eps_z']
        c = self._gates(noise['g1'], noise['g2'], temp)
        _, log_qy_zc, log_py, kl, log_pxz = self._shared(
            x, y, z, locs, scales, c)

        # k-sample marginal with the same gates
        K = noise['eps_k'].shape[0]
        z_k = locs[None] + scales[None] * noise['eps_k']
        zc_k = tf.reshape(z_k[:, :, self.z_style:],
                          [-1, int(self.mu.shape[0])])
        logits_k = self._classify(zc_k, c)
        logits_k = tf.reshape(logits_k, [K] + list(y.shape))
        lq_k = tf.reduce_sum(self._bern_lp(logits_k, y[None]), axis=-1)
        log_qy_x = tf.reduce_logsumexp(lq_k, axis=0) - np.log(float(K))

        # importance weight, z detached in the numerator only
        zc_det = tf.stop_gradient(z[:, self.z_style:])
        log_qy_zc_det = tf.reduce_sum(
            self._bern_lp(self._classify(zc_det, c), y), axis=-1)
        w = tf.exp(log_qy_zc_det - log_qy_x)

        elbo = w * (log_pxz - kl - log_qy_zc) + log_py + log_qy_x
        return tf.reduce_mean(-elbo) \
            + self.reg * tf.reduce_mean(tf.abs(self.mu))

    def unsup_loss(self, x, noise, temp):
        """Unsupervised ELBO (gated_ccvae.py:184-232): y sampled from the
        classifier via the injected uniforms noise['u_y']."""
        tf = self.tf
        locs, scales = self._encode(x)
        z = locs + scales * noise['eps_z']
        c = self._gates(noise['g1'], noise['g2'], temp)
        zc = z[:, self.z_style:]
        logits0 = self._classify(zc, c)
        y_s = tf.cast(noise['u_y'] < tf.sigmoid(logits0), tf.float32)
        _, log_qy_zc, log_py, kl, log_pxz = self._shared(
            x, y_s, z, locs, scales, c)
        elbo = log_pxz + log_py - kl - log_qy_zc
        return tf.reduce_mean(-elbo) \
            + self.reg * tf.reduce_mean(tf.abs(self.mu))

    # ------------------------------ steps ------------------------------
    def train_step(self, x, y, noise, temp, supervised):
        tf = self.tf
        with tf.GradientTape() as tape:
            if supervised:
                loss = self.sup_loss(tf.constant(x), tf.constant(y),
                                     noise, temp)
            else:
                loss = self.unsup_loss(tf.constant(x), noise, temp)
        names = [n for n in self.v if self.train_mu or n != 'mu']
        grads = tape.gradient(loss, [self.v[n] for n in names])
        self.opt.apply_gradients(
            [(g, self.v[n]) for g, n in zip(grads, names)])
        return float(loss)

    def params_np(self):
        return {k: v.numpy() for k, v in self.v.items()}
