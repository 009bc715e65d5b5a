"""Diagnostic: step-level and trajectory-level comparison against the
ACTUAL reference code (not the TF twin).

Builds the reference Learner (eager), copies its fresh-init weights into
a gltvae pytree, then:
1. single-step: injected-noise sup/unsup loss + gradients, reference vs
   gltvae — must match to float tolerance;
2. multi-step: N steps on real corpus batches with per-step injected
   noise and LIVE optimizers (reference: Keras Adam; gltvae: keras_adam)
   — loss curves must track.

Run on CPU: JAX_PLATFORMS=cpu python tools/diag_ref_compare.py \
    --data-dir /tmp/h2h/ref_root/data --steps 48
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE = '/root/reference'


def build_reference_learner(gate_type='fixed', gate_subtype='one-one',
                            mu_init=None, lr=1e-4, workdir='/tmp'):
    try:
        import tensorflow_probability  # noqa: F401
    except ImportError:
        sys.path.insert(0, os.path.join(REPO, 'tools', 'tfp_shim'))
    sys.path.insert(0, REFERENCE)
    if workdir is not None:
        os.chdir(workdir)                 # reference logs to ./logs
    import gated_ccvae
    cfg = {'n_epochs': 1, 'batch_size': 64, 'num_iters': 10, 'lr': lr,
           'init_temp': 0.1, 'anneal_rate': 3e-5, 'perc_supervision': 1.0,
           'z_dim': 45, 'n_classes': 18, 'gate_type': gate_type,
           'gate_subtype': gate_subtype,
           'gating_init_temp': 1.0 if gate_type == 'learnable' else 0.3,
           'gating_reg': 0.2, 'mu_init': mu_init}
    learner = gated_ccvae.Learner(
        ip_shape=(64, 64, 3), z_dim=45, z_classify=18, y_dim=18,
        num_samples=1500, supervision=1.0, train_config=cfg)
    # build by dummy forward (load_model protocol, gated_ccvae.py:150-153)
    m = learner.model
    m.encoder(np.ones([1, 64, 64, 3], np.float32))
    m.decoder(np.ones([1, 45], np.float32))
    m.classifier(np.ones([1, 18, 18], np.float32),
                 np.ones([18, 18], np.float32) / 2.)
    m.cond_prior(np.ones([1, 18, 18], np.float32),
                 np.ones([18, 18], np.float32) / 2.)
    return learner


def ref_weights_to_pytree(learner):
    """Reference keras models -> gltvae params pytree (fresh-init copy)."""
    m = learner.model
    enc = {}
    for i in range(1, 6):
        conv = getattr(m.encoder, f'conv{i}')
        enc[f'conv{i}'] = {'kernel': conv.kernel.numpy(),
                           'bias': conv.bias.numpy()}
    enc['locs'] = {'kernel': m.encoder.locs_out.kernel.numpy(),
                   'bias': m.encoder.locs_out.bias.numpy()}
    enc['scale'] = {'kernel': m.encoder.std_out.kernel.numpy(),
                    'bias': m.encoder.std_out.bias.numpy()}
    dec = {'fc1': {'kernel': m.decoder.fc1.kernel.numpy(),
                   'bias': m.decoder.fc1.bias.numpy()}}
    for i in range(1, 6):
        conv = getattr(m.decoder, f'conv{i}t')
        dec[f'conv{i}t'] = {'kernel': conv.kernel.numpy(),
                            'bias': conv.bias.numpy()}
    clf = {'kernel': m.classifier.get_logits.kernel.numpy(),
           'bias': m.classifier.get_logits.bias.numpy()}
    cp = {'loc_true': m.cond_prior.loc_true.kernel.numpy(),
          'loc_false': m.cond_prior.loc_false.kernel.numpy(),
          'scale_true': m.cond_prior.scale_true.kernel.numpy(),
          'scale_false': m.cond_prior.scale_false.kernel.numpy()}
    return {'encoder': enc, 'decoder': dec, 'classifier': clf,
            'cond_prior': cp, 'mu': m.mu.numpy()}


class NoiseInjector:
    """Monkeypatch the reference CCVAE's samplers with queued draws."""

    def __init__(self, model):
        self.model = model
        self.normals = []
        self.gumbels = []
        model.sample_normal = self._sample_normal
        model.sample_gating_parameter = self._sample_gating

    def load(self, noise):
        self.normals = [noise['eps_z']] + (
            list(noise['eps_k']) if 'eps_k' in noise else [])
        self.gumbels = [noise['g1'], noise['g2']]

    def _sample_normal(self, mu, std, latent_dim):
        import tensorflow as tf
        eps = tf.constant(self.normals.pop(0), tf.float32)
        return tf.reshape(mu + std * eps, [-1, latent_dim])

    def _sample_gating(self, mu, temperature, EPSILON=1e-20):
        import tensorflow as tf
        mu = tf.clip_by_value(mu, 0.0, 1.0)
        eps1 = tf.constant(self.gumbels.pop(0), tf.float32)
        eps2 = tf.constant(self.gumbels.pop(1 - 1), tf.float32)
        num = tf.exp((eps2 - eps1) / temperature)
        t1 = tf.pow(mu, 1. / temperature)
        t2 = tf.pow((1. - mu), 1. / temperature) * num
        return t1 / (t1 + t2 + EPSILON)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data-dir', required=True)
    p.add_argument('--steps', type=int, default=48)
    p.add_argument('--bs', type=int, default=64)
    p.add_argument('--k', type=int, default=100)
    p.add_argument('--gate-type', default='fixed')
    p.add_argument('--gate-subtype', default='one-one')
    p.add_argument('--epochs-compare', type=int, default=0,
                   help='additionally train BOTH sides N epochs from the '
                        'same init on the same batch stream with '
                        'independent live noise, printing val accuracy')
    args = p.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import tensorflow as tf
    from gltvae.config import ModelConfig, TrainConfig, DataConfig
    from gltvae.data.celeba import CelebAReader
    from gltvae.models.ccvae import CCVAE, Temps
    from gltvae.train.state import create_train_state
    from gltvae.train.steps import make_train_steps
    from tests.tf_twin import reconstruct_noise

    mu0 = np.eye(18, dtype=np.float32)
    learner = build_reference_learner(args.gate_type, args.gate_subtype,
                                      mu_init=mu0)
    params0 = ref_weights_to_pytree(learner)

    model_cfg = ModelConfig(gate_type=args.gate_type,
                            gate_subtype=args.gate_subtype)
    train_cfg = TrainConfig(batch_size=args.bs,
                            classifier_mc_samples=args.k)
    model = CCVAE(model_cfg)
    state = create_train_state(model, train_cfg, jax.random.key(0),
                               mu_init=mu0)
    state = state.replace(params=jax.tree.map(jnp.asarray, params0))
    temp = train_cfg.gating_temp_for(model_cfg)

    # real corpus batches through the PIL (reference-identical) decoder
    data_cfg = DataConfig(data_dir=args.data_dir, n_train=1500, n_valid=300,
                          n_test=300, num_workers=0, decode_backend='pil')
    reader = CelebAReader(data_cfg, sup_frac=1.0, batch_size=args.bs,
                          reshuffle_each_epoch=False)
    loader = reader.setup_data_loaders()['sup']
    it = iter(loader)

    inj = NoiseInjector(learner.model)

    # ---------------- single-step loss + grad comparison ----------------
    x_u8, y = next(it)
    x = x_u8.astype(np.float32) / 255.0
    key = jax.random.fold_in(jax.random.wrap_key_data(state.rng), 0)
    noise = reconstruct_noise(key, True, args.bs, args.k)
    inj.load(noise)
    with tf.GradientTape() as tape:
        ref_loss, _ = learner.sup_loss(tf.constant(x), tf.constant(y))
    ref_grads = tape.gradient(ref_loss, learner.model.trainable_variables)
    ref_gnorm = float(tf.linalg.global_norm(
        [g for g in ref_grads if g is not None]))

    (our_loss, aux), our_grads = jax.value_and_grad(
        model.sup_loss, has_aux=True)(
            state.params, jnp.asarray(x), jnp.asarray(y), key,
            Temps(gating=jnp.float32(temp)), gating_reg=0.0, k=args.k)
    # drop the frozen-μ grad for norm comparison (reference excludes
    # non-trainable μ from trainable_variables)
    g_no_mu = dict(our_grads)
    g_no_mu['mu'] = jax.tree.map(jnp.zeros_like, our_grads['mu'])
    our_gnorm = float(jnp.sqrt(sum(
        jnp.sum(g * g) for g in jax.tree.leaves(g_no_mu))))
    print(f'single-step sup: ref loss {float(ref_loss):.4f}  '
          f'our loss {float(our_loss):.4f}  '
          f'rel diff {abs(float(ref_loss) - float(our_loss)) / abs(float(ref_loss)):.2e}')
    print(f'grad global-norm: ref {ref_gnorm:.4f}  ours {our_gnorm:.4f}  '
          f'rel diff {abs(ref_gnorm - our_gnorm) / ref_gnorm:.2e}')
    # per-variable: match by shape+init values is overkill; compare the
    # classifier kernel grad specifically (identifiable by path name)
    for v, g in zip(learner.model.trainable_variables, ref_grads):
        if g is None:
            continue
        if 'kernel' in v.path and tuple(v.shape) == (18, 18) and \
                np.allclose(v.numpy(), params0['classifier']['kernel']):
            d = np.abs(np.asarray(our_grads['classifier']['kernel'])
                       - g.numpy()).max()
            print(f'classifier kernel grad max|Δ| {d:.3e}')

    # ---------------- multi-step trajectory, live optimizers -------------
    sup_step, _ = make_train_steps(model, train_cfg)
    ref_losses, our_losses = [], []
    for step_i in range(args.steps):
        x_u8, y = next(it)
        x = x_u8.astype(np.float32) / 255.0
        key = jax.random.fold_in(jax.random.wrap_key_data(state.rng),
                                 state.step)
        noise = reconstruct_noise(key, True, args.bs, args.k)
        inj.load(noise)
        with tf.GradientTape() as tape:
            rl, _ = learner.sup_loss(tf.constant(x), tf.constant(y))
        tv = learner.model.trainable_variables
        grads = tape.gradient(rl, tv)
        learner.optimiser.apply_gradients(
            [(g, v) for g, v in zip(grads, tv) if g is not None])
        ref_losses.append(float(rl))

        state, m = sup_step(state, jnp.asarray(x_u8), jnp.asarray(y), temp)
        our_losses.append(float(jax.device_get(m['loss'])))
        if step_i % 8 == 0 or step_i == args.steps - 1:
            rd = abs(ref_losses[-1] - our_losses[-1]) / abs(ref_losses[-1])
            print(f'step {step_i:3d}: ref {ref_losses[-1]:9.2f} '
                  f'ours {our_losses[-1]:9.2f} rel {rd:.2e}')
    drift = np.abs(np.array(ref_losses) - np.array(our_losses)) \
        / np.abs(ref_losses)
    print(f'trajectory rel drift: mean {drift.mean():.2e} '
          f'max {drift.max():.2e}')

    if args.epochs_compare:
        epochs_compare(args, learner, model, model_cfg, train_cfg,
                       reader, temp)


def epochs_compare(args, learner, model, model_cfg, train_cfg, reader,
                   temp):
    """Same init, same batch stream, INDEPENDENT live noise: train the
    reference (its real tf.function train_step + Keras Adam) and gltvae
    side by side for N epochs, printing per-epoch val accuracy. Separates
    'systematic learning-speed difference' from 'init/noise luck'."""
    import jax
    import jax.numpy as jnp
    import tensorflow as tf
    from gltvae.train.state import create_train_state
    from gltvae.train.steps import make_train_steps, make_eval_step

    # fresh copies of the SAME init for both sides
    params0 = ref_weights_to_pytree(learner)
    # un-patch the samplers: live noise from here on
    learner.model.sample_normal = type(learner.model).sample_normal \
        .__get__(learner.model)
    learner.model.sample_gating_parameter = \
        type(learner.model).sample_gating_parameter.__get__(learner.model)
    learner.optimiser = tf.keras.optimizers.Adam(1e-4)   # reset moments

    state = create_train_state(model, train_cfg, jax.random.key(7),
                               mu_init=np.asarray(params0['mu']))
    state = state.replace(params=jax.tree.map(jnp.asarray, params0))
    sup_step, _ = make_train_steps(model, train_cfg)
    ev = make_eval_step(model, train_cfg)
    eval_key = jax.random.key(11)

    loaders = reader.setup_data_loaders()
    sup_it = iter(loaders['sup'])
    n_batches = loaders['sup'].epoch_batches
    v_batches = [next(iter_v) for iter_v in [iter(loaders['valid'])]
                 for _ in range(loaders['valid'].epoch_batches)]

    from gltvae.models.ccvae import Temps  # noqa: F401
    for epoch in range(args.epochs_compare):
        for _ in range(n_batches):
            x_u8, y = next(sup_it)
            x32 = tf.constant(x_u8.astype(np.float32) / 255.0)
            yt = tf.constant(y)
            learner.train_step(x32, yt, supervised=True)
            state, _ = sup_step(state, jnp.asarray(x_u8), jnp.asarray(y),
                                temp)
        r_acc = float(np.mean([
            float(learner.classifier_accuracy(
                tf.constant(bx.astype(np.float32) / 255.0),
                tf.constant(by)))
            for bx, by in v_batches]))
        accs = []
        for bx, by in v_batches:
            eval_key, sub = jax.random.split(eval_key)
            accs.append(float(ev(state.params, jnp.asarray(bx),
                                 jnp.asarray(by), sub, temp)))
        print(f'epoch {epoch:02d}: ref val {r_acc:.3f}   '
              f'gltvae val {float(np.mean(accs)):.3f}', flush=True)


if __name__ == '__main__':
    main()
