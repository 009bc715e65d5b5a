"""kl_divergence for the Normal/Normal pair the reference uses
(/root/reference/utils.py:108-119)."""

import tensorflow as tf


def kl_divergence(q, p):
    from tensorflow_probability.python.distributions import Normal
    if not (isinstance(q, Normal) and isinstance(p, Normal)):
        raise NotImplementedError('tfp shim: only Normal/Normal KL')
    ratio = q.scale / p.scale
    return (tf.square((q.loc - p.loc) / p.scale)
            + tf.square(ratio) - 1.0 - 2.0 * tf.math.log(ratio)) * 0.5
