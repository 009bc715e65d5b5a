"""Minimal tensorflow_probability shim (distributions only).

This image ships TF 2.21 but NOT tensorflow_probability, which the
reference codebase imports (/root/reference/gated_ccvae.py:15,
/root/reference/utils.py:5-6). The head-to-head parity harness
(tools/parity_head2head.py) runs the reference UNMODIFIED by prepending
this package to sys.path when the real TFP is absent.

Only the four symbols the reference actually touches are provided —
Normal, Laplace, Bernoulli (log_prob/sample) and kl_divergence(Normal,
Normal) — each implementing the exact TFP math (verified against scipy
oracles in tests/test_tfp_shim.py). Categorical is imported by the
reference but never called; it is a stub.
"""

from tensorflow_probability.python import distributions  # noqa: F401

__version__ = '0.0-gltvae-shim'
