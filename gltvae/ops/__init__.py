from gltvae.ops.distributions import (
    gaussian_kl,
    laplace_log_prob,
    img_log_likelihood,
    bernoulli_log_prob,
    bernoulli_log_prob_probs,
    bernoulli_sample,
)
from gltvae.ops.sampling import (
    sample_gumbel,
    sample_normal,
    sample_gating,
    sample_gating_deterministic,
)
from gltvae.ops.gating import (
    cooccurrence_gating_matrix,
    gating_matrix_from_labels,
    identity_gating_matrix,
    uniform_gating_matrix,
)
