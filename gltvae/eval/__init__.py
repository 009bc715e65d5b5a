from gltvae.eval.traversal import latent_traversal, make_traversal_fn
from gltvae.eval.analysis import gating_threshold_analysis, off_diagonal_gates
