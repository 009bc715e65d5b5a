"""gltvae — TPU-native Gated Latent-Tree CCVAE framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
jabhinav/Semi-Supervised-Gated-LT-VAE (a TF2 research codebase implementing a
gated characteristic-capturing VAE for semi-supervised attribute learning on
CelebA). This is NOT a port: the compute path is jit-compiled JAX running on
TPU MXUs, data parallelism is expressed over a `jax.sharding.Mesh`, the input
pipeline ships uint8 to the device and finishes preprocessing in a fused
Pallas kernel, and checkpoints are Orbax-managed full train states.

Package layout
--------------
- ``gltvae.ops``       pure-JAX distribution math, samplers, gating init, Pallas kernels
- ``gltvae.models``    Flax networks (encoder/decoder/classifier/cond-prior), CCVAE losses
- ``gltvae.train``     train state, jitted steps, epoch engine, Orbax checkpointing
- ``gltvae.parallel``  device mesh + data-parallel sharding over ICI/DCN
- ``gltvae.data``      CelebA reader, synthetic fixtures, prefetching host pipeline
- ``gltvae.eval``      accuracy/ELBO meters, gating-matrix analysis, latent traversal
- ``gltvae.utils``     reference-.h5 import, logging
"""

from gltvae import config as config
from gltvae.config import ModelConfig, TrainConfig, DataConfig

__version__ = "0.1.0"
