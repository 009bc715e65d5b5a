"""Test harness: run everything on CPU with 8 virtual XLA devices so the
data-parallel mesh paths (SURVEY.md §4 implication) are exercised without
TPU hardware. Must run before jax is imported anywhere."""

import os

# Force CPU (this machine imports jax at interpreter startup with
# JAX_PLATFORMS=axon baked in, which would silently route "unit" tests
# through the real TPU tunnel — slow, and TPU default matmul precision
# breaks f32 golden comparisons). Env vars are snapshotted before conftest
# runs, so use jax.config.update; XLA_FLAGS is still read lazily at CPU
# backend init.
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
assert jax.default_backend() == 'cpu'
assert len(jax.devices()) == 8, 'virtual 8-device CPU platform required'

import numpy as np
import pytest


@pytest.fixture(scope='session')
def rng():
    return np.random.RandomState(42)


@pytest.fixture(scope='session')
def ref_param_dir():
    """Reference learnable sup=1.0 checkpoint (golden fixture), if present."""
    path = '/root/reference/models/params_1.0_learnable'
    if not os.path.isdir(path):
        pytest.skip('reference checkpoints not available')
    return path


def has_tf():
    try:
        import tensorflow  # noqa: F401
        return True
    except ImportError:
        return False


requires_tf = pytest.mark.skipif(not has_tf(), reason='tensorflow oracle unavailable')
