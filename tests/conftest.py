"""Test harness: run everything on CPU with 8 virtual XLA devices so the
data-parallel mesh paths (SURVEY.md §4 implication) are exercised without
TPU hardware. Must run before jax is imported anywhere."""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

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
