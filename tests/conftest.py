"""Test configuration: CPU backend with 8 virtual devices, float64.

Tests run on CPU so that (a) multi-device sharding is exercised through a
virtual 8-device mesh and (b) float64 gives tight allclose parity against
the float64 NumPy/SciPy reference. TPU-specific kernels are validated in
interpret mode here and for real by the benchmark harness.
"""

import os

# Must happen before jax is imported anywhere.
os.environ['PALLAS_AXON_POOL_IPS'] = ''   # disable the TPU plugin
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')

import jax  # noqa: E402

jax.config.update('jax_enable_x64', True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope='session')
def rng():
    return np.random.default_rng(42)


def _reference_available():
    return os.path.isdir('/root/reference/pygsp')


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'reference: tests comparing against the live reference '
        'implementation (skipped when /root/reference is absent)')


@pytest.fixture(scope='session')
def pygsp_ref():
    """The reference PyGSP, used as a numerical oracle (never imported into
    the package itself)."""
    if not _reference_available():
        pytest.skip('reference implementation not available')
    import sys
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    import warnings
    warnings.filterwarnings('ignore')
    import pygsp
    return pygsp
