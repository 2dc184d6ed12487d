"""pygsp_tpu — TPU-native spectral graph signal processing.

A from-scratch JAX/XLA/Pallas framework covering the capability surface of
PyGSP (graph construction, Laplacians, spectral filtering via Chebyshev /
Lanczos recurrences, exact Fourier filtering, graph reduction pyramids,
semi-supervised learning), redesigned TPU-first:

- graphs are immutable pytrees of padded edge arrays (static shapes, jit-able),
- the hot path is a fused SpMM inside a ``lax.scan`` Chebyshev recurrence,
- scale-out is edge partitioning over a ``jax.sharding.Mesh`` with
  halo/boundary exchange compiled to XLA collectives,
- all dense math rides the MXU; sparse aggregation uses segment-sum /
  Pallas gather kernels.

The public API mirrors the reference PyGSP (``/root/reference/pygsp``) so
users can switch: ``pygsp_tpu.graphs``, ``pygsp_tpu.filters``,
``pygsp_tpu.reduction``, ``pygsp_tpu.learning``, ``pygsp_tpu.features``,
``pygsp_tpu.optimization``, ``pygsp_tpu.utils``, ``pygsp_tpu.plotting``.
"""

from pygsp_tpu import core
from pygsp_tpu import ops
from pygsp_tpu import graphs
from pygsp_tpu import filters
from pygsp_tpu import utils

__version__ = '0.1.0'

__all__ = [
    'core',
    'ops',
    'graphs',
    'filters',
    'utils',
    'reduction',
    'learning',
    'features',
    'optimization',
    'plotting',
    'parallel',
]


def __getattr__(name):
    # Lazy imports for heavier / optional-dependency modules (plotting pulls
    # matplotlib; algorithm modules pull the filter stack).
    if name in ('reduction', 'learning', 'features', 'optimization',
                'plotting', 'parallel'):
        import importlib
        module = importlib.import_module(f'pygsp_tpu.{name}')
        globals()[name] = module
        return module
    raise AttributeError(f"module 'pygsp_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(__all__))
