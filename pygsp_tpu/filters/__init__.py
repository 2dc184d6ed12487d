"""Spectral filter banks (API parity with ``pygsp.filters``)."""

from pygsp_tpu.filters.filter import Filter
from pygsp_tpu.filters.heat import Heat

__all__ = ['Filter', 'Heat']


_LAZY = {
    'Abspline': 'abspline', 'Expwin': 'expwin', 'Gabor': 'gabor',
    'HalfCosine': 'halfcosine', 'Held': 'held', 'Itersine': 'itersine',
    'MexicanHat': 'mexicanhat', 'Meyer': 'meyer', 'Modulation': 'modulation',
    'Papadakis': 'papadakis', 'Rectangular': 'rectangular',
    'Regular': 'regular', 'Simoncelli': 'simoncelli',
    'SimpleTight': 'simpletight', 'Wave': 'wave',
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        mod = importlib.import_module(f'pygsp_tpu.filters.{_LAZY[name]}')
        cls = getattr(mod, name)
        globals()[name] = cls
        return cls
    if name in ('compute_cheby_coeff', 'compute_jackson_cheby_coeff',
                'cheby_op', 'cheby_rect', 'lanczos', 'lanczos_op'):
        from pygsp_tpu.filters import approximations
        fn = getattr(approximations, name)
        globals()[name] = fn
        return fn
    # submodule access (e.g. ``pygsp_tpu.filters.heat``): import on demand so
    # reference-style ``from pygsp_tpu.filters.x import Y`` habits keep working
    import importlib
    try:
        mod = importlib.import_module(f'pygsp_tpu.filters.{name}')
        globals()[name] = mod
        return mod
    except ImportError:
        pass
    raise AttributeError(f"module 'pygsp_tpu.filters' has no attribute {name!r}")


_APPROX_NAMES = ('compute_cheby_coeff', 'compute_jackson_cheby_coeff',
                 'cheby_op', 'cheby_rect', 'lanczos', 'lanczos_op')


def __dir__():
    """Expose the lazy zoo to dir()/tab-completion (the reference exports
    everything eagerly, ``filters/__init__.py:114-136``)."""
    return sorted(set(globals()) | set(_LAZY) | set(_APPROX_NAMES))
