"""Graph core and model zoo (API parity with ``pygsp.graphs``)."""

from pygsp_tpu.graphs.graph import Graph

__all__ = ['Graph']


_LAZY = {
    'Airfoil': 'airfoil', 'BarabasiAlbert': 'barabasialbert',
    'Comet': 'comet', 'Community': 'community',
    'DavidSensorNet': 'davidsensornet', 'ErdosRenyi': 'erdosrenyi',
    'FullConnected': 'fullconnected', 'Grid2d': 'grid2d',
    'LineGraph': 'linegraph', 'Logo': 'logo',
    'LowStretchTree': 'lowstretchtree', 'Minnesota': 'minnesota',
    'Path': 'path', 'RandomRegular': 'randomregular',
    'RandomRing': 'randomring', 'Ring': 'ring',
    'StochasticBlockModel': 'stochasticblockmodel', 'Star': 'star',
    'SwissRoll': 'swissroll', 'Torus': 'torus',
    # nearest-neighbor graphs
    'NNGraph': 'nngraphs.nngraph', 'Bunny': 'nngraphs.bunny',
    'Cube': 'nngraphs.cube', 'Grid2dImgPatches': 'nngraphs.grid2dimgpatches',
    'ImgPatches': 'nngraphs.imgpatches', 'Sensor': 'nngraphs.sensor',
    'Sphere': 'nngraphs.sphere', 'TwoMoons': 'nngraphs.twomoons',
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        mod = importlib.import_module(f'pygsp_tpu.graphs.{_LAZY[name]}')
        cls = getattr(mod, name)
        globals()[name] = cls
        return cls
    # submodule access (e.g. ``pygsp_tpu.graphs.heat``): import on demand so
    # reference-style ``from pygsp_tpu.graphs.x import Y`` habits keep working
    import importlib
    try:
        mod = importlib.import_module(f'pygsp_tpu.graphs.{name}')
        globals()[name] = mod
        return mod
    except ImportError:
        pass
    raise AttributeError(f"module 'pygsp_tpu.graphs' has no attribute {name!r}")


def __dir__():
    """Expose the lazy zoo to dir()/tab-completion (the reference exports
    everything eagerly, ``graphs/__init__.py:187-215``)."""
    return sorted(set(globals()) | set(_LAZY) | {'Graph'})
