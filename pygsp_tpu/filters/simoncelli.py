"""Simoncelli QMF pair (reference: ``pygsp/filters/simoncelli.py:42-58``)."""

from __future__ import annotations

import jax.numpy as jnp

from pygsp_tpu.filters.filter import Filter


class Simoncelli(Filter):
    r"""Low/high pair: 1 on [0, a), ``cos(π/2·log₂(x/a))`` on [a, 2a).

    Examples
    --------
    >>> import numpy as np
    >>> from pygsp_tpu import graphs, filters
    >>> G = graphs.Sensor(64, seed=42)
    >>> G.estimate_lmax()
    >>> g = filters.Simoncelli(G)
    >>> g.Nf
    2
    >>> lam = np.linspace(0, float(G.lmax), 5)
    >>> v = (np.asarray(g.evaluate(lam)) ** 2).sum(axis=0)
    >>> print(np.round(v, 2))            # exact quadrature-mirror pair
    [1. 1. 1. 1. 1.]

    """

    def __init__(self, G, a=2 / 3):
        self.a = a

        def kernel(x):
            x = x * 2 / G.lmax
            safe = jnp.maximum(x, jnp.finfo(jnp.result_type(x, 1.0)).tiny)
            trans = jnp.cos(jnp.pi / 2 * jnp.log(safe / a) / jnp.log(2.0))
            out = jnp.where((x >= 0) & (x < a), 1.0, 0.0)
            out = jnp.where((x >= a) & (x < 2 * a), trans, out)
            return out

        low = Filter(G, kernel)
        complement = low.complement(frame_bound=1)
        super().__init__(G, low._kernels + complement._kernels)

    def _get_extra_repr(self):
        return dict(a=f'{self.a:.2f}')
