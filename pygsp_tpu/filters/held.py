"""Held QMF pair (reference: ``pygsp/filters/held.py:46-65``)."""

from __future__ import annotations

import jax.numpy as jnp

from pygsp_tpu.filters.filter import Filter


class Held(Filter):
    r"""Low/high pair: 1 on [0, a), sine-of-cubic transition on [a, 2a).

    Examples
    --------
    >>> import numpy as np
    >>> from pygsp_tpu import graphs, filters
    >>> G = graphs.Sensor(64, seed=42)
    >>> G.estimate_lmax()
    >>> g = filters.Held(G)
    >>> g.Nf                             # low-pass + exact complement
    2
    >>> lam = np.linspace(0, float(G.lmax), 5)
    >>> v = (np.asarray(g.evaluate(lam)) ** 2).sum(axis=0)
    >>> print(np.round(v, 2))            # exact quadrature-mirror pair
    [1. 1. 1. 1. 1.]

    """

    def __init__(self, G, a=2.0 / 3):
        self.a = a

        def kernel(x):
            x = x * 2 / G.lmax
            mu = lambda t: -1 + 24 * t - 144 * t ** 2 + 256 * t ** 3
            trans = jnp.sin(2 * jnp.pi * mu(x / (8 * a)))
            out = jnp.where((x >= 0) & (x < a), 1.0, 0.0)
            out = jnp.where((x >= a) & (x < 2 * a), trans, out)
            return out

        low = Filter(G, kernel)
        complement = low.complement(frame_bound=1)
        super().__init__(G, low._kernels + complement._kernels)

    def _get_extra_repr(self):
        return dict(a=f'{self.a:.2f}')
