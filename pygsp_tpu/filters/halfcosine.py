"""Half-cosine tight frame (reference: ``pygsp/filters/halfcosine.py:32-48``)."""

from __future__ import annotations

import jax.numpy as jnp

from pygsp_tpu.filters.filter import Filter


class HalfCosine(Filter):
    r"""Shifted raised-cosine translates (tight frame).

    Examples
    --------
    >>> import numpy as np
    >>> from pygsp_tpu import graphs, filters
    >>> G = graphs.Sensor(64, seed=42)
    >>> G.estimate_lmax()
    >>> g = filters.HalfCosine(G, Nf=5)
    >>> g.Nf
    5
    >>> lam = np.linspace(0, float(G.lmax), 5)
    >>> v = (np.asarray(g.evaluate(lam)) ** 2).sum(axis=0)
    >>> print(round(float(v.max() / v.min()), 2))   # tight: constant frame
    1.0

    """

    def __init__(self, G, Nf=6):
        if Nf <= 2:
            raise ValueError('The number of filters must be greater than 2.')
        dila_fact = G.lmax * 3 / (Nf - 2)

        def window(x):
            y = 0.5 + 0.5 * jnp.cos(2 * jnp.pi * (x / dila_fact - 0.5))
            return y * (x >= 0) * (x <= dila_fact)

        kernels = [lambda x, i=i: window(x - dila_fact / 3 * (i - 2))
                   for i in range(Nf)]
        super().__init__(G, kernels)
