"""Itersine tight frame (reference: ``pygsp/filters/itersine.py:37-57``)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pygsp_tpu.filters.filter import Filter


class Itersine(Filter):
    r"""Tight frame of ``sin(½π·cos²(πx))`` translates with overlap 2.

    Examples
    --------
    >>> import numpy as np
    >>> from pygsp_tpu import graphs, filters
    >>> G = graphs.Sensor(64, seed=42)
    >>> G.estimate_lmax()
    >>> g = filters.Itersine(G, Nf=5)
    >>> g.Nf
    5
    >>> lam = np.linspace(0, float(G.lmax), 5)
    >>> v = (np.asarray(g.evaluate(lam)) ** 2).sum(axis=0)
    >>> print(round(float(v.max() / v.min()), 2))   # tight: constant frame
    1.0

    """

    def __init__(self, G, Nf=6, overlap=2):
        self.overlap = overlap
        self.mu = np.linspace(0, G.lmax, num=Nf)
        scales = G.lmax / (Nf - overlap + 1) * overlap

        def window(x):
            y = jnp.sin(0.5 * jnp.pi * jnp.cos(x * jnp.pi) ** 2)
            return y * ((x >= -0.5) & (x <= 0.5))

        kernels = []
        for i in range(1, Nf + 1):
            def kernel(x, i=i):
                y = window(x / scales - (i - overlap / 2) / overlap)
                return y * np.sqrt(2 / overlap)
            kernels.append(kernel)
        super().__init__(G, kernels)

    def _get_extra_repr(self):
        return dict(overlap=f'{self.overlap:.2f}')
