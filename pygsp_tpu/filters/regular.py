"""Regular QMF pair (reference: ``pygsp/filters/regular.py:50-60``)."""

from __future__ import annotations

import jax.numpy as jnp

from pygsp_tpu.filters.filter import Filter


class Regular(Filter):
    r"""Low/high pair with ``g_l² + g_h² = 1`` via iterated sine flattening.

    Examples
    --------
    >>> import numpy as np
    >>> from pygsp_tpu import graphs, filters
    >>> G = graphs.Sensor(64, seed=42)
    >>> G.estimate_lmax()
    >>> g = filters.Regular(G, degree=2)
    >>> g.Nf
    2
    >>> lam = np.linspace(0, float(G.lmax), 5)
    >>> v = (np.asarray(g.evaluate(lam)) ** 2).sum(axis=0)
    >>> print(np.round(v, 2))            # exact quadrature-mirror pair
    [1. 1. 1. 1. 1.]

    """

    def __init__(self, G, degree=3):
        self.degree = degree

        def kernel(x):
            x = x * 2 / G.lmax
            if degree == 0:
                return jnp.sin(jnp.pi / 4 * x)
            output = jnp.sin(jnp.pi * (x - 1) / 2)
            for _ in range(2, degree):
                output = jnp.sin(jnp.pi * output / 2)
            return jnp.sin(jnp.pi / 4 * (1 + output))

        low = Filter(G, kernel)
        complement = low.complement(frame_bound=1)
        super().__init__(G, low._kernels + complement._kernels)

    def _get_extra_repr(self):
        return dict(degree=self.degree)
