"""Meyer wavelet/scaling bank (reference: ``pygsp/filters/meyer.py:41-89``)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pygsp_tpu.filters.filter import Filter


def _nu(x):
    return x ** 4 * (35 - 84 * x + 70 * x ** 2 - 20 * x ** 3)


def _meyer_kernel(x, kind):
    """Meyer windows: scaling on [0, 4/3], wavelet on [2/3, 8/3]."""
    x = jnp.abs(jnp.asarray(x))
    l1, l2, l3 = 2 / 3.0, 4 / 3.0, 8 / 3.0
    r1 = x < l1
    r2 = (x >= l1) & (x < l2)
    r3 = (x >= l2) & (x < l3)
    if kind == 'scaling_function':
        out = jnp.where(r1, 1.0, 0.0)
        out = jnp.where(r2, jnp.cos((jnp.pi / 2) * _nu(x / l1 - 1)), out)
        return out
    elif kind == 'wavelet':
        out = jnp.where(r2, jnp.sin((jnp.pi / 2) * _nu(x / l1 - 1)), 0.0)
        out = jnp.where(r3, jnp.cos((jnp.pi / 2) * _nu(x / l2 - 1)), out)
        return out
    raise ValueError(f'Unknown kernel type {kind}')


class Meyer(Filter):
    r"""Tight Meyer frame at dyadic scales ``(4/(3·lmax))·2^i``.

    Examples
    --------
    >>> import numpy as np
    >>> from pygsp_tpu import graphs, filters
    >>> G = graphs.Sensor(64, seed=42)
    >>> G.estimate_lmax()
    >>> g = filters.Meyer(G, Nf=4)
    >>> g.Nf
    4
    >>> lam = np.linspace(0, float(G.lmax), 5)
    >>> v = (np.asarray(g.evaluate(lam)) ** 2).sum(axis=0)
    >>> print(round(float(v.max() / v.min()), 2))   # tight: constant frame
    1.0
    >>> s = np.zeros(G.N); s[5] = 1.0
    >>> g.filter(s, order=30).shape
    (64, 4)

    """

    def __init__(self, G, Nf=6, scales=None):
        if scales is None:
            scales = (4.0 / (3 * G.lmax)) * np.power(2.0, np.arange(Nf - 2, -1, -1))
        self.scales = np.asarray(scales)
        if len(self.scales) != Nf - 1:
            raise ValueError('len(scales) should be Nf-1.')

        kernels = [lambda x: _meyer_kernel(self.scales[0] * x, 'scaling_function')]
        for i in range(Nf - 1):
            kernels.append(lambda x, i=i: _meyer_kernel(self.scales[i] * x, 'wavelet'))
        super().__init__(G, kernels)
