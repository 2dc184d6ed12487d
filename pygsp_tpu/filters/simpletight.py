"""Simple tight frame (reference: ``pygsp/filters/simpletight.py:41-97``)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pygsp_tpu.filters.filter import Filter


def _stf_kernel(x, kind):
    """'sf' supported on [0, 1/2]; 'wavelet' on [1/4, 1]."""
    x = jnp.asarray(x)
    l1, l2, l3 = 0.25, 0.5, 1.0

    def h(v):
        return jnp.sin(jnp.pi * v / 2.0) ** 2

    r1 = x < l1
    r2 = (x >= l1) & (x < l2)
    r3 = (x >= l2) & (x < l3)
    if kind == 'sf':
        out = jnp.where(r1, 1.0, 0.0)
        out = jnp.where(r2, jnp.sqrt(jnp.clip(1 - h(4 * x - 1) ** 2, 0.0)), out)
        return out
    elif kind == 'wavelet':
        out = jnp.where(r2, h(4 * (x - 0.25)), 0.0)
        out = jnp.where(r3, jnp.sqrt(jnp.clip(1 - h(2 * x - 1) ** 2, 0.0)), out)
        return out
    raise ValueError(f'Unknown kernel type {kind}')


class SimpleTight(Filter):
    r"""sin²/cos² tight pair at dyadic scales ``1/(2·lmax)·2^i``.

    Examples
    --------
    >>> import numpy as np
    >>> from pygsp_tpu import graphs, filters
    >>> G = graphs.Sensor(64, seed=42)
    >>> G.estimate_lmax()
    >>> g = filters.SimpleTight(G, Nf=4)
    >>> g.Nf
    4
    >>> lam = np.linspace(0, float(G.lmax), 5)
    >>> v = (np.asarray(g.evaluate(lam)) ** 2).sum(axis=0)
    >>> print(round(float(v.max() / v.min()), 2))   # tight: constant frame
    1.0

    """

    def __init__(self, G, Nf=6, scales=None):
        if scales is None or (np.ndim(scales) == 0 and not scales):
            scales = 1.0 / (2.0 * G.lmax) * np.power(2, np.arange(Nf - 2, -1, -1))
        self.scales = np.asarray(scales)
        if len(self.scales) != Nf - 1:
            raise ValueError('len(scales) should be Nf-1.')

        kernels = [lambda x: _stf_kernel(self.scales[0] * x, 'sf')]
        for i in range(Nf - 1):
            kernels.append(lambda x, i=i: _stf_kernel(self.scales[i] * x, 'wavelet'))
        super().__init__(G, kernels)
