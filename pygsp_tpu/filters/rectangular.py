"""Ideal band indicator filter (reference: ``pygsp/filters/rectangular.py:54-83``)."""

from __future__ import annotations

import jax.numpy as jnp

from pygsp_tpu.filters.filter import Filter


class Rectangular(Filter):
    r"""Indicator of ``band_min ≤ x/lmax ≤ band_max``.

    Examples
    --------
    >>> import numpy as np
    >>> from pygsp_tpu import graphs, filters
    >>> G = graphs.Sensor(64, seed=42)
    >>> G.estimate_lmax()
    >>> g = filters.Rectangular(G, band_max=0.3)
    >>> lam = np.array([0.1 * float(G.lmax), 0.9 * float(G.lmax)])
    >>> print(np.asarray(g.evaluate(lam)))   # exact indicator of the band
    [[1. 0.]]

    """

    def __init__(self, G, band_min=None, band_max=0.2):
        self.band_min = band_min
        self.band_max = band_max

        def kernel_lowpass(x):
            return (x / G.lmax <= band_max).astype(jnp.result_type(x, 1.0))

        def kernel_highpass(x):
            return (x / G.lmax >= band_min).astype(jnp.result_type(x, 1.0))

        if band_min is None and band_max is None:
            kernel = lambda x: jnp.ones_like(x)
        elif band_min is None:
            kernel = kernel_lowpass
        elif band_max is None:
            kernel = kernel_highpass
        else:
            kernel = lambda x: kernel_lowpass(x) * kernel_highpass(x)
        super().__init__(G, kernel)

    def _get_extra_repr(self):
        attrs = dict()
        if self.band_min is not None:
            attrs.update(band_min=f'{self.band_min:.2f}')
        if self.band_max is not None:
            attrs.update(band_max=f'{self.band_max:.2f}')
        return attrs
