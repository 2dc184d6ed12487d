"""Mexican-hat wavelet bank (reference: ``pygsp/filters/mexicanhat.py:55-84``)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pygsp_tpu import utils
from pygsp_tpu.filters.filter import Filter


class MexicanHat(Filter):
    r"""Band-pass ``x·e^{-x}`` at log scales plus low-pass ``e^{-x⁴}``.

    Examples
    --------
    >>> import numpy as np
    >>> from pygsp_tpu import graphs, filters
    >>> G = graphs.Sensor(64, seed=42)
    >>> G.estimate_lmax()
    >>> g = filters.MexicanHat(G, Nf=5)
    >>> g.Nf
    5
    >>> y = np.asarray(g.evaluate(np.linspace(0, float(G.lmax), 8)))
    >>> y.shape                     # one row per wavelet scale
    (5, 8)
    >>> bool(np.isfinite(y).all())
    True
    >>> s = np.zeros(G.N); s[11] = 1.0
    >>> g.filter(s, order=30).shape
    (64, 5)

    """

    def __init__(self, G, Nf=6, lpfactor=20, scales=None, normalize=False):
        self.lpfactor = lpfactor
        self.normalize = normalize

        lmin = G.lmax / lpfactor
        if scales is None:
            scales = utils.compute_log_scales(lmin, G.lmax, Nf - 1)
        self.scales = np.asarray(scales)
        if len(self.scales) != Nf - 1:
            raise ValueError('len(scales) should be Nf-1.')

        def band_pass(x):
            return x * jnp.exp(-x)

        def low_pass(x):
            return jnp.exp(-(x ** 4))

        kernels = [lambda x: 1.2 * np.exp(-1) * low_pass(x / 0.4 / lmin)]
        for i in range(Nf - 1):
            def kernel(x, i=i):
                norm = np.sqrt(self.scales[i]) if normalize else 1.0
                return norm * band_pass(self.scales[i] * x)
            kernels.append(kernel)
        super().__init__(G, kernels)

    def _get_extra_repr(self):
        return dict(lpfactor=f'{self.lpfactor:.2f}', normalize=self.normalize)
