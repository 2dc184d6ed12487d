"""Abspline cubic-spline wavelet bank (reference: ``pygsp/filters/abspline.py:42-107``)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy import optimize

from pygsp_tpu import utils
from pygsp_tpu.filters.filter import Filter


def _abspline3(x, alpha, beta, t1, t2):
    """Cubic spline joining x^alpha rise (x≤t1) and x^-beta decay (x≥t2).

    The 4×4 system for the spline coefficients is solved host-side once
    (NumPy); kernel evaluation is jnp.
    """
    M = np.array([[1, t1, t1 ** 2, t1 ** 3],
                  [1, t2, t2 ** 2, t2 ** 3],
                  [0, 1, 2 * t1, 3 * t1 ** 2],
                  [0, 1, 2 * t2, 3 * t2 ** 2]], dtype=float)
    v = np.array([1, 1,
                  t1 ** (-alpha) * alpha * t1 ** (alpha - 1),
                  -beta * t2 ** (-beta - 1) * t2 ** beta], dtype=float)
    a = np.linalg.solve(M, v)

    x = jnp.asarray(x)
    xs = jnp.maximum(x, jnp.finfo(jnp.result_type(x, 1.0)).tiny)  # avoid 0^-beta
    r1 = x <= t1
    r3 = x >= t2
    spline = a[0] + a[1] * x + a[2] * x ** 2 + a[3] * x ** 3
    out = jnp.where(r1, xs ** alpha * t1 ** (-alpha), spline)
    out = jnp.where(r3, xs ** (-beta) * t2 ** beta, out)
    return out


class Abspline(Filter):
    r"""Spline band wavelets at log scales + tuned exp low-pass.

    Examples
    --------
    >>> import numpy as np
    >>> from pygsp_tpu import graphs, filters
    >>> G = graphs.Sensor(64, seed=42)
    >>> G.estimate_lmax()
    >>> g = filters.Abspline(G, Nf=4)
    >>> g.Nf
    4
    >>> y = np.asarray(g.evaluate(np.linspace(0, float(G.lmax), 6)))
    >>> y.shape
    (4, 6)
    >>> s = np.zeros(G.N); s[9] = 1.0
    >>> g.filter(s, order=30).shape
    (64, 4)

    """

    def __init__(self, G, Nf=6, lpfactor=20, scales=None):
        self.lpfactor = lpfactor
        lmin = G.lmax / lpfactor
        if scales is None:
            scales = utils.compute_log_scales(lmin, G.lmax, Nf - 1)
        self.scales = np.asarray(scales)

        def gb(x):
            return _abspline3(x, 2, 2, 1, 2)

        def gl(x):
            return jnp.exp(-(x ** 4))

        # peak of the band kernel sets the low-pass gain (reference
        # uses a bounded scalar minimization of -gb).
        xstar = optimize.minimize_scalar(
            lambda x: -float(_abspline3(np.array(x), 2, 2, 1, 2)),
            bounds=(1, 2), method='bounded')
        gamma_l = float(_abspline3(np.array(xstar.x), 2, 2, 1, 2))
        lminfac = 0.6 * lmin

        kernels = [lambda x: gamma_l * gl(x / lminfac)]
        for i in range(Nf - 1):
            kernels.append(lambda x, i=i: gb(self.scales[i] * x))
        super().__init__(G, kernels)

    def _get_extra_repr(self):
        return dict(lpfactor=f'{self.lpfactor:.2f}')
