"""Heat (low-pass exponential) kernel filter bank."""

from __future__ import annotations

import jax.numpy as jnp

from pygsp_tpu.filters.filter import Filter


class Heat(Filter):
    r"""Heat diffusion kernel: ``g(x) = min(exp(-scale·x/lmax), 1)``.

    Semantics match the reference ``filters.Heat``
    (``pygsp/filters/heat.py:102-119``): one kernel per scale, default
    scale 10, optional L2 normalization by ``‖g(G.e)‖`` (requires the
    Fourier basis).

    Examples
    --------
    >>> import numpy as np
    >>> from pygsp_tpu import graphs, filters
    >>> G = graphs.Sensor(64, seed=42)
    >>> G.estimate_lmax()
    >>> g = filters.Heat(G, scale=[10, 100])
    >>> g.Nf
    2
    >>> print(np.round(np.asarray(g.evaluate(np.array([0.0]))), 2))
    [[1.]
     [1.]]
    >>> s = np.zeros(G.N); s[7] = 1.0
    >>> out = g.filter(s, order=30)
    >>> out.shape
    (64, 2)
    >>> print(np.round(np.asarray(out.sum(axis=0)), 2))  # diffusion conserves mass
    [1. 1.]

    """

    def __init__(self, G, scale=10, normalize: bool = False):
        try:
            iter(scale)
        except TypeError:
            scale = [scale]
        self.scale = list(scale)
        self.normalize = normalize

        # G.lmax is read at evaluation time (not captured) so the kernels
        # track lmax refinements, exactly like the reference's closures.
        def base(x, s):
            return jnp.minimum(jnp.exp(-s * x / G.lmax), 1.0)

        kernels = []
        for s in self.scale:
            norm = float(jnp.linalg.norm(base(G.e, s))) if normalize else 1.0
            kernels.append(lambda x, s=s, norm=norm: base(x, s) / norm)
        super().__init__(G, kernels)

    def _get_extra_repr(self):
        scale = '[' + ', '.join(f'{s:.2f}' for s in self.scale) + ']'
        return dict(scale=scale, normalize=self.normalize)
