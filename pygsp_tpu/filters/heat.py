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
