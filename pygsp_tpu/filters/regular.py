"""Regular QMF pair (reference: ``pygsp/filters/regular.py:50-60``)."""

from __future__ import annotations

import jax.numpy as jnp

from pygsp_tpu.filters.filter import Filter


class Regular(Filter):
    r"""Low/high pair with ``g_l² + g_h² = 1`` via iterated sine flattening."""

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
