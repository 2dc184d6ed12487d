"""Half-cosine tight frame (reference: ``pygsp/filters/halfcosine.py:32-48``)."""

from __future__ import annotations

import jax.numpy as jnp

from pygsp_tpu.filters.filter import Filter


class HalfCosine(Filter):
    r"""Shifted raised-cosine translates (tight frame)."""

    def __init__(self, G, Nf=6):
        if Nf <= 2:
            raise ValueError('The number of filters must be greater than 2.')
        dila_fact = G.lmax * 3 / (Nf - 2)

        def window(x):
            y = 0.5 + 0.5 * jnp.cos(2 * jnp.pi * (x / dila_fact - 0.5))
            return y * (x >= 0) * (x <= dila_fact)

        kernels = [lambda x, i=i: window(x - dila_fact / 3 * (i - 2))
                   for i in range(Nf)]
        super().__init__(G, kernels)
