"""Modulation (windowed GFT) filter bank
(reference: ``pygsp/filters/modulation.py:126-177``). Exact-only."""

from __future__ import annotations

import jax.numpy as jnp

from pygsp_tpu.filters.filter import Filter


class Modulation(Filter):
    r"""Kernel modulated by each eigenvector — the vertex-frequency
    (windowed-GFT) analysis operator. ``evaluate`` is only defined at the
    graph eigenvalues, as in the reference.

    Examples
    --------
    >>> import numpy as np
    >>> from pygsp_tpu import graphs, filters
    >>> G = graphs.Ring(16)
    >>> G.compute_fourier_basis()
    >>> mother = filters.Heat(G, scale=20)
    >>> g = filters.Modulation(G, mother)
    >>> g.Nf == G.N              # one modulated kernel per vertex frequency
    True
    >>> s = np.zeros(G.N); s[2] = 1.0
    >>> g.filter(s, method='exact').shape
    (16, 16)

    """

    def __init__(self, graph, kernel, modulation_first: bool = False):
        self.G = graph
        self._kernels = kernel
        self._modulation_first = modulation_first

        if kernel.n_filters != 1:
            raise ValueError(f'A kernel must be one filter. The passed '
                             f'filter bank {kernel} has {kernel.n_filters}.')
        if kernel.G is not graph:
            raise ValueError('The graph passed to this filter bank must '
                             'be the one used to build the mother kernel.')

        self.n_features_in, self.n_features_out = (1, graph.n_vertices)
        self.shape = (self.n_features_out, self.n_features_in)
        self.n_filters = self.n_features_in * self.n_features_out
        self.Nf = self.n_filters

    def _coefficients_matrix(self):
        if not hasattr(self, '_coefficients'):
            G = self.G
            c = G.igft(self._kernels.evaluate(G.e).squeeze())
            c = jnp.sqrt(G.n_vertices) * G.U * c[:, None]
            self._coefficients = G.gft(c)
        return self._coefficients

    def evaluate(self, x):
        """Responses at graph frequencies only: NaN off-spectrum, matching
        the reference's eigenvalue-lookup semantics (modulation.py:146-162)
        but vectorized (one equality matmul instead of a python loop)."""
        coeff = self._coefficients_matrix()          # (N_out, N_e)
        x = jnp.asarray(x)
        flat = x.reshape(-1)
        match = flat[:, None] == self.G.e[None, :]   # (len(x), N_e)
        any_match = jnp.any(match, axis=1)
        idx = jnp.argmax(match, axis=1)
        y = jnp.where(any_match[None, :], coeff[:, idx], jnp.nan)
        return y.reshape((self.n_features_out,) + x.shape)

    def filter(self, s, method='exact', order=None):
        if self._modulation_first:
            return super().filter(s, method='exact')
        # localization-then-modulation: y[i] = √N · GFT(s ⊙ localize(i));
        # vectorized as one N×N batch instead of the reference's loop.
        G = self.G
        s = jnp.asarray(G._check_signal(s))
        # localize all vertices at once: loc[i, :] = √N (g(L) δ_i)
        ker = self._kernels.evaluate(G.e)[0]                    # (N_e,)
        gL = G.U @ (ker[:, None] * G.U.T)                       # g(L), (N, N)
        loc = jnp.sqrt(G.n_vertices) * gL.T                     # loc[i] = g(L)δ_i
        prod = s[None, :] * loc                                 # (N, N)
        return prod @ jnp.conj(G.U) * jnp.sqrt(G.n_vertices)
