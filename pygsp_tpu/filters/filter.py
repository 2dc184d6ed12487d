"""Filter banks over graph spectra.

The user-facing class mirrors the reference ``Filter``
(``pygsp/filters/filter.py:56-760``): a bank is a list of scalar kernels
λ → g(λ) attached to a graph, with ``evaluate / filter / analyze /
synthesize / localize / estimate_frame_bounds / compute_frame / complement /
inverse``. The compute paths differ fundamentally:

- ``method='chebyshev'`` dispatches to the jit-compiled ``lax.scan``
  recurrence in :mod:`pygsp_tpu.ops.chebyshev` (K SpMMs shared by the bank);
- ``method='exact'`` runs the dense Fourier path on device;
- ``method='lanczos'`` works (the reference's is dead code —
  ``approximations.py:247``, ``filter.py:324-325``).

Signal convention is the reference's rank-3 ``(N_NODES, N_SIGNALS,
N_FEATURES)`` with the same squeeze/expand ergonomics
(``filter.py:146-328``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pygsp_tpu import utils
from pygsp_tpu.ops import chebyshev as cheby
from pygsp_tpu.ops import lanczos as lanczos_mod

_logger = utils.build_logger(__name__)




class Filter:
    """A filter bank: list of spectral kernels attached to a graph.

    Examples
    --------
    >>> import numpy as np
    >>> from pygsp_tpu import graphs, filters
    >>> G = graphs.Sensor(64, seed=42)
    >>> G.estimate_lmax()
    >>> g = filters.Filter(G, lambda x: 1.0 / (1.0 + x))  # custom kernel
    >>> g.Nf
    1
    >>> s = np.zeros(G.N); s[13] = 1.0
    >>> g.filter(s, order=30).shape
    (64,)
    >>> gb = g + filters.Heat(G, scale=5)     # bank concatenation
    >>> gb.Nf
    2
    >>> gb[1].Nf                              # indexing into the bank
    1

    """

    def __init__(self, G, kernels):
        self.G = G
        try:
            iter(kernels)
        except TypeError:
            kernels = [kernels]
        self._kernels = list(kernels)

        self.n_features_in, self.n_features_out = (1, len(self._kernels))
        self.shape = (self.n_features_out, self.n_features_in)
        self.n_filters = self.n_features_in * self.n_features_out
        self.Nf = self.n_filters
        # jitted end-to-end filtering programs, keyed by
        # (mode, order, lmax): ONE device dispatch per filter() call
        # (coefficient quadrature included in the traced program).
        self._jit_cache = {}

    # -- bank algebra (reference filter.py:87-105) ------------------------

    def _get_extra_repr(self):
        return dict()

    def __repr__(self):
        attrs = {'in': self.n_features_in, 'out': self.n_features_out}
        attrs.update(self._get_extra_repr())
        s = ', '.join(f'{k}={v}' for k, v in attrs.items())
        return f'{type(self).__name__}({s})'

    def __len__(self):
        return self.n_filters

    def __getitem__(self, key):
        if isinstance(key, int):
            return Filter(self.G, self._kernels[key])
        return Filter(self.G, self._kernels[key])

    def __add__(self, other):
        if not isinstance(other, Filter):
            return NotImplemented
        return Filter(self.G, self._kernels + other._kernels)

    def __call__(self, x):
        from pygsp_tpu.graphs import Graph
        if isinstance(x, Graph):
            return Filter(x, self._kernels)
        return self.evaluate(x)

    def __matmul__(self, other):
        return self.filter(other)

    def _cheby_program(self, mode: str, order: int, carry_dtype=None,
                       carry_tol=None, vals_dtype=None,
                       fixed_graph=False):
        """Cached jit of quadrature + recurrence (kernels and lmax are
        trace-time constants; cache is keyed on lmax so refinements after
        ``compute_fourier_basis`` retrace). ``carry_dtype`` requests the
        reduced-precision carry (gated by its a-priori error bound HERE,
        at program-build time — inside the jit the coefficients are
        traced); ``vals_dtype`` casts the slab values inside the program
        (see :func:`pygsp_tpu.ops.chebyshev._cast_vals`)."""
        cdt = None if carry_dtype is None else jnp.dtype(carry_dtype).name
        vdt = None if vals_dtype is None else jnp.dtype(vals_dtype).name
        key = (mode, order, float(self.G.lmax), cdt, carry_tol, vdt,
               fixed_graph)
        fn = self._jit_cache.get(key)
        if fn is None:
            lmax = float(self.G.lmax)
            if carry_dtype is not None:
                from pygsp_tpu.ops.chebyshev import _check_carry_budget
                c_gate = cheby.cheby_coeff(self.evaluate, lmax, m=order)
                _check_carry_budget(np.asarray(c_gate), carry_dtype,
                                    carry_tol)

            if mode == 'analysis':
                if fixed_graph:
                    def run(L, s):
                        c = cheby.cheby_coeff(self.evaluate, lmax,
                                              m=order, dtype=s.dtype)
                        r = cheby.cheby_op_fixed_graph(L, lmax, c, s)
                        return jnp.moveaxis(r, 0, -1)      # (N, S, Nf)
                else:
                    def run(L, s):
                        c = cheby.cheby_coeff(self.evaluate, lmax,
                                              m=order, dtype=s.dtype)
                        r = cheby.cheby_op(L, lmax, c, s,
                                           carry_dtype=carry_dtype,
                                           vals_dtype=vals_dtype)
                        return jnp.moveaxis(r, 0, -1)      # (N, S, Nf)
            else:
                def run(L, s):
                    c = cheby.cheby_coeff(self.evaluate, lmax, m=order,
                                          dtype=s.dtype)
                    return cheby.cheby_synthesis(L, lmax, c, s,
                                                 carry_dtype=carry_dtype,
                                                 vals_dtype=vals_dtype)

            fn = jax.jit(run)
            self._jit_cache[key] = fn
        return fn

    # -- evaluation -------------------------------------------------------

    def evaluate(self, x):
        """Kernel responses at graph frequencies x: returns (Nf, *x.shape)."""
        x = jnp.asarray(x)
        return jnp.stack([jnp.asarray(k(x)) for k in self._kernels])

    # -- filtering --------------------------------------------------------

    def filter(self, s, method: str = 'chebyshev', order: int = 30,
               carry_dtype=None, carry_tol=None, vals_dtype=None,
               fixed_graph: bool = False):
        """Analysis (1 → Nf features) or synthesis (Nf → 1).

        Same rank-3 convention and dispatch as the reference
        (``filter.py:146-328``); returns a squeezed jax array.

        ``carry_dtype`` (chebyshev method, chunked/windowed graph
        formats): opt-in reduced-precision recurrence carry — e.g.
        ``jnp.bfloat16`` halves the hot loop's gather bytes and state
        memory at a measured ~3e-3–2e-2 max relative error on the
        BASELINE banks at order 30 (``BF16_ERRORS_r3.json``,
        ``benchmarks/bf16_error_curves.py``). Refused with a ValueError
        when the bank's coefficient decay cannot absorb the rounding
        (override with ``carry_tol``).

        ``vals_dtype``: opt-in cast of the stored edge VALUES — pair
        ``jnp.bfloat16`` with ``carry_dtype=jnp.bfloat16`` so the
        one-hot fold runs a single native MXU pass instead of the f32
        emulation (the full fast mode: 91.4% of the f32 read roofline
        on the bench graph vs 73% exact). Exact for unit/power-of-two
        weights; otherwise one extra rounding per edge weight.

        ``fixed_graph`` (analysis direction, chebyshev): route through
        the CONSTANT-MEMORY custom VJP
        (:func:`pygsp_tpu.ops.chebyshev.cheby_op_fixed_graph`) — plain
        reverse-mode through the K-step recurrence stores 3K signal-sized
        scan carries; this replaces them with two fresh recurrences.
        Gradients flow to the signal and (through the coefficients) to
        any filter parameters; the graph gets zero cotangents.
        """
        if fixed_graph and (carry_dtype is not None
                            or vals_dtype is not None):
            raise ValueError('fixed_graph does not combine with '
                             'carry_dtype/vals_dtype yet — the exact '
                             'path is the training configuration')
        if fixed_graph and method != 'chebyshev':
            raise ValueError('fixed_graph requires method="chebyshev" — '
                             'the constant-memory VJP wraps the Chebyshev '
                             'recurrence only')
        s = jnp.asarray(self.G._check_signal(np.asanyarray(s) if not
                                             isinstance(s, jax.Array) else s))
        if s.ndim == 1 or s.shape[-1] not in (1, self.Nf):
            if s.ndim == 3:
                raise ValueError(
                    f'Third dimension (#features) should be either 1 or the '
                    f'number of filters Nf = {self.Nf}, got {s.shape}.')
            s = jnp.expand_dims(s, -1)
        n_features_in = s.shape[-1]
        if s.ndim < 3:
            s = jnp.expand_dims(s, 1)
        if s.ndim > 3:
            raise ValueError('At most 3 dimensions: '
                             '#nodes x #signals x #features.')
        n_signals = s.shape[1]
        n_features_out = self.Nf if n_features_in == 1 else 1

        if method == 'exact':
            f = self.evaluate(self.G.e).T                 # (N, Nf)
            axis = 1 if n_features_in == 1 else 2
            f = jnp.expand_dims(f, axis)
            assert f.shape == (self.G.N, n_features_in, n_features_out)
            s_hat = self.G.gft(s)
            s_hat = jnp.matmul(s_hat, f)
            out = self.G.igft(s_hat)

        elif method == 'chebyshev':
            self.G._hint_fast_laplacian()
            if n_features_in == 1:   # analysis
                out = self._cheby_program(
                    'analysis', order, carry_dtype, carry_tol, vals_dtype,
                    fixed_graph)(self.G.L, s[..., 0])
            else:                    # synthesis
                if fixed_graph:
                    raise ValueError('fixed_graph supports the analysis '
                                     'direction (1 -> Nf features); '
                                     'differentiate that side')
                out = self._cheby_program('synthesis', order, carry_dtype,
                                          carry_tol, vals_dtype)(self.G.L,
                                                                 s)
                out = jnp.expand_dims(out, -1)

        elif method == 'lanczos':
            if n_features_in == 1:
                r = lanczos_mod.lanczos_op(self.G.L, self.evaluate,
                                           s[..., 0], order=order)
                out = jnp.moveaxis(r, 0, -1)
            else:
                r = lanczos_mod.lanczos_synthesis_op(self.G.L, self.evaluate,
                                                     s, order=order)
                out = jnp.expand_dims(r, -1)

        else:
            raise ValueError(f'Unknown method {method}.')

        return out.squeeze()

    def analyze(self, s, method='chebyshev', order=30):
        s = np.asanyarray(s) if not isinstance(s, jax.Array) else s
        if s.ndim == 3 and s.shape[-1] != 1:
            raise ValueError(f'Last dimension (#features) should be 1, '
                             f'got {s.shape}.')
        return self.filter(s, method, order)

    def synthesize(self, s, method='chebyshev', order=30):
        s = np.asanyarray(s) if not isinstance(s, jax.Array) else s
        if s.shape[-1] != self.Nf:
            raise ValueError(f'Last dimension (#features) should be the '
                             f'number of filters Nf = {self.Nf}, got {s.shape}.')
        return self.filter(s, method, order)

    def localize(self, i, **kwargs):
        """Filter √N·δᵢ to visualize the kernels in the vertex domain
        (reference filter.py:350-391).

        Examples
        --------
        >>> import numpy as np
        >>> from pygsp_tpu import graphs, filters
        >>> G = graphs.Sensor(64, seed=42)
        >>> G.estimate_lmax()
        >>> g = filters.Heat(G, scale=[5, 20])
        >>> np.asarray(g.localize(7)).shape   # the two atoms centred at v=7
        (64, 2)

        """
        s = jnp.zeros(self.G.N).at[i].set(1.0)
        return jnp.sqrt(self.G.N) * self.filter(s, **kwargs)

    # -- frame machinery --------------------------------------------------

    def estimate_frame_bounds(self, x=None):
        """(A, B) = min/max of Σᵢ gᵢ²(x) (reference filter.py:393-504).

        Examples
        --------
        >>> from pygsp_tpu import graphs, filters
        >>> G = graphs.Sensor(64, seed=42)
        >>> G.estimate_lmax()
        >>> A, B = filters.Itersine(G, Nf=5).estimate_frame_bounds()
        >>> print(round(float(B / A), 2))     # tight frame
        1.0

        """
        if x is None:
            x = jnp.linspace(0, self.G.lmax, 1000)
        else:
            x = jnp.asarray(x)
        s = jnp.sum(self.evaluate(x) ** 2, axis=0)
        return float(jnp.min(s)), float(jnp.max(s))

    def compute_frame(self, **kwargs):
        """Analysis-operator matrix (N·Nf, N) by filtering the identity
        (reference filter.py:506-583). Small graphs only.

        Examples
        --------
        >>> import numpy as np
        >>> from pygsp_tpu import graphs, filters
        >>> G = graphs.Ring(16)
        >>> G.estimate_lmax()
        >>> g = filters.Heat(G, scale=[5, 20])
        >>> np.asarray(g.compute_frame()).shape   # Nf*N atoms as rows
        (32, 16)

        """
        if self.G.N > 2000:
            _logger.warning('Creating a big matrix. '
                            'You should prefer the filter method.')
        s = jnp.identity(self.G.N)
        return self.filter(s, **kwargs).T.reshape(-1, self.G.N)

    def toarray(self):
        return self.compute_frame()

    def complement(self, frame_bound=None):
        """Kernel √(B − Σg²) that tightens the frame
        (reference filter.py:602-661).

        Examples
        --------
        >>> import numpy as np
        >>> from pygsp_tpu import graphs, filters
        >>> G = graphs.Sensor(64, seed=42)
        >>> G.estimate_lmax()
        >>> g = filters.Heat(G, scale=10)
        >>> gc = g + g.complement()           # saturate the frame
        >>> lam = np.linspace(0, float(G.lmax), 5)
        >>> v = (np.asarray(gc.evaluate(lam)) ** 2).sum(axis=0)
        >>> print(np.round(v, 2))             # now exactly tight
        [1. 1. 1. 1. 1.]

        """
        def kernel(x):
            y = jnp.sum(self.evaluate(x) ** 2, axis=0)
            if frame_bound is None:
                bound = jnp.max(y)
            else:
                _, B = self.estimate_frame_bounds(x)
                if B > frame_bound:
                    raise ValueError(f'The chosen bound is not feasible. '
                                     f'Choose at least {B}.')
                bound = frame_bound
            return jnp.sqrt(jnp.maximum(bound - y, 0.0))
        return Filter(self.G, kernel)

    def inverse(self):
        """Canonical dual bank gᵢ⁺ = gᵢ / Σⱼ gⱼ² (pseudo-inverse; reference
        filter.py:663-759)."""
        A, B = self.estimate_frame_bounds()
        if A == 0:
            _logger.warning('The filter bank is not invertible as it is not '
                            'a frame (lower frame bound A=0).')
        elif A / B < 1e-10:
            _logger.warning('The filter bank is badly conditioned. '
                            'The inverse will be approximate.')

        def make_kernel(i):
            def kernel(x):
                y = self.evaluate(x)               # (Nf, len(x))
                denom = jnp.sum(y ** 2, axis=0)
                return jnp.where(denom > 0, y[i] / jnp.where(denom > 0, denom, 1.0), 0.0)
            return kernel

        return Filter(self.G, [make_kernel(i) for i in range(self.n_filters)])

    # -- presentation -----------------------------------------------------

    def plot(self, **kwargs):
        from pygsp_tpu import plotting
        return plotting.plot_filter(self, **kwargs)
