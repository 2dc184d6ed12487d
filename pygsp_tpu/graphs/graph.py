"""The Graph class: host-side construction, device-side spectral operators.

Design (vs reference ``pygsp/graphs/graph.py:15`` + mixins): the reference
assembles ``Graph`` from four mix-ins over a scipy CSR matrix. Here the graph
is a thin host wrapper around one canonical scipy CSR adjacency (construction,
validation, interop, plotting all live on host) plus lazily-built **immutable
device pytrees** used by every compute path:

- ``W_op``  : padded row-sorted :class:`~pygsp_tpu.core.sparse.CSRMatrix`
- ``L``     : :class:`~pygsp_tpu.core.operators.LaplacianOp`
  (diag + negated off-diag edges — jit-able, shardable)
- ``U, e``  : dense Fourier basis (small-graph exact path only)

All spectral methods (``estimate_lmax``, ``compute_fourier_basis``,
``gft``/``igft``, ``grad``/``div``, ``dirichlet_energy``) dispatch to jitted
pure functions in :mod:`pygsp_tpu.ops`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

from pygsp_tpu import utils
from pygsp_tpu.core import sparse as core_sparse
from pygsp_tpu.core.operators import LaplacianOp, laplacian_op, matvec
from pygsp_tpu.ops import eigen as ops_eigen
from pygsp_tpu.ops.spmm import spmm


class Graph:
    """Weighted (un)directed graph with device-resident spectral operators.

    Parameters mirror the reference ``Graph.__init__``
    (``graphs/graph.py:98-176``): ``adjacency`` is any square dense/sparse
    matrix; NaN/Inf raise; self-loops and negative weights warn.

    Examples
    --------
    >>> import numpy as np
    >>> from pygsp_tpu import graphs
    >>> W = np.array([[0., 1., 0.],
    ...               [1., 0., 2.],
    ...               [0., 2., 0.]])
    >>> G = graphs.Graph(W)
    >>> G.N, G.Ne
    (3, 2)
    >>> G.dw                             # weighted degrees
    array([1., 3., 2.])
    >>> G.is_connected(), G.is_directed()
    (True, False)
    >>> G.set_signal('height', np.array([0., 1., 2.]))
    >>> sorted(G.signals)
    ['height']

    """

    def __init__(self, adjacency, lap_type: str = 'combinatorial',
                 coords=None, plotting=None):
        self.logger = utils.build_logger(__name__)

        if sps.issparse(adjacency):
            adjacency = adjacency.tocsr().astype(np.float64)
        else:
            adjacency = sps.csr_matrix(np.asarray(adjacency, dtype=np.float64))
        if adjacency.shape[0] != adjacency.shape[1]:
            raise ValueError('Adjacency: must be a square matrix.')
        if np.isnan(adjacency.sum()):
            raise ValueError('Adjacency: there is a Not a Number (NaN).')
        if np.isinf(adjacency.sum()):
            raise ValueError('Adjacency: there is an infinite value.')

        adjacency.eliminate_zeros()
        self._adjacency = adjacency
        self.n_vertices = adjacency.shape[0]
        self._init_caches()

        if self.has_loops():
            self.logger.warning('Adjacency: there are self-loops '
                                '(non-zeros on the diagonal). '
                                'The Laplacian will not see them.')
        if (adjacency < 0).nnz != 0:
            self.logger.warning('Adjacency: there are negative edge weights.')

        # Count undirected edges once (reference graph.py:133-140).
        if self.is_directed():
            self.n_edges = adjacency.nnz
        else:
            n_loops = np.count_nonzero(adjacency.diagonal())
            self.n_edges = (adjacency.nnz - n_loops) // 2 + n_loops

        self.coords = None if coords is None else np.asarray(coords)
        self.plotting = {'vertex_size': 100, 'vertex_color': (0.12, 0.47, 0.71, 0.5),
                         'edge_color': (0.5, 0.5, 0.5, 0.5), 'edge_width': 2,
                         'edge_style': '-', 'highlight_color': 'C1',
                         'normalize_intercept': .25}
        if plotting:
            self.plotting.update(plotting)
        self.signals = {}
        self.mr = None  # multiresolution info set by reduction.graph_multiresolution

        self.compute_laplacian(lap_type)

    # ------------------------------------------------------------------
    # cache management
    # ------------------------------------------------------------------

    def _init_caches(self):
        self._W_op = None
        self._L = None
        self._fmt_hinted = False
        self._lmax = None
        self._lmax_method = None
        self._U = None
        self._e = None
        self._coherence = None
        self._D = None
        self._d = None
        self._dw = None
        self._directed = None
        self._connected = None

    # ------------------------------------------------------------------
    # basic attributes
    # ------------------------------------------------------------------

    @property
    def W(self):
        """Host scipy CSR adjacency (immutable; reference graph.py:709-715)."""
        return self._adjacency

    @W.setter
    def W(self, value):
        raise AttributeError('In-place modification of the graph is not '
                            'supported. Build a new Graph object.')

    @property
    def A(self):
        """Binary (boolean) adjacency."""
        return self._adjacency > 0

    @property
    def N(self):
        return self.n_vertices

    @property
    def Ne(self):
        return self.n_edges

    @property
    def W_op(self) -> core_sparse.CSRMatrix:
        """Device pytree of the adjacency (row-sorted padded COO/CSR)."""
        if self._W_op is None:
            self._W_op = core_sparse.from_scipy(self._adjacency)
        return self._W_op

    def __repr__(self, limit=None):
        attrs = {'n_vertices': self.n_vertices, 'n_edges': self.n_edges}
        s = ', '.join(f'{k}={v}' for k, v in attrs.items())
        return f'{type(self).__name__}({s})'

    # ------------------------------------------------------------------
    # structure predicates (host-side; reference graph.py:257-508)
    # ------------------------------------------------------------------

    def is_weighted(self) -> bool:
        """False iff all edge weights are 0/1 (reference graph.py:257-292)."""
        return not np.all(self._adjacency.data == 1)

    def is_directed(self) -> bool:
        """W != W.T anywhere (reference graph.py:368-405)."""
        if self._directed is None:
            self._directed = (self._adjacency != self._adjacency.T).nnz != 0
        return self._directed

    def has_loops(self) -> bool:
        return bool(np.any(self._adjacency.diagonal() != 0))

    def is_connected(self) -> bool:
        """Connectivity (weak for directed graphs follows the reference's
        BFS over W + Wᵀ; here scipy.sparse.csgraph on host)."""
        if self._connected is None:
            n_comp, _ = sps.csgraph.connected_components(
                self._adjacency, directed=self.is_directed(),
                connection='strong' if self.is_directed() else 'weak')
            self._connected = n_comp == 1
        return self._connected

    def extract_components(self):
        """List of connected-component subgraphs (reference graph.py:444-508)."""
        if self.is_directed():
            self.logger.error('Directed graphs not supported yet.')
            return None
        n_comp, labels = sps.csgraph.connected_components(
            self._adjacency, directed=False)
        graphs = []
        for c in range(n_comp):
            idx = np.nonzero(labels == c)[0]
            G = self.subgraph(idx)
            G.info = {'orig_idx': idx}
            graphs.append(G)
        return graphs

    def subgraph(self, vertices):
        """Induced subgraph on ``vertices`` (reference graph.py:218-255).

        Examples
        --------
        >>> from pygsp_tpu import graphs
        >>> G = graphs.Ring(8)
        >>> H = G.subgraph([0, 1, 2, 3])     # an arc of the ring
        >>> H.N, H.Ne
        (4, 3)

        """
        vertices = np.asarray(vertices)
        adjacency = self._adjacency[vertices, :][:, vertices]
        try:
            coords = self.coords[vertices] if self.coords is not None else None
        except (TypeError, IndexError):
            coords = None
        G = Graph(adjacency, lap_type=self.lap_type, coords=coords,
                  plotting=self.plotting)
        for name, signal in self.signals.items():
            G.set_signal(name, signal[vertices])
        return G

    def get_edge_list(self):
        """(sources, targets, weights); upper-triangular only if undirected
        (reference graph.py:962-1029).

        Examples
        --------
        >>> from pygsp_tpu import graphs
        >>> v_in, v_out, weights = graphs.Path(4).get_edge_list()
        >>> [list(map(int, v_in)), list(map(int, v_out))]
        [[0, 1, 2], [1, 2, 3]]

        """
        if self.is_directed():
            W = self._adjacency.tocoo()
        else:
            W = sps.triu(self._adjacency, format='coo')
        return W.row, W.col, W.data

    # ------------------------------------------------------------------
    # signals
    # ------------------------------------------------------------------

    def _check_signal(self, s):
        s = np.asanyarray(s) if isinstance(s, np.ndarray) else s
        if s.shape[0] != self.n_vertices:
            raise ValueError(f'First dimension must be the number of vertices '
                             f'G.N = {self.N}, got {s.shape}.')
        return s

    def set_signal(self, name: str, signal):
        self.signals[name] = self._check_signal(np.asanyarray(signal))

    # ------------------------------------------------------------------
    # degrees
    # ------------------------------------------------------------------

    @property
    def d(self):
        """Unweighted degree; directed = mean of in/out (graph.py:729-781)."""
        if self._d is None:
            if not self.is_directed():
                self._d = self._adjacency.getnnz(axis=1)
            else:
                din = self._adjacency.getnnz(axis=0)
                dout = self._adjacency.getnnz(axis=1)
                self._d = (din + dout) / 2
        return self._d

    @property
    def dw(self):
        """Weighted degree; directed = mean of in/out (graph.py:783-838)."""
        if self._dw is None:
            if not self.is_directed():
                self._dw = np.ravel(self._adjacency.sum(axis=0))
            else:
                din = np.ravel(self._adjacency.sum(axis=0))
                dout = np.ravel(self._adjacency.sum(axis=1))
                self._dw = (din + dout) / 2
        return self._dw

    # ------------------------------------------------------------------
    # Laplacian
    # ------------------------------------------------------------------

    def compute_laplacian(self, lap_type: str = 'combinatorial',
                          fmt: str = 'coo'):
        """(Re)build the device Laplacian operator.

        Semantics of reference ``compute_laplacian`` (graph.py:510-630):
        directed graphs are average-symmetrized first; lap-type change
        invalidates spectral caches. ``fmt='hybrid'`` stores the
        off-diagonal block in the multi-level ELL TPU fast path
        (identical math, different summation order); ``fmt='chunked'``
        in the chunked variant whose gathers stay below the VMEM cliff;
        ``fmt='windowed'`` in the windowed-compact variant (exact-packed
        slots + MXU one-hot fold — the fastest power-law path, see
        ``core.windowed``); ``fmt='auto'`` picks by size.
        """
        if getattr(self, 'lap_type', None) != lap_type:
            self._lmax = None
            self._lmax_method = None
            self._U = None
            self._e = None
            self._coherence = None
            self._D = None
        self.lap_type = lap_type

        if lap_type not in ('combinatorial', 'normalized'):
            raise ValueError(f'Unknown Laplacian type {lap_type!r}')

        W = self._adjacency
        if self.is_directed():
            W = utils.symmetrize(W, method='average')
        # Self-loop entries stay in the edge set: with diag = dw (which
        # includes loop weights) and off-diagonal values -w including the
        # diagonal COO entries, L_ii = dw_i - w_ii falls out exactly as in
        # the reference for both Laplacian types.
        Wsym = core_sparse.from_scipy(W)
        self._L = laplacian_op(Wsym, lap_type)
        if fmt == 'auto':
            # the VMEM gather window (core.chunked.CHUNK_ROWS): larger
            # graphs pay the ~4x gather cliff unless chunked/windowed
            from pygsp_tpu.core.chunked import CHUNK_ROWS
            fmt = 'windowed' if self.n_vertices > CHUNK_ROWS else 'hybrid'
        if fmt == 'hybrid':
            self._L = self._L.to_hybrid()
        elif fmt == 'chunked':
            self._L = self._L.to_chunked()
        elif fmt == 'windowed':
            self._L = self._L.to_windowed()
        elif fmt != 'coo':
            raise ValueError(f'Unknown Laplacian format {fmt!r}')
        self._Wsym_host = W

    @property
    def L(self) -> LaplacianOp:
        """Device Laplacian operator. Supports ``L @ x``, ``L.dot(x)``,
        ``L.to_scipy()``, ``L.to_dense()``."""
        return self._L

    def _hint_fast_laplacian(self):
        """One-time perf hint before iterated SpMM on a big graph still
        in the default COO format, which pays the scatter/gather cliff
        on TPU (see ``core.chunked``). Same warn-before-slow-path UX as
        the reference's O(N²) warnings (reference graph.py:120,771)."""
        if self._fmt_hinted or not isinstance(self._L.offdiag,
                                              core_sparse.CSRMatrix):
            return
        self._fmt_hinted = True
        from pygsp_tpu.core.chunked import CHUNK_ROWS
        if self.n_vertices > CHUNK_ROWS:
            self.logger.warning(
                'Filtering a %d-vertex graph with the default COO '
                'Laplacian; call G.compute_laplacian(fmt=%r) first to '
                'use the TPU fast path (windowed-compact ELL).',
                self.n_vertices, 'auto')

    def dirichlet_energy(self, x):
        """``x^T L x`` (reference graph.py:642-702).

        Examples
        --------
        >>> import numpy as np
        >>> from pygsp_tpu import graphs
        >>> G = graphs.Path(5)
        >>> print(float(G.dirichlet_energy(np.ones(5))))   # constants are free
        0.0
        >>> bool(float(G.dirichlet_energy(np.arange(5.))) > 0)
        True

        """
        x = self._check_signal(x)
        x = jnp.asarray(x)
        return jnp.sum(x * matvec(self._L, x), axis=0)

    # ------------------------------------------------------------------
    # lmax
    # ------------------------------------------------------------------

    @property
    def lmax(self):
        """Largest-eigenvalue estimate; lazily estimated with a warning
        (reference graph.py:840-856)."""
        if self._lmax is None:
            self.logger.warning(
                'The largest eigenvalue G.lmax is not available, we need to '
                'estimate it. Explicitly call G.estimate_lmax() or '
                'G.compute_fourier_basis() once beforehand to suppress the '
                'warning.')
            self.estimate_lmax()
        return self._lmax

    def estimate_lmax(self, method: str = 'lanczos'):
        """Estimate λmax (reference graph.py:858-931).

        'lanczos': fixed-order jit-able Lanczos ×1.01 (role of ARPACK
        eigsh tol 5e-3). 'bounds': min of four algebraic upper bounds.

        Examples
        --------
        >>> from pygsp_tpu import graphs
        >>> G = graphs.Ring(8)               # true lmax of an even ring is 4
        >>> G.estimate_lmax()
        >>> bool(3.9 <= G.lmax <= 4.05)
        True

        """
        if method == self._lmax_method:
            return
        self._lmax_method = method
        if method == 'lanczos':
            lmax = float(ops_eigen.estimate_lmax_lanczos(self._L))
            ub = float(self._get_upper_bound())
            # clip to the theoretical bound like the reference asserts
            self._lmax = min(lmax, ub)
        elif method == 'bounds':
            self._lmax = float(self._get_upper_bound())
        else:
            raise ValueError(f'Unknown method {method!r}')

    def _get_upper_bound(self):
        if self.lap_type == 'normalized':
            return 2.0
        W = getattr(self, '_Wsym_host', self._adjacency)
        dw = np.ravel(W.sum(axis=0))
        bounds = [self.n_vertices * W.max() if W.nnz else 0.0,
                  2.0 * dw.max() if dw.size else 0.0]
        coo = W.tocoo()
        if coo.nnz:
            bounds.append(float(np.max(dw[coo.row] + dw[coo.col])))
            safe = np.where(dw > 0, dw, 1.0)
            m = W.dot(dw) / safe
            bounds.append(float(np.max(dw + m)))
        return min(bounds)

    # ------------------------------------------------------------------
    # Fourier basis (exact spectral path; small graphs)
    # ------------------------------------------------------------------

    def compute_fourier_basis(self, n_eigenvectors=None):
        """Dense eigendecomposition of L (reference fourier.py:97-195).

        Examples
        --------
        >>> import numpy as np
        >>> from pygsp_tpu import graphs
        >>> G = graphs.Ring(8)
        >>> G.compute_fourier_basis()
        >>> G.U.shape
        (8, 8)
        >>> print(round(float(G.e[0]), 6))   # the constant mode
        0.0

        """
        if n_eigenvectors is None:
            n_eigenvectors = self.n_vertices
        if self._U is not None and n_eigenvectors <= len(self._e):
            return
        if self.n_vertices ** 2 * n_eigenvectors > 3000 ** 3:
            self.logger.warning(
                'Computing the eigendecomposition of a large matrix is '
                'expensive. Consider using a polynomial filter instead.')
        e, U = ops_eigen.fourier_basis(self._L, n_eigenvectors)
        self._e, self._U = e, U
        if n_eigenvectors == self.N:
            self._lmax = float(e[-1])
            self._lmax_method = 'fourier'
            self._coherence = float(jnp.max(jnp.abs(U)))

    @property
    def U(self):
        return self._check_fourier('_U')

    @property
    def e(self):
        return self._check_fourier('_e')

    @property
    def coherence(self):
        return self._check_fourier('_coherence')

    def _check_fourier(self, attr):
        if getattr(self, attr) is None:
            self.logger.warning(
                f'The Fourier basis G.{attr[1:]} is not available, we need '
                'to compute the Fourier basis. Explicitly call '
                'G.compute_fourier_basis() once beforehand to suppress the '
                'warning.')
            self.compute_fourier_basis()
        return getattr(self, attr)

    def gft(self, s):
        """Graph Fourier transform ``ŝ = Uᵀ s`` (reference fourier.py:197-230).

        Examples
        --------
        >>> import numpy as np
        >>> from pygsp_tpu import graphs
        >>> G = graphs.Ring(8)
        >>> G.compute_fourier_basis()
        >>> s = np.sin(np.arange(8))
        >>> bool(np.allclose(np.asarray(G.igft(G.gft(s))), s))
        True

        """
        s = jnp.asarray(self._check_signal(s))
        U = self.U
        return jnp.tensordot(jnp.conj(U), s, axes=([0], [0]))

    def igft(self, s_hat):
        """Inverse GFT ``s = U ŝ`` (reference fourier.py:232-264)."""
        s_hat = jnp.asarray(s_hat)
        return jnp.tensordot(self.U, s_hat, axes=([1], [0]))

    # ------------------------------------------------------------------
    # differential operator: grad / div
    # ------------------------------------------------------------------

    def compute_differential_operator(self):
        """Edge-incidence operator D with ``L = D Dᵀ``
        (reference difference.py:26-166).

        Stored natively as per-edge gather/scatter index+value arrays —
        the TPU-friendly form — with a scipy view available via ``G.D``.

        Examples
        --------
        >>> import numpy as np
        >>> from pygsp_tpu import graphs
        >>> G = graphs.Path(5)
        >>> G.compute_differential_operator()
        >>> s = np.arange(5.)
        >>> np.asarray(G.D.grad(s)).shape    # one difference per edge
        (4,)
        >>> bool(np.allclose(np.asarray(G.D.div(G.D.grad(s))),
        ...                  np.asarray(G.L @ s)))        # div∘grad = L
        True

        """
        sources, targets, weights = self.get_edge_list()
        w = np.asarray(weights, dtype=np.float64)
        if self.lap_type == 'combinatorial':
            v_src = -np.sqrt(w)
            v_tgt = np.sqrt(w)
        elif self.lap_type == 'normalized':
            dw = np.ravel(getattr(self, '_Wsym_host', self._adjacency).sum(axis=0))
            safe = np.where(dw > 0, dw, 1.0)
            v_src = -np.sqrt(w / safe[sources])
            v_tgt = np.sqrt(w / safe[targets])
        else:
            raise ValueError(f'Unknown lap_type {self.lap_type!r}')
        if self.is_directed():
            v_src = v_src / np.sqrt(2)
            v_tgt = v_tgt / np.sqrt(2)
        # self-loops produce zero rows in D (sqrt(w) - sqrt(w) on same vertex)
        loops = sources == targets
        v_src = np.where(loops, 0.0, v_src)
        v_tgt = np.where(loops, 0.0, v_tgt)
        self._D = _DifferenceOp(self, sources, targets, v_src, v_tgt)

    @property
    def D(self):
        if self._D is None:
            self.logger.warning(
                'The differential operator G.D is not available, we need to '
                'compute it. Explicitly call G.compute_differential_operator() '
                'once beforehand to suppress the warning.')
            self.compute_differential_operator()
        return self._D

    def grad(self, x):
        """Per-edge gradient ``(Dᵀ x)`` (reference difference.py:168-244)."""
        return self.D.grad(jnp.asarray(self._check_signal(x)))

    def div(self, y):
        """Vertex divergence ``(D y)`` (reference difference.py:246-331)."""
        return self.D.div(jnp.asarray(y))

    # ------------------------------------------------------------------
    # coordinates / plotting / io hooks (implemented in sibling modules)
    # ------------------------------------------------------------------

    def set_coordinates(self, kind='spring', seed=None, **kwargs):
        from pygsp_tpu.graphs import _layout
        _layout.set_coordinates(self, kind=kind, seed=seed, **kwargs)

    def plot(self, *args, **kwargs):
        from pygsp_tpu import plotting
        return plotting.plot_graph(self, *args, **kwargs)

    def plot_signal(self, signal, **kwargs):
        from pygsp_tpu import plotting
        return plotting.plot_graph(self, vertex_color=signal, **kwargs)

    def plot_spectrogram(self, **kwargs):
        from pygsp_tpu import plotting
        return plotting.plot_spectrogram(self, **kwargs)

    def to_networkx(self):
        from pygsp_tpu.graphs import _io
        return _io.to_networkx(self)

    @classmethod
    def from_networkx(cls, graph_nx, weight='weight'):
        from pygsp_tpu.graphs import _io
        return _io.from_networkx(graph_nx, weight=weight)

    def to_graphtool(self):
        from pygsp_tpu.graphs import _io
        return _io.to_graphtool(self)

    @classmethod
    def from_graphtool(cls, graph_gt, weight='weight'):
        from pygsp_tpu.graphs import _io
        return _io.from_graphtool(graph_gt, weight=weight)

    def save(self, path, fmt=None, backend=None):
        from pygsp_tpu.graphs import _io
        return _io.save(self, path, fmt=fmt, backend=backend)

    @classmethod
    def load(cls, path, fmt=None, backend=None):
        from pygsp_tpu.graphs import _io
        return _io.load(path, fmt=fmt, backend=backend)


class _DifferenceOp:
    """Edge-incidence operator as gather/scatter arrays (device-resident).

    grad: ``(Dᵀ x)[e] = v_tgt[e] x[t_e] + v_src[e] x[s_e]`` — one gather.
    div: ``(D y)[v] = Σ_{e: s_e=v} v_src[e] y[e] + Σ_{e: t_e=v} v_tgt[e] y[e]``
    — two segment-sums. Together they satisfy ``div(grad(x)) = L x``.
    """

    def __init__(self, G, sources, targets, v_src, v_tgt):
        self.G = G
        self.n_vertices = G.n_vertices
        self.n_edges = len(sources)
        self.sources = jnp.asarray(sources, dtype=jnp.int32)
        self.targets = jnp.asarray(targets, dtype=jnp.int32)
        self.v_src = jnp.asarray(v_src)
        self.v_tgt = jnp.asarray(v_tgt)

    def grad(self, x):
        bshape = (-1,) + (1,) * (x.ndim - 1)
        return (self.v_tgt.reshape(bshape) * x[self.targets]
                + self.v_src.reshape(bshape) * x[self.sources])

    def div(self, y):
        if y.shape[0] != self.n_edges:
            raise ValueError(f'First dimension must be the number of edges '
                             f'G.Ne = {self.n_edges}, got {y.shape}.')
        import jax
        bshape = (-1,) + (1,) * (y.ndim - 1)
        out = jax.ops.segment_sum(self.v_src.reshape(bshape) * y, self.sources,
                                  num_segments=self.n_vertices)
        out = out + jax.ops.segment_sum(self.v_tgt.reshape(bshape) * y,
                                        self.targets,
                                        num_segments=self.n_vertices)
        return out

    def to_scipy(self):
        cols = np.arange(self.n_edges)
        rows = np.concatenate([np.asarray(self.sources), np.asarray(self.targets)])
        vals = np.concatenate([np.asarray(self.v_src), np.asarray(self.v_tgt)])
        D = sps.csc_matrix((vals, (rows, np.concatenate([cols, cols]))),
                           shape=(self.n_vertices, self.n_edges))
        D.eliminate_zeros()
        return D

    def toarray(self):
        return self.to_scipy().toarray()

    @property
    def T(self):
        return _TransposedDiff(self)

    def dot(self, y):
        return self.div(y)


class _TransposedDiff:
    def __init__(self, D):
        self._D = D

    def dot(self, x):
        return self._D.grad(x)
