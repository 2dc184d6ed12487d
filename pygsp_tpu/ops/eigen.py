"""Spectrum estimation and (small-graph) eigendecomposition.

TPU-native replacements for the reference's ARPACK/LAPACK calls:

- ``estimate_lmax_lanczos``: fixed-iteration jit-able Lanczos (the role of
  ``scipy.sparse.linalg.eigsh(k=1, tol=5e-3)`` in
  ``pygsp/graphs/graph.py:911-917``), with the same ×1.01 inflation.
- ``estimate_lmax_bounds``: the four algebraic upper bounds of
  ``Graph._get_upper_bound`` (``graphs/graph.py:933-960``).
- ``fourier_basis``: dense ``jnp.linalg.eigh`` for the exact spectral path
  (role of ``scipy.linalg.eigh`` in ``graphs/fourier.py:171-175``) —
  small graphs only, by design; large graphs use polynomial filtering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pygsp_tpu.core.operators import LaplacianOp, matvec, degrees_from_adjacency
from pygsp_tpu.ops.lanczos import _lanczos_single


def estimate_lmax_lanczos(L: LaplacianOp, order: int = 32,
                          seed: int = 42, inflation: float = 1.01):
    """Largest-eigenvalue estimate via fixed-order Lanczos, ×1.01.

    Deterministic (seeded start vector), static shapes, jit-able: compiles
    once per graph shape, unlike ARPACK's data-dependent restart loop.
    """
    n = L.n_vertices
    order = min(order, n)
    key = jax.random.PRNGKey(seed)
    v0 = jax.random.normal(key, (n,), dtype=L.dtype)
    if order == 1:
        v0 = v0 / jnp.linalg.norm(v0)
        return (v0 @ matvec(L, v0)) * inflation
    _, H = _lanczos_single(L, v0, order)
    lmax = jnp.max(jnp.linalg.eigvalsh(H))
    return lmax * inflation


def estimate_lmax_bounds(W, dw=None, lap_type: str = 'combinatorial'):
    """Algebraic upper bound on λmax (min of four classical bounds).

    W is a symmetric adjacency :class:`CSRMatrix`. Matches
    ``Graph._get_upper_bound`` (``graphs/graph.py:933-960``).
    """
    if lap_type == 'normalized':
        return jnp.asarray(2.0)
    if lap_type != 'combinatorial':
        raise ValueError(f'Unknown Laplacian type {lap_type!r}')
    if dw is None:
        _, dw = degrees_from_adjacency(W)
    n = W.n_rows
    real = W.rows < n
    wmax = jnp.max(jnp.where(real, W.vals, -jnp.inf))
    b_full = n * wmax
    b_gersh = 2.0 * jnp.max(dw)
    # Anderson–Morley: max over edges of dw[i] + dw[j]
    r = jnp.minimum(W.rows, n - 1)
    c = jnp.minimum(W.cols, n - 1)
    edge_sum = jnp.where(real, dw[r] + dw[c], -jnp.inf)
    b_am = jnp.max(edge_sum)
    # Merris: max dw[i] + mean degree of neighbors
    wdw = matvec_adj(W, dw)
    safe_dw = jnp.where(dw > 0, dw, 1.0)
    b_merris = jnp.max(dw + wdw / safe_dw)
    return jnp.minimum(jnp.minimum(b_full, b_gersh),
                       jnp.minimum(b_am, b_merris))


def matvec_adj(W, x):
    """Adjacency matvec (no diag term)."""
    from pygsp_tpu.ops.spmm import spmm
    return spmm(W, x)


def fourier_basis(L: LaplacianOp, n_eigenvectors: int | None = None):
    """(Partial) eigendecomposition of the (densified) Laplacian.

    Returns (e, U), ascending, with e[0] clamped to exactly 0 like the
    reference (``graphs/fourier.py:178-182``). Dense ``eigh`` throughout:
    on TPU a partial ARPACK-style solve has no advantage below the size
    where the exact path is sensible at all, so partial results are slices
    of the full decomposition.
    """
    dense = L.to_dense()
    e, U = jnp.linalg.eigh(dense)
    e = e.at[0].set(0.0)
    if n_eigenvectors is not None and n_eigenvectors < e.shape[0]:
        e, U = e[:n_eigenvectors], U[:, :n_eigenvectors]
    return e, U


def power_iteration_lmax(L: LaplacianOp, iters: int = 100, seed: int = 0):
    """Plain power iteration on L (cheap fallback; slower convergence than
    Lanczos for clustered spectra)."""
    n = L.n_vertices
    v = jax.random.normal(jax.random.PRNGKey(seed), (n,), dtype=L.dtype)
    v = v / jnp.linalg.norm(v)

    def body(_, v):
        w = matvec(L, v)
        return w / jnp.maximum(jnp.linalg.norm(w), jnp.finfo(v.dtype).tiny)

    v = jax.lax.fori_loop(0, iters, body, v)
    return v @ matvec(L, v)
