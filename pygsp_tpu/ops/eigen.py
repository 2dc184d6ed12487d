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
    """(Partial) eigendecomposition of the Laplacian.

    Returns (e, U), ascending, with e[0] clamped to exactly 0 like the
    reference (``graphs/fourier.py:178-182``). Full requests densify and
    run ``eigh``; partial requests with k ≪ N dispatch to the iterative
    LOBPCG path (:func:`partial_fourier_basis`) — the role ARPACK
    ``eigsh(k, which='SM')`` plays in ``graphs/fourier.py:171-175`` —
    so eigenmap layouts of large graphs never touch an O(N³) solve.
    """
    n = L.n_vertices
    k = n if n_eigenvectors is None else int(n_eigenvectors)
    # Iterative path only when it wins: k small relative to N and N big
    # enough that dense eigh hurts. LOBPCG needs 5k < n for its basis.
    if k < n and n > 2000 and 5 * k < n:
        return partial_fourier_basis(L, k)
    dense = L.to_dense()
    e, U = jnp.linalg.eigh(dense)
    e = e.at[0].set(0.0)
    if k < e.shape[0]:
        e, U = e[:k], U[:, :k]
    return e, U


def laplacian_upper_bound(L: LaplacianOp):
    """Gershgorin bound on λmax straight from the operator pytree:
    ``max_i (diag_i + Σ_j |offdiag_ij|)``; works for any storage format."""
    off = L.offdiag
    from pygsp_tpu.core import sparse as _sp
    if isinstance(off, _sp.ELLMatrix):
        absrow = jnp.sum(jnp.abs(off.ell_vals), axis=1)[:off.n_rows]
        for lvl in off.levels:
            absrow = absrow.at[lvl.rows].add(
                jnp.sum(jnp.abs(lvl.vals), axis=1), mode='drop',
                unique_indices=True)
    elif type(off).__name__ == 'ChunkedELLMatrix':
        from pygsp_tpu.core import chunked as _ck
        absrow = _ck.chunked_spmm(off.abs_vals(),
                                  jnp.ones((off.n_cols,), off.dtype))
    elif isinstance(off, _sp.BandedMatrix):
        absrow = jnp.sum(jnp.abs(off.tiles), axis=(1, 3)).reshape(-1)[:off.n_rows]
    else:
        absrow = jax.ops.segment_sum(jnp.abs(off.vals), off.rows,
                                     num_segments=off.n_rows,
                                     indices_are_sorted=True)
    return jnp.max(L.diag + absrow)


def partial_fourier_basis(L: LaplacianOp, k: int, *, maxiter: int = 300,
                          tol=None, seed: int = 17):
    """k smallest eigenpairs of L via LOBPCG on the flipped operator.

    ``jax.experimental.sparse.linalg.lobpcg_standard`` finds the TOP-k of
    a symmetric operator; the bottom of L's spectrum is the top of
    ``B = c·I − L`` for any upper bound c ≥ λmax (Gershgorin here), so we
    run LOBPCG on B and map back ``λ = c − θ``. Matches the role of the
    reference's ``sparse.linalg.eigsh(L, k, which='SM')``
    (``graphs/fourier.py:171-175``) with O(k·|E|·iters) work instead of
    O(N³) — each iteration is one k-wide SpMM on the same kernel as
    filtering.
    """
    from jax.experimental.sparse.linalg import lobpcg_standard

    n = L.n_vertices
    if not 1 <= k or 5 * k >= n:
        raise ValueError(f'need 1 <= k and 5k < n, got k={k}, n={n}')
    c = laplacian_upper_bound(L) * 1.01

    def B(x):
        return c * x - matvec(L, x)

    x0 = jax.random.normal(jax.random.PRNGKey(seed), (n, k), dtype=L.dtype)
    theta, U, _ = lobpcg_standard(B, x0, m=maxiter, tol=tol)
    e = c - theta
    order = jnp.argsort(e)
    e = e[order].at[0].set(0.0)
    return e, U[:, order]


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
