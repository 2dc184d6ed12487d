"""Core sparse pytree + Laplacian operator tests (vs scipy ground truth)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sps

from pygsp_tpu.core import sparse as core_sparse
from pygsp_tpu.core.operators import laplacian_op, matvec, degrees_from_adjacency


def random_sym_adj(rng, n=57, density=0.1):
    A = sps.random(n, n, density=density, random_state=np.random.RandomState(7),
                   data_rvs=lambda k: rng.uniform(0.1, 2.0, k))
    A = A + A.T
    A.setdiag(0)
    A.eliminate_zeros()
    return A.tocsr()


def test_from_scipy_roundtrip(rng):
    A = random_sym_adj(rng)
    M = core_sparse.from_scipy(A)
    assert M.nnz == A.nnz
    assert (M.n_edges_padded % core_sparse.EDGE_BLOCK) == 0
    B = core_sparse.to_scipy(M)
    assert np.allclose(B.toarray(), A.toarray())


def test_spmm_matches_scipy(rng):
    A = random_sym_adj(rng)
    M = core_sparse.from_scipy(A)
    x = rng.normal(size=(A.shape[0],))
    assert np.allclose(np.asarray(M @ jnp.asarray(x)), A @ x)
    X = rng.normal(size=(A.shape[0], 5))
    assert np.allclose(np.asarray(M @ jnp.asarray(X)), A @ X)
    X3 = rng.normal(size=(A.shape[0], 3, 4))
    got = np.asarray(M @ jnp.asarray(X3))
    want = np.einsum('ij,jsf->isf', A.toarray(), X3)
    assert np.allclose(got, want)


def test_transpose(rng):
    A = sps.random(40, 60, density=0.15,
                   random_state=np.random.RandomState(3))
    M = core_sparse.from_scipy(A)
    Mt = M.T
    x = rng.normal(size=(40,))
    assert np.allclose(np.asarray(Mt @ jnp.asarray(x)), A.T @ x)
    assert np.allclose(core_sparse.to_scipy(Mt).toarray(), A.T.toarray())


def test_to_dense(rng):
    A = random_sym_adj(rng)
    M = core_sparse.from_scipy(A)
    assert np.allclose(np.asarray(core_sparse.to_dense(M)), A.toarray())


def test_degrees(rng):
    A = random_sym_adj(rng)
    W = core_sparse.from_scipy(A)
    d, dw = degrees_from_adjacency(W)
    assert np.allclose(np.asarray(d), A.getnnz(axis=1))
    assert np.allclose(np.asarray(dw), np.ravel(A.sum(axis=1)))


@pytest.mark.parametrize('lap_type', ['combinatorial', 'normalized'])
def test_laplacian_matches_scipy(rng, lap_type):
    A = random_sym_adj(rng)
    W = core_sparse.from_scipy(A)
    L = laplacian_op(W, lap_type)
    dw = np.ravel(A.sum(axis=1))
    if lap_type == 'combinatorial':
        L_ref = sps.diags(dw) - A
    else:
        d = np.where(dw > 0, dw, 1.0) ** -0.5
        d = np.where(dw > 0, d, 0.0)
        L_ref = sps.eye(A.shape[0]) - sps.diags(d) @ A @ sps.diags(d)
        L_ref = L_ref.tolil()
        for i in np.nonzero(dw == 0)[0]:
            L_ref[i, i] = 0
    x = rng.normal(size=(A.shape[0], 3))
    assert np.allclose(np.asarray(matvec(L, jnp.asarray(x))), L_ref @ x)
    assert np.allclose(np.asarray(L.to_dense()), L_ref.toarray())


def test_laplacian_isolated_vertex(rng):
    A = np.zeros((5, 5))
    A[0, 1] = A[1, 0] = 2.0
    A[2, 3] = A[3, 2] = 1.0   # vertex 4 isolated
    W = core_sparse.from_dense(A)
    L = laplacian_op(W, 'normalized')
    dense = np.asarray(L.to_dense())
    assert dense[4, 4] == 0.0
    assert np.allclose(np.diag(dense)[:4], 1.0)


def test_shifted_operator(rng):
    A = random_sym_adj(rng)
    W = core_sparse.from_scipy(A)
    L = laplacian_op(W, 'combinatorial')
    x = rng.normal(size=(A.shape[0],))
    shifted = L.shifted(0.7, 1.3)
    want = 0.7 * (np.asarray(L.to_dense()) @ x - 1.3 * x)
    assert np.allclose(np.asarray(matvec(shifted, jnp.asarray(x))), want)


def test_empty_graph():
    M = core_sparse.from_coo([], [], [], 4)
    x = jnp.ones((4,))
    assert np.allclose(np.asarray(M @ x), 0.0)


def test_hybrid_ell_matches_coo(rng):
    """ELL(+tail) fast path must agree with the COO segment path."""
    import scipy.sparse as sps
    from pygsp_tpu.core.sparse import to_ell
    # power-law-ish degrees to exercise the overflow tail
    deg = np.minimum(rng.zipf(1.7, 200), 150)
    rows = np.repeat(np.arange(200), deg)
    cols = rng.integers(0, 200, size=len(rows))
    A = sps.csr_matrix((rng.uniform(0.1, 1, len(rows)), (rows, cols)),
                       shape=(200, 200))
    A = A + A.T
    A.setdiag(0)
    A.eliminate_zeros()
    M = core_sparse.from_scipy(A)
    H = to_ell(M)
    x = rng.normal(size=(200, 7))
    got = np.asarray(H @ jnp.asarray(x))
    want = np.asarray(M @ jnp.asarray(x))
    assert np.allclose(got, want, atol=1e-11)
    # fixed small width forces a big tail
    H2 = to_ell(M, width=8)
    got2 = np.asarray(H2 @ jnp.asarray(x))
    assert np.allclose(got2, want, atol=1e-11)


def test_hybrid_laplacian_cheby(rng):
    from pygsp_tpu.ops import chebyshev as cheby
    A = random_sym_adj(rng, n=80)
    W = core_sparse.from_scipy(A)
    L = laplacian_op(W, 'combinatorial')
    Lh = L.to_hybrid()
    x = rng.normal(size=(80, 3))
    c = rng.normal(size=(2, 21))
    r1 = np.asarray(cheby.cheby_op(L, 5.0, jnp.asarray(c), jnp.asarray(x)))
    r2 = np.asarray(cheby.cheby_op(Lh, 5.0, jnp.asarray(c), jnp.asarray(x)))
    assert np.allclose(r1, r2, atol=1e-9)


def test_ell_from_scipy_matches(rng):
    import scipy.sparse as sps
    from pygsp_tpu.core.sparse import ell_from_scipy, to_ell
    deg = np.minimum(rng.zipf(1.7, 150), 100)
    rows = np.repeat(np.arange(150), deg)
    cols = rng.integers(0, 150, size=len(rows))
    A = sps.csr_matrix((rng.uniform(0.1, 1, len(rows)), (rows, cols)),
                       shape=(150, 150))
    A = A + A.T
    A.setdiag(0)
    A.eliminate_zeros()
    H1 = ell_from_scipy(A)
    H2 = to_ell(core_sparse.from_scipy(A))
    x = rng.normal(size=(150, 5))
    got1 = np.asarray(H1 @ jnp.asarray(x))
    got2 = np.asarray(H2 @ jnp.asarray(x))
    want = A @ x
    assert np.allclose(got1, want, atol=1e-11)
    assert np.allclose(got2, want, atol=1e-11)


def test_banded_matches_coo(rng):
    import scipy.sparse as sps
    from pygsp_tpu.core.sparse import banded_from_scipy
    # banded random matrix (bandwidth < 128 -> half_bw = 1)
    n = 300
    diags = [rng.normal(size=n - off) for off in (1, 5, 90)]
    A = sum(sps.diags(d, off) for d, off in zip(diags, (1, 5, 90)))
    A = A + A.T
    B = banded_from_scipy(A)
    assert B is not None and B.half_bw == 1
    x = rng.normal(size=(n, 4))
    got = np.asarray(B @ jnp.asarray(x))
    assert np.allclose(got, A @ x, atol=1e-10)
    got1 = np.asarray(B @ jnp.asarray(x[:, 0]))
    assert np.allclose(got1, A @ x[:, 0], atol=1e-10)


def test_banded_laplacian_cheby(rng):
    import scipy.sparse as sps
    from pygsp_tpu.ops import chebyshev as cheby
    import pygsp_tpu as gsp
    G = gsp.graphs.Grid2d(12, 10)   # bandwidth 10 in natural order
    G.estimate_lmax(method='bounds')
    Lb = G.L.to_banded()
    assert Lb is not None
    x = rng.normal(size=(G.N, 3))
    c = rng.normal(size=(2, 15))
    r1 = np.asarray(cheby.cheby_op(G.L, G.lmax, jnp.asarray(c), jnp.asarray(x)))
    r2 = np.asarray(cheby.cheby_op(Lb, G.lmax, jnp.asarray(c), jnp.asarray(x)))
    assert np.allclose(r1, r2, atol=1e-8)


def test_banded_rejects_wide_band(rng):
    import pygsp_tpu as gsp
    G = gsp.graphs.ErdosRenyi(600, p=0.05, seed=1)  # random: huge bandwidth
    assert G.L.to_banded(max_half_bw=1) is None


def test_pallas_banded_interpret(rng):
    """Pallas banded kernel (interpret mode on CPU) == einsum path."""
    import scipy.sparse as sps
    from pygsp_tpu.core.sparse import banded_from_scipy, banded_spmm
    from pygsp_tpu.ops.pallas_banded import banded_spmm_pallas
    n = 300
    diags = [rng.normal(size=n - off) for off in (1, 7, 60)]
    A = sum(sps.diags(d, off) for d, off in zip(diags, (1, 7, 60)))
    A = (A + A.T).astype(np.float32)
    B = banded_from_scipy(A, dtype=np.float32)
    x = rng.normal(size=(n, 128)).astype(np.float32)
    want = np.asarray(banded_spmm(B, jnp.asarray(x)))
    got = np.asarray(banded_spmm_pallas(B, jnp.asarray(x), interpret=True))
    assert np.allclose(got, want, atol=1e-4)
    # narrow signal (padding path)
    x1 = rng.normal(size=(n, 5)).astype(np.float32)
    got1 = np.asarray(banded_spmm_pallas(B, jnp.asarray(x1), interpret=True))
    want1 = np.asarray(banded_spmm(B, jnp.asarray(x1)))
    assert np.allclose(got1, want1, atol=1e-4)


def test_banded_bf16(rng):
    import scipy.sparse as sps
    import jax.numpy as jnp_
    from pygsp_tpu.core.sparse import banded_from_scipy
    n = 200
    A = sps.diags([rng.uniform(0.5, 1, n - 1)], [1])
    A = (A + A.T).tocsr()
    B16 = banded_from_scipy(A, dtype=jnp_.bfloat16)
    x = rng.normal(size=(n, 4)).astype(np.float32)
    got = np.asarray(B16 @ jnp.asarray(x)).astype(np.float32)
    assert np.allclose(got, A @ x, rtol=2e-2, atol=2e-2)


def test_to_scipy_all_formats(rng):
    """Every storage format exports back to the exact source matrix
    (sentinel masks dropped, degree-sort/shuffle relabelings inverted) —
    mirrors the reference's always-scipy ``G.W``/``G.L`` (graph.py:117)."""
    from pygsp_tpu.core import chunked as ck
    from pygsp_tpu.core import windowed as cw

    n = 77  # non-divisible by any chunk size
    A = random_sym_adj(rng, n=n, density=0.15)
    mats = {
        'csr': core_sparse.from_scipy(A),
        'ell': core_sparse.ell_from_scipy(A),
        'chunked': ck.chunked_from_scipy(A, chunk_rows=16),
        'chunked-perm': ck.chunked_from_scipy(A, chunk_rows=16,
                                              permute='degree'),
        'windowed': cw.windowed_from_scipy(A, chunk_rows=16, window_rows=8,
                                           permute=None),
        'windowed-shuffle': cw.windowed_from_scipy(A, chunk_rows=16,
                                                   window_rows=8),
    }
    for name, M in mats.items():
        S = core_sparse.to_scipy(M)
        assert np.allclose(S.toarray(), A.toarray(), atol=1e-14), name
        assert np.allclose(np.asarray(core_sparse.to_dense(M)),
                           A.toarray(), atol=1e-14), name


def test_to_scipy_banded(rng):
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    A = random_sym_adj(rng, n=300, density=0.02)
    p = reverse_cuthill_mckee(A, symmetric_mode=True)
    A = A[p][:, p].tocsr()
    B = core_sparse.banded_from_scipy(A, max_half_bw=16)
    assert B is not None
    assert np.allclose(core_sparse.to_scipy(B).toarray(), A.toarray(),
                       atol=1e-14)


def test_laplacian_to_scipy_fast_formats(rng):
    """``G.L.to_scipy()`` works after ``compute_laplacian(fmt=...)``
    (regression: the chunked formats had no scipy export)."""
    import pygsp_tpu as gsp

    G = gsp.graphs.BarabasiAlbert(150, m0=3, m=3, seed=1)
    G.compute_laplacian('combinatorial')
    ref = G.L.to_scipy().toarray()
    for fmt in ('hybrid', 'auto'):
        G2 = gsp.graphs.BarabasiAlbert(150, m0=3, m=3, seed=1)
        G2.compute_laplacian('combinatorial', fmt=fmt)
        assert np.allclose(G2.L.to_scipy().toarray(), ref, atol=1e-12), fmt
        assert np.allclose(np.asarray(G2.L.to_dense()), ref, atol=1e-12), fmt
