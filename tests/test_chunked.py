"""Parity tests for the chunked multi-level ELL format (core.chunked).

The chunked format must reproduce plain SpMM / Chebyshev arithmetic
exactly (same math as the reference's ``G.L.dot`` / ``cheby_op``,
``pygsp/filters/approximations.py:58-114``) — only the storage and the
gather operand sizes differ.
"""

import numpy as np
import pytest
import scipy.sparse as sps

import jax.numpy as jnp

from pygsp_tpu.core import chunked as ck
from pygsp_tpu.core import sparse as sp
from pygsp_tpu.core.operators import laplacian_op
from pygsp_tpu.ops import chebyshev as cheby


def _random_powerlaw(n, rng, avg_deg=6):
    # skewed degrees: preferential-style endpoint sampling
    m = n * avg_deg // 2
    a = rng.integers(0, n, size=m)
    b = (rng.random(size=m) ** 2.5 * n).astype(np.int64)  # hub-skewed
    keep = a != b
    a, b = a[keep], b[keep]
    w = rng.random(size=a.size) + 0.5
    W = sps.csr_matrix((np.concatenate([w, w]),
                        (np.concatenate([a, b]), np.concatenate([b, a]))),
                       shape=(n, n))
    W.sum_duplicates()
    return W


@pytest.mark.parametrize('chunk_rows', [64, 100, 256])
def test_chunked_spmm_matches_scipy(chunk_rows):
    rng = np.random.default_rng(3)
    W = _random_powerlaw(500, rng)
    mat = ck.chunked_from_scipy(W, chunk_rows=chunk_rows)
    assert mat.nnz == W.nnz
    x = rng.normal(size=(500, 3))
    got = np.asarray(mat @ jnp.asarray(x))
    want = W @ x
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)
    # 1-D signal path
    got1 = np.asarray(mat @ jnp.asarray(x[:, 0]))
    np.testing.assert_allclose(got1, want[:, 0], rtol=1e-10, atol=1e-10)


def test_chunked_spmm_via_dispatch():
    rng = np.random.default_rng(5)
    W = _random_powerlaw(300, rng)
    mat = ck.chunked_from_scipy(W, chunk_rows=128)
    x = jnp.asarray(rng.normal(size=(300, 2)))
    np.testing.assert_allclose(np.asarray(sp.spmm(mat, x)),
                               W @ np.asarray(x), rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize('lap_type', ['combinatorial', 'normalized'])
def test_chunked_cheby_matches_plain(lap_type):
    rng = np.random.default_rng(7)
    W = _random_powerlaw(400, rng)
    Wm = sp.from_scipy(W)
    L = laplacian_op(Wm, lap_type)
    Lc = L.to_chunked(chunk_rows=96)
    assert isinstance(Lc.offdiag, ck.ChunkedELLMatrix)
    lmax = 1.02 * float(abs(sps.linalg.eigsh(
        L.to_scipy(), k=1, return_eigenvectors=False)[0]))
    x = jnp.asarray(rng.normal(size=(400, 5)))
    scales = jnp.asarray([1.0, 4.0])
    c = cheby.cheby_coeff(
        lambda lam: jnp.exp(-scales[:, None] * lam[None, :] / lmax),
        lmax, m=20)
    got = np.asarray(cheby.cheby_op(Lc, lmax, c, x))
    want = np.asarray(cheby.cheby_op(L, lmax, c, x))
    assert got.shape == want.shape == (2, 400, 5)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
    # matvec through the generic dispatch agrees too
    np.testing.assert_allclose(np.asarray(Lc @ x), np.asarray(L @ x),
                               rtol=1e-9, atol=1e-9)


def test_chunked_hub_block_levels():
    """A graph with one extreme hub exercises the overflow levels."""
    rng = np.random.default_rng(11)
    n = 200
    others = np.arange(1, n)
    a = np.concatenate([np.zeros(n - 1, np.int64), others[:-1]])
    b = np.concatenate([others, others[1:]])
    w = np.ones(a.size)
    W = sps.csr_matrix((np.concatenate([w, w]),
                        (np.concatenate([a, b]), np.concatenate([b, a]))),
                       shape=(n, n))
    W.sum_duplicates()
    mat = ck.chunked_from_scipy(W, chunk_rows=64)
    assert len(mat.levels) > 0 and mat.level_rows.size > 0
    x = rng.normal(size=(n, 2))
    np.testing.assert_allclose(np.asarray(mat @ jnp.asarray(x)), W @ x,
                               rtol=1e-10, atol=1e-10)


def test_degree_permute_parity():
    """Degree-sorted internal storage must be invisible at the A @ x
    contract: same results as the unpermuted build, and the Chebyshev
    driver (hoisted permutes) agrees with plain cheby_op."""
    rng = np.random.default_rng(17)
    W = _random_powerlaw(400, rng)
    m_p = ck.chunked_from_scipy(W, chunk_rows=96, permute='degree')
    m_n = ck.chunked_from_scipy(W, chunk_rows=96, permute=None)
    assert m_p.perm is not None and m_n.perm is None
    # perm is a true inverse pair and descending-degree
    perm = np.asarray(m_p.perm)
    iperm = np.asarray(m_p.iperm)
    np.testing.assert_array_equal(perm[iperm], np.arange(400))
    deg = np.diff(np.asarray(m_p.rowptr))
    assert (np.diff(deg[perm]) <= 0).all()
    x = rng.normal(size=(400, 3))
    np.testing.assert_allclose(np.asarray(m_p @ jnp.asarray(x)),
                               np.asarray(m_n @ jnp.asarray(x)),
                               rtol=1e-10, atol=1e-10)
    # full Chebyshev parity through the hoisted-permute driver
    Wm = sp.from_scipy(W)
    L = laplacian_op(Wm, 'combinatorial')
    Lc = L.to_chunked(chunk_rows=96, permute='degree')
    assert Lc.offdiag.perm is not None
    lmax = 1.02 * float(abs(sps.linalg.eigsh(
        L.to_scipy(), k=1, return_eigenvectors=False)[0]))
    c = cheby.cheby_coeff(lambda lam: jnp.exp(-lam[None, :] / lmax), lmax,
                          m=18)
    np.testing.assert_allclose(
        np.asarray(cheby.cheby_op(Lc, lmax, c, jnp.asarray(x))),
        np.asarray(cheby.cheby_op(L, lmax, c, jnp.asarray(x))),
        rtol=1e-9, atol=1e-9)


def test_chunked_scale_and_astype():
    rng = np.random.default_rng(13)
    W = _random_powerlaw(150, rng)
    mat = ck.chunked_from_scipy(W, chunk_rows=64)
    x = rng.normal(size=(150,))
    np.testing.assert_allclose(np.asarray(mat.scale_vals(-2.0) @ jnp.asarray(x)),
                               -2.0 * (W @ x), rtol=1e-10, atol=1e-10)
    m32 = mat.astype(jnp.float32)
    assert m32.dtype == jnp.float32
