"""Parity tests for the windowed-compact ELL format (core.windowed).

Same contract as every sparse backend: exact ``A @ x`` / Chebyshev
arithmetic (the reference's ``G.L.dot`` / ``cheby_op``,
``pygsp/filters/approximations.py:58-114``) — only the slot layout and
the MXU one-hot fold differ. The layout's safety valves (borrowed
slack into the previous window's slab, residue level tiers for hub
rows) must be exercised and invisible at the contract.
"""

import numpy as np
import pytest
import scipy.sparse as sps

import jax.numpy as jnp

from pygsp_tpu.core import sparse as sp
from pygsp_tpu.core import windowed as wd
from pygsp_tpu.core.operators import laplacian_op
from pygsp_tpu.ops import chebyshev as cheby

from test_chunked import _random_powerlaw


@pytest.mark.parametrize('chunk_rows,window_rows',
                         [(64, 16), (128, 64), (256, 32)])
def test_windowed_spmm_matches_scipy(chunk_rows, window_rows):
    rng = np.random.default_rng(3)
    W = _random_powerlaw(500, rng)
    mat = wd.windowed_from_scipy(W, chunk_rows=chunk_rows,
                                 window_rows=window_rows)
    assert mat.nnz == W.nnz
    x = rng.normal(size=(500, 3))
    got = np.asarray(mat @ jnp.asarray(x))
    want = W @ x
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)
    got1 = np.asarray(mat @ jnp.asarray(x[:, 0]))
    np.testing.assert_allclose(got1, want[:, 0], rtol=1e-10, atol=1e-10)


def test_windowed_edge_conservation():
    """Every stored edge lands in exactly one of slab/levels: A @ 1
    equals the row sums, and the slab + residue accounting matches nnz."""
    rng = np.random.default_rng(11)
    W = _random_powerlaw(700, rng)
    mat = wd.windowed_from_scipy(W, chunk_rows=128, window_rows=32)
    ones = jnp.ones((700,))
    np.testing.assert_allclose(np.asarray(mat @ ones),
                               np.ravel(W.sum(axis=1)),
                               rtol=1e-10, atol=1e-10)
    live_slab = int(np.count_nonzero(
        np.asarray(mat.cols) < mat.chunk_rows))
    live_levels = sum(int(np.count_nonzero(np.asarray(l.cols)
                                           < mat.chunk_rows))
                      for l in mat.levels)
    assert live_slab + live_levels == W.nnz


def test_windowed_borrow_and_levels_exercised():
    """A slab width straddling the window mean forces both borrowing
    (overflow into a neighbour's slack) and residue tiers."""
    rng = np.random.default_rng(7)
    W = _random_powerlaw(400, rng, avg_deg=10)
    # window λ = P * avg_deg / n_src ≈ 80: some windows under, some over
    mat = wd.windowed_from_scipy(W, chunk_rows=128, window_rows=32,
                                 slab_width=80)
    rowid = np.asarray(mat.rowid)
    live = np.asarray(mat.cols) < mat.chunk_rows
    assert (rowid[live] >= mat.window_rows).any(), 'no borrowed slots'
    assert mat.levels, 'no residue tiers'
    x = rng.normal(size=(400, 2))
    np.testing.assert_allclose(np.asarray(mat @ jnp.asarray(x)),
                               W @ x, rtol=1e-10, atol=1e-10)


def test_windowed_hub_rows():
    """Rows denser than any slab width route through levels correctly."""
    rng = np.random.default_rng(9)
    n = 300
    W = _random_powerlaw(n, rng).tolil()
    W[5, :] = rng.random(n)
    W[:, 5] = W[5, :].T
    W[5, 5] = 0
    W = sps.csr_matrix(W)
    mat = wd.windowed_from_scipy(W, chunk_rows=64, window_rows=16)
    x = rng.normal(size=(n, 2))
    np.testing.assert_allclose(np.asarray(mat @ jnp.asarray(x)),
                               W @ x, rtol=1e-10, atol=1e-10)


def test_windowed_spmm_via_dispatch():
    rng = np.random.default_rng(5)
    W = _random_powerlaw(300, rng)
    mat = wd.windowed_from_scipy(W, chunk_rows=128, window_rows=64)
    x = jnp.asarray(rng.normal(size=(300, 2)))
    np.testing.assert_allclose(np.asarray(sp.spmm(mat, x)),
                               W @ np.asarray(x), rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize('lap_type', ['combinatorial', 'normalized'])
def test_windowed_cheby_matches_plain(lap_type):
    """Full Chebyshev bank through the chunked driver with a windowed
    offdiag == plain CSR cheby_op."""
    rng = np.random.default_rng(17)
    W = _random_powerlaw(500, rng)
    Wm = sp.from_scipy(W)
    L = laplacian_op(Wm, lap_type)
    Lw = L.to_windowed(chunk_rows=96, window_rows=32)
    assert isinstance(Lw.offdiag, wd.WindowedELLMatrix)
    lmax = 1.02 * float(abs(sps.linalg.eigsh(
        L.to_scipy(), k=1, return_eigenvectors=False)[0]))

    def evaluate(lam):
        scales = jnp.asarray([1.0, 5.0, 25.0])
        return jnp.exp(-scales[:, None] * lam[None, :] / lmax)

    c = cheby.cheby_coeff(evaluate, lmax, m=20)
    x = jnp.asarray(rng.normal(size=(500, 3)))
    got = np.asarray(cheby.cheby_op(Lw, lmax, c, x))
    want = np.asarray(cheby.cheby_op(L, lmax, c, x))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_filter_fixed_graph(rng):
    """Filter.filter(fixed_graph=True): the constant-memory VJP behind
    the public Filter API — values and signal-gradients match the plain
    autodiff path; synthesis direction and dtype combos refuse."""
    import jax
    import pygsp_tpu as gsp

    G = gsp.graphs.BarabasiAlbert(400, m0=4, m=4, seed=1)
    G.estimate_lmax()
    G.compute_laplacian('combinatorial', fmt='windowed')
    g_ = gsp.filters.Heat(G, scale=[5.0, 20.0])
    s = rng.normal(size=(G.N,))

    def loss_plain(sv):
        return jnp.sum(jnp.sin(g_.filter(sv, order=20)))

    def loss_fg(sv):
        return jnp.sum(jnp.sin(g_.filter(sv, order=20,
                                         fixed_graph=True)))

    sv = jnp.asarray(s)
    assert np.isclose(float(loss_plain(sv)), float(loss_fg(sv)),
                      rtol=1e-12)
    g0 = np.asarray(jax.grad(loss_plain)(sv))
    g1 = np.asarray(jax.grad(loss_fg)(sv))
    np.testing.assert_allclose(g1, g0, rtol=1e-10, atol=1e-12)
    with pytest.raises(ValueError, match='analysis direction'):
        g_.filter(np.zeros((G.N, 1, 2)), fixed_graph=True)
    with pytest.raises(ValueError, match='carry_dtype'):
        g_.filter(s, fixed_graph=True, carry_dtype=jnp.bfloat16)
    with pytest.raises(ValueError, match='chebyshev'):
        g_.filter(s, fixed_graph=True, method='exact')
    with pytest.raises(ValueError, match='chebyshev'):
        g_.filter(s, fixed_graph=True, method='lanczos')


def test_vals_dtype_fast_mode(rng):
    """``vals_dtype=bf16`` (the full fast mode when paired with the bf16
    carry): exact for unit weights, within the measured reduced-precision
    budget for general weights, refused on non-chunked formats."""
    import pygsp_tpu as gsp

    # unit weights: the bf16 value cast is EXACT (representable), so the
    # only error is the carry's — same budget as carry-alone
    G = gsp.graphs.BarabasiAlbert(500, m0=4, m=4, seed=7)
    G.estimate_lmax()
    G.compute_laplacian('combinatorial', fmt='windowed')
    g_ = gsp.filters.Heat(G, scale=[5.0, 20.0])
    s = rng.normal(size=(G.N,)).astype(np.float32)
    ref = np.asarray(g_.filter(s, order=20))
    out = np.asarray(g_.filter(s, order=20, carry_dtype=jnp.bfloat16,
                               vals_dtype=jnp.bfloat16))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1.5e-2

    # weighted graph: value rounding adds ~one more bf16 rounding
    G2 = gsp.graphs.Sensor(400, seed=3)
    G2.estimate_lmax()
    G2.compute_laplacian('combinatorial', fmt='windowed')
    g2 = gsp.filters.Heat(G2, scale=[5.0, 20.0])
    s2 = rng.normal(size=(G2.N,)).astype(np.float32)
    ref2 = np.asarray(g2.filter(s2, order=20))
    out2 = np.asarray(g2.filter(s2, order=20, carry_dtype=jnp.bfloat16,
                                vals_dtype=jnp.bfloat16))
    assert np.abs(out2 - ref2).max() / np.abs(ref2).max() < 2e-2

    # non-chunked format refuses
    from pygsp_tpu.core.operators import laplacian_op
    from pygsp_tpu.core import sparse as spmod
    L = laplacian_op(spmod.from_scipy(G2.W.tocsr()), 'combinatorial')
    with pytest.raises(ValueError, match='vals_dtype'):
        cheby.cheby_op(L, float(G2.lmax),
                       jnp.ones((1, 5)), jnp.asarray(s2),
                       vals_dtype=jnp.bfloat16)


@pytest.mark.parametrize('g', [3, 5])
def test_acc_group_parity(g, monkeypatch):
    """Grouped accumulator fold (g recurrence steps per scan body) is
    bit-compatible with the g=1 body the suite otherwise pins
    (conftest sets PYGSP_CHEBY_ACC_GROUP=1 to keep CPU compiles small;
    this test is the grouped coverage)."""
    rng = np.random.default_rng(23)
    W = _random_powerlaw(400, rng)
    L = laplacian_op(sp.from_scipy(W), 'combinatorial')
    Lw = L.to_windowed(chunk_rows=96, window_rows=32)
    lmax = 1.02 * float(abs(sps.linalg.eigsh(
        L.to_scipy(), k=1, return_eigenvectors=False)[0]))

    def evaluate(lam):
        scales = jnp.asarray([1.0, 5.0, 25.0])
        return jnp.exp(-scales[:, None] * lam[None, :] / lmax)

    c = cheby.cheby_coeff(evaluate, lmax, m=17)   # m-2=15: head remainder
    x = jnp.asarray(rng.normal(size=(400, 3)))
    monkeypatch.setenv('PYGSP_CHEBY_ACC_GROUP', '1')
    want = np.asarray(cheby.cheby_op(Lw, lmax, c, x))
    monkeypatch.setenv('PYGSP_CHEBY_ACC_GROUP', str(g))
    got = np.asarray(cheby.cheby_op(Lw, lmax, c, x))
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-13)


def test_windowed_scale_astype_abs():
    rng = np.random.default_rng(13)
    W = _random_powerlaw(150, rng)
    mat = wd.windowed_from_scipy(W, chunk_rows=64, window_rows=32,
                                 slab_width=8)
    x = rng.normal(size=(150,))
    np.testing.assert_allclose(np.asarray(mat.scale_vals(2.0) @ x),
                               2.0 * (W @ x), rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(mat.abs_vals() @ x), abs(W) @ x,
        rtol=1e-10, atol=1e-10)
    assert mat.astype(jnp.float32).dtype == jnp.float32


def test_windowed_ragged_chunks():
    """n_rows not a multiple of chunk_rows: padded windows stay silent."""
    rng = np.random.default_rng(23)
    W = _random_powerlaw(333, rng)
    mat = wd.windowed_from_scipy(W, chunk_rows=128, window_rows=64)
    x = rng.normal(size=(333, 2))
    np.testing.assert_allclose(np.asarray(mat @ jnp.asarray(x)),
                               W @ x, rtol=1e-10, atol=1e-10)


def test_windowed_validation():
    rng = np.random.default_rng(1)
    W = _random_powerlaw(100, rng)
    with pytest.raises(ValueError, match='multiple'):
        wd.windowed_from_scipy(W, chunk_rows=100, window_rows=64)
    # round 5: window_rows up to 32768 supported via uint16 row ids
    m = wd.windowed_from_scipy(W, chunk_rows=512, window_rows=256)
    assert m.rowid.dtype == jnp.uint16
    with pytest.raises(ValueError, match='uint16'):
        wd.windowed_from_scipy(W, chunk_rows=65536, window_rows=65536)


@pytest.mark.parametrize('step', [1, 2, 4])
def test_windowed_subchunked_scan(step, monkeypatch):
    """PYGSP_WINDOW_STEP splits the window scan; the carried borrow block
    must make every split arithmetic-identical to the full-NW path."""
    rng = np.random.default_rng(31)
    W = _random_powerlaw(700, rng)
    x = jnp.asarray(rng.normal(size=(700, 3)))
    mat = wd.windowed_from_scipy(W, chunk_rows=256, window_rows=32)
    want = np.asarray(mat @ x)
    monkeypatch.setenv('PYGSP_WINDOW_STEP', str(step))
    got = np.asarray(mat @ x)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(got, W @ np.asarray(x),
                               rtol=1e-10, atol=1e-10)


def test_bf16_carry_windowed(rng):
    """Opt-in bf16 recurrence carry (VERDICT r3 #1/#2): f32-accumulated,
    within the measured error budget, and gated by the a-priori bound."""
    import jax.numpy as jnp
    import pygsp_tpu as gsp
    from pygsp_tpu.core import windowed as cw
    from pygsp_tpu.core.operators import LaplacianOp
    from pygsp_tpu.ops import chebyshev as cheby

    G = gsp.graphs.BarabasiAlbert(700, m0=6, m=6, seed=9)
    G.estimate_lmax()
    W = G.W.tocsr()
    dw = np.ravel(W.sum(axis=1)).astype(np.float32)
    Wneg = W.copy().astype(np.float32)
    Wneg.data = -Wneg.data
    H = cw.windowed_from_scipy(Wneg, chunk_rows=256, window_rows=64)
    L = LaplacianOp(offdiag=H, diag=jnp.asarray(dw),
                    lap_type='combinatorial')
    x = jnp.asarray(rng.normal(size=(G.N, 4)).astype(np.float32))
    g = gsp.filters.Heat(G, scale=[5.0, 25.0])
    c = cheby.cheby_coeff(g.evaluate, G.lmax, m=30, dtype=jnp.float32)

    ref = np.asarray(cheby.cheby_op(L, G.lmax, c, x))
    out = np.asarray(cheby.cheby_op(L, G.lmax, c, x,
                                    carry_dtype=jnp.bfloat16))
    assert out.dtype == np.float32          # accumulators stay f32
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    # measured ~3-6e-3 on the BASELINE banks (BF16_ERRORS_r3.json);
    # pin at 2x headroom
    assert rel < 1.5e-2, rel

    # bf16 synthesis path
    bank = jnp.asarray(rng.normal(size=(G.N, 3, 2)).astype(np.float32))
    sref = np.asarray(cheby.cheby_synthesis(L, G.lmax, c, bank))
    sout = np.asarray(cheby.cheby_synthesis(L, G.lmax, c, bank,
                                            carry_dtype=jnp.bfloat16))
    assert np.abs(sout - sref).max() / np.abs(sref).max() < 1.5e-2

    # carry_dtype == signal dtype is the identity configuration
    same = np.asarray(cheby.cheby_op(L, G.lmax, c, x,
                                     carry_dtype=jnp.float32))
    assert np.array_equal(same, ref)


def test_bf16_carry_gate(rng):
    """Slowly-decaying banks are refused at the default tolerance, with
    carry_tol as the explicit override; plain formats reject the knob."""
    import jax.numpy as jnp
    import pytest as _pytest
    import pygsp_tpu as gsp
    from pygsp_tpu.core import windowed as cw
    from pygsp_tpu.core.operators import LaplacianOp
    from pygsp_tpu.ops import chebyshev as cheby

    G = gsp.graphs.BarabasiAlbert(300, m0=4, m=4, seed=2)
    G.estimate_lmax()
    W = G.W.tocsr()
    dw = np.ravel(W.sum(axis=1)).astype(np.float32)
    Wneg = W.copy().astype(np.float32)
    Wneg.data = -Wneg.data
    H = cw.windowed_from_scipy(Wneg, chunk_rows=256, window_rows=64)
    L = LaplacianOp(offdiag=H, diag=jnp.asarray(dw),
                    lap_type='combinatorial')
    x = jnp.asarray(rng.normal(size=(G.N, 2)).astype(np.float32))

    rect = gsp.filters.Rectangular(G, band_min=0.1, band_max=0.3)
    c = cheby.cheby_coeff(rect.evaluate, G.lmax, m=30, dtype=jnp.float32)
    est = cheby.carry_error_estimate(c, jnp.bfloat16)
    assert est > 0.05          # this bank must trip the default gate
    with _pytest.raises(ValueError, match='refused'):
        cheby.cheby_op(L, G.lmax, c, x, carry_dtype=jnp.bfloat16)
    # explicit override runs
    out = cheby.cheby_op(L, G.lmax, c, x, carry_dtype=jnp.bfloat16,
                         carry_tol=1.0)
    assert np.isfinite(np.asarray(out)).all()

    # plain (non-chunked) formats refuse the knob outright
    with _pytest.raises(ValueError, match='chunked/windowed'):
        cheby.cheby_op(G.L, G.lmax, jnp.asarray(c, jnp.float64),
                       jnp.asarray(np.asarray(x), jnp.float64),
                       carry_dtype=jnp.bfloat16)


def test_bf16_carry_filter_api(rng):
    """Filter.filter(carry_dtype=...) end-to-end on a windowed graph."""
    import jax.numpy as jnp
    import pygsp_tpu as gsp

    G = gsp.graphs.BarabasiAlbert(600, m0=5, m=5, seed=4)
    G.estimate_lmax()
    G.compute_laplacian('combinatorial', fmt='windowed')
    g = gsp.filters.Heat(G, scale=[5.0, 20.0])
    s = rng.normal(size=(G.N,)).astype(np.float32)
    ref = np.asarray(g.filter(s, order=30))
    out = np.asarray(g.filter(s, order=30, carry_dtype=jnp.bfloat16))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1.5e-2


def test_bf16_carry_bound_holds():
    """The a-priori gate estimate sizes the measured bf16 bank error
    (BASELINE config 1: Logo + Heat(50), K=30 — the measured curves for
    all 4 configs live in BF16_ERRORS_r3.json). The estimate is a
    sizing bound, not a worst-case proof, so allow a 1.5x factor; a
    LOCAL rng keeps the draw independent of test order."""
    rng = np.random.default_rng(1234)
    import jax.numpy as jnp
    import pygsp_tpu as gsp
    from pygsp_tpu.core import windowed as cw
    from pygsp_tpu.core.operators import LaplacianOp
    from pygsp_tpu.ops import chebyshev as cheby

    G = gsp.graphs.Logo()
    G.estimate_lmax()
    W = G.W.tocsr()
    dw = np.ravel(W.sum(axis=1)).astype(np.float32)
    Wneg = W.copy().astype(np.float32)
    Wneg.data = -Wneg.data
    H = cw.windowed_from_scipy(Wneg, chunk_rows=512, window_rows=64)
    L = LaplacianOp(offdiag=H, diag=jnp.asarray(dw),
                    lap_type='combinatorial')
    g = gsp.filters.Heat(G, scale=50)
    c = cheby.cheby_coeff(g.evaluate, G.lmax, m=30, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(G.N, 4)).astype(np.float32))

    ref = np.asarray(cheby.cheby_op(L, G.lmax, c, x), np.float64)
    out = np.asarray(cheby.cheby_op(L, G.lmax, c, x,
                                    carry_dtype=jnp.bfloat16), np.float64)
    measured = np.abs(out - ref).max() / np.abs(ref).max()
    bound = cheby.carry_error_estimate(c, jnp.bfloat16)
    assert measured <= 1.5 * bound, (measured, bound)
    # and the measured error itself stays in the documented budget
    assert measured < 2.5e-2, measured


def test_borrow_span_packing(rng):
    """Span-K borrow chain (round 5): exact A@x parity and scipy
    roundtrip at spans 2/3/4, including forced-narrow slabs (heavy
    borrow + residue) and the sub-chunked inner-scan path."""
    import os
    import scipy.sparse as sps
    from pygsp_tpu.core.windowed import (windowed_from_scipy,
                                         windowed_spmm, windowed_to_scipy)

    A = sps.random(3000, 5000, density=2e-3, random_state=7,
                   format='csr')
    A.data[:] = rng.normal(size=A.nnz)
    x = rng.normal(size=(A.shape[1], 3))
    ref = A @ x
    for span in (2, 3, 4):
        m = windowed_from_scipy(A, chunk_rows=1024, slab_width=4,
                                borrow_span=span, permute=None)
        assert m.borrow_span == span
        y = np.asarray(windowed_spmm(m, jnp.asarray(x)))
        np.testing.assert_allclose(y, ref, atol=1e-12)
        assert abs(windowed_to_scipy(m) - A).max() < 1e-14

    # sub-chunked inner scan with the (K-1)-window carry strip
    os.environ['PYGSP_WINDOW_STEP'] = '4'
    try:
        m = windowed_from_scipy(A, chunk_rows=2048, slab_width=4,
                                borrow_span=4, permute=None)
        y = np.asarray(windowed_spmm(m, jnp.asarray(x)))
        np.testing.assert_allclose(y, ref, atol=1e-12)
    finally:
        del os.environ['PYGSP_WINDOW_STEP']


def test_auto_span_and_chunk_cap(rng):
    """Auto rules (round 5): dense blocks keep span 2; fragmented
    low-density blocks (lambda_w < 24) widen to span 4; auto_chunk_rows
    honors the bytes-true max_rows cap; invalid spans refuse."""
    import scipy.sparse as sps
    from pygsp_tpu.core.windowed import (auto_chunk_rows,
                                         windowed_from_scipy)

    dense = sps.random(2000, 2000, density=2e-2, random_state=1,
                       format='csr')
    dense.data[:] = 1.0
    assert windowed_from_scipy(dense).borrow_span == 2

    frag = sps.random(1 << 15, 1 << 15, density=6e-5, random_state=2,
                      format='csr')
    frag.data[:] = 1.0
    m = windowed_from_scipy(frag, chunk_rows=2048)
    assert m.borrow_span == 4

    assert auto_chunk_rows(10, 1 << 22, 1 << 22) == 1 << 16
    assert auto_chunk_rows(10, 1 << 22, 1 << 22,
                           max_rows=1 << 18) == 1 << 18

    with pytest.raises(ValueError, match='borrow_span'):
        windowed_from_scipy(dense, borrow_span=1)

    # P > 128 switches the row ids to uint16 (round 5: lambda_w doubles
    # with P on fragmented blocks) — parity must hold
    from pygsp_tpu.core.windowed import windowed_spmm
    m256 = windowed_from_scipy(frag, chunk_rows=2048, window_rows=256)
    assert m256.rowid.dtype == jnp.uint16
    x = np.random.default_rng(5).normal(size=(frag.shape[1], 2))
    np.testing.assert_allclose(np.asarray(windowed_spmm(m256, x)),
                               frag @ x, atol=1e-12)


def test_windowed_spmm_multi(rng):
    """Fused multi-matrix SpMM (round 5): Σ_m A_m @ x_m with per-matrix
    slab widths/source-chunk counts, against the per-matrix sum."""
    from pygsp_tpu.core.chunked import chunk_signal
    from pygsp_tpu.core.windowed import (windowed_from_scipy,
                                         windowed_spmm_chunks,
                                         windowed_spmm_chunks_multi)

    n_rows, n1, n2 = 1024, 640, 1280
    A1 = sps.random(n_rows, n1, density=8e-3, random_state=1,
                    format='csr')
    A1.data[:] = rng.normal(size=A1.nnz)
    A2 = sps.random(n_rows, n2, density=2e-3, random_state=2,
                    format='csr')
    A2.data[:] = rng.normal(size=A2.nnz)
    m1 = windowed_from_scipy(A1, chunk_rows=256, window_rows=32,
                             permute=None, borrow_span=2)
    m2 = windowed_from_scipy(A2, chunk_rows=256, window_rows=32,
                             permute=None, borrow_span=2)
    x1 = rng.normal(size=(n1, 3))
    x2 = rng.normal(size=(n2, 3))
    xc1 = chunk_signal(jnp.asarray(x1), 256)
    xc2 = chunk_signal(jnp.asarray(x2), 256)
    got = np.concatenate([np.asarray(c) for c in
                          windowed_spmm_chunks_multi([m1, m2],
                                                     [xc1, xc2])])
    want = A1 @ x1 + A2 @ x2
    np.testing.assert_allclose(got, want, atol=1e-12)

    # equals the sum of single-matrix folds exactly (same fold order)
    y1 = np.concatenate([np.asarray(c)
                         for c in windowed_spmm_chunks(m1, xc1)])
    y2 = np.concatenate([np.asarray(c)
                         for c in windowed_spmm_chunks(m2, xc2)])
    np.testing.assert_allclose(got, y1 + y2, atol=1e-13)

    # mismatched chunking refuses
    m3 = windowed_from_scipy(A2, chunk_rows=128, window_rows=32,
                             permute=None, borrow_span=2)
    with pytest.raises(ValueError, match='fused'):
        windowed_spmm_chunks_multi([m1, m3], [xc1, xc2])
