"""Filter zoo: kernel-response parity vs reference + method contracts.

Pattern follows the reference suite's shared `_test_filter_methods`
(``pygsp/tests/test_filters.py:41-84``): every filter class is exercised
through evaluate / analysis / synthesis, exact vs chebyshev; tight frames
must reconstruct perfectly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pygsp_tpu as gsp


@pytest.fixture(scope='module')
def pair(pygsp_ref):
    G = gsp.graphs.Logo()
    Gr = pygsp_ref.graphs.Logo()
    Gr.estimate_lmax()
    G._lmax = Gr.lmax
    G._lmax_method = 'pinned'
    return G, Gr


GRID = np.linspace(0, 13.92, 137)  # spans [0, lmax] incl. both edges


def _evaluate_parity(g, gr, atol=1e-8):
    ours = np.asarray(g.evaluate(jnp.asarray(GRID)))
    theirs = np.stack([k(GRID) for k in gr._kernels])
    assert ours.shape == theirs.shape
    assert np.allclose(ours, theirs, atol=atol), \
        f'max diff {np.abs(ours - theirs).max()}'


@pytest.mark.parametrize('name,kwargs', [
    ('Heat', dict(scale=[10, 50])),
    ('Heat', dict(scale=5, normalize=False)),
    ('Wave', dict(time=[5, 10], speed=[1])),
    ('MexicanHat', dict(Nf=6)),
    ('MexicanHat', dict(Nf=5, normalize=True)),
    ('Meyer', dict(Nf=6)),
    ('Itersine', dict(Nf=6)),
    ('SimpleTight', dict(Nf=6)),
    ('Abspline', dict(Nf=6)),
    ('HalfCosine', dict(Nf=6)),
    ('Regular', dict()),
    ('Regular', dict(degree=0)),
    ('Regular', dict(degree=5)),
    ('Held', dict()),
    ('Simoncelli', dict()),
    ('Papadakis', dict()),
    ('Expwin', dict()),
    ('Expwin', dict(band_min=0.1, band_max=0.7)),
    ('Expwin', dict(band_min=0.1, band_max=None)),
    ('Rectangular', dict(band_min=0.1, band_max=0.5)),
])
def test_kernel_parity(pair, pygsp_ref, name, kwargs):
    G, Gr = pair
    g = getattr(gsp.filters, name)(G, **kwargs)
    gr = getattr(pygsp_ref.filters, name)(Gr, **kwargs)
    assert g.Nf == gr.Nf
    _evaluate_parity(g, gr)


def test_heat_normalize_parity(pair, pygsp_ref):
    G, Gr = pair
    G.compute_fourier_basis()
    Gr.compute_fourier_basis()
    g = gsp.filters.Heat(G, scale=[5, 9], normalize=True)
    gr = pygsp_ref.filters.Heat(Gr, scale=[5, 9], normalize=True)
    _evaluate_parity(g, gr, atol=1e-8)


@pytest.mark.parametrize('name,kwargs,tight', [
    ('Heat', dict(scale=[10, 50]), False),
    ('Itersine', dict(Nf=6), True),
    ('MexicanHat', dict(Nf=4), False),
    ('Meyer', dict(Nf=4), True),
])
def test_filter_methods(pair, rng, name, kwargs, tight):
    """Contract harness: exact ≈ chebyshev(order=100); tight frames
    reconstruct: synthesize(analyze(s)) == A·s."""
    G, _ = pair
    G.compute_fourier_basis()
    g = getattr(gsp.filters, name)(G, **kwargs)
    A, B = g.estimate_frame_bounds()
    s = rng.normal(size=(G.N,))

    s_exact = np.asarray(g.filter(s, method='exact'))
    s_cheby = np.asarray(g.filter(s, method='chebyshev', order=100))
    assert np.allclose(s_exact, s_cheby, rtol=0.1, atol=0.01)

    if tight:
        assert np.isclose(A, B, rtol=1e-5)
        s_rec = np.asarray(g.synthesize(g.analyze(s, method='exact'),
                                        method='exact'))
        assert np.allclose(s_rec, A * s, atol=1e-8)
        s_rec_c = np.asarray(g.synthesize(g.analyze(s, order=100), order=100))
        assert np.allclose(s_rec_c, A * s, rtol=1e-3, atol=1e-3)


def test_complement_tightens(pair):
    G, _ = pair
    g = gsp.filters.MexicanHat(G, Nf=4)
    g2 = g + g.complement()
    A, B = g2.estimate_frame_bounds()
    assert np.isclose(A, B)


def test_inverse_is_pseudo_inverse(pair, rng):
    G, _ = pair
    G.compute_fourier_basis()
    g = gsp.filters.Itersine(G, Nf=5)
    h = g.inverse()
    s = rng.normal(size=(G.N,))
    coeffs = g.analyze(s, method='exact')
    rec = np.asarray(h.synthesize(coeffs, method='exact'))
    assert np.allclose(rec, s, atol=1e-8)


def test_localize_is_frame_row(pair):
    G, _ = pair
    G.compute_fourier_basis()
    g = gsp.filters.Heat(G, scale=5)
    i = 42
    loc = np.asarray(g.localize(i, method='exact'))
    gL = np.asarray(G.U) @ np.diag(np.asarray(g.evaluate(G.e))[0]) @ np.asarray(G.U).T
    assert np.allclose(loc, np.sqrt(G.N) * gL[:, i], atol=1e-8)


def test_gabor_modulation_small(pygsp_ref, rng):
    """Gabor & Modulation vs reference on a small graph."""
    W = rng.uniform(0.1, 1, (24, 24)) * (rng.uniform(size=(24, 24)) < 0.3)
    W = np.triu(W, 1)
    W = W + W.T
    G = gsp.graphs.Graph(W)
    Gr = pygsp_ref.graphs.Graph(W)
    G.compute_fourier_basis()
    Gr.compute_fourier_basis()
    np.testing.assert_allclose(np.asarray(G.e), Gr.e, atol=1e-8)

    # a random weighted graph has a generically simple spectrum; assert it
    # so the comparison below can never silently degrade
    assert np.min(np.diff(Gr.e)) > 1e-6

    # sign-align our eigenvectors to the reference's (eigh fixes each
    # simple eigenvector only up to sign; reference fourier.py:181-189)
    U = np.asarray(G.U)
    signs = np.sign(np.sum(U * Gr.U, axis=0))
    G._U = jnp.asarray(U * signs)

    mother = gsp.filters.Heat(G, scale=5)
    mother_r = pygsp_ref.filters.Heat(Gr, scale=5)
    s = rng.normal(size=(24,))

    gab = gsp.filters.Gabor(G, mother)
    gab_r = pygsp_ref.filters.Gabor(Gr, mother_r)
    out = np.asarray(gab.filter(s))
    out_r = gab_r.filter(s)
    assert out.shape == out_r.shape
    np.testing.assert_allclose(out, out_r, atol=1e-8)

    mod = gsp.filters.Modulation(G, mother)
    mod_r = pygsp_ref.filters.Modulation(Gr, mother_r)
    y = np.asarray(mod.filter(s))
    y_r = mod_r.filter(s)
    assert y.shape == y_r.shape
    np.testing.assert_allclose(y, y_r, atol=1e-8)


def test_filter_bank_ops(pair):
    G, _ = pair
    g = gsp.filters.Heat(G, scale=[5, 10])
    h = gsp.filters.Heat(G, scale=20)
    assert (g + h).Nf == 3
    assert g[0].Nf == 1
    assert len(g) == 2
    x = jnp.linspace(0, 13.0, 10)
    assert g(x).shape == (2, 10)


def test_approximations_facade_parity(pair, pygsp_ref, rng):
    """The pygsp-style free functions keep the reference's calling
    conventions and layouts."""
    from pygsp_tpu.filters import approximations as ap
    G, Gr = pair
    g = gsp.filters.Heat(G, scale=[5, 20])
    gr = pygsp_ref.filters.Heat(Gr, scale=[5, 20])

    c_list = ap.compute_cheby_coeff(g, m=20)
    c_ref = pygsp_ref.filters.approximations.compute_cheby_coeff(gr, m=20)
    assert len(c_list) == 2
    assert np.allclose(np.asarray(c_list[0]), c_ref[0], atol=1e-10)

    s = rng.normal(size=(G.N, 3))
    r = np.asarray(ap.cheby_op(G, np.stack([np.asarray(c) for c in c_list]), s))
    r_ref = pygsp_ref.filters.approximations.cheby_op(
        Gr, [np.asarray(c) for c in c_ref], s)
    assert r.shape == r_ref.shape      # stacked (N*Nf, Nv) layout
    assert np.allclose(r, r_ref, atol=1e-9)

    # our lanczos_op works (reference's is dead code) and uses the same
    # stacked layout
    out = np.asarray(ap.lanczos_op(g, s[:, 0], order=25))
    assert out.shape == (2 * G.N,)


def test_compute_frame_matches_reference(pygsp_ref, rng):
    W = rng.uniform(0.1, 1, (30, 30)) * (rng.uniform(size=(30, 30)) < 0.3)
    W = np.triu(W, 1); W = W + W.T
    G = gsp.graphs.Graph(W)
    Gr = pygsp_ref.graphs.Graph(W)
    G.compute_fourier_basis(); Gr.compute_fourier_basis()
    g = gsp.filters.Heat(G, scale=[3, 9])
    gr = pygsp_ref.filters.Heat(Gr, scale=[3, 9])
    ours = np.asarray(g.compute_frame(method='exact'))
    theirs = gr.compute_frame(method='exact')
    assert ours.shape == theirs.shape == (60, 30)
    assert np.allclose(ours, theirs, atol=1e-8)
