"""Chebyshev engine tests: parity with the reference per order and output."""

import jax.numpy as jnp
import numpy as np
import pytest

import pygsp_tpu as gsp
from pygsp_tpu.ops import chebyshev as cheby


@pytest.fixture(scope='module')
def logo_pair(pygsp_ref):
    G = gsp.graphs.Logo()
    Gr = pygsp_ref.graphs.Logo()
    Gr.estimate_lmax()
    G._lmax = Gr.lmax          # pin identical lmax → per-order parity
    G._lmax_method = 'pinned'
    return G, Gr


def test_cheby_coeff_parity(logo_pair, pygsp_ref):
    G, Gr = logo_pair
    g = gsp.filters.Heat(G, scale=[10, 50])
    gr = pygsp_ref.filters.Heat(Gr, scale=[10, 50])
    c = np.asarray(cheby.cheby_coeff(g.evaluate, G.lmax, m=30))
    c_ref = np.stack(pygsp_ref.filters.approximations.compute_cheby_coeff(gr, m=30))
    assert np.allclose(c, c_ref, atol=1e-12)


def test_cheby_op_per_order_parity(logo_pair, pygsp_ref, rng):
    """BASELINE correctness target: per-Chebyshev-order intermediates
    allclose to the reference given the same lmax."""
    G, Gr = logo_pair
    s = rng.normal(size=(G.N,))
    g = gsp.filters.Heat(G, scale=50)
    c = np.asarray(cheby.cheby_coeff(g.evaluate, G.lmax, m=30))

    _, terms = cheby.cheby_op_intermediates(G.L, G.lmax, jnp.asarray(c),
                                            jnp.asarray(s))
    terms = np.asarray(terms)

    # reference recurrence, replayed manually with scipy
    a1 = a2 = Gr.lmax / 2
    t_old, t_cur = s, (Gr.L.dot(s) - a2 * s) / a1
    assert np.allclose(terms[0], t_old, atol=1e-12)
    assert np.allclose(terms[1], t_cur, atol=1e-12)
    for k in range(2, 31):
        t_new = 2 / a1 * (Gr.L.dot(t_cur) - a2 * t_cur) - t_old
        assert np.allclose(terms[k], t_new, atol=1e-9), f'order {k}'
        t_old, t_cur = t_cur, t_new


@pytest.mark.parametrize('shape', [(), (7,), (3, 1)])
def test_filter_output_parity(logo_pair, pygsp_ref, rng, shape):
    G, Gr = logo_pair
    s = rng.normal(size=(G.N,) + shape)
    g = gsp.filters.Heat(G, scale=[10, 50])
    gr = pygsp_ref.filters.Heat(Gr, scale=[10, 50])
    out = np.asarray(g.filter(s, method='chebyshev', order=30))
    out_ref = gr.filter(s, method='chebyshev', order=30)
    assert out.shape == out_ref.shape
    assert np.allclose(out, out_ref, atol=1e-12)


def test_synthesis_parity(logo_pair, pygsp_ref, rng):
    G, Gr = logo_pair
    g = gsp.filters.Heat(G, scale=[5, 10, 20])
    gr = pygsp_ref.filters.Heat(Gr, scale=[5, 10, 20])
    s = rng.normal(size=(G.N, 2, 3))
    out = np.asarray(g.synthesize(s, order=30))
    out_ref = gr.synthesize(s, order=30)
    assert out.shape == out_ref.shape
    assert np.allclose(out, out_ref, atol=1e-11)


def test_cheby_rect_parity(logo_pair, pygsp_ref, rng):
    G, Gr = logo_pair
    s = rng.normal(size=(G.N,))
    out = np.asarray(cheby.cheby_rect(G.L, G.lmax, [0.5, 3.0],
                                      jnp.asarray(s), order=30))
    out_ref = pygsp_ref.filters.approximations.cheby_rect(
        Gr, [0.5, 3.0], s, order=30)
    # XLA's arccos/sin differ from libm by ~1 ulp; the k·b1 arguments of the
    # analytic coefficients amplify that to ~1e-8 over 30 orders.
    assert np.allclose(out, out_ref, atol=1e-6)


def test_jackson_coeff_parity(pygsp_ref):
    ch, jch = cheby.jackson_cheby_coeff([0.5, 3.0], [0.0, 13.9], 30)
    ch_ref, jch_ref = pygsp_ref.filters.approximations.compute_jackson_cheby_coeff(
        [0.5, 3.0], [0.0, 13.9], 30)
    assert np.allclose(np.asarray(ch), ch_ref, atol=1e-12)
    assert np.allclose(np.asarray(jch), jch_ref, atol=1e-12)


def test_lanczos_matches_exact(logo_pair, rng):
    G, _ = logo_pair
    G.compute_fourier_basis()
    g = gsp.filters.Heat(G, scale=[10, 50])
    s = rng.normal(size=(G.N,))
    out_l = np.asarray(g.filter(s, method='lanczos', order=30))
    out_e = np.asarray(g.filter(s, method='exact'))
    assert np.allclose(out_l, out_e, atol=1e-6)


def test_lmax_estimation(logo_pair):
    G, Gr = logo_pair
    G2 = gsp.graphs.Logo()
    G2.estimate_lmax(method='lanczos')
    Gr.compute_fourier_basis()
    true_lmax = float(Gr.e[-1])
    # same contract as the reference: estimate in [lmax, 1.01*ub]
    assert true_lmax <= G2.lmax * 1.0 + 1e-9
    assert G2.lmax <= 1.02 * true_lmax
    G3 = gsp.graphs.Logo()
    G3.estimate_lmax(method='bounds')
    Gr2 = type(Gr)()
    Gr2.estimate_lmax(method='bounds')
    assert np.isclose(G3.lmax, Gr2.lmax)


def test_cheby_op_fixed_graph_grads(rng):
    """Constant-memory VJP == plain autodiff for grads wrt c and x."""
    import jax
    G = gsp.graphs.Sensor(120, seed=2)
    G.estimate_lmax()
    x = jnp.asarray(rng.normal(size=(G.N, 3)))
    g = gsp.filters.Heat(G, scale=[4.0, 9.0])
    c = cheby.cheby_coeff(g.evaluate, G.lmax, m=12)
    L, lmax = G.L, G.lmax

    assert np.allclose(np.asarray(cheby.cheby_op(L, lmax, c, x)),
                       np.asarray(cheby.cheby_op_fixed_graph(L, lmax, c, x)),
                       atol=1e-12)

    t = jnp.asarray(rng.normal(size=(c.shape[0], G.N, 3)))

    def make(fn):
        return jax.grad(lambda c_, x_: jnp.sum(fn(L, lmax, c_, x_) * t),
                        argnums=(0, 1))

    gc1, gx1 = make(cheby.cheby_op)(c, x)
    gc2, gx2 = make(cheby.cheby_op_fixed_graph)(c, x)
    assert np.allclose(np.asarray(gc1), np.asarray(gc2), atol=1e-12)
    assert np.allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-12)

    # 1-D coefficient vector keeps its primal shape in the cotangent
    gc3 = jax.grad(lambda c_: jnp.sum(
        cheby.cheby_op_fixed_graph(L, lmax, c_, x[:, 0]) ** 2))(c[0])
    assert gc3.shape == c[0].shape


def test_cheby_op_fixed_graph_windowed(rng):
    """Constant-memory VJP on the windowed (large-graph) operator format."""
    import jax
    from pygsp_tpu.core import windowed as cw
    from pygsp_tpu.core.operators import LaplacianOp

    G = gsp.graphs.BarabasiAlbert(400, m0=4, m=4, seed=5)
    G.estimate_lmax()
    W = G.W.tocsr()
    dw = np.ravel(W.sum(axis=1))
    Wneg = W.copy()
    Wneg.data = -Wneg.data
    H = cw.windowed_from_scipy(Wneg, chunk_rows=128, window_rows=64)
    Lw = LaplacianOp(offdiag=H, diag=jnp.asarray(dw),
                     lap_type='combinatorial')
    x = jnp.asarray(rng.normal(size=(G.N, 3)))
    c = cheby.cheby_coeff(gsp.filters.Heat(G, scale=[4.0, 9.0]).evaluate,
                          G.lmax, m=10)
    t = jnp.asarray(rng.normal(size=(2, G.N, 3)))

    def make(fn, L):
        return jax.grad(lambda c_, x_: jnp.sum(fn(L, G.lmax, c_, x_) * t),
                        argnums=(0, 1))

    gc1, gx1 = make(cheby.cheby_op, G.L)(c, x)
    gc2, gx2 = make(cheby.cheby_op_fixed_graph, Lw)(c, x)
    assert np.allclose(np.asarray(gc1), np.asarray(gc2), atol=1e-12)
    assert np.allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-12)


def test_cheby_synthesis_windowed_parity(rng):
    """Forward synthesis on the windowed operator == dense-path synthesis
    (the chunked dispatch added for constant-memory training)."""
    from pygsp_tpu.core import windowed as cw
    from pygsp_tpu.core.operators import LaplacianOp

    G = gsp.graphs.BarabasiAlbert(500, m0=4, m=4, seed=11)
    G.estimate_lmax()
    W = G.W.tocsr()
    dw = np.ravel(W.sum(axis=1))
    Wneg = W.copy()
    Wneg.data = -Wneg.data
    H = cw.windowed_from_scipy(Wneg, chunk_rows=128, window_rows=64)
    Lw = LaplacianOp(offdiag=H, diag=jnp.asarray(dw),
                     lap_type='combinatorial')
    c = cheby.cheby_coeff(gsp.filters.Heat(G, scale=[3.0, 8.0]).evaluate,
                          G.lmax, m=12)
    bank = jnp.asarray(rng.normal(size=(G.N, 4, 2)))   # (N, S, Nf)
    y_w = np.asarray(cheby.cheby_synthesis(Lw, G.lmax, c, bank))
    y_d = np.asarray(cheby.cheby_synthesis(G.L, G.lmax, c, bank))
    assert np.allclose(y_w, y_d, atol=1e-12)
