"""Algorithms-layer tests (learning / reduction / features / optimization)."""

import jax.numpy as jnp
import numpy as np
import pytest

import pygsp_tpu as gsp
from pygsp_tpu import learning, reduction, features, optimization, utils


@pytest.fixture(scope='module')
def sensor():
    G = gsp.graphs.Sensor(100, seed=42)
    G.estimate_lmax()
    return G


def test_sketched_resistances_match_exact(sensor):
    G = sensor
    s, t, R = reduction.effective_resistances_sketch(G, n_probes=300, seed=1)
    Rd = np.asarray(utils.resistance_distance(G).todense())
    exact = Rd[s, t]
    rel = np.abs(R - exact) / np.maximum(exact, 1e-12)
    # JL error ~ 1/sqrt(k); with k=300 the median error is small
    assert np.median(rel) < 0.15
    assert np.corrcoef(R, exact)[0, 1] > 0.93


def test_graph_sparsify_sketch(sensor):
    G = sensor
    H = reduction.graph_sparsify_sketch(G, 0.5, seed=3)
    assert H.N == G.N
    assert H.is_connected()
    assert H.Ne <= G.Ne * 3  # reweighted subsample, not densified


def test_kron_elimination_spectrally_close():
    """Star-mesh elimination Schur ~ exact Schur in quadratic forms, at a
    fraction of the edges (the large-graph pyramid path)."""
    G = gsp.graphs.Sensor(600, k=8, seed=5)
    keep = np.arange(0, G.N, 2)
    Ge = reduction.kron_reduction(G, keep, method='exact')
    Ga = reduction.kron_reduction(G, keep, method='eliminate', seed=0)
    X = np.random.default_rng(0).normal(size=(len(keep), 16))
    qe = np.einsum('ik,ik->k', X, np.asarray(Ge.L.to_scipy() @ X))
    qa = np.einsum('ik,ik->k', X, np.asarray(Ga.L.to_scipy() @ X))
    assert np.all(np.abs(qa / qe - 1.0) < 0.1)
    assert Ga.n_edges < Ge.n_edges / 4


def test_kron_elimination_slack_ground():
    """Diagonal slack (eps*I regularization) routes through the virtual
    ground vertex: quadratic forms of Schur(L + eps I) stay unbiased."""
    import scipy.sparse as sps
    G = gsp.graphs.Sensor(400, k=8, seed=5)
    L = sps.csr_matrix(G.L.to_scipy()) + 0.005 * sps.eye(G.N)
    keep = np.arange(0, G.N, 2)
    Ke = reduction.kron_reduction(L, keep, method='exact')
    Ka = reduction.kron_reduction(L, keep, method='eliminate', seed=0)
    x = np.random.default_rng(0).normal(size=len(keep))
    assert abs((x @ (Ka @ x)) / (x @ (Ke @ x)) - 1.0) < 0.05


def test_graph_sparsify_size_dispatch(monkeypatch):
    """graph_sparsify uses the CG sketch above the dense-resistance
    threshold (no dense pinv on large graphs)."""
    G = gsp.graphs.Sensor(150, k=6, seed=2)
    monkeypatch.setattr(reduction, '_DENSE_RESISTANCE_MAX', 100)

    def boom(*a, **k):
        raise AssertionError('dense resistance path used on large graph')

    monkeypatch.setattr(utils, 'resistance_distance', boom)
    H = reduction.graph_sparsify(G, 0.6, seed=3, n_probes=64)
    assert H.N == G.N and H.is_connected()


def test_regression_tikhonov_matches_reference(pygsp_ref, sensor, rng):
    G = sensor
    Gr = pygsp_ref.graphs.Graph(G.W)
    sig = np.asarray(G.coords[:, 0])
    M = rng.uniform(size=G.N) > 0.5
    y = np.where(M, sig, 0.0)
    ours = np.asarray(learning.regression_tikhonov(G, y.copy(), M, tau=0.2))
    theirs = pygsp_ref.learning.regression_tikhonov(Gr, y.copy(), M, tau=0.2)
    assert np.allclose(ours, theirs, atol=1e-4)
    ours0 = np.asarray(learning.regression_tikhonov(G, y.copy(), M, tau=0))
    theirs0 = pygsp_ref.learning.regression_tikhonov(Gr, y.copy(), M, tau=0)
    assert np.allclose(ours0, theirs0, atol=1e-5)


def test_classification_matches_reference(pygsp_ref, sensor, rng):
    G = sensor
    Gr = pygsp_ref.graphs.Graph(G.W)
    labels = (np.asarray(G.coords[:, 0]) > 0.5).astype(int)
    M = rng.uniform(size=G.N) > 0.4
    y = np.where(M, labels, 0)
    ours = np.asarray(learning.classification_tikhonov(G, y.copy(), M, tau=0.1))
    theirs = pygsp_ref.learning.classification_tikhonov(Gr, y.copy(), M,
                                                        tau=0.1)
    assert np.allclose(ours, theirs, atol=1e-4)


def test_kron_matches_reference(pygsp_ref, sensor):
    G = sensor
    # the reference's kron_reduction requires coords (it indexes G.coords
    # unconditionally, reduction.py:374)
    Gr = pygsp_ref.graphs.Graph(G.W, coords=G.coords)
    ind = np.arange(0, G.N, 2)
    ours = reduction.kron_reduction(G, ind)
    theirs = pygsp_ref.reduction.kron_reduction(Gr, ind)
    assert np.allclose(ours.W.toarray(), theirs.W.toarray(), atol=1e-8)


def test_interpolate_matches_reference(pygsp_ref, rng):
    G = gsp.graphs.Sensor(64, seed=7)
    G.estimate_lmax()
    Gr = pygsp_ref.graphs.Graph(G.W)
    Gr.mr = None      # reference interpolate reads G.mr unconditionally
    Gr.estimate_lmax()
    G._lmax = Gr.lmax
    keep = np.arange(0, 64, 2)
    f_sub = rng.normal(size=len(keep))
    ours = np.asarray(reduction.interpolate(G, f_sub, keep, order=60))
    theirs = pygsp_ref.reduction.interpolate(Gr, f_sub, keep, order=60)
    assert np.allclose(ours.squeeze(), theirs.squeeze(), atol=1e-6)


def test_avg_adj_deg_matches_reference(pygsp_ref, sensor):
    G = sensor
    Gr = pygsp_ref.graphs.Graph(G.W)
    ours = np.asarray(features.compute_avg_adj_deg(G))
    theirs = np.asarray(pygsp_ref.features.compute_avg_adj_deg(Gr)).ravel()
    assert np.allclose(ours, theirs, atol=1e-8)


def test_prox_tv_denoises(sensor, rng):
    G = sensor
    sig = (np.asarray(G.coords[:, 0]) > 0.5).astype(float)
    noisy = sig + 0.3 * rng.normal(size=G.N)
    den = np.asarray(optimization.prox_tv(noisy, 0.3, G))
    assert np.linalg.norm(den - sig) < np.linalg.norm(noisy - sig)
