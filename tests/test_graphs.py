"""Graph core + model zoo tests (patterns from reference test_graphs.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

import pygsp_tpu as gsp
from pygsp_tpu import utils


def test_graph_validation():
    with pytest.raises(ValueError):
        gsp.graphs.Graph(np.ones((3, 4)))
    with pytest.raises(ValueError):
        gsp.graphs.Graph([[0, np.nan], [np.nan, 0]])
    with pytest.raises(ValueError):
        gsp.graphs.Graph([[0, np.inf], [np.inf, 0]])
    G = gsp.graphs.Graph([[0, 1], [1, 0]])
    with pytest.raises(AttributeError):
        G.W = np.eye(2)


def test_degrees_match_reference_convention():
    G = gsp.graphs.Graph([[0, 1, 0], [1, 0, 2], [0, 2, 0]])
    assert np.array_equal(G.d, [1, 2, 1])
    assert np.array_equal(G.dw, [1, 3, 2])
    Gd = gsp.graphs.Graph([[0, 1, 0], [0, 0, 2], [0, 2, 0]])
    assert np.allclose(Gd.d, [0.5, 1.5, 1.0])
    assert np.allclose(Gd.dw, [0.5, 2.5, 2.0])


def test_edge_count_and_list():
    G = gsp.graphs.Graph([[0, 3, 0], [3, 0, 4], [0, 4, 0]])
    assert G.n_edges == 2
    s, t, w = G.get_edge_list()
    assert list(s) == [0, 1] and list(t) == [1, 2] and list(w) == [3, 4]
    Gd = gsp.graphs.Graph([[0, 3, 0], [3, 0, 4], [0, 0, 0]])
    assert Gd.is_directed() and Gd.n_edges == 3


def test_laplacian_directed_symmetrization():
    Gd = gsp.graphs.Graph([[0, 2, 0], [0, 0, 1], [0, 0, 0]])
    L = np.asarray(Gd.L.to_dense())
    W_avg = np.array([[0, 1, 0], [1, 0, .5], [0, .5, 0]])
    L_ref = np.diag(W_avg.sum(1)) - W_avg
    assert np.allclose(L, L_ref)


def test_dirichlet_energy():
    G = gsp.graphs.Path(10)
    x = np.arange(10.0)
    # sum over edges w_ij (x_i - x_j)^2 = 9 for the unit-weight path
    assert np.isclose(float(G.dirichlet_energy(x)), 9.0)


def test_D_L_identity(rng):
    """L = D Dᵀ (doctest graph.py:582-586) via grad/div composition."""
    for lap_type in ('combinatorial', 'normalized'):
        G = gsp.graphs.Sensor(50, seed=1, lap_type=lap_type)
        G.compute_differential_operator()
        x = rng.normal(size=G.N)
        lhs = np.asarray(G.div(G.grad(x)))
        rhs = np.asarray(G.L.dot(x))
        assert np.allclose(lhs, rhs, atol=1e-10), lap_type


def test_subgraph_and_components():
    G = gsp.graphs.Graph([[0, 3, 0, 0], [3, 0, 4, 0], [0, 4, 0, 0],
                          [0, 0, 0, 0]])
    sub = G.subgraph([0, 1, 2])
    assert sub.N == 3 and sub.Ne == 2
    comps = G.extract_components()
    assert sorted(c.N for c in comps) == [1, 3]
    assert not G.is_connected()


def test_estimate_lmax_vs_true():
    G = gsp.graphs.FullConnected(10)  # lmax = N for full graph
    G.estimate_lmax(method='bounds')
    assert np.isclose(G.lmax, 10.0)
    G2 = gsp.graphs.FullConnected(10)
    G2.estimate_lmax(method='lanczos')
    assert 10.0 - 1e-6 <= G2.lmax <= 10.2
    # normalized Laplacian of bipartite graph has lmax = 2
    G3 = gsp.graphs.Path(10, lap_type='normalized')
    G3.estimate_lmax(method='bounds')
    assert np.isclose(G3.lmax, 2.0)


def test_gft_roundtrip(rng):
    G = gsp.graphs.Sensor(40, seed=3)
    G.compute_fourier_basis()
    s = rng.normal(size=(G.N, 3))
    rec = np.asarray(G.igft(G.gft(s)))
    assert np.allclose(rec, s, atol=1e-10)
    assert float(G.e[0]) == 0.0
    assert G.coherence < 1


def test_partial_fourier_basis_matches_eigsh():
    """LOBPCG partial path == ARPACK eigsh(which='SM') (the reference's
    partial eigensolver, fourier.py:171-175) on a mid-size graph."""
    import scipy.sparse.linalg as spl
    G = gsp.graphs.Sensor(2500, k=8, seed=3)
    from pygsp_tpu.ops.eigen import partial_fourier_basis
    e, U = partial_fourier_basis(G._L, 4)
    e, U = np.asarray(e), np.asarray(U)
    er, Ur = spl.eigsh(G._L.to_scipy(), 4, which='SM')
    assert np.allclose(e, er, atol=1e-6)
    # eigenvectors agree up to sign (sign-aligned comparison)
    align = np.abs(U.T @ Ur)
    assert np.allclose(np.diag(align), 1.0, atol=1e-4)


def test_compute_fourier_basis_partial_dispatch():
    """compute_fourier_basis(n_eigenvectors=k) on a large graph routes to
    the iterative solver and feeds eigenmap layouts."""
    G = gsp.graphs.Sensor(2500, k=8, seed=3)
    G.compute_fourier_basis(n_eigenvectors=3)
    assert np.asarray(G._U).shape == (2500, 3)
    assert float(G._e[0]) == 0.0
    G.set_coordinates('laplacian_eigenmap2D')
    assert G.coords.shape == (2500, 2)


ZOO = [
    ('Logo', dict(), 1130),
    ('Minnesota', dict(), 2642),
    ('Airfoil', dict(), 4253),
    ('Grid2d', dict(N1=5, N2=4), 20),
    ('Path', dict(N=12), 12),
    ('Ring', dict(N=12, k=2), 12),
    ('Torus', dict(Nv=4, Mv=5), 20),
    ('Comet', dict(N=15, k=4), 15),
    ('Star', dict(N=8), 8),
    ('FullConnected', dict(N=7), 7),
    ('LowStretchTree', dict(k=3), 64),
    ('RandomRing', dict(N=12, seed=1), 12),
    ('DavidSensorNet', dict(N=64), 64),
    ('StochasticBlockModel', dict(N=120, k=3, seed=2), 120),
    ('ErdosRenyi', dict(N=60, p=0.2, seed=2), 60),
    ('BarabasiAlbert', dict(N=60, seed=2), 60),
    ('RandomRegular', dict(N=20, k=4, seed=2), 20),
    ('Community', dict(N=80, seed=2), 80),
    ('SwissRoll', dict(N=60, seed=2), 60),
    ('Sensor', dict(N=30, seed=2), 30),
    ('Bunny', dict(), 2503),
    ('Cube', dict(nb_pts=60, seed=2), 60),
    ('Sphere', dict(nb_pts=60, seed=2), 60),
    ('TwoMoons', dict(), 2000),
]


@pytest.mark.parametrize('name,kwargs,n', ZOO)
def test_zoo_constructs(name, kwargs, n):
    G = getattr(gsp.graphs, name)(**kwargs)
    assert G.N == n
    assert G.W.shape == (n, n)
    assert G.Ne >= 0
    repr(G)


@pytest.mark.parametrize('name,kwargs', [
    ('Logo', dict()), ('Minnesota', dict()), ('Airfoil', dict()),
    ('Grid2d', dict(N1=5, N2=4)), ('Path', dict(N=12)),
    ('Torus', dict(Nv=4, Mv=5)), ('Comet', dict(N=15, k=4)),
    ('LowStretchTree', dict(k=3)), ('DavidSensorNet', dict(N=64)),
    ('Bunny', dict()),
])
def test_zoo_matches_reference(pygsp_ref, name, kwargs):
    """Deterministic generators must produce the exact same adjacency."""
    G = getattr(gsp.graphs, name)(**kwargs)
    Gr = getattr(pygsp_ref.graphs, name)(**kwargs)
    assert G.N == Gr.N and G.Ne == Gr.Ne
    # identical sparsity; values equal up to fp noise in kernel evaluation
    assert (abs(G.W - Gr.W) > 1e-6).nnz == 0
    if G.coords is not None and Gr.coords is not None:
        assert np.allclose(np.asarray(G.coords, dtype=float),
                           np.asarray(Gr.coords, dtype=float))


def test_linegraph_matches_reference(pygsp_ref):
    """LineGraph adjacency == reference (linegraph.py:34-53), including
    the coords midpoint convention."""
    G0 = gsp.graphs.Grid2d(4, 3)
    L = gsp.graphs.LineGraph(G0)
    Lr = pygsp_ref.graphs.LineGraph(pygsp_ref.graphs.Grid2d(4, 3))
    assert L.N == Lr.N == G0.n_edges
    assert (abs(L.W - Lr.W) > 1e-9).nnz == 0
    assert np.allclose(np.asarray(L.coords, float), Lr.coords)


def test_imgpatches_matches_reference(pygsp_ref):
    """ImgPatches == reference behavior (nngraphs/imgpatches.py:51-100).

    The reference's patch extraction requires scikit-image (absent here),
    so parity splits in two: (a) our stride-tricks extraction reproduces
    skimage's symmetric-pad patch vectors (hand-rolled oracle), (b) the
    kNN stage matches the reference's NNGraph on those same vectors."""
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(9, 11)).astype(np.float64)
    G = gsp.graphs.ImgPatches(img, patch_shape=(3, 3))
    assert G.N == img.size

    # (a) hand-rolled oracle: symmetric pad + 3x3 window per pixel
    padded = np.pad(img, 1, mode='symmetric')
    patches = np.stack([
        padded[i:i + 3, j:j + 3].ravel()
        for i in range(img.shape[0]) for j in range(img.shape[1])])
    # (b) the kNN stage == reference NNGraph on identical vectors
    Gr = pygsp_ref.graphs.NNGraph(patches, NNtype='knn', k=10)
    assert np.allclose(G.W.toarray(), Gr.W.toarray(), atol=1e-10)


def test_grid2dimgpatches_constructs(pygsp_ref):
    """Aggregated grid + patch graph (nngraphs/grid2dimgpatches.py:37-42):
    W = Wp + Wg with the grid's coords. (Reference class needs skimage,
    absent here; the aggregation contract is checked directly.)"""
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(7, 8)).astype(np.float64)
    G = gsp.graphs.Grid2dImgPatches(img)
    Gg = gsp.graphs.Grid2d(7, 8)
    Gp = gsp.graphs.ImgPatches(img)
    assert G.N == img.size
    assert np.allclose(G.W.toarray(), (Gp.W + Gg.W).toarray(), atol=1e-12)
    assert np.allclose(np.asarray(G.coords, float),
                       np.asarray(Gg.coords, float))


def test_ring_matches_reference(pygsp_ref):
    # 2k < N cases match the reference exactly.  The 2k == N case is NOT
    # compared: the reference's antipodal branch is buggy (it assigns
    # i_inds twice and never j_inds, ring.py:82-84, producing self-loops);
    # ours builds the correct antipodal ring (checked below).
    for k in (1, 3, 5):
        G = gsp.graphs.Ring(12, k=k)
        Gr = pygsp_ref.graphs.Ring(12, k=k)
        assert abs(G.W - Gr.W).max() < 1e-12, k
    G = gsp.graphs.Ring(12, k=6)
    assert not G.has_loops()
    assert np.all(G.d == 11)
    assert G.Ne == 12 * 5 + 6


def test_sbm_statistics():
    """Vectorized SBM must match the ensemble statistics."""
    G = gsp.graphs.StochasticBlockModel(N=600, k=3, p=0.5, q=0.05, seed=0)
    z = G.z
    W = G.W.toarray()
    for a in range(3):
        for b in range(3):
            block = W[np.ix_(z == a, z == b)]
            if a == b:
                density = block.sum() / (block.shape[0] * (block.shape[0] - 1))
                assert abs(density - 0.5) < 0.05
            else:
                density = block.mean()
                assert abs(density - 0.05) < 0.02


def test_ba_power_law():
    G = gsp.graphs.BarabasiAlbert(N=2000, seed=0)
    d = G.d
    assert G.Ne == 1999           # tree: N-1 edges for m=1
    assert d.max() > 20           # hubs exist under preferential attachment


def test_random_regular_is_regular():
    G = gsp.graphs.RandomRegular(N=30, k=4, seed=0)
    assert np.all(G.d == 4)


def test_networkx_roundtrip(rng):
    G = gsp.graphs.Sensor(20, seed=1)
    G.set_signal('sig', rng.normal(size=20))
    nxg = G.to_networkx()
    G2 = gsp.graphs.Graph.from_networkx(nxg)
    assert np.allclose(G2.W.toarray(), G.W.toarray())
    assert np.allclose(G2.signals['sig'], G.signals['sig'])


def test_save_load_roundtrip(tmp_path, rng):
    G = gsp.graphs.Sensor(15, seed=1)
    G.set_signal('x', rng.normal(size=15))
    path = str(tmp_path / 'g.graphml')
    G.save(path)
    G2 = gsp.graphs.Graph.load(path)
    assert np.allclose(G2.W.toarray(), G.W.toarray(), atol=1e-12)


def test_set_coordinates():
    G = gsp.graphs.Ring(10)
    for kind in ('line1D', 'line2D', 'ring2D', 'random2D', 'random3D',
                 'spring', 'laplacian_eigenmap2D', 'laplacian_eigenmap3D'):
        G.set_coordinates(kind, seed=42)
        assert G.coords.shape[0] == 10
    with pytest.raises(ValueError):
        G.set_coordinates('bogus')


def test_symmetrize_methods():
    W = np.array([[0, 3, 0], [3, 1, 6], [4, 2, 3]], dtype=float)
    assert np.allclose(utils.symmetrize(W, 'average'),
                       [[0, 3, 2], [3, 1, 4], [2, 4, 3]])
    assert np.allclose(utils.symmetrize(W, 'maximum'),
                       [[0, 3, 4], [3, 1, 6], [4, 6, 3]])
    assert np.allclose(utils.symmetrize(W, 'fill'),
                       [[0, 3, 4], [3, 1, 4], [4, 4, 3]])
    assert np.allclose(utils.symmetrize(W, 'tril'),
                       [[0, 3, 4], [3, 1, 2], [4, 2, 3]])
    assert np.allclose(utils.symmetrize(W, 'triu'),
                       [[0, 3, 0], [3, 1, 6], [0, 6, 3]])


def test_checkpoint_roundtrip(tmp_path, rng):
    from pygsp_tpu import checkpoint
    G = gsp.graphs.Sensor(40, seed=4)
    G.compute_fourier_basis()
    G.set_signal('s', rng.normal(size=(40, 2)))
    path = str(tmp_path / 'g.npz')
    checkpoint.save_graph(path, G)
    G2 = checkpoint.load_graph(path)
    assert np.allclose(G2.W.toarray(), G.W.toarray())
    assert np.isclose(G2.lmax, G.lmax)
    assert np.allclose(np.asarray(G2.U), np.asarray(G.U))
    assert np.allclose(G2.signals['s'], G.signals['s'])


def test_sharded_checkpoint_roundtrip(tmp_path, rng):
    from pygsp_tpu import checkpoint
    from pygsp_tpu.parallel import partition_graph
    G = gsp.graphs.Sensor(60, seed=5)
    sg = partition_graph(G.W, 4)
    prefix = str(tmp_path / 'shard')
    checkpoint.save_sharded(prefix, sg)
    sg2 = checkpoint.load_sharded(prefix)
    assert sg2.n_shards == sg.n_shards and sg2.n_local == sg.n_local
    assert np.allclose(np.asarray(sg2.vals), np.asarray(sg.vals))
    x = rng.normal(size=G.N)
    assert np.allclose(np.asarray(sg2.unpad_signal(sg2.pad_signal(x))), x)


def test_hybrid_fmt_graph(rng):
    from pygsp_tpu.core.sparse import ELLMatrix
    G = gsp.graphs.Sensor(50, seed=6)
    G.compute_laplacian('combinatorial', fmt='hybrid')
    assert isinstance(G.L.offdiag, ELLMatrix)
    x = rng.normal(size=G.N)
    G2 = gsp.graphs.Sensor(50, seed=6)
    assert np.allclose(np.asarray(G.L.dot(x)), np.asarray(G2.L.dot(x)),
                       atol=1e-10)


def test_throughput_meter():
    from pygsp_tpu.profiling import Throughput
    meter = Throughput(n_edges=100, k_order=3, n_signals=2)
    with meter:
        sum(range(1000))
    rep = meter.report()
    assert rep['edge_ops'] == 600 and rep['runs'] == 1


def test_process_shard_range():
    from pygsp_tpu.parallel import launch
    lo, hi = launch.process_shard_range(100)
    assert (lo, hi) == (0, 100)  # single process owns everything
    import pytest as _pytest
    with _pytest.raises(ValueError):
        launch.global_mesh(n_graph=1000, n_batch=1000)


def test_ba_fast_ensemble():
    from pygsp_tpu.graphs.barabasialbert import ba_edges, ba_edges_fast
    import numpy as np
    N, m = 5000, 4
    s1, t1 = ba_edges(N, m, m, seed=1)
    s2, t2 = ba_edges_fast(N, m, m, seed=1)
    d1 = np.bincount(s1, minlength=N) + np.bincount(t1, minlength=N)
    d2 = np.bincount(s2, minlength=N) + np.bincount(t2, minlength=N)
    assert len(s2) == (N - m) * m
    assert (t2 >= 0).all() and (t2 < s2).all()   # targets precede sources
    # log-binned degree distributions agree within sampling noise
    for lo, hi in ((4, 8), (8, 16), (16, 32), (32, 64)):
        c1 = ((d1 >= lo) & (d1 < hi)).sum()
        c2 = ((d2 >= lo) & (d2 < hi)).sum()
        assert abs(c1 - c2) < 0.1 * max(c1, c2) + 50, (lo, hi, c1, c2)


@pytest.mark.parametrize('fmt', ['graphml', 'gml', 'gexf'])
def test_save_load_all_formats(tmp_path, rng, fmt):
    G = gsp.graphs.Sensor(12, seed=2)
    G.set_signal('x', rng.normal(size=12))
    path = str(tmp_path / f'g.{fmt}')
    G.save(path)
    G2 = gsp.graphs.Graph.load(path)
    assert np.allclose(G2.W.toarray(), G.W.toarray(), atol=1e-6)


def test_save_load_backend_routing(tmp_path):
    """Reference backend routing (``_io.py:375-556``): explicit
    'networkx' works, explicit 'graph-tool' raises ImportError when the
    optional dependency is absent (or round-trips when present), and an
    unknown backend raises ValueError."""
    G = gsp.graphs.Sensor(10, seed=3)
    path = str(tmp_path / 'g.graphml')
    G.save(path, backend='networkx')
    G2 = gsp.graphs.Graph.load(path, backend='networkx')
    assert np.allclose(G2.W.toarray(), G.W.toarray(), atol=1e-6)
    try:
        import graph_tool  # noqa: F401
        G.save(str(tmp_path / 'gt.graphml'), backend='graph-tool')
        G3 = gsp.graphs.Graph.load(str(tmp_path / 'gt.graphml'),
                                   backend='graph-tool')
        assert np.allclose(G3.W.toarray(), G.W.toarray(), atol=1e-6)
    except ImportError:
        with pytest.raises(ImportError):
            G.save(str(tmp_path / 'gt.graphml'), backend='graph-tool')
        with pytest.raises(ImportError):
            gsp.graphs.Graph.load(path, backend='graph-tool')
    with pytest.raises(ValueError, match='backend'):
        G.save(path, backend='bogus')
    with pytest.raises(ValueError, match='backend'):
        gsp.graphs.Graph.load(path, backend='bogus')


def test_fast_laplacian_hint(monkeypatch):
    """Filtering a big graph still in COO format logs a one-time hint to
    opt into the TPU fast path; small graphs and converted formats don't."""
    import logging

    from pygsp_tpu.core import chunked

    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    handler = Capture(level=logging.WARNING)
    logger = logging.getLogger('pygsp_tpu.graphs.graph')
    logger.addHandler(handler)
    try:
        s = np.ones(48)
        G = gsp.graphs.Sensor(48, seed=3)
        G.estimate_lmax()
        gsp.filters.Heat(G, scale=5).filter(s)
        assert not any('fast path' in m for m in records)  # small: quiet

        monkeypatch.setattr(chunked, 'CHUNK_ROWS', 16)     # make 48 "big"
        G2 = gsp.graphs.Sensor(48, seed=3)
        G2.estimate_lmax()
        g2 = gsp.filters.Heat(G2, scale=5)
        g2.filter(s)
        assert sum('fast path' in m for m in records) == 1
        g2.filter(s)                                       # hint is one-time
        assert sum('fast path' in m for m in records) == 1

        G2.compute_laplacian('combinatorial', fmt='hybrid')
        G2._fmt_hinted = False
        g2.filter(s)                                       # non-COO: quiet
        assert sum('fast path' in m for m in records) == 1
    finally:
        logger.removeHandler(handler)
