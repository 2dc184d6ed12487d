"""Multi-device tests on the virtual 8-CPU mesh: sharded == unsharded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pygsp_tpu as gsp
from pygsp_tpu.core import sparse as core_sparse
from pygsp_tpu.core.operators import laplacian_op, matvec
from pygsp_tpu.ops import chebyshev as cheby
from pygsp_tpu.parallel import (ShardedGraph, make_mesh, partition_graph,
                                sharded_cheby_op, sharded_matvec)


requires_multi = pytest.mark.skipif(len(jax.devices()) < 8,
                                    reason='needs 8 virtual devices')


@pytest.fixture(scope='module', params=['combinatorial', 'normalized'])
def problem(request, pygsp_ref):
    lap_type = request.param
    G = gsp.graphs.Sensor(200, seed=7, lap_type=lap_type)
    rng = np.random.default_rng(11)
    x = rng.normal(size=(G.N, 4))
    return G, x, lap_type


@requires_multi
@pytest.mark.parametrize('n_graph,n_batch', [(8, 1), (4, 2)])
@pytest.mark.parametrize('reorder', ['rcm'])
def test_sharded_matvec_matches(problem, n_graph, n_batch, reorder):
    # (2,2) mesh and reorder='none' are covered by the SBM/e2e paths;
    # each extra variant is another multi-minute shard_map compile on CPU
    G, x, lap_type = problem
    sg = partition_graph(G.W, n_graph, lap_type=lap_type, reorder=reorder)
    mesh = make_mesh(n_graph, n_batch)
    xp = sg.pad_signal(x)
    y = sharded_matvec(sg, xp, mesh)
    got = np.asarray(sg.unpad_signal(y))
    want = np.asarray(matvec(G.L, jnp.asarray(x)))
    assert np.allclose(got, want, atol=1e-10)


@requires_multi
def test_sharded_cheby_matches(problem):
    G, x, lap_type = problem
    G.estimate_lmax()
    g = gsp.filters.Heat(G, scale=[5, 20])
    c = cheby.cheby_coeff(g.evaluate, G.lmax, m=30)

    ref = np.asarray(cheby.cheby_op(G.L, G.lmax, c, jnp.asarray(x)))

    sg = partition_graph(G.W, 4, lap_type=lap_type)
    mesh = make_mesh(4, 2)
    xp = sg.pad_signal(x)
    out = sharded_cheby_op(sg, G.lmax, c, xp, mesh)
    got = np.stack([np.asarray(sg.unpad_signal(out[f]))
                    for f in range(out.shape[0])])
    assert np.allclose(got, ref, atol=1e-9)


@requires_multi
def test_sharded_cheby_1d_signal(problem):
    G, x, lap_type = problem
    G.estimate_lmax()
    g = gsp.filters.Heat(G, scale=10)
    c = cheby.cheby_coeff(g.evaluate, G.lmax, m=20)
    ref = np.asarray(cheby.cheby_op(G.L, G.lmax, c, jnp.asarray(x[:, 0])))
    sg = partition_graph(G.W, 8, lap_type=lap_type)
    mesh = make_mesh(8, 1)
    out = sharded_cheby_op(sg, G.lmax, c, sg.pad_signal(x[:, 0]), mesh)
    got = np.asarray(sg.unpad_signal(out[0]))
    assert np.allclose(got, ref[0] if ref.ndim > 1 else ref, atol=1e-9)


@requires_multi
def test_sharded_autodiff(problem):
    """Gradients flow through the halo exchange + scan (training use-case)."""
    G, x, lap_type = problem
    G.estimate_lmax()
    sg = partition_graph(G.W, 4, lap_type=lap_type)
    mesh = make_mesh(4, 2)
    xp = sg.pad_signal(x)
    lmax = G.lmax

    def loss(scale):
        def ev(lam):
            return jnp.exp(-scale * lam / lmax)[None, :] * jnp.ones((1, 1))
        c = cheby.cheby_coeff(lambda lam: jnp.exp(-scale * lam / lmax)[None],
                              lmax, m=10)
        out = sharded_cheby_op(sg, lmax, c, xp, mesh)
        return jnp.sum(out ** 2)

    g1 = jax.grad(loss)(5.0)
    # finite difference check
    eps = 1e-4
    fd = (loss(5.0 + eps) - loss(5.0 - eps)) / (2 * eps)
    assert np.isclose(float(g1), float(fd), rtol=1e-3)


def test_partition_roundtrip_signal():
    G = gsp.graphs.Sensor(100, seed=3)
    sg = partition_graph(G.W, 4)
    x = np.random.default_rng(0).normal(size=(G.N, 3))
    rec = np.asarray(sg.unpad_signal(sg.pad_signal(x)))
    assert np.allclose(rec, x)


def test_single_shard_matches():
    """n_shards=1 degenerates to the plain operator."""
    G = gsp.graphs.Sensor(60, seed=5)
    sg = partition_graph(G.W, 1)
    mesh = make_mesh(1, 1)
    x = np.random.default_rng(2).normal(size=G.N)
    y = np.asarray(sg.unpad_signal(sharded_matvec(sg, sg.pad_signal(x), mesh)))
    want = np.asarray(matvec(G.L, jnp.asarray(x)))
    assert np.allclose(y, want, atol=1e-10)


@requires_multi
def test_sharded_ell_matches(problem):
    """Scatter-free per-shard ELL == COO sharded path == unsharded."""
    from pygsp_tpu.parallel import shard_local_ell
    G, x, lap_type = problem
    G.estimate_lmax()
    g = gsp.filters.Heat(G, scale=[5, 20])
    c = cheby.cheby_coeff(g.evaluate, G.lmax, m=20)
    ref = np.asarray(cheby.cheby_op(G.L, G.lmax, c, jnp.asarray(x)))

    sg = partition_graph(G.W, 4, lap_type=lap_type)
    ell = shard_local_ell(sg)
    mesh = make_mesh(4, 2)
    xp = sg.pad_signal(x)
    y = sharded_matvec(sg, xp, mesh, ell=ell)
    want_mv = np.asarray(matvec(G.L, jnp.asarray(x)))
    assert np.allclose(np.asarray(sg.unpad_signal(y)), want_mv, atol=1e-10)

    out = sharded_cheby_op(sg, G.lmax, c, xp, mesh, ell=ell)
    got = np.stack([np.asarray(sg.unpad_signal(out[f])) for f in range(2)])
    assert np.allclose(got, ref, atol=1e-9)


@requires_multi
def test_sharded_ell_autodiff(problem):
    """Reverse-mode through the scatter-free sharded path (regression for
    the scan-carry varying-axis bug: a jnp.zeros carry inside shard_map
    broke grad tracing)."""
    from pygsp_tpu.parallel import shard_local_ell
    G, x, lap_type = problem
    if lap_type != 'combinatorial':
        pytest.skip('one lap_type suffices for the grad regression '
                    '(compile-heavy)')
    x = x[:, :2]
    G.estimate_lmax()
    sg = partition_graph(G.W, 4, lap_type=lap_type)
    ell = shard_local_ell(sg)
    mesh = make_mesh(4, 2)
    xp = sg.pad_signal(x)
    lmax = G.lmax

    def loss(scale):
        c = cheby.cheby_coeff(lambda lam: jnp.exp(-scale * lam / lmax)[None],
                              lmax, m=6)
        return jnp.sum(sharded_cheby_op(sg, lmax, c, xp, mesh, ell=ell) ** 2)

    g1 = jax.grad(loss)(5.0)
    fd = (loss(5.0 + 1e-4) - loss(5.0 - 1e-4)) / 2e-4
    assert np.isclose(float(g1), float(fd), rtol=1e-4)


@requires_multi
def test_sharded_windowed_matches():
    """Windowed-compact per-shard SpMM (combined + interior/boundary split)
    == unsharded, on a power-law graph (hub rows exercise the shared-shape
    residue tiers)."""
    from pygsp_tpu.parallel import shard_local_windowed
    G = gsp.graphs.BarabasiAlbert(300, m0=4, m=4, seed=3)
    G.estimate_lmax()
    rng = np.random.default_rng(4)
    x = rng.normal(size=(G.N, 4))
    c = cheby.cheby_coeff(gsp.filters.Heat(G, scale=[5, 20]).evaluate,
                          G.lmax, m=10)
    ref_mv = np.asarray(matvec(G.L, jnp.asarray(x)))
    ref = np.asarray(cheby.cheby_op(G.L, G.lmax, c, jnp.asarray(x)))

    sg = partition_graph(G.W, 4)
    mesh = make_mesh(4, 2)
    xp = sg.pad_signal(x)
    for ell in (shard_local_windowed(sg),
                shard_local_windowed(sg, split_boundary=True)):
        y = sharded_matvec(sg, xp, mesh, ell=ell)
        assert np.allclose(np.asarray(sg.unpad_signal(y)), ref_mv,
                           atol=1e-10)
        out = sharded_cheby_op(sg, G.lmax, c, xp, mesh, ell=ell)
        got = np.stack([np.asarray(sg.unpad_signal(out[f]))
                        for f in range(2)])
        assert np.allclose(got, ref, atol=1e-9)


@requires_multi
def test_sharded_acc_group_parity(monkeypatch):
    """Grouped sharded accumulator fold (g=3) == the pinned g=1 body
    (the conftest pins PYGSP_SHARDED_ACC_GROUP=1 for compile speed;
    this is the grouped coverage), through the chunk-carried path."""
    from pygsp_tpu.parallel import shard_local_windowed
    G = gsp.graphs.Sensor(400, seed=2)
    G.estimate_lmax(method='bounds')
    rng = np.random.default_rng(1)
    x = rng.normal(size=(G.N, 4))
    c = cheby.cheby_coeff(gsp.filters.Heat(G, scale=[2, 20]).evaluate,
                          G.lmax, m=11)    # m-2=9: head remainder at g=3
    sg = partition_graph(G.W, 4)
    ell = shard_local_windowed(sg, split_boundary=True)
    mesh = make_mesh(4, 2)
    xp = sg.pad_signal(x)
    monkeypatch.setenv('PYGSP_SHARDED_ACC_GROUP', '1')
    want = np.asarray(sharded_cheby_op(sg, G.lmax, c, xp, mesh, ell=ell))
    monkeypatch.setenv('PYGSP_SHARDED_ACC_GROUP', '3')
    got = np.asarray(sharded_cheby_op(sg, G.lmax, c, xp, mesh, ell=ell))
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-13)


@requires_multi
def test_sharded_windowed_multichunk():
    """Chunk-carried sharded recurrence with n_local spanning SEVERAL
    source chunks: exercises the masked halo gather-from-chunks
    (``parallel.sharded._gather_from_chunks``) and the per-chunk
    accumulator/recurrence tuples against the unsharded reference."""
    from pygsp_tpu.parallel import shard_local_windowed
    G = gsp.graphs.Sensor(1200, seed=3)
    G.estimate_lmax(method='bounds')
    rng = np.random.default_rng(0)
    x = rng.normal(size=(G.N, 6))
    c = cheby.cheby_coeff(gsp.filters.Heat(G, scale=[1, 5, 20]).evaluate,
                          G.lmax, m=12)
    ref = np.asarray(cheby.cheby_op(G.L, G.lmax, c, jnp.asarray(x)))

    sg = partition_graph(G.W, 4)
    ell = shard_local_windowed(sg, split_boundary=True, chunk_rows=64)
    assert -(-sg.n_local // 64) >= 3  # the point of the test
    mesh = make_mesh(4, 2)
    xp = sg.pad_signal(x)
    out = sharded_cheby_op(sg, G.lmax, c, xp, mesh, ell=ell)
    got = np.stack([np.asarray(sg.unpad_signal(out[f])) for f in range(3)])
    assert np.allclose(got, ref, atol=1e-9)

    out16 = sharded_cheby_op(sg, G.lmax, c, xp, mesh, ell=ell,
                             carry_dtype=jnp.bfloat16)
    got16 = np.stack([np.asarray(sg.unpad_signal(out16[f]))
                      for f in range(3)])
    rel = np.abs(got16 - ref).max() / np.abs(ref).max()
    assert rel < 1.5e-2, rel


@requires_multi
def test_sharded_windowed_autodiff():
    """Reverse-mode through the windowed shard fold + halo exchange."""
    from pygsp_tpu.parallel import shard_local_windowed
    G = gsp.graphs.BarabasiAlbert(200, m0=3, m=3, seed=9)
    G.estimate_lmax()
    sg = partition_graph(G.W, 4)
    sw = shard_local_windowed(sg)
    mesh = make_mesh(4, 2)
    x = np.random.default_rng(1).normal(size=(G.N, 2))
    xp = sg.pad_signal(x)
    lmax = G.lmax

    def loss(scale):
        c = cheby.cheby_coeff(lambda lam: jnp.exp(-scale * lam / lmax)[None],
                              lmax, m=6)
        return jnp.sum(sharded_cheby_op(sg, lmax, c, xp, mesh, ell=sw) ** 2)

    g1 = jax.grad(loss)(5.0)
    fd = (loss(5.0 + 1e-4) - loss(5.0 - 1e-4)) / 2e-4
    assert np.isclose(float(g1), float(fd), rtol=1e-4)


@requires_multi
def test_sharded_split_boundary(problem):
    """Interior/boundary-split ELL (comm/compute overlap layout) matches."""
    from pygsp_tpu.parallel import shard_local_ell
    G, x, lap_type = problem
    G.estimate_lmax()
    sg = partition_graph(G.W, 4, lap_type=lap_type)
    ell2 = shard_local_ell(sg, split_boundary=True)
    assert isinstance(ell2, tuple) and len(ell2) == 2
    mesh = make_mesh(4, 2)
    xp = sg.pad_signal(x)
    y = sharded_matvec(sg, xp, mesh, ell=ell2)
    want = np.asarray(matvec(G.L, jnp.asarray(x)))
    assert np.allclose(np.asarray(sg.unpad_signal(y)), want, atol=1e-10)
    c = cheby.cheby_coeff(gsp.filters.Heat(G, scale=[5, 20]).evaluate,
                          G.lmax, m=10)
    out = sharded_cheby_op(sg, G.lmax, c, xp, mesh, ell=ell2)
    ref = np.asarray(cheby.cheby_op(G.L, G.lmax, c, jnp.asarray(x)))
    got = np.stack([np.asarray(sg.unpad_signal(out[f])) for f in range(2)])
    assert np.allclose(got, ref, atol=1e-9)


@requires_multi
def test_sharded_fixed_graph_vjp():
    """Constant-memory sharded VJP == plain sharded autodiff (grads wrt
    c and x), plus sharded synthesis parity vs the single-chip op."""
    from pygsp_tpu.parallel import (sharded_cheby_op_fixed_graph,
                                    sharded_cheby_synthesis,
                                    shard_local_windowed)
    G = gsp.graphs.BarabasiAlbert(240, m0=4, m=4, seed=3)
    G.estimate_lmax()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(G.N, 4))
    c = cheby.cheby_coeff(gsp.filters.Heat(G, scale=[4., 9.]).evaluate,
                          G.lmax, m=8)
    sg = partition_graph(G.W, 4)
    mesh = make_mesh(4, 2)
    xp = sg.pad_signal(x)
    sw = shard_local_windowed(sg)

    y = rng.normal(size=(G.N, 4, 2))
    yp = np.zeros((sg.n_padded, 4, 2))
    yp[np.asarray(sg.perm)] = y
    syn = np.asarray(sharded_cheby_synthesis(
        sg, G.lmax, c, jnp.asarray(yp), mesh, ell=sw))[np.asarray(sg.perm)]
    ref_syn = np.asarray(cheby.cheby_synthesis(G.L, G.lmax, c,
                                               jnp.asarray(y)))
    assert np.allclose(syn, ref_syn, atol=1e-10)

    o1 = sharded_cheby_op(sg, G.lmax, c, xp, mesh, ell=sw)
    t = jnp.asarray(rng.normal(size=o1.shape))

    def make(fn):
        return jax.grad(lambda c_, x_: jnp.sum(
            fn(sg, G.lmax, c_, x_, mesh, ell=sw) * t), argnums=(0, 1))

    gc1, gx1 = make(sharded_cheby_op)(c, xp)
    gc2, gx2 = make(sharded_cheby_op_fixed_graph)(c, xp)
    assert np.allclose(np.asarray(gc1), np.asarray(gc2), atol=1e-12)
    assert np.allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-12)


@requires_multi
def test_sharded_fixed_graph_vjp_1d():
    """1-D signals are replicated over 'batch': the c-bar inner product
    must NOT psum the replicas (regression for the n_batch scaling bug)."""
    from pygsp_tpu.parallel import sharded_cheby_op_fixed_graph
    G = gsp.graphs.Sensor(120, seed=2)
    G.estimate_lmax()
    rng = np.random.default_rng(1)
    c = cheby.cheby_coeff(gsp.filters.Heat(G, scale=5.).evaluate,
                          G.lmax, m=6)
    sg = partition_graph(G.W, 4)
    mesh = make_mesh(4, 2)
    x1 = sg.pad_signal(rng.normal(size=G.N))
    t1 = jnp.asarray(rng.normal(size=(1, sg.n_padded)))

    def make(fn):
        return jax.grad(lambda c_: jnp.sum(
            fn(sg, G.lmax, c_, x1, mesh) * t1))

    gc1 = make(sharded_cheby_op)(c)
    gc2 = make(sharded_cheby_op_fixed_graph)(c)
    assert np.allclose(np.asarray(gc1), np.asarray(gc2), atol=1e-12)


@requires_multi
def test_cluster_reorder_parity_and_quality(rng):
    """reorder='cluster' (VERDICT r3 #3): sharded == unsharded, balanced,
    and on a community graph with SHUFFLED vertex ids the clustered
    partition's halo drops well below the contiguous split's."""
    from pygsp_tpu.graphs.stochasticblockmodel import sbm_edges
    import scipy.sparse as sps

    ns, k = 4096, 16
    z = np.random.default_rng(3).integers(0, k, ns)   # shuffled membership
    p = 12.0 / (ns / k)
    M = np.full((k, k), p / 50)
    np.fill_diagonal(M, p)
    r, c = sbm_edges(z, M, rng=np.random.default_rng(4))
    W = sps.csr_matrix((np.ones(2 * len(r), np.float64),
                        (np.concatenate([r, c]), np.concatenate([c, r]))),
                       shape=(ns, ns))
    W.sum_duplicates()
    G = gsp.graphs.Graph(W)
    G.estimate_lmax(method='bounds')

    def halo_and_imb(sg):
        n_local = sg.n_local
        real_send = sum(int((np.asarray(a) < n_local).sum())
                        for a in sg.send_idx)
        rows = np.asarray(sg.rows)
        nnz_per = (rows < n_local).sum(axis=1)
        return real_send, float(nnz_per.max() / nnz_per.mean())

    sg_none = partition_graph(W, 8, reorder='none')
    sg_cl = partition_graph(W, 8, reorder='cluster')
    h0, _ = halo_and_imb(sg_none)
    h1, imb = halo_and_imb(sg_cl)
    assert imb <= 1.15, imb
    assert h1 < 0.85 * h0, (h1, h0)      # ≥15% cut on this small instance

    # parity: clustered sharded bank == unsharded bank
    x = rng.normal(size=(ns, 4))
    g = gsp.filters.Heat(G, scale=[5, 20])
    cc = cheby.cheby_coeff(g.evaluate, G.lmax, m=15)
    ref = np.asarray(cheby.cheby_op(G.L, G.lmax, cc, jnp.asarray(x)))
    mesh = make_mesh(8, 1)
    out = sharded_cheby_op(sg_cl, G.lmax, cc, sg_cl.pad_signal(x), mesh)
    got = np.stack([np.asarray(sg_cl.unpad_signal(out[f]))
                    for f in range(out.shape[0])])
    assert np.allclose(got, ref, atol=1e-9)


@requires_multi
def test_sharded_bf16_carry(problem):
    """bf16 halo payload: sharded bank with carry_dtype=bfloat16 matches
    the f32 sharded bank within the measured carry budget."""
    G, x, lap_type = problem
    G.estimate_lmax()
    g = gsp.filters.Heat(G, scale=[5, 20])
    c = cheby.cheby_coeff(g.evaluate, G.lmax, m=20).astype(jnp.float32)
    x32 = x.astype(np.float32)

    sg = partition_graph(G.W, 4, lap_type=lap_type, dtype=np.float32)
    mesh = make_mesh(4, 2)
    xp = sg.pad_signal(x32)
    ref = np.asarray(sharded_cheby_op(sg, G.lmax, c, xp, mesh))
    out = np.asarray(sharded_cheby_op(sg, G.lmax, c, xp, mesh,
                                      carry_dtype=jnp.bfloat16))
    assert out.dtype == np.float32
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 1.5e-2, rel


# --- 2-D edge partition (structure-independent comm) -----------------------

@requires_multi
@pytest.mark.parametrize('pr,pc', [(2, 2), (4, 2)])
def test_2d_matvec_matches(problem, pr, pc):
    from pygsp_tpu.parallel import make_mesh_2d, matvec_2d, partition_graph_2d
    G, x, lap_type = problem
    tg = partition_graph_2d(G.W, pr, pc, lap_type=lap_type)
    assert tg.comm_rows_per_step == (pr + pc - 2) * tg.n_local
    mesh = make_mesh_2d(pr, pc)
    xp = tg.pad_signal(x)
    y = matvec_2d(tg, xp, mesh)
    got = np.asarray(tg.unpad_signal(y))
    want = np.asarray(matvec(G.L, jnp.asarray(x)))
    assert np.allclose(got, want, atol=1e-10)


@requires_multi
def test_2d_cheby_matches(problem):
    from pygsp_tpu.parallel import cheby_op_2d, make_mesh_2d, partition_graph_2d
    G, x, lap_type = problem
    G.estimate_lmax()
    g = gsp.filters.Heat(G, scale=[5, 20])
    c = cheby.cheby_coeff(g.evaluate, G.lmax, m=30)
    ref = np.asarray(cheby.cheby_op(G.L, G.lmax, c, jnp.asarray(x)))

    tg = partition_graph_2d(G.W, 2, 2, lap_type=lap_type, reorder='cluster')
    mesh = make_mesh_2d(2, 2)
    xp = tg.pad_signal(x)
    out = cheby_op_2d(tg, G.lmax, c, xp, mesh)
    got = np.stack([np.asarray(tg.unpad_signal(out[f]))
                    for f in range(out.shape[0])])
    assert np.allclose(got, ref, atol=1e-9)


@requires_multi
def test_2d_autodiff_and_bf16(problem):
    """grad flows through all_gather/psum_scatter; bf16 carry stays in
    the measured budget (same gate as the 1-D and single-chip paths)."""
    from pygsp_tpu.parallel import cheby_op_2d, make_mesh_2d, partition_graph_2d
    G, x, lap_type = problem
    G.estimate_lmax()
    g = gsp.filters.Heat(G, scale=[5, 20])
    c = cheby.cheby_coeff(g.evaluate, G.lmax, m=12)
    Lop = G.L

    tg = partition_graph_2d(G.W, 2, 2, lap_type=lap_type)
    mesh = make_mesh_2d(2, 2)
    xp = tg.pad_signal(x)
    perm = np.asarray(tg.perm)

    def loss_sh(x_):
        return jnp.sum(cheby_op_2d(tg, G.lmax, c, x_, mesh) ** 2)

    def loss_ref(x_):
        return jnp.sum(cheby.cheby_op(Lop, G.lmax, c, x_) ** 2)

    g_sh = np.asarray(jax.grad(loss_sh)(xp))[perm]
    g_ref = np.asarray(jax.grad(loss_ref)(jnp.asarray(x)))
    assert np.allclose(g_sh, g_ref, atol=1e-7 * max(1, np.abs(g_ref).max()))

    c32 = c.astype(jnp.float32)
    xp32 = tg.pad_signal(x.astype(np.float32))
    tg32 = partition_graph_2d(G.W, 2, 2, lap_type=lap_type,
                              dtype=np.float32)
    ref32 = np.asarray(cheby_op_2d(tg32, G.lmax, c32, xp32, mesh))
    out16 = np.asarray(cheby_op_2d(tg32, G.lmax, c32, xp32, mesh,
                                   carry_dtype=jnp.bfloat16))
    assert out16.dtype == np.float32
    rel = np.abs(out16 - ref32).max() / np.abs(ref32).max()
    assert rel < 1.5e-2, rel


@requires_multi
def test_2d_ring_overlapped(problem):
    """Ring-overlapped chunk-carried 2-D path (the deployed 2-D layout):
    per-step ppermute + static step matrices == unsharded reference on
    square and degenerate meshes; bf16 ring payload within budget; grads
    flow through the ppermute chain and psum_scatter."""
    from pygsp_tpu.parallel import (cheby_op_2d, make_mesh_2d,
                                    partition_graph_2d,
                                    twod_local_windowed)
    G, x, lap_type = problem
    G.estimate_lmax()
    lmax = float(G.lmax)
    c = cheby.cheby_coeff(gsp.filters.Heat(G, scale=[5, 20]).evaluate,
                          lmax, m=12)
    ref = np.asarray(cheby.cheby_op(G.L, lmax, c, jnp.asarray(x)))

    for pr, pc in ((2, 2), (4, 1)):
        tg = partition_graph_2d(G.W, pr, pc, lap_type=lap_type)
        ell = twod_local_windowed(tg, ring=True, chunk_rows=64)
        assert isinstance(ell, tuple) and len(ell) == pr
        mesh = make_mesh_2d(pr, pc)
        xp = tg.pad_signal(x)
        perm = np.asarray(tg.perm)
        out = cheby_op_2d(tg, lmax, c, xp, mesh, ell=ell)
        got = np.asarray(out)[:, perm, :]
        assert np.allclose(got, ref, atol=1e-9)

    out16 = cheby_op_2d(tg, lmax, c, xp, mesh, ell=ell,
                        carry_dtype=jnp.bfloat16)
    rel = (np.abs(np.asarray(out16)[:, perm, :] - ref).max()
           / np.abs(ref).max())
    assert rel < 1.5e-2, rel

    def loss(scale):
        cs = cheby.cheby_coeff(
            lambda lam: jnp.exp(-scale * lam / lmax)[None], lmax, m=8)
        return jnp.sum(cheby_op_2d(tg, lmax, cs, xp, mesh, ell=ell) ** 2)

    g1 = jax.grad(loss)(5.0)
    fd = (loss(5.0 + 1e-4) - loss(5.0 - 1e-4)) / 2e-4
    assert np.isclose(float(g1), float(fd), rtol=1e-4)


@requires_multi
def test_2d_interleaved(problem):
    """Fully interleaved 2-D path (split_cols=True): row all-gather AND
    col reduce-scatter both ring-overlapped, per-device static fold
    schedules == unsharded reference; bf16 carry + bf16 hop payload
    within budget; grads through both ring chains."""
    from pygsp_tpu.parallel import (cheby_op_2d, make_mesh_2d,
                                    partition_graph_2d,
                                    twod_local_windowed)
    G, x, lap_type = problem
    G.estimate_lmax()
    lmax = float(G.lmax)
    c = cheby.cheby_coeff(gsp.filters.Heat(G, scale=[5, 20]).evaluate,
                          lmax, m=12)
    ref = np.asarray(cheby.cheby_op(G.L, lmax, c, jnp.asarray(x)))

    for pr, pc in ((2, 4), (2, 2)):
        tg = partition_graph_2d(G.W, pr, pc, lap_type=lap_type)
        ell = twod_local_windowed(tg, ring=True, split_cols=True,
                                  chunk_rows=64)
        assert isinstance(ell[0], tuple) and len(ell[0]) == pc
        mesh = make_mesh_2d(pr, pc)
        xp = tg.pad_signal(x)
        perm = np.asarray(tg.perm)
        out = cheby_op_2d(tg, lmax, c, xp, mesh, ell=ell)
        assert np.allclose(np.asarray(out)[:, perm, :], ref, atol=1e-9)

    out16 = cheby_op_2d(tg, lmax, c, xp, mesh, ell=ell,
                        carry_dtype=jnp.bfloat16,
                        scatter_dtype=jnp.bfloat16)
    rel = (np.abs(np.asarray(out16)[:, perm, :] - ref).max()
           / np.abs(ref).max())
    assert rel < 1.5e-2, rel

    def loss(scale):
        cs = cheby.cheby_coeff(
            lambda lam: jnp.exp(-scale * lam / lmax)[None], lmax, m=8)
        return jnp.sum(cheby_op_2d(tg, lmax, cs, xp, mesh, ell=ell) ** 2)

    g1 = jax.grad(loss)(5.0)
    fd = (loss(5.0 + 1e-4) - loss(5.0 - 1e-4)) / 2e-4
    assert np.isclose(float(g1), float(fd), rtol=1e-4)


@requires_multi
def test_2d_fixed_graph_vjp(problem):
    """2-D constant-memory VJP == plain autodiff through cheby_op_2d
    (both ring and interleaved layouts): backward = adjoint synthesis +
    term contraction with psum over both mesh axes, no stored scan
    carries."""
    from pygsp_tpu.parallel import (cheby_op_2d, cheby_op_2d_fixed_graph,
                                    cheby_synthesis_2d, make_mesh_2d,
                                    partition_graph_2d,
                                    twod_local_windowed)
    G, x, lap_type = problem
    if lap_type != 'combinatorial':
        pytest.skip('one lap_type suffices (compile-heavy)')
    G.estimate_lmax()
    lmax = float(G.lmax)
    c = cheby.cheby_coeff(gsp.filters.Heat(G, scale=[2, 10, 40]).evaluate,
                          lmax, m=10)
    tg = partition_graph_2d(G.W, 2, 4, lap_type=lap_type)
    mesh = make_mesh_2d(2, 4)
    xp = tg.pad_signal(x)
    rng = np.random.default_rng(9)
    y = rng.normal(size=(G.N, x.shape[1], 3))
    yp = tg.pad_signal(y)
    ref_s = np.asarray(cheby.cheby_synthesis(G.L, lmax, c,
                                             jnp.asarray(y)))
    perm = np.asarray(tg.perm)
    for split in (True,):
        ell = twod_local_windowed(tg, ring=True, split_cols=split,
                                  chunk_rows=64)
        out_s = cheby_synthesis_2d(tg, lmax, c, yp, mesh, ell=ell)
        assert np.allclose(np.asarray(out_s)[perm], ref_s, atol=1e-9)

        def loss_fg(c_, x_):
            out = cheby_op_2d_fixed_graph(tg, lmax, c_, x_, mesh,
                                          ell=ell)
            return jnp.sum(jnp.sin(out))

        def loss_plain(c_, x_):
            out = cheby_op_2d(tg, lmax, c_, x_, mesh, ell=ell)
            return jnp.sum(jnp.sin(out))

        gc1, gx1 = jax.grad(loss_fg, argnums=(0, 1))(c, xp)
        gc2, gx2 = jax.grad(loss_plain, argnums=(0, 1))(c, xp)
        np.testing.assert_allclose(np.asarray(gc1), np.asarray(gc2),
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                                   rtol=1e-10, atol=1e-12)
    with pytest.raises(ValueError, match='ring layout'):
        cheby_op_2d_fixed_graph(tg, lmax, c, xp, mesh, ell=None)


@requires_multi
def test_2d_scatter_dtype(problem):
    """Opt-in bf16 psum_scatter payload on the ring layout (the path's
    only exposed comm): error stays within the reduced-precision budget
    alongside the bf16 carry; refuses the non-ring layout."""
    from pygsp_tpu.parallel import (cheby_op_2d, make_mesh_2d,
                                    partition_graph_2d,
                                    twod_local_windowed)
    G, x, lap_type = problem
    if lap_type != 'combinatorial':
        pytest.skip('one lap_type suffices (compile-heavy)')
    G.estimate_lmax()
    lmax = float(G.lmax)
    c = cheby.cheby_coeff(gsp.filters.Heat(G, scale=[5, 20]).evaluate,
                          lmax, m=12)
    ref = np.asarray(cheby.cheby_op(G.L, lmax, c, jnp.asarray(x)))
    tg = partition_graph_2d(G.W, 2, 4, lap_type=lap_type)
    ell = twod_local_windowed(tg, ring=True, chunk_rows=64)
    mesh = make_mesh_2d(2, 4)
    xp = tg.pad_signal(x)
    perm = np.asarray(tg.perm)
    out = cheby_op_2d(tg, lmax, c, xp, mesh, ell=ell,
                      carry_dtype=jnp.bfloat16,
                      scatter_dtype=jnp.bfloat16)
    rel = (np.abs(np.asarray(out)[:, perm, :] - ref).max()
           / np.abs(ref).max())
    assert rel < 1.5e-2, rel
    with pytest.raises(ValueError, match='ring layout'):
        cheby_op_2d(tg, lmax, c, xp, mesh,
                    ell=twod_local_windowed(tg),
                    scatter_dtype=jnp.bfloat16)


@requires_multi
def test_2d_windowed_local_spmm(problem):
    """2-D path with the windowed-compact local block format matches the
    COO segment-sum path and the unsharded reference."""
    from pygsp_tpu.parallel import (cheby_op_2d, make_mesh_2d,
                                    partition_graph_2d,
                                    twod_local_windowed)
    G, x, lap_type = problem
    G.estimate_lmax()
    g = gsp.filters.Heat(G, scale=[5, 20])
    c = cheby.cheby_coeff(g.evaluate, G.lmax, m=20)
    ref = np.asarray(cheby.cheby_op(G.L, G.lmax, c, jnp.asarray(x)))

    tg = partition_graph_2d(G.W, 2, 2, lap_type=lap_type)
    ell = twod_local_windowed(tg)
    mesh = make_mesh_2d(2, 2)
    xp = tg.pad_signal(x)
    out = cheby_op_2d(tg, G.lmax, c, xp, mesh, ell=ell)
    got = np.stack([np.asarray(tg.unpad_signal(out[f]))
                    for f in range(out.shape[0])])
    assert np.allclose(got, ref, atol=1e-9)


@requires_multi
def test_mixed_dtype_promotion():
    """f64 graph (x64 default) + f32 signal must not break the scan-carry
    dtype contract on ANY multi-chip path: 2-D ring forward/synthesis and
    both fixed-graph backwards promote the signal once and return
    cotangents in the primal's dtype (ADVICE r4 medium items)."""
    from pygsp_tpu.parallel import (cheby_op_2d, cheby_op_2d_fixed_graph,
                                    cheby_synthesis_2d, make_mesh_2d,
                                    partition_graph_2d,
                                    sharded_cheby_op_fixed_graph,
                                    sharded_cheby_synthesis,
                                    shard_local_windowed,
                                    twod_local_windowed)
    G = gsp.graphs.Sensor(96, seed=5)
    G.estimate_lmax()
    lmax = float(G.lmax)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(G.N, 2)).astype(np.float32)
    c = cheby.cheby_coeff(gsp.filters.Heat(G, scale=[3., 9.]).evaluate,
                          lmax, m=4)
    assert jnp.asarray(c).dtype == jnp.float64          # mixed by design
    ref = np.asarray(cheby.cheby_op(G.L, lmax, c, jnp.asarray(x)))

    # 2-D ring: forward, synthesis, and the fixed-graph VJP
    tg = partition_graph_2d(G.W, 2, 2)
    ell = twod_local_windowed(tg, ring=True, chunk_rows=64)
    mesh2 = make_mesh_2d(2, 2)
    xp = tg.pad_signal(x)
    assert xp.dtype == jnp.float32
    perm = np.asarray(tg.perm)
    out = cheby_op_2d(tg, lmax, c, xp, mesh2, ell=ell)
    assert np.allclose(np.asarray(out)[:, perm, :], ref, atol=1e-5)
    y = rng.normal(size=(G.N, 2, 2)).astype(np.float32)
    yp = tg.pad_signal(y)
    ref_s = np.asarray(cheby.cheby_synthesis(G.L, lmax, c,
                                             jnp.asarray(y)))
    out_s = cheby_synthesis_2d(tg, lmax, c, yp, mesh2, ell=ell)
    assert np.allclose(np.asarray(out_s)[perm], ref_s, atol=1e-5)

    gc, gx = jax.grad(
        lambda c_, x_: jnp.sum(
            cheby_op_2d_fixed_graph(tg, lmax, c_, x_, mesh2, ell=ell)
            ** 2), argnums=(0, 1))(c, xp)
    assert gx.dtype == xp.dtype and gc.dtype == jnp.asarray(c).dtype
    assert np.isfinite(np.asarray(gc)).all()

    # 1-D sharded: synthesis forward + fixed-graph VJP
    sg = partition_graph(G.W, 4)
    mesh1 = make_mesh(4, 2)
    xq = sg.pad_signal(x)
    assert xq.dtype == jnp.float32
    sw = shard_local_windowed(sg)
    yq = np.zeros((sg.n_padded, 2, 2), np.float32)
    yq[np.asarray(sg.perm)] = y
    syn = sharded_cheby_synthesis(sg, lmax, c, jnp.asarray(yq), mesh1,
                                  ell=sw)
    assert np.allclose(np.asarray(syn)[np.asarray(sg.perm)], ref_s,
                       atol=1e-5)
    gc, gx = jax.grad(
        lambda c_, x_: jnp.sum(
            sharded_cheby_op_fixed_graph(sg, lmax, c_, x_, mesh1, ell=sw)
            ** 2), argnums=(0, 1))(c, xq)
    assert gx.dtype == xq.dtype and gc.dtype == jnp.asarray(c).dtype
    assert np.isfinite(np.asarray(gc)).all()


@requires_multi
def test_2d_mono(problem):
    """Monolithic ring layout (round 5): ONE fold per matvec over the
    zero-copy concatenation of the collected ring buffers — parity with
    the unsharded reference on plain and interleaved variants, bf16
    carry within budget, grads through the engine."""
    from pygsp_tpu.parallel import (cheby_op_2d, cheby_synthesis_2d,
                                    make_mesh_2d, partition_graph_2d,
                                    twod_local_windowed)
    G, x, lap_type = problem
    if lap_type != 'combinatorial':
        pytest.skip('one lap_type suffices (compile-heavy)')
    G.estimate_lmax()
    lmax = float(G.lmax)
    c = cheby.cheby_coeff(gsp.filters.Heat(G, scale=[5, 20]).evaluate,
                          lmax, m=10)
    ref = np.asarray(cheby.cheby_op(G.L, lmax, c, jnp.asarray(x)))

    tg = partition_graph_2d(G.W, 2, 2, lap_type=lap_type)
    assert tg.n_local % 8 == 0
    mesh = make_mesh_2d(2, 2)
    xp = tg.pad_signal(x)
    perm = np.asarray(tg.perm)
    ell = twod_local_windowed(tg, ring=True, mono=True, chunk_rows=8,
                              window_rows=8)
    assert isinstance(ell, tuple) and len(ell) == 1
    out = cheby_op_2d(tg, lmax, c, xp, mesh, ell=ell)
    assert np.allclose(np.asarray(out)[:, perm, :], ref, atol=1e-9)

    out16 = cheby_op_2d(tg, lmax, c, xp, mesh, ell=ell,
                        carry_dtype=jnp.bfloat16)
    rel = (np.abs(np.asarray(out16)[:, perm, :] - ref).max()
           / np.abs(ref).max())
    assert rel < 1.5e-2, rel

    # synthesis through the same mono body
    rng = np.random.default_rng(5)
    y = rng.normal(size=(G.N, x.shape[1], 2))
    yp = tg.pad_signal(y)
    ref_s = np.asarray(cheby.cheby_synthesis(G.L, lmax, c,
                                             jnp.asarray(y)))
    out_s = cheby_synthesis_2d(tg, lmax, c, yp, mesh, ell=ell)
    assert np.allclose(np.asarray(out_s)[perm], ref_s, atol=1e-9)

    # mono-interleaved: col ring hops between per-destination folds
    elli = twod_local_windowed(tg, ring=True, mono=True,
                               split_cols=True, chunk_rows=8,
                               window_rows=8)
    assert len(elli) == 1 and isinstance(elli[0], tuple)
    outi = cheby_op_2d(tg, lmax, c, xp, mesh, ell=elli)
    assert np.allclose(np.asarray(outi)[:, perm, :], ref, atol=1e-9)

    def loss(scale):
        cs = cheby.cheby_coeff(
            lambda lam: jnp.exp(-scale * lam / lmax)[None], lmax, m=6)
        return jnp.sum(cheby_op_2d(tg, lmax, cs, xp, mesh, ell=ell) ** 2)

    g1 = jax.grad(loss)(5.0)
    fd = (loss(5.0 + 1e-4) - loss(5.0 - 1e-4)) / 2e-4
    assert np.isclose(float(g1), float(fd), rtol=1e-4)

    with pytest.raises(ValueError, match='divide'):
        twod_local_windowed(tg, ring=True, mono=True, chunk_rows=24,
                            window_rows=8)
