"""BASELINE config 4: SBM N=1M, heat-kernel diffusion, single-host
edge-partitioned SpMM.

Runs the sharded Chebyshev filter bank over all available devices
(community-sorted SBM → the contiguous partition is already block-local)
and validates a sample of the output against the unsharded operator.

Usage (virtual devices):
  PALLAS_AXON_POOL_IPS="" JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/baseline_sbm1m.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])

N = 1_000_000
K_COMM = 5
P_IN = 8e-5      # expected intra-degree 16
Q_OUT = 5e-6     # expected inter-degree 4
K_ORDER = 30
S = 16


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sps
    from pygsp_tpu.graphs.stochasticblockmodel import sbm_edges
    from pygsp_tpu.ops import chebyshev as cheby
    from pygsp_tpu.core import sparse as cs
    from pygsp_tpu.core.operators import LaplacianOp
    from pygsp_tpu.parallel import make_mesh, partition_graph, sharded_cheby_op

    rng = np.random.default_rng(0)
    t0 = time.time()
    z = np.sort(rng.integers(0, K_COMM, N))
    M = np.full((K_COMM, K_COMM), Q_OUT)
    np.fill_diagonal(M, P_IN)
    r, c = sbm_edges(z, M, rng=rng)
    W = sps.csr_matrix((np.ones(2 * len(r), np.float32),
                        (np.concatenate([r, c]), np.concatenate([c, r]))),
                       shape=(N, N))
    W.sum_duplicates()
    nnz = W.nnz
    print(f'SBM generated: nnz={nnz} in {time.time()-t0:.0f}s',
          file=sys.stderr, flush=True)

    dw = np.ravel(W.sum(1)).astype(np.float32)
    lmax = float(2 * dw.max())

    n_dev = len(jax.devices())
    n_graph = max(d for d in (1, 2, 4, 8) if d <= n_dev and n_dev % d == 0)
    t0 = time.time()
    sg = partition_graph(W, n_graph, reorder='none')
    print(f'partitioned over {n_graph} shards (halo={sg.halo_total}) '
          f'in {time.time()-t0:.0f}s', file=sys.stderr, flush=True)

    scales = jnp.asarray([5.0, 20.0], jnp.float32)

    def evaluate(lam):
        return jnp.exp(-scales[:, None] * lam[None, :] / lmax)

    c_coef = cheby.cheby_coeff(evaluate, lmax, m=K_ORDER, dtype=jnp.float32)
    x = rng.normal(size=(N, S)).astype(np.float32)
    xp = sg.pad_signal(x)
    mesh = make_mesh(n_graph, max(1, n_dev // n_graph))

    run = jax.jit(lambda sg, c, x: sharded_cheby_op(sg, lmax, c, x, mesh))
    t0 = time.time()
    out = run(sg, c_coef, xp)
    _ = float(jnp.sum(out[0, ::4096, 0]))
    print(f'compile+first: {time.time()-t0:.0f}s', file=sys.stderr, flush=True)
    t0 = time.time()
    out = run(sg, c_coef, xp)
    _ = float(jnp.sum(out[0, ::4096, 0]))
    dt = time.time() - t0

    # validate a sample against the unsharded operator (few columns)
    Wneg = W.copy()
    Wneg.data = -Wneg.data
    L = LaplacianOp(cs.ell_from_scipy(Wneg, dtype=np.float32),
                    jnp.asarray(dw), 'combinatorial')
    ref = cheby.cheby_op(L, lmax, c_coef, jnp.asarray(x[:, :2]))
    got = np.asarray(sg.unpad_signal(out[0]))[:, :2]
    err = float(np.abs(got - np.asarray(ref[0])).max())
    rel = err / (float(np.abs(np.asarray(ref[0])).max()) + 1e-30)

    print(json.dumps({
        'metric': 'sbm1m_sharded_cheby',
        'n_vertices': N, 'nnz': nnz, 'shards': n_graph,
        'edge_ops_per_s': K_ORDER * nnz * S / dt,
        'sharded_vs_unsharded_rel_err': rel,
    }))
    assert rel < 1e-3, f'sharded output mismatch: rel={rel}'


if __name__ == '__main__':
    main()
