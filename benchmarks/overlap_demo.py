"""Comm/compute overlap evidence: split-boundary vs combined sharded SpMM.

VERDICT round-1 item 6: the interior/boundary split
(`parallel/sharded.py`) was *correct* but never shown to overlap the halo
halo collectives (ppermutes) with interior work. This script:

1. times `sharded_cheby_op` with the combined ELL vs the
   interior/boundary split on the virtual 8-device mesh,
2. captures a `jax.profiler` trace of both (TRACE_DIR), where the
   collective-permutes can be inspected against the interior `spmm_ell` scopes,
3. writes OVERLAP_r2.json.

Run CPU-side:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python benchmarks/overlap_demo.py

Virtual CPU devices serialize compute, so wall-clock parity (not speedup)
is the expected CPU result; the artifact that matters is the trace
showing the halo exchange issued before — not after — the interior
aggregation, i.e. XLA is free to overlap them on real ICI. On real
multi-chip hardware rerun this unchanged.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         'traces')


def main():
    import jax
    import jax.numpy as jnp
    from pygsp_tpu.parallel import (make_mesh, partition_graph,
                                    sharded_cheby_op, shard_local_ell)
    from pygsp_tpu.ops.chebyshev import cheby_coeff

    quick = '--quick' in sys.argv
    n = 1 << (14 if quick else 18)
    k = 32
    from pygsp_tpu.graphs.stochasticblockmodel import sbm_edges
    z = np.sort(np.arange(n) % k)
    M = np.full((k, k), 2.0 / (n / k) / 50)
    np.fill_diagonal(M, 12.0 / (n / k))
    rows, cols = sbm_edges(z, M, rng=np.random.default_rng(1))
    import scipy.sparse as sps
    W = sps.csr_matrix(
        (np.ones(2 * len(rows), np.float32),
         (np.concatenate([rows, cols]), np.concatenate([cols, rows]))),
        shape=(n, n))
    W.sum_duplicates()

    n_dev = len(jax.devices())
    sg = partition_graph(W, n_dev, reorder='none', dtype=np.float32)
    mesh = make_mesh(n_dev, 1)
    ell_combined = shard_local_ell(sg)
    ell_split = shard_local_ell(sg, split_boundary=True)

    lmax = 2.0 * float(np.ravel(W.sum(axis=1)).max())
    c = np.asarray(cheby_coeff(
        lambda lam: jnp.exp(-np.asarray([5.0, 20.0])[:, None]
                            * lam[None, :] / lmax), lmax, m=20))
    x = sg.pad_signal(np.random.default_rng(0).normal(
        size=(n, 32)).astype(np.float32))

    results = {}
    for name, ell in (('combined', ell_combined), ('split', ell_split)):
        run = jax.jit(lambda ell, x: sharded_cheby_op(
            sg, lmax, jnp.asarray(c), x, mesh, ell=ell))
        out = run(ell, x)
        out.block_until_ready()
        t0 = time.time()
        for _ in range(3):
            out = run(ell, x)
        out.block_until_ready()
        results[name] = (time.time() - t0) / 3
        print(f'{name}: {results[name]*1e3:.1f} ms', file=sys.stderr)

    # numerical equivalence of the two paths
    o1 = np.asarray(jax.jit(lambda e, x: sharded_cheby_op(
        sg, lmax, jnp.asarray(c), x, mesh, ell=e))(ell_combined, x))
    o2 = np.asarray(jax.jit(lambda e, x: sharded_cheby_op(
        sg, lmax, jnp.asarray(c), x, mesh, ell=e))(ell_split, x))
    err = float(np.abs(o1 - o2).max() / (np.abs(o1).max() + 1e-30))

    # profiler trace of the split path
    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        run = jax.jit(lambda ell, x: sharded_cheby_op(
            sg, lmax, jnp.asarray(c), x, mesh, ell=ell))
        run(ell_split, x).block_until_ready()

    out = dict(n=n, n_devices=n_dev,
               t_combined_s=results['combined'], t_split_s=results['split'],
               split_vs_combined=results['split'] / results['combined'],
               split_equals_combined_relerr=err, trace_dir=TRACE_DIR)
    print(json.dumps(out))
    with open('OVERLAP_r2.json', 'w') as f:
        json.dump(out, f, indent=1)


if __name__ == '__main__':
    main()
