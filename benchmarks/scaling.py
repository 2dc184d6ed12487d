"""Weak-scaling harness: edges/s/chip efficiency across mesh sizes.

BASELINE's scaling metric: run the same per-chip workload on 1, 2, ..., D
graph shards and report efficiency = (edges/s/chip at D) / (edges/s at 1).
On real multi-chip hardware the halo all_to_all rides ICI; on a CPU host
with virtual devices the numbers characterize the framework overhead only
(still useful for regression tracking).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python benchmarks/scaling.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def main():
    import jax
    import jax.numpy as jnp
    import pygsp_tpu as pg
    from pygsp_tpu.ops import chebyshev as cheby
    from pygsp_tpu.parallel import make_mesh, partition_graph, sharded_cheby_op

    n_dev = len(jax.devices())
    shard_counts = [d for d in (1, 2, 4, 8, 16) if d <= n_dev]

    # weak scaling: per-shard problem size constant
    per_shard_vertices = 1 << 14
    m = 8
    S = 32
    K = 30
    results = {}
    for d in shard_counts:
        N = per_shard_vertices * d
        G = pg.graphs.ErdosRenyi(N, p=2.0 * m / N, seed=0)
        nnz = G.W.nnz
        lmax = 4.0 * m  # rough bound; exactness irrelevant for timing
        sg = partition_graph(G.W, d, reorder='none')
        mesh = make_mesh(d, 1)
        c = jnp.asarray(np.random.default_rng(1).normal(size=(2, K + 1)),
                        jnp.float32)
        x = sg.pad_signal(np.random.default_rng(0).normal(
            size=(N, S)).astype(np.float32))

        # sg passed as a pytree argument (jit constants rule); one traced
        # program per shard count.
        run = jax.jit(lambda sg, c, x: sharded_cheby_op(sg, lmax, c, x, mesh))
        out = run(sg, c, x)
        _ = float(jnp.sum(out[0, ::4096, 0]))     # forced sync
        t0 = time.time()
        n_iter = 3
        for _ in range(n_iter):
            out = run(sg, c, x)
            _ = float(jnp.sum(out[0, ::4096, 0]))
        dt = (time.time() - t0) / n_iter
        eps_per_chip = K * nnz * S / dt / d
        results[d] = eps_per_chip
        print(f'shards={d}: N={N} nnz={nnz} {dt*1e3:8.1f}ms '
              f'{eps_per_chip:.3e} edge-ops/s/chip', file=sys.stderr,
              flush=True)

    base = results[shard_counts[0]]
    eff = {d: results[d] / base for d in shard_counts}
    print(json.dumps({
        'metric': 'weak_scaling_efficiency',
        'efficiency': {str(d): round(e, 3) for d, e in eff.items()},
        'edge_ops_per_s_per_chip': {str(d): results[d] for d in shard_counts},
    }))


if __name__ == '__main__':
    main()
