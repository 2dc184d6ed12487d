"""Worker process for tests/test_distributed.py (one of two
``jax.distributed`` CPU processes; see that file for the contract)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    coord = os.environ['PYGSP_DIST_COORD']
    nproc = int(os.environ['PYGSP_DIST_NPROC'])
    pid = int(os.environ['PYGSP_DIST_PID'])
    work = os.environ['PYGSP_DIST_DIR']

    import jax

    from pygsp_tpu.parallel import (global_mesh, initialize,
                                    load_edge_shard, partition_graph,
                                    put_sharded_graph, sharded_cheby_op)

    initialize(coordinator_address=coord, num_processes=nproc,
               process_id=pid)
    assert jax.process_count() == nproc
    jax.config.update('jax_enable_x64', True)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    prob = np.load(os.path.join(work, 'problem.npz'))
    N = int(prob['N'])
    lmax = float(prob['lmax'])

    # per-process edge shard of the shared file (contiguous row ranges)
    src, tgt, w, (lo, hi) = load_edge_shard(
        os.path.join(work, 'edges.npz'), N)
    assert np.all((src >= lo) & (src < hi))
    shard_edges = len(src)

    # global W assembled identically on every process (the partitioner is
    # deterministic host-side prep); the shard slice above is validated
    # against it
    import scipy.sparse as sps
    with np.load(os.path.join(work, 'edges.npz')) as d:
        W = sps.csr_matrix((d['weight'], (d['src'], d['tgt'])),
                           shape=(N, N))
    mask = (np.asarray(W.tocoo().row) >= lo) & (np.asarray(W.tocoo().row) < hi)
    assert mask.sum() == shard_edges

    mesh = global_mesh()      # all processes' devices, graph-axis major
    n_graph = mesh.shape['graph']
    sg = put_sharded_graph(partition_graph(W, n_graph, dtype=np.float64),
                           mesh)

    # pad_signal in numpy (global array), then device_put with the global
    # sharding — every process holds the full host copy
    perm = np.zeros(N, np.int64)
    perm[:] = np.asarray(jax.device_get(sg.perm))
    x = np.asarray(prob['x'])
    xp = np.zeros((sg.n_padded, x.shape[1]), x.dtype)
    xp[perm] = x
    xg = jax.device_put(xp, NamedSharding(mesh, P('graph', 'batch')))
    c = jnp.asarray(prob['c'])

    # sg passed as a pytree ARGUMENT: closing over global jax.Arrays would
    # try to inline them as compile-time constants, which is impossible
    # for arrays spanning non-addressable devices (and a memory blowup
    # even when possible — CLAUDE.md).
    out = jax.jit(
        lambda sg, c, x: sharded_cheby_op(sg, lmax, c, x, mesh))(sg, c, xg)

    # validate the locally addressable output shards against the parent's
    # single-process reference (reordered into padded layout)
    ref = np.asarray(prob['ref'])                        # (Nf, N, S)
    refp = np.zeros((ref.shape[0], sg.n_padded, ref.shape[2]), ref.dtype)
    refp[:, perm] = ref
    scale = np.abs(ref).max() + 1e-30
    max_err = 0.0
    for s in out.addressable_shards:
        sl = s.index
        err = np.abs(np.asarray(s.data) - refp[sl]).max() / scale
        max_err = max(max_err, float(err))

    with open(os.path.join(work, f'report_{pid}.json'), 'w') as f:
        json.dump({'max_rel_err': max_err,
                   'shard_edges': shard_edges,
                   'n_devices': jax.device_count(),
                   'process_count': jax.process_count()}, f)


if __name__ == '__main__':
    main()
