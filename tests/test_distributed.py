"""Multi-process launch validation (VERDICT r2 missing #3 / item #6b).

Spawns TWO real ``jax.distributed`` CPU processes on a localhost
coordinator, each owning 2 virtual devices, and runs ``sharded_cheby_op``
over the 4-device :func:`pygsp_tpu.parallel.global_mesh` — exercising
``initialize``'s multi-process path, ``process_shard_range``,
``load_edge_shard``, and ``put_sharded_graph``. Each worker checks its
addressable output shards against a single-process reference computed by
the parent.

The reference has no analogue (it is single-process; SURVEY §2.6 names
the launcher a new first-class component).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), '_distributed_worker.py')


def _free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


@pytest.mark.timeout(600)
def test_two_process_sharded_cheby(tmp_path, rng):
    import jax.numpy as jnp

    import pygsp_tpu as gsp
    from pygsp_tpu.ops import chebyshev as cheby

    # deterministic problem, written to disk for the workers
    G = gsp.graphs.StochasticBlockModel(N=160, k=4, seed=7, connected=True)
    G.estimate_lmax(method='bounds')
    coo = G.W.tocoo()
    edge_path = tmp_path / 'edges.npz'
    np.savez(edge_path, src=coo.row, tgt=coo.col,
             weight=coo.data.astype(np.float64))

    x = np.random.default_rng(3).normal(size=(G.N, 4))
    c = np.asarray(cheby.cheby_coeff(
        gsp.filters.Heat(G, scale=[4.0, 12.0]).evaluate, G.lmax, m=8))
    ref = np.asarray(cheby.cheby_op(G.L, G.lmax, jnp.asarray(c),
                                    jnp.asarray(x)))
    np.savez(tmp_path / 'problem.npz', x=x, c=c, ref=ref,
             lmax=np.float64(G.lmax), N=np.int64(G.N))

    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if not k.startswith(('JAX_', 'XLA_'))}
    procs = []
    for pid in range(2):
        env = dict(env_base,
                   PALLAS_AXON_POOL_IPS='',
                   JAX_PLATFORMS='cpu',
                   XLA_FLAGS='--xla_force_host_platform_device_count=2',
                   PYGSP_DIST_COORD=f'127.0.0.1:{port}',
                   PYGSP_DIST_NPROC='2',
                   PYGSP_DIST_PID=str(pid),
                   PYGSP_DIST_DIR=str(tmp_path))
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=540) for p in procs]
    for p, (out, errtxt) in zip(procs, outs):
        assert p.returncode == 0, f'worker failed:\n{out}\n{errtxt}'

    # each worker reports its shard-level max error and edge-shard counts
    reports = [json.loads((tmp_path / f'report_{i}.json').read_text())
               for i in range(2)]
    assert sum(r['shard_edges'] for r in reports) == coo.nnz
    for r in reports:
        assert r['n_devices'] == 4
        assert r['process_count'] == 2
        assert r['max_rel_err'] < 1e-10, r
