"""Single-chip size scaling of the windowed Chebyshev hot path.

Measures edge-ops/s and %-of-read-roofline for the K=30 4-filter heat
bank on BA(m=8) graphs of increasing size on the real chip — evidence
that throughput holds the documented O(K·|E|) complexity from 4M to
34M stored edges (the reference documents the complexity claim only,
``pygsp/filters/__init__.py:90-94``). Writes one JSON line per size;
the driver-style artifact lives in ``SINGLECHIP_r2.json``.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

K_ORDER = 30
SCALES = [5.0, 10.0, 25.0, 50.0]
# (N, S, acc_group). N=2^21 at S=128 does NOT fit this 16 GB chip in
# the plain path even with acc_group=1 (4.3 GB accumulators + 3.2 GB
# recurrence state + temps; S=64 is no escape — 64-lane arrays pad 2x
# on the (8,128) tiling with 27% fragmentation). The large-N datapoint
# comes from benchmarks/config5_100m.py instead (201M stored edges via
# bf16 slabs + donated signals: 1.31e10 edge-ops/s).
SIZES = [(1 << 18, 128, None), (1 << 19, 128, None),
         (1 << 20, 128, None)]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sps

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         '..', '.bench_cache')
    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.path.join(cache, 'xla_cache'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception as e:
        log(f'no compile cache: {e}')

    from pygsp_tpu.core import windowed as core_windowed
    from pygsp_tpu.core.operators import LaplacianOp
    from pygsp_tpu.graphs.barabasialbert import ba_edges_fast
    from pygsp_tpu.ops import chebyshev as cheby

    def sync(o):
        return float(jnp.sum(o[0, ::4096, 0]))

    results = []
    for N, n_signals, acc_group in SIZES:
        if acc_group is None:
            os.environ.pop('PYGSP_CHEBY_ACC_GROUP', None)
        else:
            os.environ['PYGSP_CHEBY_ACC_GROUP'] = str(acc_group)
        path = os.path.join(cache, f'bafast_{N}_8.npz')
        if os.path.exists(path):
            with np.load(path) as d:
                src, tgt = d['src'], d['tgt']
        else:
            src, tgt = ba_edges_fast(N, m0=8, m=8, seed=42)
            np.savez(path, src=src, tgt=tgt)
        W = sps.csr_matrix(
            (np.ones(2 * len(src), dtype=np.float32),
             (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
            shape=(N, N))
        W.data[:] = 1.0
        W.sum_duplicates()
        nnz = W.nnz
        dw = np.ravel(W.sum(axis=1)).astype(np.float32)
        lmax = float(2 * dw.max())
        Wneg = W.copy()
        Wneg.data = -Wneg.data
        H = core_windowed.windowed_from_scipy(Wneg, dtype=np.float32)
        L = LaplacianOp(offdiag=H, diag=jnp.asarray(dw),
                        lap_type='combinatorial')

        def evaluate(lam, _lmax=lmax):
            return jnp.exp(-jnp.asarray(SCALES, jnp.float32)[:, None]
                           * lam[None, :] / _lmax)

        c = cheby.cheby_coeff(evaluate, lmax, m=K_ORDER, dtype=jnp.float32)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(N, n_signals)).astype(np.float32))
        run = jax.jit(lambda L, c, x, _lmax=lmax: cheby.cheby_op(
            L, _lmax, c, x))

        t0 = time.time()
        out = run(L, c, x)
        sync(out)
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            run(L, c, x)
            run(L, c, x)
            out = run(L, c, x)
            sync(out)
            times.append((time.time() - t0) / 3)
        dt = float(np.median(times))
        eps = K_ORDER * nnz * n_signals / dt
        min_bytes = K_ORDER * (nnz * (4 * n_signals + 8)
                               + N * n_signals * 4)
        pct = 100.0 * (min_bytes / 160e9) / dt
        row = {'N': N, 'S': n_signals, 'nnz': int(nnz), 'ms_per_bank': dt * 1e3,
               'edge_ops_s': eps, 'pct_roofline': pct,
               'compile_s': compile_s}
        results.append(row)
        print(json.dumps(row), flush=True)
        del out, x, L, H
        # write incrementally: a late-size OOM must not lose earlier rows
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               '..', 'SINGLECHIP_r2.json'), 'w') as f:
            json.dump({'config': {'K': K_ORDER,
                                  'graph': 'BA m=8',
                                  'device': 'TPU v5 lite'},
                       'sizes': results}, f, indent=1)


if __name__ == '__main__':
    main()
