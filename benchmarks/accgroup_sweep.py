"""Sweep the Chebyshev accumulator grouping factor g on the bench graph.

The per-step accumulator update reads+writes all Nf (N, S) buffers; running
g recurrence steps per scan iteration folds g updates into one pass at the
cost of carrying g materialized t_new buffers (512 MB each at the bench
config). This probe measures the whole K=30 bank per g to pick the default
in ``ops/chebyshev.py``.

Run on the TPU: ``python benchmarks/accgroup_sweep.py``
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

N = 1 << 20
M_ATTACH = 8
K_ORDER = 30
N_SIGNALS = 128
SCALES = [5.0, 10.0, 25.0, 50.0]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         '..', '.bench_cache')
    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.path.join(cache, 'xla_cache'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception as e:
        log(f'no compile cache: {e}')

    path = os.path.join(cache, f'bafast_{N}_{M_ATTACH}.npz')
    with np.load(path) as d:
        src, tgt = d['src'], d['tgt']
    import scipy.sparse as sps
    W = sps.csr_matrix(
        (np.ones(2 * len(src), dtype=np.float32),
         (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
        shape=(N, N))
    W.data[:] = 1.0
    W.sum_duplicates()
    nnz = W.nnz
    dw = np.ravel(W.sum(axis=1)).astype(np.float32)
    lmax = float(2 * dw.max())

    from pygsp_tpu.core import windowed as core_windowed
    from pygsp_tpu.core.operators import LaplacianOp
    from pygsp_tpu.ops import chebyshev as cheby

    Wneg = W.copy()
    Wneg.data = -Wneg.data
    t0 = time.time()
    H = core_windowed.windowed_from_scipy(Wneg, dtype=np.float32)
    L = LaplacianOp(offdiag=H, diag=jnp.asarray(dw),
                    lap_type='combinatorial')
    log(f'built in {time.time()-t0:.0f}s; device={jax.devices()[0]}')

    def evaluate(lam):
        return jnp.exp(-jnp.asarray(SCALES, jnp.float32)[:, None]
                       * lam[None, :] / lmax)

    c = cheby.cheby_coeff(evaluate, lmax, m=K_ORDER, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(N, N_SIGNALS)).astype(np.float32))

    def sync(o):
        return float(jnp.sum(o[0, ::4096, 0]))

    for g in (4, 7, 14, 28):
        os.environ['PYGSP_CHEBY_ACC_GROUP'] = str(g)
        run = jax.jit(lambda L, c, x, _g=g: cheby.cheby_op(L, lmax, c, x))
        t0 = time.time()
        out = run(L, c, x)
        sync(out)
        comp = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            run(L, c, x)
            run(L, c, x)
            out = run(L, c, x)
            sync(out)
            times.append((time.time() - t0) / 3)
        dt = float(np.median(times))
        eps = K_ORDER * nnz * N_SIGNALS / dt
        print(json.dumps({'g': g, 'ms': dt * 1e3, 'edge_ops_s': eps,
                          'compile_s': comp}), flush=True)


if __name__ == '__main__':
    main()
