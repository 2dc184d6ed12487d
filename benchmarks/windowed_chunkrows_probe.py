"""Probe: windowed SpMM rate vs (N, chunk_rows) block shape.

The size sweep (singlechip_scaling.py) found N=2^19 running 2.5x slower
PER SLOT than N=2^20 with identical per-out-chunk work: the only shape
difference is (n_src=8, L=144) vs (n_src=16, L=72) — fewer, wider slab
gathers. This probe times the K=30 bank at several chunk_rows per size
to find whether keeping n_src (and thus the window mean and L) at the
2^20 values restores the rate.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

K_ORDER = 30
N_SIGNALS = 128
SCALES = [5.0, 10.0, 25.0, 50.0]
# (N, chunk_rows, window_rows): round 2 established λ_w ≈ 64 as the
# fast shape; the P=128 rows test whether halving the gather operand
# (R=2^15) while holding λ_w at 64 via wider windows buys more
CASES = [(1 << 20, 1 << 15, 128), (1 << 20, 1 << 16, 128)]
# measured 2026-08-18 (P=64 rows; the λ_w ≈ 64 evidence):
#  N=2^19 R=2^16: L=144 n_src=8  1.05e10 | R=2^15: L=72 n_src=16 2.72e10
#  N=2^19 R=2^14: L=40  n_src=32 2.31e10
#  N=2^18 R=2^16: L=280 n_src=4  1.53e10 | R=2^14: L=72 n_src=16 2.53e10


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
    from pygsp_tpu.ops import chebyshev as cheby

    def sync(o):
        return float(jnp.sum(o[0, ::4096, 0]))

    graphs = {}
    for N, R, P in CASES:
        if N not in graphs:
            with np.load(os.path.join(cache, f'bafast_{N}_8.npz')) as d:
                src, tgt = d['src'], d['tgt']
            W = sps.csr_matrix(
                (np.ones(2 * len(src), dtype=np.float32),
                 (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
                shape=(N, N))
            W.data[:] = 1.0
            W.sum_duplicates()
            graphs[N] = W
        W = graphs[N]
        nnz = W.nnz
        dw = np.ravel(W.sum(axis=1)).astype(np.float32)
        lmax = float(2 * dw.max())
        Wneg = W.copy()
        Wneg.data = -Wneg.data
        H = core_windowed.windowed_from_scipy(Wneg, dtype=np.float32,
                                              chunk_rows=R, window_rows=P)
        L = LaplacianOp(offdiag=H, diag=jnp.asarray(dw),
                        lap_type='combinatorial')
        pad = H.n_slots / nnz

        def evaluate(lam, _lmax=lmax):
            return jnp.exp(-jnp.asarray(SCALES, jnp.float32)[:, None]
                           * lam[None, :] / _lmax)

        c = cheby.cheby_coeff(evaluate, lmax, m=K_ORDER, dtype=jnp.float32)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(N, N_SIGNALS)).astype(np.float32))
        run = jax.jit(lambda L, c, x, _lmax=lmax: cheby.cheby_op(
            L, _lmax, c, x))
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
        print(json.dumps({
            'N': N, 'chunk_rows': R, 'window_rows': P,
            'L': int(H.cols.shape[3]),
            'n_src': int(H.cols.shape[2]), 'pad': round(pad, 3),
            'ms': dt * 1e3,
            'edge_ops_s': K_ORDER * nnz * N_SIGNALS / dt,
            'compile_s': comp}), flush=True)
        del out, x, L, H


if __name__ == '__main__':
    main()
