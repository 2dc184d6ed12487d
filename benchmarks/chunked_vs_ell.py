"""Chunked multi-level ELL vs plain multi-level ELL on the bench graph.

Measures, on the real chip: build time, first-compile time, steady-state
per-filterbank time, and validates device output against the reference
arithmetic (host scipy) before reporting — a crashed backend can lie.

Run: nohup python benchmarks/chunked_vs_ell.py > /tmp/chunked_bench.out 2>&1 &
"""

import json
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, '/root/repo')

N = 1 << 20
M_ATTACH = 8
K_ORDER = 30
N_SIGNALS = 128
SCALES = [5.0, 10.0, 25.0, 50.0]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    log(kw)


def main():
    import jax
    import jax.numpy as jnp
    log(f'device: {jax.devices()[0]}')

    import bench as benchmod
    src, tgt = benchmod.get_graph()
    W = sps.csr_matrix(
        (np.ones(2 * len(src), dtype=np.float32),
         (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
        shape=(N, N))
    W.data[:] = 1.0
    W.sum_duplicates()
    nnz = W.nnz
    log(f'graph: N={N}, nnz={nnz}')
    dw = np.ravel(W.sum(axis=1)).astype(np.float32)
    lmax = float(2 * dw.max())

    from pygsp_tpu.core import chunked as ck
    from pygsp_tpu.core import sparse as core_sparse
    from pygsp_tpu.core.operators import LaplacianOp
    from pygsp_tpu.ops import chebyshev as cheby

    Wneg = W.copy()
    Wneg.data = -Wneg.data

    def evaluate(lam):
        return jnp.exp(-jnp.asarray(SCALES, jnp.float32)[:, None]
                       * lam[None, :] / lmax)

    c = cheby.cheby_coeff(evaluate, lmax, m=K_ORDER, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(N, N_SIGNALS)).astype(np.float32))

    # host reference slice for the correctness gate
    cpu_eps, cpu_out = benchmod.reference_cpu_eps(
        W, lmax, np.asarray(c), np.asarray(x)[:, :8])
    log(f'reference scipy: {cpu_eps:.3e} edge-ops/s')

    def sync(o):
        return float(jnp.sum(o[0, ::4096, 0]))

    def drive(tag, L):
        run = jax.jit(lambda L, c, x: cheby.cheby_op(L, lmax, c, x))
        t0 = time.time()
        out = run(L, c, x)
        sync(out)
        t_compile = time.time() - t0
        n_iter = 3
        t0 = time.time()
        for _ in range(n_iter):
            out = run(L, c, x)
            sync(out)
        dt = (time.time() - t0) / n_iter
        dev_slice = np.asarray(out[0, :, :8])
        err = float(np.abs(dev_slice - cpu_out).max()
                    / (np.abs(cpu_out).max() + 1e-30))
        eps = K_ORDER * nnz * N_SIGNALS / dt
        emit(tag=tag, compile_s=round(t_compile, 1),
             per_bank_ms=round(dt * 1e3, 1), edge_ops_per_s=eps,
             ns_per_edge_gather=dt / (K_ORDER * nnz) * 1e9, rel_err=err)
        del out
        return eps

    # ---- chunked ----
    t0 = time.time()
    H = ck.chunked_from_scipy(Wneg, dtype=np.float32)
    widths = {}
    n_levels = 0
    slot_total = 0
    for (i, cc), blk in zip(H.block_keys, H.blocks):
        widths[(i, cc)] = blk.cols.shape[1]
        slot_total += blk.cols.shape[0] * blk.cols.shape[1]
        n_levels += len(blk.levels)
        slot_total += sum(l.cols.shape[0] * l.cols.shape[1]
                          for l in blk.levels)
    log(f'chunked build: {time.time()-t0:.1f}s; blocks={len(H.blocks)}, '
        f'levels={n_levels}, slots={slot_total} '
        f'(pad {slot_total/nnz:.2f}x), widths={widths}')
    Lc = LaplacianOp(offdiag=H, diag=jnp.asarray(dw),
                     lap_type='combinatorial')
    drive('chunked', Lc)
    del Lc, H

    # ---- plain ELL (round-1 path) ----
    t0 = time.time()
    He = core_sparse.ell_from_scipy(Wneg, dtype=np.float32)
    log(f'ell build: {time.time()-t0:.1f}s; width={He.ell_width}')
    Le = LaplacianOp(offdiag=He, diag=jnp.asarray(dw),
                     lap_type='combinatorial')
    drive('ell', Le)


if __name__ == '__main__':
    main()
