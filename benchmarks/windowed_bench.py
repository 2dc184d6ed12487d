"""Bench-scale measurement of the windowed-compact format (core.windowed)
on the real BA graph: layout stats, SpMM ms, full K=30 bank edge-ops/s,
compile times, in-run validation vs scipy.

Run: nohup python benchmarks/windowed_bench.py > /tmp/windowed_bench.out 2>&1 &
"""

import json
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp

import bench as benchmod
from pygsp_tpu.core import windowed as wd
from pygsp_tpu.core.operators import LaplacianOp
from pygsp_tpu.ops import chebyshev as cheby

N = benchmod.N
S = 128
K = 30
SCALES = [5.0, 10.0, 25.0, 50.0]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def sync(o):
    return float(jnp.sum(jnp.ravel(o)[::4097]))


def measure(call, out_pick, n=6, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(n - 1):
            call()
        o = call()
        sync(out_pick(o))
        ts.append((time.time() - t0) / n)
    return float(np.median(ts))


def main():
    log(f'device: {jax.devices()[0]}')
    src, tgt = benchmod.get_graph()
    W = sps.csr_matrix(
        (np.ones(2 * len(src), dtype=np.float32),
         (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
        shape=(N, N))
    W.data[:] = 1.0
    W.sum_duplicates()
    nnz = W.nnz
    dw = np.ravel(W.sum(axis=1)).astype(np.float32)
    lmax = float(2 * dw.max())
    coo = W.tocoo()

    t0 = time.time()
    H = wd.windowed_from_host_coo(coo.row, coo.col, -coo.data, N, N,
                                  dtype=np.float32)
    build_s = time.time() - t0
    n_out, n_src, NW, L = H.cols.shape
    lvl_slots = sum(int(np.prod(l.cols.shape)) for l in H.levels)
    emit(tag='layout', L=L, NW=NW, P=H.window_rows,
         slab_slots=H.n_slots, level_slots=lvl_slots,
         level_rows=int(H.level_rows.shape[0]), n_levels=len(H.levels),
         pad=round((H.n_slots + lvl_slots) / nnz, 3),
         build_s=round(build_s, 1))

    Lop = LaplacianOp(offdiag=H, diag=jnp.asarray(dw),
                      lap_type='combinatorial')
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(N, S)).astype(np.float32))

    # plain SpMM (L @ x) timing
    run1 = jax.jit(lambda H, x: wd.windowed_spmm(H, x))
    t0 = time.time()
    o = run1(H, x)
    sync(o)
    comp1 = time.time() - t0
    # validate SpMM against scipy on a column slice
    want = (-W) @ np.asarray(x[:, :4], np.float64)
    got = np.asarray(o[:, :4], np.float64)
    err = float(np.abs(got - want).max() / (np.abs(want).max() + 1e-30))
    dt = measure(lambda: run1(H, x), lambda o: o)
    tot_slots = H.n_slots + lvl_slots
    emit(tag='spmm', compile_s=round(comp1, 1), ms=dt * 1e3,
         rel_err=err, ns_per_slot=dt / tot_slots * 1e9,
         ns_per_edge=dt / nnz * 1e9)

    # full Chebyshev bank
    def evaluate(lam):
        return jnp.exp(-jnp.asarray(SCALES, jnp.float32)[:, None]
                       * lam[None, :] / lmax)

    c = cheby.cheby_coeff(evaluate, lmax, m=K, dtype=jnp.float32)
    run = jax.jit(lambda L, c, x: cheby.cheby_op(L, lmax, c, x))
    t0 = time.time()
    out = run(Lop, c, x)
    sync(out[0])
    comp = time.time() - t0
    dt = measure(lambda: run(Lop, c, x), lambda o: o[0], n=3)
    edge_ops = K * nnz * S
    # validate vs reference arithmetic
    cpu_eps, cpu_out = benchmod.reference_cpu_eps(W, lmax, np.asarray(c),
                                                  np.asarray(x)[:, :8])
    dev = np.asarray(out[0, :, :8])
    err = float(np.abs(dev - cpu_out).max() / (np.abs(cpu_out).max() + 1e-30))
    emit(tag='cheby_bank', K=K, S=S, nf=len(SCALES),
         compile_s=round(comp, 1), per_bank_ms=dt * 1e3, rel_err=err,
         edge_ops_per_s=edge_ops / dt,
         pct_roofline=round(100 * (K * (nnz * (4 * S + 9) + N * S * 4)
                                   / 160e9) / dt, 1))
    log('done')


if __name__ == '__main__':
    main()
