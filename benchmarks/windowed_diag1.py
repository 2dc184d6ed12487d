"""Where do the extra ~45 ms/step go in the windowed cheby bank?

Bank measures 120 ms/step; the probe's gather+fold says ~70 ms for the
slab slots. Variants at bench scale isolate:
  A  spmm_chunks on separate tuple buffers (probe conditions + levels)
  B  5 chained spmm_chunks (output slices re-chunked -> next input):
     marginal step cost — does re-chunking re-introduce the cliff?
  C  bank K=30 nf=4 (reference point, known 3.62 s)
  D  bank K=30 nf=1: isolates the per-filter acc traffic
  E  bank nf=4 with fold precision DEFAULT: are HIGHEST's extra MXU
     passes free inside the big fused program?
  F  bank nf=4 with levels+scatter stripped: their true in-bank cost

Run: nohup python benchmarks/windowed_diag1.py > /tmp/windowed_diag1.out 2>&1 &
"""

import dataclasses
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def sync(o):
    return float(jnp.sum(jnp.ravel(o)[::4097]))


def measure(call, out_pick, n=4, reps=3):
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
    H = wd.windowed_from_host_coo(coo.row, coo.col, -coo.data, N, N,
                                  dtype=np.float32)
    R = H.chunk_rows
    log(f'layout pad={(H.n_slots + sum(int(np.prod(l.cols.shape)) for l in H.levels)) / nnz:.3f}')

    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(N, S)).astype(np.float32)
    xt = tuple(jnp.asarray(x_np[s:s + R]) for s in range(0, N, R))

    # ---- A: spmm_chunks on separate buffers -----------------------------
    ja = jax.jit(lambda H, xc: wd.windowed_spmm_chunks(H, xc))
    t0 = time.time()
    o = ja(H, xt)
    sync(o[0])
    comp = time.time() - t0
    dt = measure(lambda: ja(H, xt), lambda o: o[0])
    emit(tag='A_tuple_buffers', compile_s=round(comp, 1), ms=dt * 1e3,
         ns_per_edge=dt / nnz * 1e9)

    # ---- B: 5 chained steps (re-chunked outputs) ------------------------
    def chain(H, xc):
        for _ in range(5):
            xc = wd.windowed_spmm_chunks(H, xc)
        return xc

    jb = jax.jit(chain)
    t0 = time.time()
    o = jb(H, xt)
    sync(o[0])
    comp = time.time() - t0
    dt = measure(lambda: jb(H, xt), lambda o: o[0], n=3)
    emit(tag='B_chained5', compile_s=round(comp, 1), ms_per_step=dt / 5 * 1e3,
         ns_per_edge_step=dt / 5 / nnz * 1e9)

    # ---- C/D/E/F: banks --------------------------------------------------
    x = jnp.asarray(x_np)

    def bank(Lop, scales, tag, H_override=None):
        Hx = H_override if H_override is not None else Lop.offdiag

        def evaluate(lam):
            return jnp.exp(-jnp.asarray(scales, jnp.float32)[:, None]
                           * lam[None, :] / lmax)

        c = cheby.cheby_coeff(evaluate, lmax, m=K, dtype=jnp.float32)
        Lx = LaplacianOp(offdiag=Hx, diag=Lop.diag, lap_type='combinatorial')
        run = jax.jit(lambda L, c, x: cheby.cheby_op(L, lmax, c, x))
        t0 = time.time()
        out = run(Lx, c, x)
        sync(out[0])
        comp = time.time() - t0
        dt = measure(lambda: run(Lx, c, x), lambda o: o[0], n=3)
        emit(tag=tag, compile_s=round(comp, 1), per_bank_ms=dt * 1e3,
             ms_per_step=dt / K * 1e3,
             edge_ops_per_s=K * nnz * S / dt * (len(scales) and 1))

    Lop = LaplacianOp(offdiag=H, diag=jnp.asarray(dw),
                      lap_type='combinatorial')
    bank(Lop, [5.0, 10.0, 25.0, 50.0], 'C_nf4')
    bank(Lop, [10.0], 'D_nf1')

    orig = wd.FOLD_PRECISION
    wd.FOLD_PRECISION = jax.lax.Precision.DEFAULT
    bank(Lop, [5.0, 10.0, 25.0, 50.0], 'E_nf4_default_prec')
    wd.FOLD_PRECISION = orig

    # F: strip levels
    H_nolvl = dataclasses.replace(H, levels=(),
                                  level_rows=jnp.zeros(0, jnp.int32))
    bank(Lop, [5.0, 10.0, 25.0, 50.0], 'F_nf4_nolevels', H_override=H_nolvl)
    log('done')


if __name__ == '__main__':
    main()
