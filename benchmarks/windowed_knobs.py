"""Roofline push: measure bench-config bank time across layout/recurrence
knobs — accumulation group g, window_rows P, slab width L. One process,
graph built once, each knob variant compiled + timed + validated.

Run: nohup python benchmarks/windowed_knobs.py > /tmp/knobs.out 2>&1 &
"""

import json
import os
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

    def evaluate(lam):
        return jnp.exp(-jnp.asarray(SCALES, jnp.float32)[:, None]
                       * lam[None, :] / lmax)

    c = cheby.cheby_coeff(evaluate, lmax, m=K, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(N, S)).astype(np.float32))
    cpu_eps, cpu_out = benchmod.reference_cpu_eps(W, lmax, np.asarray(c),
                                                  np.asarray(x)[:, :4])

    cases = [
        # (name, build kwargs, env overrides)
        ('base_g4', {}, {}),
        ('g8', {}, {'PYGSP_CHEBY_ACC_GROUP': '8'}),
        ('g14', {}, {'PYGSP_CHEBY_ACC_GROUP': '14'}),
        ('P128', {'window_rows': 128}, {}),
        ('P32', {'window_rows': 32}, {}),
        ('L64', {'slab_width': 64}, {}),
        ('L80', {'slab_width': 80}, {}),
    ]
    H_cache = {}
    for name, bkw, env in cases:
        key = tuple(sorted(bkw.items()))
        if key not in H_cache:
            t0 = time.time()
            H_cache[key] = wd.windowed_from_host_coo(
                coo.row, coo.col, -coo.data, N, N, dtype=np.float32, **bkw)
            log(f'layout {bkw}: {time.time() - t0:.0f}s')
        H = H_cache[key]
        lvl = sum(int(np.prod(l.cols.shape)) for l in H.levels)
        for k, v in env.items():
            os.environ[k] = v
        try:
            Lop = LaplacianOp(offdiag=H, diag=jnp.asarray(dw),
                              lap_type='combinatorial')
            run = jax.jit(lambda L_, c_, x_: cheby.cheby_op(L_, lmax, c_, x_))
            t0 = time.time()
            out = run(Lop, c, x)
            sync(out[0])
            comp = time.time() - t0
            dev = np.asarray(out[0, :, :4])
            err = float(np.abs(dev - cpu_out).max()
                        / (np.abs(cpu_out).max() + 1e-30))
            ts = []
            for _ in range(3):
                t0 = time.time()
                for _ in range(2):
                    run(Lop, c, x)
                o = run(Lop, c, x)
                sync(o[0])
                ts.append((time.time() - t0) / 3)
            dt = float(np.median(ts))
            emit(tag=name, per_bank_ms=round(dt * 1e3, 1),
                 L=int(H.cols.shape[3]), P=H.window_rows,
                 pad=round((H.n_slots + lvl) / nnz, 3),
                 compile_s=round(comp, 1), rel_err=err,
                 edge_ops_per_s=K * nnz * S / dt,
                 pct_roofline=round(
                     100 * (K * (nnz * (4 * S + 8) + N * S * 4) / 160e9)
                     / dt, 1))
        except Exception as e:  # noqa: BLE001
            emit(tag=name, error=f'{type(e).__name__}: {e}'[:200])
        finally:
            for k in env:
                del os.environ[k]
    log('done')


if __name__ == '__main__':
    main()
