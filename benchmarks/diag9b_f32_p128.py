"""Round-5 follow-ups: (a) f32 mono folds at R=2^16 (the f32 cell
FRAGDIAG9 missed — r17 f32 measured 12-13 ns/edge with painful
compiles), (b) the single-chip FULL BANK at window_rows=128 — the
stripped-SpMM probes measured dense f32 12% faster at P=128
(FRAGDIAG4), which would move the headline bench number if it holds
in-bank.

Run ON the TPU:  python benchmarks/diag9b_f32_p128.py
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sps

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from fragblock_diag9 import device0_block, log  # noqa: E402

K = 30
S = 128
SCALES = [5.0, 10.0, 25.0, 50.0]


def sync_chunks(chunks):
    return float(jnp.sum(chunks[0][::997, 0].astype(jnp.float32)))


def main():
    from pygsp_tpu.core.chunked import chunk_signal
    from pygsp_tpu.core.operators import LaplacianOp
    from pygsp_tpu.core.windowed import (windowed_from_host_coo,
                                         windowed_from_scipy)
    from pygsp_tpu.ops import chebyshev as cheby
    log('device:', jax.devices()[0])
    rng = np.random.default_rng(0)
    results = []

    def strip(mat):
        return dataclasses.replace(mat, levels=(),
                                   level_rows=jnp.zeros(0, jnp.int32))

    # ---- (a) f32 mono folds at R=2^16, P=128 ---------------------------
    def bench_spmm(mat, x_np, tag, nedges, n=10):
        xc = tuple(jnp.asarray(c) for c in chunk_signal(
            jnp.asarray(x_np), mat.chunk_rows))
        f = jax.jit(lambda m, c: m.spmm_chunks(c))
        t0 = time.time()
        sync_chunks(f(mat, xc))
        fc = time.time() - t0
        t0 = time.time()
        for _ in range(n - 1):
            f(mat, xc)
        sync_chunks(f(mat, xc))
        dt = (time.time() - t0) / n
        r = {'tag': tag, 'ms': round(dt * 1e3, 2),
             'ns_per_edge': round(dt / nedges * 1e9, 2),
             'first_call_s': round(fc, 1)}
        results.append(r)
        print(json.dumps(r), flush=True)

    for p, pr, pc, logN in ((4, 2, 2, 22), (8, 4, 2, 23),
                            (16, 4, 4, 24)):
        rk, ck, nr, ncol, n_local = device0_block(logN, pr, pc)
        x = rng.normal(size=(ncol, S)).astype(np.float32)
        mat = strip(windowed_from_host_coo(
            rk, ck, np.ones(rk.size, np.float32), nr, ncol,
            chunk_rows=1 << 16, window_rows=128, permute=None,
            dtype=np.float32))
        bench_spmm(mat, x, f'mono_p{p}_r16_P128_f32', rk.size)
        del mat
        if p >= 8:
            # P=256 (uint16 rowids): lambda_w doubles on the
            # fragmented shapes
            m2 = strip(windowed_from_host_coo(
                rk, ck, np.ones(rk.size, np.float32), nr, ncol,
                chunk_rows=1 << 17, window_rows=256, permute=None,
                dtype=np.float32))
            xc2 = tuple(jnp.asarray(c).astype(jnp.bfloat16)
                        for c in __import__(
                            'pygsp_tpu.core.chunked',
                            fromlist=['chunk_signal']).chunk_signal(
                                jnp.asarray(x), m2.chunk_rows))
            fb = jax.jit(lambda m, c: m.spmm_chunks(
                c, out_dtype=jnp.float32))
            t0 = time.time()
            sync_chunks(fb(m2.astype(jnp.bfloat16), xc2))
            fc = time.time() - t0
            mb = m2.astype(jnp.bfloat16)
            t0 = time.time()
            for _ in range(9):
                fb(mb, xc2)
            sync_chunks(fb(mb, xc2))
            dt = (time.time() - t0) / 10
            r = {'tag': f'mono_p{p}_r17_P256_bf16',
                 'ms': round(dt * 1e3, 2),
                 'ns_per_edge': round(dt / rk.size * 1e9, 2),
                 'L': int(m2.cols.shape[-1]),
                 'first_call_s': round(fc, 1)}
            results.append(r)
            print(json.dumps(r), flush=True)
            del m2, mb, xc2

    # ---- (b) single-chip full bank, P=64 vs P=128 ----------------------
    N1 = 1 << 20
    with np.load(os.path.join(REPO, '.bench_cache',
                              f'bafast_{N1}_8.npz')) as d:
        s1, t1 = d['src'], d['tgt']
    W1 = sps.csr_matrix(
        (np.ones(2 * len(s1), np.float32),
         (np.concatenate([s1, t1]), np.concatenate([t1, s1]))),
        shape=(N1, N1))
    W1.data[:] = 1.0
    W1.sum_duplicates()
    nnz = W1.nnz
    dw = np.ravel(W1.sum(axis=1)).astype(np.float32)
    lmax = float(2 * dw.max())

    def evaluate(lam):
        return jnp.exp(-jnp.asarray(SCALES, jnp.float32)[:, None]
                       * lam[None, :] / lmax)

    c = cheby.cheby_coeff(evaluate, lmax, m=K, dtype=jnp.float32)
    x_host = rng.normal(size=(N1, S)).astype(np.float32)
    x2ref = x_host[:, :2]
    import bench as benchmod
    cpu_eps, cpu_out = benchmod.reference_cpu_eps(W1, lmax,
                                                  np.asarray(c), x2ref)

    def sync(o):
        return float(jnp.sum(jnp.ravel(o)[::65537]))

    for P_ in (64, 128):
        Hh = windowed_from_scipy(W1, dtype=np.float32, window_rows=P_)
        for mode, vdt, cdt in (('f32', None, None),
                               ('bf16', jnp.bfloat16, jnp.bfloat16)):
            H = Hh if vdt is None else Hh.astype(vdt)
            Lop = LaplacianOp(offdiag=H, diag=jnp.asarray(dw),
                              lap_type='combinatorial')
            run = jax.jit(lambda L_, c_, x_: cheby.cheby_op(
                L_, lmax, c_, x_, carry_dtype=cdt, carry_tol=1.0))
            x = jnp.asarray(x_host)
            t0 = time.time()
            out = run(Lop, c, x)
            sync(out)
            fc = time.time() - t0
            # cheby_op's contract is ORIGINAL vertex order; the
            # reference helper returns filter 0 only
            dev = np.asarray(out[0, :, :2])
            err = float(np.abs(dev - cpu_out).max()
                        / (np.abs(cpu_out).max() + 1e-30))
            ts = []
            for _ in range(3):
                t0 = time.time()
                for _ in range(2):
                    run(Lop, c, x)
                o = run(Lop, c, x)
                sync(o)
                ts.append((time.time() - t0) / 3)
            dt = float(np.median(ts))
            f32_bytes = K * (nnz * (4 * S + 8) + N1 * S * 4)
            r = {'tag': f'bank_P{P_}_{mode}',
                 'per_bank_ms': round(dt * 1e3, 1),
                 'pct_f32_roofline': round(
                     100 * (f32_bytes / 160e9) / dt, 1),
                 'rel_err': err, 'first_call_s': round(fc, 1),
                 'L': int(Hh.cols.shape[-1])}
            results.append(r)
            print(json.dumps(r), flush=True)
            del H, Lop, out
        del Hh

    with open(os.path.join(REPO, 'DIAG9B_r5.json'), 'w') as f:
        json.dump({'metric': 'f32_mono_r16 + single_chip_bank_P128',
                   'rows': results}, f, indent=1)


if __name__ == '__main__':
    main()
