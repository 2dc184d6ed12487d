"""Per-chip MATVEC compute with the FUSED ring fold (round 5).

FRAGDIAG5 measured the separate per-step-matrix folds at true
weak-scale geometry: the pr strips dominated (p=16: 4 x 52.7 ms vs the
59.5 ms ideal). This measures the round-5 fix — all pr ring-step
matrices folded as ONE fused multi-matrix SpMM
(windowed_spmm_chunks_multi, summing window tensors before the strip):
per-chip per-matvec compute at p in {4, 16, 64}, bf16 and f32, plus the
dense single-chip control in the same process.

Run ON the TPU:  python benchmarks/fragblock_diag6.py
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(chunks):
    return float(jnp.sum(chunks[0][::997, 0].astype(jnp.float32)))


def device0_steps(logN, p):
    """All pr ring step matrices of device 0 at a square p-chip mesh."""
    N = 1 << logN
    with np.load(os.path.join(REPO, '.bench_cache',
                              f'bafast_{N}_8.npz')) as d:
        src, tgt = d['src'], d['tgt']
    rows_all = np.concatenate([src, tgt])
    cols_all = np.concatenate([tgt, src])
    perm = np.random.default_rng(0x5EED).permutation(N)
    prow, pcol = perm[rows_all], perm[cols_all]
    pr = pc = int(round(p ** 0.5))
    n_local = N // p
    s_row, r_row = prow // n_local, prow % n_local
    s_col, r_col = pcol // n_local, pcol % n_local
    dev = (s_row // pc) * pc + (s_col % pc)
    sel = dev == 0
    row_local = (s_row[sel] % pc) * n_local + r_row[sel]
    col_slice = s_col[sel] // pc
    rcl = r_col[sel]
    steps = []
    for k in range(pr):
        m = (0 - col_slice) % pr == k
        steps.append((row_local[m].astype(np.int64),
                      rcl[m].astype(np.int64)))
    return steps, pc * n_local, n_local


def main():
    from pygsp_tpu.core.chunked import chunk_signal
    from pygsp_tpu.core.windowed import (windowed_from_host_coo,
                                         windowed_from_scipy,
                                         windowed_spmm_chunks_multi)
    log('device:', jax.devices()[0])
    S = 128
    rng = np.random.default_rng(0)
    results = []

    def strip(mat):
        return dataclasses.replace(mat, levels=(),
                                   level_rows=jnp.zeros(0, jnp.int32))

    def bench_multi(mats, x_np, tag, nedges, carry=None, n=12):
        xc = tuple(jnp.asarray(c) for c in chunk_signal(
            jnp.asarray(x_np), mats[0].chunk_rows))
        if carry is not None:
            xc = tuple(c.astype(carry) for c in xc)
        xs = [xc] * len(mats)
        kw = {'out_dtype': jnp.float32} if carry is not None else {}
        f = jax.jit(lambda ms, c: windowed_spmm_chunks_multi(
            ms, [c] * len(ms), **kw))
        t0 = time.time()
        sync(f(mats, xc))
        fc = time.time() - t0
        t0 = time.time()
        for _ in range(n - 1):
            f(mats, xc)
        sync(f(mats, xc))
        dt = (time.time() - t0) / n
        nslots = sum(int(np.prod(m.cols.shape)) for m in mats)
        r = {'tag': tag, 'ms': round(dt * 1e3, 2), 'edges': int(nedges),
             'slots': nslots, 'n_mats': len(mats),
             'ns_per_edge': round(dt / nedges * 1e9, 2),
             'pad': round(nslots / nedges, 3),
             'R': int(mats[0].chunk_rows), 'P': int(mats[0].window_rows),
             'first_call_s': round(fc, 1)}
        results.append(r)
        print(json.dumps(r), flush=True)
        del xc, xs

    configs = {4: (22, None), 16: (24, None)}
    step_cache = {}
    for p, (logN, _) in configs.items():
        steps, nr, nc = device0_steps(logN, p)
        step_cache[p] = (steps, nr, nc)
    # p64 synthesized from p16 (rows doubled, each step split in two)
    steps16, nr16, nc16 = step_cache[16]
    rng64 = np.random.default_rng(7)
    steps64 = []
    for rk, ck in steps16:
        half = rng64.random(rk.size) < 0.5
        roff = rng64.integers(0, 2, size=rk.size) * nr16
        steps64.append((rk[half] + roff[half], ck[half]))
        steps64.append((rk[~half] + roff[~half], ck[~half]))
    step_cache[64] = (steps64, 2 * nr16, nc16)

    for p, (steps, nr, nc) in step_cache.items():
        tot_edges = sum(rk.size for rk, _ in steps)
        log(f'p={p}: {len(steps)} steps, {tot_edges} edges over '
            f'{nr} x {nc}')
        for R in ((1 << 16), (1 << 17)):
            mats, span = [], None
            for rk, ck in steps:
                m = windowed_from_host_coo(
                    rk, ck, np.ones(rk.size, np.float32), nr, nc,
                    chunk_rows=R, window_rows=128, permute=None,
                    borrow_span=span, dtype=np.float32)
                span = m.borrow_span
                mats.append(strip(m))
            x = rng.normal(size=(nc, S)).astype(np.float32)
            tagb = f'p{p}_r{R.bit_length() - 1}_P128'
            bench_multi([m.astype(jnp.bfloat16) for m in mats], x,
                        tagb + '_bf16', tot_edges, carry=jnp.bfloat16)
            if R == 1 << 16:
                bench_multi(mats, x, tagb + '_f32', tot_edges)
            del mats

    # dense control (single matrix through the same fused entry)
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
    m1 = windowed_from_scipy(W1, dtype=np.float32)
    x1 = rng.normal(size=(N1, S)).astype(np.float32)[np.asarray(m1.perm)]
    m1 = strip(m1)
    bench_multi([m1.astype(jnp.bfloat16)], x1, 'dense_bf16', m1.nnz,
                carry=jnp.bfloat16)
    bench_multi([m1], x1, 'dense_f32', m1.nnz)

    with open(os.path.join(REPO, 'FRAGDIAG6_r5.json'), 'w') as f:
        json.dump({'metric': 'fused_ring_fold_per_chip_matvec', 'S': S,
                   'rows': results}, f, indent=1)


if __name__ == '__main__':
    main()
