"""Decompose the fragmented-block SpMM slowdown (fragblock_onchip saw
9-12.6 ns/slot vs ~4.2 dense). Variants isolate: residue-tier scatter
(BA hub rows), chunk size R, borrow span, output height, and the dense
baseline with the bench's shuffle permute.

Run ON the TPU:  python benchmarks/fragblock_diag.py
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


def main():
    from pygsp_tpu.core.chunked import chunk_signal
    from pygsp_tpu.core.windowed import windowed_from_host_coo
    log('device:', jax.devices()[0])
    S = 128
    rng = np.random.default_rng(0)
    N = 1 << 22
    with np.load(os.path.join(REPO, '.bench_cache',
                              f'bafast_{N}_8.npz')) as d:
        src, tgt = d['src'], d['tgt']
    W = sps.csr_matrix(
        (np.ones(2 * len(src), np.float32),
         (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
        shape=(N, N))
    W.data[:] = 1.0
    W.sum_duplicates()
    perm = np.random.default_rng(0x5EED).permutation(N)
    coo = W.tocoo()
    prow, pcol = perm[coo.row], perm[coo.col]
    p, pr, pc = 4, 2, 2
    n_local = N // p
    s_row, r_row = prow // n_local, prow % n_local
    s_col, r_col = pcol // n_local, pcol % n_local
    dev = (s_row // pc) * pc + (s_col % pc)
    sel = dev == 0
    row_local = (s_row[sel] % pc) * n_local + r_row[sel]
    ksel = (0 - s_col[sel] // pc) % pr == 1
    rows_k = row_local[ksel]
    cols_k = r_col[sel][ksel]
    vals_k = np.ones(rows_k.size, np.float32)
    n_rows_k = pc * n_local

    results = []

    def bench(mat, x_np, tag, carry=None, n=12):
        xc = tuple(jnp.asarray(c) for c in chunk_signal(
            jnp.asarray(x_np), mat.chunk_rows))
        if carry is not None:
            xc = tuple(c.astype(carry) for c in xc)
        kw = {'out_dtype': jnp.float32} if carry is not None else {}
        f = jax.jit(lambda m, c: m.spmm_chunks(c, **kw))
        t0 = time.time()
        sync(f(mat, xc))
        fc = time.time() - t0
        t0 = time.time()
        for _ in range(n - 1):
            f(mat, xc)
        sync(f(mat, xc))
        dt = (time.time() - t0) / n
        nslots = int(np.prod(mat.cols.shape)) + sum(
            int(np.prod(np.asarray(c.cols).shape)) for c in mat.levels)
        r = {'tag': tag, 'ms': round(dt * 1e3, 1),
             'slots': nslots, 'ns_per_slot': round(dt / nslots * 1e9, 2),
             'span': int(mat.borrow_span), 'R': int(mat.chunk_rows),
             'L': int(mat.cols.shape[-1]),
             'n_levels': len(mat.levels),
             'first_call_s': round(fc, 1)}
        results.append(r)
        print(json.dumps(r), flush=True)

    def strip(mat):
        return dataclasses.replace(mat, levels=(),
                                   level_rows=jnp.zeros(0, jnp.int32))

    x = rng.normal(size=(n_local, S)).astype(np.float32)

    for R, span, tag in ((1 << 16, 2, 'r16_s2'),
                         (1 << 17, 2, 'r17_s2'),
                         (1 << 18, 2, 'r18_s2')):
        mat = windowed_from_host_coo(rows_k, cols_k, vals_k, n_rows_k,
                                     n_local, chunk_rows=R, permute=None,
                                     borrow_span=span, dtype=np.float32)
        bench(mat, x, f'{tag}_full')
        bench(strip(mat), x, f'{tag}_noslvl')
        if R == 1 << 18:
            m16 = mat.astype(jnp.bfloat16)
            bench(m16, x, f'{tag}_bf16_full', carry=jnp.bfloat16)
            bench(strip(m16), x, f'{tag}_bf16_noslvl', carry=jnp.bfloat16)
        del mat

    # half-height block (square): output-size effect
    half = rows_k < n_local
    mat = windowed_from_host_coo(rows_k[half], cols_k[half],
                                 vals_k[half], n_local, n_local,
                                 chunk_rows=1 << 17, permute=None,
                                 borrow_span=2, dtype=np.float32)
    bench(strip(mat), x, 'square_r17_s2_noslvl')
    del mat

    # dense bench baseline WITH the shuffle permute (true single-chip)
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
    from pygsp_tpu.core.windowed import windowed_from_scipy
    m1 = windowed_from_scipy(W1, dtype=np.float32)   # permute='shuffle'
    c1 = W1.tocoo()
    ip = np.asarray(m1.iperm)
    x1 = rng.normal(size=(N1, S)).astype(np.float32)
    # feed pre-permuted chunks like the hot loop does
    x1p = x1[np.asarray(m1.perm)]
    bench(m1, x1p, 'dense_shuf_f32')
    bench(m1.astype(jnp.bfloat16), x1p, 'dense_shuf_bf16',
          carry=jnp.bfloat16)

    with open(os.path.join(REPO, 'FRAGDIAG_r5.json'), 'w') as f:
        json.dump({'metric': 'fragblock_decomposition', 'rows': results},
                  f, indent=1)


if __name__ == '__main__':
    main()
