"""Tall-mesh (pc=1) fused per-chip matvec (round 5).

Square 2-D meshes fragment per-chip compute two ways at weak scale: the
partial strips span pc·n_local rows and the per-step density falls like
deg/pr. A TALL mesh (pr=p, pc=1) keeps the strip at n_local rows — and
the fused multi-matrix fold (windowed_spmm_chunks_multi) materializes
it ONCE for all pr steps — at the cost of ring wire growing like
(pr-1)·n_local instead of 2√p·n_local. This measures the per-chip
matvec at (4,1), (8,1), (16,1) weak-share geometry (n_local = 2^20,
16.8M edges/chip) in bf16 and f32.

Run ON the TPU:  python benchmarks/fragblock_diag8.py
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from fragblock_diag6 import log  # noqa: E402


def sync(chunks):
    return float(jnp.sum(chunks[0][::997, 0].astype(jnp.float32)))


def device0_steps_tall(logN, p):
    """Ring step matrices of device 0 on a (pr=p, pc=1) mesh: step k is
    the (n_local x n_local) block gathering from source slice
    (0 - k) mod p; device 0's row group is just its own n_local rows."""
    N = 1 << logN
    with np.load(os.path.join(REPO, '.bench_cache',
                              f'bafast_{N}_8.npz')) as d:
        src, tgt = d['src'], d['tgt']
    rows_all = np.concatenate([src, tgt])
    cols_all = np.concatenate([tgt, src])
    perm = np.random.default_rng(0x5EED).permutation(N)
    prow, pcol = perm[rows_all], perm[cols_all]
    n_local = N // p
    s_row, r_row = prow // n_local, prow % n_local
    s_col, r_col = pcol // n_local, pcol % n_local
    sel = s_row == 0
    steps = []
    for k in range(p):
        m = sel & ((0 - s_col) % p == k)
        steps.append((r_row[m].astype(np.int64),
                      r_col[m].astype(np.int64)))
    return steps, n_local


def main():
    from pygsp_tpu.core.chunked import chunk_signal
    from pygsp_tpu.core.windowed import (windowed_from_host_coo,
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

    for p, logN in ((4, 22), (16, 24)):
        steps, n_local = device0_steps_tall(logN, p)
        tot = sum(rk.size for rk, _ in steps)
        log(f'tall p={p}: {len(steps)} steps, {tot} edges, '
            f'n_local={n_local}')
        for R, P_ in ((1 << 16, 128), (1 << 17, 128)):
            mats, span = [], None
            for rk, ck in steps:
                m = windowed_from_host_coo(
                    rk, ck, np.ones(rk.size, np.float32), n_local,
                    n_local, chunk_rows=R, window_rows=P_, permute=None,
                    borrow_span=span, dtype=np.float32)
                span = m.borrow_span
                mats.append(strip(m))
            x = rng.normal(size=(n_local, S)).astype(np.float32)
            tagb = f'tall{p}_r{R.bit_length() - 1}_P{P_}'
            bench_multi([m.astype(jnp.bfloat16) for m in mats], x,
                        tagb + '_bf16', tot, carry=jnp.bfloat16)
            if R == 1 << 16:
                bench_multi(mats, x, tagb + '_f32', tot)
            del mats
        if p == 4:
            # p=8 tall synthesized: split each of the 4 steps in two by
            # random column-halving (keeps BA column marginals)
            rng8 = np.random.default_rng(9)
            steps8 = []
            for rk, ck in steps:
                half = rng8.random(rk.size) < 0.5
                steps8.append((rk[half], ck[half]))
                steps8.append((rk[~half], ck[~half]))
            mats, span = [], None
            for rk, ck in steps8:
                m = windowed_from_host_coo(
                    rk, ck, np.ones(rk.size, np.float32), n_local,
                    n_local, chunk_rows=1 << 17, window_rows=128,
                    permute=None, borrow_span=span, dtype=np.float32)
                span = m.borrow_span
                mats.append(strip(m))
            x = rng.normal(size=(n_local, S)).astype(np.float32)
            bench_multi([m.astype(jnp.bfloat16) for m in mats], x,
                        'tall8_r17_P128_bf16', tot, carry=jnp.bfloat16)
            del mats

    with open(os.path.join(REPO, 'FRAGDIAG8_r5.json'), 'w') as f:
        json.dump({'metric': 'tall_mesh_fused_per_chip_matvec', 'S': S,
                   'rows': results}, f, indent=1)


if __name__ == '__main__':
    main()
