"""MONOLITHIC per-chip fold at weak-scale geometry (round 5).

DIAG6/8 showed per-chip matvec cost grows with the NUMBER of separate
step-matrix folds, not with strips or edges. The fix candidate: keep
the ring collection (pr-1 shifts), then CONCATENATE the collected
buffers' chunk tuples (free — R divides n_local, so tuple concatenation
is zero-copy) and fold ONE monolithic windowed matrix over the full
column group (n_row_ext x pr*n_local, all E_c edges, dense-like
lambda_w) — one einsum per window group, the single-chip structure.

Measures the monolithic fold at p in {4, 8, 16, 64} device-0 geometry
(square-ish meshes), bf16 + f32, against the dense control.

Run ON the TPU:  python benchmarks/fragblock_diag9.py
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


def device0_block(logN, pr, pc):
    """Device-0's FULL local block on a (pr, pc) mesh: rows in the row
    group [0, pc*n_local), cols in the column group [0, pr*n_local) in
    ring-collection order (source slice (0-k) mod pr at offset k)."""
    N = 1 << logN
    with np.load(os.path.join(REPO, '.bench_cache',
                              f'bafast_{N}_8.npz')) as d:
        src, tgt = d['src'], d['tgt']
    rows_all = np.concatenate([src, tgt])
    cols_all = np.concatenate([tgt, src])
    perm = np.random.default_rng(0x5EED).permutation(N)
    prow, pcol = perm[rows_all], perm[cols_all]
    p = pr * pc
    n_local = N // p
    s_row, r_row = prow // n_local, prow % n_local
    s_col, r_col = pcol // n_local, pcol % n_local
    dev = (s_row // pc) * pc + (s_col % pc)
    sel = dev == 0
    row_local = (s_row[sel] % pc) * n_local + r_row[sel]
    k = (0 - s_col[sel] // pc) % pr          # ring position of source
    col_local = k * n_local + r_col[sel]
    return (row_local.astype(np.int64), col_local.astype(np.int64),
            pc * n_local, pr * n_local, n_local)


def main():
    from pygsp_tpu.core.chunked import chunk_signal
    from pygsp_tpu.core.windowed import windowed_from_host_coo
    log('device:', jax.devices()[0])
    S = 128
    rng = np.random.default_rng(0)
    results = []

    def strip(mat):
        return dataclasses.replace(mat, levels=(),
                                   level_rows=jnp.zeros(0, jnp.int32))

    def bench(mat, x_np, tag, nedges, carry=None, n=12):
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
        nslots = int(np.prod(mat.cols.shape))
        r = {'tag': tag, 'ms': round(dt * 1e3, 2), 'edges': int(nedges),
             'slots': nslots,
             'ns_per_edge': round(dt / nedges * 1e9, 2),
             'pad': round(nslots / nedges, 3),
             'R': int(mat.chunk_rows), 'P': int(mat.window_rows),
             'L': int(mat.cols.shape[-1]), 'first_call_s': round(fc, 1)}
        results.append(r)
        print(json.dumps(r), flush=True)

    cells = ((4, 2, 2, 22), (8, 4, 2, 23), (16, 4, 4, 24),
             (64, 8, 8, 24))
    for p, pr, pc, logN in cells:
        path = os.path.join(REPO, '.bench_cache',
                            f'bafast_{1 << logN}_8.npz')
        if not os.path.exists(path):
            from pygsp_tpu.graphs.barabasialbert import ba_edges_fast
            t0 = time.time()
            s_, t_ = ba_edges_fast(1 << logN, m0=8, m=8, seed=42)
            np.savez(path, src=s_, tgt=t_)
            log(f'generated 2^{logN} in {time.time() - t0:.0f}s')
        rk, ck, nr, ncol, n_local = device0_block(logN, pr, pc)
        share = rk.size / 16.8e6
        log(f'p={p} ({pr}x{pc}): {rk.size} edges over {nr} x {ncol} '
            f'(share {share:.2f})')
        for R, P_ in ((1 << 16, 128), (1 << 17, 128)):
            mat = strip(windowed_from_host_coo(
                rk, ck, np.ones(rk.size, np.float32), nr, ncol,
                chunk_rows=R, window_rows=P_, permute=None,
                dtype=np.float32))
            x = rng.normal(size=(ncol, S)).astype(np.float32)
            tagb = f'mono_p{p}_{pr}x{pc}_r{R.bit_length() - 1}_P{P_}'
            bench(mat.astype(jnp.bfloat16), x, tagb + '_bf16', rk.size,
                  carry=jnp.bfloat16)
            if R == 1 << 17:
                bench(mat, x, tagb + '_f32', rk.size)
            del mat

    with open(os.path.join(REPO, 'FRAGDIAG9_r5.json'), 'w') as f:
        json.dump({'metric': 'monolithic_per_chip_fold', 'S': S,
                   'rows': results}, f, indent=1)


if __name__ == '__main__':
    main()
