"""Per-step-matrix fold time at TRUE weak-scale geometry, p in {4,16,64}
(round 5 — the SCALING_r5 compute input).

Step matrix of the 2-D ring layout at p chips (square mesh, weak scale,
n_local = 2^20): (pc·n_local rows x n_local cols) with E_c/pr edges,
E_c = 16.8M.  p=4 from the N=2^22 graph, p=16 from N=2^24; p=64
synthesized from the p=16 block (rows doubled, edges halved — keeps the
BA column marginals).  Measured at the best shapes from FRAGDIAG4
(R=2^16, P=128) in bf16 (deployed fast mode) and f32.

Run ON the TPU:  python benchmarks/fragblock_diag5.py
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


def step_block(logN, p):
    """Device-0 ring step-1 block at a square mesh of p chips."""
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
    ksel = (0 - s_col[sel] // pc) % pr == 1
    return (row_local[ksel].astype(np.int64),
            r_col[sel][ksel].astype(np.int64), pc * n_local, n_local)


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
        sync(f(mat, xc))
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
             'L': int(mat.cols.shape[-1])}
        results.append(r)
        print(json.dumps(r), flush=True)
        del xc

    blocks = {}
    r4, c4, nr4, nc4 = step_block(22, 4)
    blocks[4] = (r4, c4, nr4, nc4)
    r16, c16, nr16, nc16 = step_block(24, 16)
    blocks[16] = (r16, c16, nr16, nc16)
    # p=64 synthesized from the p=16 block: rows doubled, edges halved
    rng64 = np.random.default_rng(7)
    keep = rng64.random(r16.size) < 0.5
    roff = rng64.integers(0, 2, size=int(keep.sum())) * nr16
    blocks[64] = (r16[keep] + roff, c16[keep], 2 * nr16, nc16)

    for p, (rk, ck, nr, nc) in blocks.items():
        log(f'p={p}: {rk.size} edges over {nr} x {nc} '
            f'({rk.size / nr:.2f}/row)')
        for R, P_ in ((1 << 16, 128), (1 << 17, 128)):
            mat = strip(windowed_from_host_coo(
                rk, ck, np.ones(rk.size, np.float32), nr, nc,
                chunk_rows=R, window_rows=P_, permute=None,
                dtype=np.float32))
            x = rng.normal(size=(nc, S)).astype(np.float32)
            tagbase = f'p{p}_r{R.bit_length() - 1}_P{P_}'
            bench(mat.astype(jnp.bfloat16), x, tagbase + '_bf16',
                  rk.size, carry=jnp.bfloat16)
            if R == 1 << 16:
                bench(mat, x, tagbase + '_f32', rk.size)
            del mat

    with open(os.path.join(REPO, 'FRAGDIAG5_r5.json'), 'w') as f:
        json.dump({'metric': 'true_share_step_matrix_folds', 'S': S,
                   'rows': results}, f, indent=1)


if __name__ == '__main__':
    main()
