"""Frag-block per-slot cost: shape-lever sweep (round 5).

fragblock_diag measured the fragmented 2-D step matrix at 6.35 ns/slot
(bf16, levels stripped) vs 3.44 dense — pad is fixed, the per-slot rate
is now the binding weak-scale constraint. Sweep the layout/body shape
levers on the bf16 deployed mode (and a couple of f32 points):

  window_rows 64 vs 128, slab width, chunk size, inner window-group
  size (PYGSP_WINDOW_STEP / BODY_MB).

Run ON the TPU:  python benchmarks/fragblock_diag2.py
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

    def strip(mat):
        return dataclasses.replace(mat, levels=(),
                                   level_rows=jnp.zeros(0, jnp.int32))

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
        nslots = int(np.prod(mat.cols.shape))
        r = {'tag': tag, 'ms': round(dt * 1e3, 1), 'slots': nslots,
             'ns_per_slot': round(dt / nslots * 1e9, 2),
             'ns_per_edge': round(dt / rows_k.size * 1e9, 2),
             'R': int(mat.chunk_rows), 'P': int(mat.window_rows),
             'L': int(mat.cols.shape[-1]), 'first_call_s': round(fc, 1)}
        results.append(r)
        print(json.dumps(r), flush=True)

    x = rng.normal(size=(n_local, S)).astype(np.float32)

    def build(R=None, P=64, L=None, span=2):
        return windowed_from_host_coo(
            rows_k, cols_k, vals_k, n_rows_k, n_local, chunk_rows=R,
            window_rows=P, slab_width=L, permute=None, borrow_span=span,
            dtype=np.float32)

    # round C: P=128 family + bf16 span4
    for tag, kw, env in (
            ('bf16_r15_P128', dict(R=1 << 15, P=128), {}),
            ('bf16_r16_P64_span4', dict(R=1 << 16, span=4), {}),
            ('bf16_r16_P128_L48', dict(R=1 << 16, P=128, L=48), {}),
            ('bf16_r14_P128', dict(R=1 << 14, P=128), {}),
    ):
        for k, v in env.items():
            os.environ[k] = v
        try:
            mat = strip(build(**kw)).astype(jnp.bfloat16)
            bench(mat, x, tag, carry=jnp.bfloat16)
            del mat
        finally:
            for k in env:
                del os.environ[k]

    # f32 spot checks
    for tag, kw in (('f32_r15_P128', dict(R=1 << 15, P=128)),):
        mat = strip(build(**kw))
        bench(mat, x, tag)
        del mat

    # dense bench graph with P=128 (does the baseline ALSO improve?)
    from pygsp_tpu.core.windowed import windowed_from_scipy
    W1 = None
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
    for P_, tagd in ((64, 'dense_P64'), (128, 'dense_P128')):
        m1 = windowed_from_scipy(W1, dtype=np.float32, window_rows=P_)
        mperm = np.asarray(m1.perm)
        x1 = rng.normal(size=(N1, S)).astype(np.float32)[mperm]
        m1s = strip(m1).astype(jnp.bfloat16)
        nedges = m1.nnz

        def bench_dense(mat, x_np, tag, carry=None, n=12):
            from pygsp_tpu.core.chunked import chunk_signal
            xc = tuple(jnp.asarray(c) for c in chunk_signal(
                jnp.asarray(x_np), mat.chunk_rows))
            if carry is not None:
                xc = tuple(c.astype(carry) for c in xc)
            kw2 = {'out_dtype': jnp.float32} if carry is not None else {}
            fd = jax.jit(lambda m, c: m.spmm_chunks(c, **kw2))
            sync(fd(mat, xc))
            t0 = time.time()
            for _ in range(n - 1):
                fd(mat, xc)
            sync(fd(mat, xc))
            dt = (time.time() - t0) / n
            nslots = int(np.prod(mat.cols.shape))
            r = {'tag': tag, 'ms': round(dt * 1e3, 1), 'slots': nslots,
                 'ns_per_slot': round(dt / nslots * 1e9, 2),
                 'ns_per_edge': round(dt / nedges * 1e9, 2),
                 'R': int(mat.chunk_rows), 'P': int(mat.window_rows),
                 'L': int(mat.cols.shape[-1])}
            results.append(r)
            print(json.dumps(r), flush=True)

        bench_dense(m1s, x1, f'{tagd}_bf16', carry=jnp.bfloat16)
        if P_ == 128:
            bench_dense(strip(m1), x1, f'{tagd}_f32')
        del m1, m1s

    with open(os.path.join(REPO, 'FRAGDIAG4_r5.json'), 'w') as f:
        json.dump({'metric': 'fragblock_shape_sweep', 'rows': results},
                  f, indent=1)


if __name__ == '__main__':
    main()
