"""On-chip SpMM rate of a weak-scale FRAGMENTED step matrix (round 5).

The scaling model converts layout slot padding (WEAKPAD_r5) into
per-chip compute time via the measured ~3.6 ns/slot. That proxy was
measured on the dense single-chip layout; this validates it on the
actual weak-scale object — one device's 2-D ring step matrix (rows =
pc·n_local, cols = n_local, ~quarter of the bench density) built with
the round-5 layout (vertex-balanced slicing + bytes-true chunk cap +
fine slab widths / borrow span):

- f32 mode: max_chunk_rows = 2^17 (64 MB operand at S=128)
- bf16 mode (vals + signal bf16, f32 accumulation): 2^18

Each mode reports ms/SpMM, ns/slot, and edge-ops/s alongside the dense
bench matrix measured the same way in the same process.

Run ON the TPU:  python benchmarks/fragblock_onchip.py
"""

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
    path = os.path.join(REPO, '.bench_cache', f'bafast_{N}_8.npz')
    with np.load(path) as d:
        src, tgt = d['src'], d['tgt']
    W = sps.csr_matrix(
        (np.ones(2 * len(src), np.float32),
         (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
        shape=(N, N))
    W.data[:] = 1.0
    W.sum_duplicates()

    # device (0,0)'s ring step-1 matrix at p=4 (2x2), vertex-balanced
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
    col_slice = s_col[sel] // pc
    i0 = 0
    k = 1
    ksel = (i0 - col_slice) % pr == k
    rows_k = row_local[ksel]
    cols_k = r_col[sel][ksel]
    vals_k = np.ones(rows_k.size, np.float32)
    n_rows_k = pc * n_local
    log(f'frag block: {rows_k.size} edges over {n_rows_k} rows x '
        f'{n_local} cols ({rows_k.size / n_rows_k:.2f}/row)')

    results = []

    def bench_spmm(mat, x_np, tag, carry=None, n=12):
        xc = tuple(jnp.asarray(c) for c in chunk_signal(
            jnp.asarray(x_np), mat.chunk_rows))
        if carry is not None:
            xc = tuple(c.astype(carry) for c in xc)
        kw = {'out_dtype': jnp.float32} if carry is not None else {}
        f = jax.jit(lambda m, c: m.spmm_chunks(c, **kw))
        t0 = time.time()
        out = f(mat, xc)
        sync(out)
        log(f'{tag}: first call {time.time() - t0:.1f}s')
        t0 = time.time()
        for _ in range(n - 1):
            out = f(mat, xc)
        out = f(mat, xc)
        sync(out)
        dt = (time.time() - t0) / n
        nslots = int(np.prod(mat.cols.shape)) + sum(
            int(np.prod(np.asarray(c.cols).shape)) for c in mat.levels)
        r = {'tag': tag, 'ms': round(dt * 1e3, 1),
             'edges': int(mat.nnz), 'slots': nslots,
             'pad': round(nslots / mat.nnz, 3),
             'ns_per_slot': round(dt / nslots * 1e9, 2),
             'edge_ops_per_s': round(mat.nnz * S / dt / 1e9, 2),
             'span': int(mat.borrow_span),
             'chunk_rows': int(mat.chunk_rows),
             'L': int(mat.cols.shape[-1])}
        results.append(r)
        print(json.dumps(r), flush=True)
        return out

    x = rng.normal(size=(n_local, S)).astype(np.float32)

    # host reference on a sampled slice for validation
    A = sps.csr_matrix((vals_k, (rows_k, cols_k)),
                       shape=(n_rows_k, n_local))
    ref_rows = rng.integers(0, n_rows_k, 512)
    ref = A[ref_rows] @ x

    def validate(out, tag):
        y = np.concatenate([np.asarray(c) for c in out])
        err = (np.abs(y[ref_rows] - ref).max()
               / max(np.abs(ref).max(), 1e-9))
        log(f'{tag}: rel err vs host {err:.2e}')
        return err

    for cap, cname, carry in ((1 << 16, 'r4cap_f32', None),
                              (1 << 17, 'f32cap_f32', None),
                              (1 << 18, 'bf16cap_bf16', jnp.bfloat16)):
        t0 = time.time()
        mat = windowed_from_host_coo(
            rows_k, cols_k, vals_k, n_rows_k, n_local,
            chunk_rows=None, permute=None, dtype=np.float32)
        # apply the cap via auto_chunk_rows through the public arg
        from pygsp_tpu.core.windowed import auto_chunk_rows
        R = auto_chunk_rows(rows_k.size, n_rows_k, n_local,
                            max_rows=cap)
        if R != mat.chunk_rows:
            mat = windowed_from_host_coo(
                rows_k, cols_k, vals_k, n_rows_k, n_local,
                chunk_rows=R, permute=None, dtype=np.float32)
        log(f'{cname}: build {time.time() - t0:.0f}s R={mat.chunk_rows} '
            f'L={mat.cols.shape[-1]} span={mat.borrow_span}')
        if carry is not None:
            mat = mat.astype(jnp.bfloat16)
        out = bench_spmm(mat, x, cname, carry=carry)
        err = validate(out, cname)
        results[-1]['rel_err'] = float(err)
        del mat, out

    # dense single-chip bench matrix, same process, for the baseline
    # ns/slot (f32 and bf16)
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
    x1 = rng.normal(size=(N1, S)).astype(np.float32)
    m1 = windowed_from_scipy(W1, dtype=np.float32, permute=None)
    bench_spmm(m1, x1, 'dense_f32')
    bench_spmm(m1.astype(jnp.bfloat16), x1, 'dense_bf16',
               carry=jnp.bfloat16)

    with open(os.path.join(REPO, 'FRAGBLOCK_r5.json'), 'w') as f:
        json.dump({'metric': 'fragmented_block_onchip_spmm', 'S': S,
                   'rows': results}, f, indent=1)


if __name__ == '__main__':
    main()
