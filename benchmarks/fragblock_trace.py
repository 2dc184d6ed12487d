"""Profile the dense vs fragmented windowed SpMM on-chip and print the
per-op time breakdown from the XLA trace (round 5 — the shape sweep
could not recover the frag block's ~1.5x bf16 per-edge inflation, so
find where the time actually goes).

Run ON the TPU:  python benchmarks/fragblock_trace.py
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

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


def top_ops(trace_dir, n=18):
    files = glob.glob(os.path.join(trace_dir, 'plugins', 'profile',
                                   '*', '*.trace.json.gz'))
    agg = defaultdict(float)
    total = 0.0
    for fp in files:
        with gzip.open(fp, 'rt') as f:
            data = json.load(f)
        for ev in data.get('traceEvents', []):
            if ev.get('ph') != 'X':
                continue
            pid_name = ev.get('pid')
            name = ev.get('name', '')
            dur = ev.get('dur', 0)
            args = ev.get('args', {}) or {}
            # keep device-side XLA ops only
            if 'run_id' in args or 'tf_op' in args or '%' in name \
                    or 'fusion' in name or 'copy' in name \
                    or 'dynamic' in name or 'all-' in name:
                agg[name.split('.')[0]] += dur
                total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:n]
    return total, rows


def main():
    import dataclasses
    from pygsp_tpu.core.chunked import chunk_signal
    from pygsp_tpu.core.windowed import (windowed_from_host_coo,
                                         windowed_from_scipy)
    log('device:', jax.devices()[0])
    S = 128
    rng = np.random.default_rng(0)

    def load(logN):
        N = 1 << logN
        with np.load(os.path.join(REPO, '.bench_cache',
                                  f'bafast_{N}_8.npz')) as d:
            src, tgt = d['src'], d['tgt']
        W = sps.csr_matrix(
            (np.ones(2 * len(src), np.float32),
             (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
            shape=(N, N))
        W.data[:] = 1.0
        W.sum_duplicates()
        return W

    def strip(mat):
        return dataclasses.replace(mat, levels=(),
                                   level_rows=jnp.zeros(0, jnp.int32))

    # frag block (p=4 ring step-1, device 0) at R=2^17 bf16
    W = load(22)
    N = W.shape[0]
    perm = np.random.default_rng(0x5EED).permutation(N)
    coo = W.tocoo()
    prow, pcol = perm[coo.row], perm[coo.col]
    pc, pr = 2, 2
    n_local = N // 4
    s_row, r_row = prow // n_local, prow % n_local
    s_col, r_col = pcol // n_local, pcol % n_local
    dev = (s_row // pc) * pc + (s_col % pc)
    sel = dev == 0
    row_local = (s_row[sel] % pc) * n_local + r_row[sel]
    ksel = (0 - s_col[sel] // pc) % pr == 1
    rows_k = row_local[ksel]
    cols_k = r_col[sel][ksel]
    frag = strip(windowed_from_host_coo(
        rows_k, cols_k, np.ones(rows_k.size, np.float32),
        2 * n_local, n_local, chunk_rows=1 << 17, permute=None,
        dtype=np.float32)).astype(jnp.bfloat16)
    xf = rng.normal(size=(n_local, S)).astype(np.float32)

    W1 = load(20)
    dense = windowed_from_scipy(W1, dtype=np.float32)
    densep = np.asarray(dense.perm)
    dense = strip(dense).astype(jnp.bfloat16)
    xd = rng.normal(size=(1 << 20, S)).astype(np.float32)[densep]

    f = jax.jit(lambda m, c: m.spmm_chunks(c, out_dtype=jnp.float32))

    for tag, mat, x in (('dense', dense, xd), ('frag', frag, xf)):
        xc = tuple(jnp.asarray(c).astype(jnp.bfloat16)
                   for c in chunk_signal(jnp.asarray(x), mat.chunk_rows))
        sync(f(mat, xc))          # compile
        sync(f(mat, xc))
        tdir = f'/tmp/trace_{tag}'
        os.system(f'rm -rf {tdir}')
        with jax.profiler.trace(tdir):
            for _ in range(4):
                out = f(mat, xc)
            sync(out)
        time.sleep(2)
        total, rows = top_ops(tdir)
        print(f'== {tag}: total device-op us {total:.0f}', flush=True)
        for name, dur in rows:
            print(f'   {dur:10.0f} us  {name[:110]}', flush=True)


if __name__ == '__main__':
    main()
