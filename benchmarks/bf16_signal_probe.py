"""Probe: does a bf16 signal carry speed up the windowed SpMM?

Round-3 sizing question. The windowed-compact gathers move ~512 B/slot
(S=128 f32 signal rows) at ~89% of the chip's read bandwidth, while the
full Chebyshev bank sits at ~71% of roofline — the slab gather itself is
the bound. The only way past it at fixed S is fewer bytes per gathered
row: carrying the per-chunk signal buffers in bf16 halves them. The
catch (round-1 gather probes) is that sub-cliff gather cost looked
per-row-overhead-bound, flat in row width — if that flatness extends to
256 B rows, bf16 buys nothing. This probe answers it empirically:
repeated windowed SpMM, f32 vs bf16 carry, same slabs, plus the bf16
error against a float64 host reference (accuracy budget for an opt-in
mode).

Run: nohup python benchmarks/bf16_signal_probe.py > /tmp/bf16probe.out 2>&1 &
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

sys.path.insert(0, '/root/repo')  # NOT via PYTHONPATH: that would shadow
# /root/.axon_site (the TPU plugin's sitecustomize) off the import path

from pygsp_tpu.core.windowed import windowed_from_scipy
from pygsp_tpu.core.chunked import chunk_signal
from pygsp_tpu.graphs.barabasialbert import ba_edges_fast

N = 2**19
S = 128
REPS = 10

src, tgt = ba_edges_fast(N, m0=8, m=8, seed=7)
W = sps.csr_matrix(
    (np.ones(2 * len(src), np.float32),
     (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
    shape=(N, N))
W.data[:] = 1.0   # (the COO->CSR constructor already summed duplicates)
print(f'graph N={N} nnz={W.nnz}', flush=True)

mat = windowed_from_scipy(W, dtype=np.float32)
slots = mat.n_slots + sum(l.cols.shape[0] * l.cols.shape[1]
                          for l in mat.levels)
print(f'windowed: L={mat.cols.shape[-1]} pad={slots / mat.nnz:.2f}',
      flush=True)

rng = np.random.default_rng(0)
x = rng.standard_normal((N, S)).astype(np.float32)
y_ref = W.astype(np.float64) @ x.astype(np.float64)


@jax.jit
def step(m, xc):
    # m passed as an argument, never closed over (CLAUDE.md: closures
    # bake the slab arrays in as constants)
    for _ in range(REPS):
        xc = m.spmm_chunks(xc)  # y feeds back: keeps all REPS live
    return xc


def run(dtype):
    m = mat if dtype == jnp.float32 else mat.astype(dtype)
    xc = chunk_signal(jnp.asarray(x, dtype=dtype), m.chunk_rows)

    t0 = time.time()
    out = step(m, xc)
    float(jnp.sum(out[0][::4096, 0]))  # force sync (see CLAUDE.md)
    compile_s = time.time() - t0
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = step(m, xc)
        float(jnp.sum(out[0][::4096, 0]))
        best = min(best, time.time() - t0)
    # single-application error vs f64 host reference — through the
    # full-array API (spmm_chunks takes PERMUTED chunks when the builder
    # shuffle-relabels; m @ x applies entry/exit permutes itself).
    # NOTE (advisor r2): this path accumulates in the carry dtype too, so
    # for bf16 the printed err is a FULL-bf16 worst-case bound; the
    # shipped opt-in mode keeps f32 accumulation (out_dtype=f32) and its
    # measured errors live in benchmarks/bf16_error_curves.py.
    y1 = np.asarray(m @ jnp.asarray(x, dtype=dtype), np.float64)
    rel = np.linalg.norm(y1 - y_ref) / np.linalg.norm(y_ref)
    rate = REPS * mat.nnz * S / best
    print(f'{np.dtype(dtype).name}: {best*1e3:.1f} ms/{REPS} spmm '
          f'-> {rate:.3e} edge-ops/s, 1-apply rel err {rel:.2e} '
          f'(full-{np.dtype(dtype).name} bound), '
          f'first call (compile + {REPS} spmm) {compile_s:.1f}s',
          flush=True)
    return rate


r32 = run(jnp.float32)
r16 = run(jnp.bfloat16)
print(f'bf16 speedup: {r16 / r32:.2f}x', flush=True)
