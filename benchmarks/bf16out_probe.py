"""bf16 fold OUTPUT (f32 MXU accumulation) at weak-scale + bench geometry.

PALLAS_FOLD_r5's decomposition showed the fragmented-shape fold is
BANDWIDTH-bound: the (NW, K·P, S) f32 window tensor + strip traffic is
205 B/slot at λ_w = 16 (vs 114 at single-chip density) — the 1/λ_w
growth that binds weak scaling. The bf16-carry recurrence re-rounds the
SpMM output to bf16 anyway, so emitting the fold in bf16 (accumulated
f32 on the MXU, convert fused into the dot epilogue — the round-5
acc_dt split in ``core/windowed.py``) halves it for one extra
same-scale rounding.

Cells: device-0 mono ring blocks at p ∈ {4, 8, 16, 64} (R=2^17, P=128,
bf16 vals+carry, levels stripped — FRAGDIAG9 continuity) and the
single-chip bench geometry (N=2^20 BA, auto layout, shuffle, levels
kept). Variants: out_dtype f32 (deployed baseline) vs bf16.

Run ON the TPU:
  nohup python benchmarks/bf16out_probe.py > /tmp/bf16out.log 2>&1 &
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

from fragblock_diag9 import device0_block  # noqa: E402

S = 128
BUDGET_S = float(os.environ.get('PROBE_BUDGET_S', 1500))
T0 = time.time()
RESULTS = []


def log(*a):
    print(f'[{time.time() - T0:7.1f}s]', *a, flush=True)


def sync(y):
    if isinstance(y, tuple):
        y = y[0]
    return float(jnp.sum(y[::997, 0].astype(jnp.float32)))


def bench(fn, args, tag, nedges, n=12, extra=None):
    f = jax.jit(fn)
    t0 = time.time()
    sync(f(*args))
    fc = time.time() - t0
    t0 = time.time()
    for _ in range(n - 1):
        f(*args)
    sync(f(*args))
    dt = (time.time() - t0) / n
    r = {'tag': tag, 'ms': round(dt * 1e3, 2),
         'ns_per_edge': round(dt / nedges * 1e9, 2),
         'first_call_s': round(fc, 1)}
    if extra:
        r.update(extra)
    RESULTS.append(r)
    log(json.dumps(r))
    return dt


def dump():
    with open(os.path.join(REPO, 'BF16OUT_r5.json'), 'w') as f:
        json.dump({'metric': 'bf16_fold_output_vs_f32', 'S': S,
                   'note': 'bf16 vals+carry throughout; _f32out = '
                   'deployed baseline (f32 window tensor + strip), '
                   '_bf16out = acc_dt split (f32 MXU accumulation, '
                   'bf16 leaves the dot); mono cells levels-stripped '
                   'at FRAGDIAG9 geometry, p1 = bench-config windowed '
                   'layout with levels',
                   'rows': RESULTS}, f, indent=1)


def check_err(mat, xc, tag):
    """bf16out vs f32out output parity on the same bf16 inputs."""
    ya = jax.jit(lambda m, c: m.spmm_chunks(
        c, out_dtype=jnp.float32))(mat, xc)
    yb = jax.jit(lambda m, c: m.spmm_chunks(
        c, out_dtype=jnp.bfloat16))(mat, xc)
    num = max(float(jnp.max(jnp.abs(ya[0] - yb[0].astype(jnp.float32)))),
              1e-30)
    den = max(float(jnp.max(jnp.abs(ya[0]))), 1e-30)
    r = {'tag': f'err_{tag}', 'rel_err_bf16out_vs_f32out': num / den}
    RESULTS.append(r)
    log(json.dumps(r))


def run_mono_cell(p, pr, pc, logN, also_f32):
    from pygsp_tpu.core.chunked import chunk_signal
    from pygsp_tpu.core.windowed import windowed_from_host_coo

    R, P = 1 << 17, 128
    rk, ck, nr, ncol, n_local = device0_block(logN, pr, pc)
    nedges = rk.size
    log(f'--- mono p={p} ({pr}x{pc}): {nedges} edges over {nr}x{ncol}')
    mat = windowed_from_host_coo(
        rk, ck, np.ones(rk.size, np.float32), nr, ncol,
        chunk_rows=R, window_rows=P, permute=None, dtype=np.float32)
    mat = dataclasses.replace(mat, levels=(),
                              level_rows=jnp.zeros(0, jnp.int32))
    mat = mat.astype(jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(ncol, S)).astype(np.float32)
    xc = tuple(c.astype(jnp.bfloat16) for c in
               chunk_signal(jnp.asarray(x), R))
    extra = {'p': p, 'L': int(mat.cols.shape[-1])}
    if also_f32:
        bench(lambda m, c: m.spmm_chunks(c, out_dtype=jnp.float32),
              (mat, xc), f'mono_p{p}_f32out', nedges, extra=extra)
    bench(lambda m, c: m.spmm_chunks(c, out_dtype=jnp.bfloat16),
          (mat, xc), f'mono_p{p}_bf16out', nedges, extra=extra)
    check_err(mat, xc, f'p{p}')
    del mat, xc


def run_p1_cell():
    from pygsp_tpu.core.chunked import chunk_signal, permute_in
    from pygsp_tpu.core.windowed import windowed_from_host_coo

    N = 1 << 20
    with np.load(os.path.join(REPO, '.bench_cache',
                              f'bafast_{N}_8.npz')) as d:
        src, tgt = d['src'], d['tgt']
    rows = np.concatenate([src, tgt])
    cols = np.concatenate([tgt, src])
    nedges = rows.size
    log(f'--- p1 bench geometry: {nedges} edges, N={N}')
    mat = windowed_from_host_coo(
        rows, cols, np.ones(nedges, np.float32), N, N,
        dtype=np.float32).astype(jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, S)).astype(np.float32))
    xc = tuple(c.astype(jnp.bfloat16) for c in
               chunk_signal(permute_in(mat, x), mat.chunk_rows))
    extra = {'p': 1, 'R': int(mat.chunk_rows),
             'P': int(mat.window_rows), 'L': int(mat.cols.shape[-1])}
    bench(lambda m, c: m.spmm_chunks(c, out_dtype=jnp.float32),
          (mat, xc), 'p1_f32out', nedges, extra=extra)
    bench(lambda m, c: m.spmm_chunks(c, out_dtype=jnp.bfloat16),
          (mat, xc), 'p1_bf16out', nedges, extra=extra)
    check_err(mat, xc, 'p1')
    del mat, xc


def main():
    log('device:', jax.devices()[0])
    run_p1_cell()
    dump()
    for p, pr, pc, logN, also in ((16, 4, 4, 24, False),
                                  (8, 4, 2, 23, True),
                                  (4, 2, 2, 22, False),
                                  (64, 8, 8, 24, True)):
        if time.time() - T0 > BUDGET_S:
            log('budget reached, stopping')
            break
        run_mono_cell(p, pr, pc, logN, also)
        dump()
    log('PROBE2_DONE')


if __name__ == '__main__':
    main()
