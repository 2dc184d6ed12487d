"""Slab-shape sweep: why does the real slab path run 5.8 ns/slot when
the probe's L=128 layout ran 3.5?

Synthetic slabs at bench scale through the REAL windowed_spmm_chunks
(no levels), sweeping (window_rows P, slab width L). If only L=128 (or
power-of-two L) hits 3.5, the fold/gather tiling wants aligned slot
widths and the format should pick P so that the target width IS
aligned.

Run: nohup python benchmarks/windowed_diag2.py > /tmp/windowed_diag2.out 2>&1 &
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp

from pygsp_tpu.core import windowed as wd

N = 1 << 20
R = 1 << 16
C = N // R
S = 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def measure(call, out_pick, n=6, reps=3):
    o = call()
    float(jnp.sum(out_pick(o)[::257]))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(n - 1):
            call()
        o = call()
        float(jnp.sum(out_pick(o)[::257]))
        ts.append((time.time() - t0) / n)
    return float(np.median(ts))


def main():
    log(f'device: {jax.devices()[0]}')
    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(N, S)).astype(np.float32)
    xt = tuple(jnp.asarray(x_np[c * R:(c + 1) * R]) for c in range(C))

    for P, L in ((64, 72), (64, 64), (64, 80), (64, 96), (64, 128),
                 (128, 128), (128, 144), (32, 40)):
        NW = R // P
        shape = (C, C, NW, L)
        cols = rng.integers(0, R, size=shape).astype(np.int32)
        vals = rng.random(size=shape).astype(np.float32)
        rowid = np.sort(rng.integers(0, 2 * P, size=shape), axis=-1)
        mat = wd.WindowedELLMatrix(
            cols=jnp.asarray(cols), vals=jnp.asarray(vals),
            rowid=jnp.asarray(rowid.astype(np.uint8)),
            levels=(), level_rows=jnp.zeros(0, jnp.int32),
            rowptr=jnp.zeros(N + 1, jnp.int32),
            n_rows=N, n_cols=N, nnz=int(np.prod(shape)),
            chunk_rows=R, window_rows=P)
        slots = int(np.prod(shape))
        jf = jax.jit(lambda m, xc: wd.windowed_spmm_chunks(m, xc))
        t0 = time.time()
        o = jf(mat, xt)
        float(jnp.sum(o[0][::257, 0]))
        comp = time.time() - t0
        dt = measure(lambda: jf(mat, xt), lambda o: o[0][:, 0])
        emit(tag=f'P{P}_L{L}', compile_s=round(comp, 1),
             slots=slots, ns_per_slot=dt / slots * 1e9, ms=dt * 1e3)
    log('done')


if __name__ == '__main__':
    main()
