"""Microbenchmark v3: what makes a gather operand VMEM-fast?

probe2 established: a small *parameter* array (<= 2^17 x 128 f32) gathers
at ~2.7 ns/row; slices/views of big arrays gather at ~6-11 ns/row; above
the size cliff everything is ~11 ns/row (flat in width to 512 floats);
unique scatters are 11-19 ns/row. This probe answers the questions the
chunked-Chebyshev design hinges on:

  A. VMEM gather width scaling (does 2.7 ns/row hold at 256/512 floats?)
  B. does a TUPLE of chunk params gather fast per chunk?
  C. does an in-jit INTERMEDIATE (what a recurrence carry is) gather fast?
  D. does it survive a lax.scan (chunked carry across steps)?
  E. MXU economics: ns per 128x128xS dense tile op, f32 and bf16 operand
  F. segment-sum by matmul: (w,R) one-hot-free reduce alternatives
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(o):
    if isinstance(o, (tuple, list)):
        o = o[0]
    return float(jnp.sum(jnp.ravel(o)[:4]))


def emit(**kw):
    print(json.dumps(kw), flush=True)
    log(kw)


RTT = 0.0


def timeit(fn, *args, n=8):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(n - 1):
        fn(*args)
    out = fn(*args)
    sync(out)
    return max((time.time() - t0 - RTT) / n, 1e-9)


def measure_rtt():
    global RTT
    tiny = jnp.zeros((8,), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    sync(f(tiny))
    ts = []
    for _ in range(5):
        t0 = time.time()
        sync(f(tiny))
        ts.append(time.time() - t0)
    RTT = float(np.median(ts))
    emit(probe='rtt', secs=RTT)


def ell_like(tab, cols, vals):
    y = jnp.zeros((cols.shape[0], tab.shape[1]), jnp.float32)
    for j in range(cols.shape[1]):
        y = y + vals[:, j:j + 1] * tab[cols[:, j]].astype(jnp.float32)
    return y


def main():
    log(f'device: {jax.devices()[0]}')
    rng = np.random.default_rng(0)
    measure_rtt()

    WSLOT = 8

    # ---- A. VMEM gather width scaling ------------------------------------
    for logR, W in ((16, 128), (15, 256), (14, 512), (16, 256), (16, 512)):
        R = 1 << logR
        rout = (1 << 20) // (W // 128)
        tab = jnp.asarray(rng.normal(size=(R, W)).astype(np.float32))
        cols = jnp.asarray(
            rng.integers(0, R, size=(rout, WSLOT)).astype(np.int32))
        vals = jnp.asarray(rng.normal(size=(rout, WSLOT)).astype(np.float32))
        dt = timeit(jax.jit(ell_like), tab, cols, vals)
        nrows = rout * WSLOT
        emit(probe='vmem_width', operand_rows=R, width_floats=W,
             ns_per_row=dt / nrows * 1e9, gbps=nrows * W * 4 / dt / 1e9)
        del tab, cols, vals

    # ---- B. tuple-of-chunk-params gathers --------------------------------
    S = 128
    R = 1 << 20
    for C in (8, 16):
        K = R // C
        chunks = tuple(
            jnp.asarray(rng.normal(size=(K, S)).astype(np.float32))
            for _ in range(C))
        rout_c = (1 << 20) // C
        cols = jnp.asarray(
            rng.integers(0, K, size=(C, rout_c, WSLOT)).astype(np.int32))
        vals = jnp.asarray(
            rng.normal(size=(C, rout_c, WSLOT)).astype(np.float32))

        def tup(chunks, cols, vals):
            return jnp.concatenate(
                [ell_like(chunks[c], cols[c], vals[c]) for c in range(C)], 0)

        dt = timeit(jax.jit(tup), chunks, cols, vals)
        nrows = rout_c * WSLOT * C
        emit(probe='tuple_param_chunks', chunk_rows=K, chunks=C,
             ns_per_row=dt / nrows * 1e9, gbps=nrows * S * 4 / dt / 1e9)
        del chunks, cols, vals

    # ---- C. gather from an in-jit intermediate ---------------------------
    K = 1 << 16
    tab = jnp.asarray(rng.normal(size=(K, S)).astype(np.float32))
    cols = jnp.asarray(
        rng.integers(0, K, size=(1 << 20, WSLOT)).astype(np.int32))
    vals = jnp.asarray(
        rng.normal(size=(1 << 20, WSLOT)).astype(np.float32))

    def interm(tab, cols, vals):
        tab2 = tab * 1.0001 + 0.0001     # force an intermediate buffer
        return ell_like(tab2, cols, vals)

    dt = timeit(jax.jit(interm), tab, cols, vals)
    nrows = (1 << 20) * WSLOT
    emit(probe='intermediate_gather', chunk_rows=K,
         ns_per_row=dt / nrows * 1e9, gbps=nrows * S * 4 / dt / 1e9)

    # ---- D. chunked carry through lax.scan (mini recurrence) -------------
    C = 16
    K = (1 << 20) // C
    chunks0 = tuple(
        jnp.asarray(rng.normal(size=(K, S)).astype(np.float32))
        for _ in range(C))
    # per output chunk: gathers from 2 random source chunks (local ids)
    colsA = jnp.asarray(rng.integers(0, K, size=(C, K, 4)).astype(np.int32))
    colsB = jnp.asarray(rng.integers(0, K, size=(C, K, 4)).astype(np.int32))
    valsA = jnp.asarray(rng.normal(size=(C, K, 4)).astype(np.float32))
    valsB = jnp.asarray(rng.normal(size=(C, K, 4)).astype(np.float32))
    srcA = [int(x) for x in rng.integers(0, C, size=C)]
    srcB = [int(x) for x in rng.integers(0, C, size=C)]

    def step(chunks, _):
        new = tuple(
            ell_like(chunks[srcA[c]], colsA[c], valsA[c])
            + ell_like(chunks[srcB[c]], colsB[c], valsB[c])
            for c in range(C))
        return new, None

    def recur(chunks):
        out, _ = jax.lax.scan(step, chunks, None, length=4)
        return out[0]

    dt = timeit(jax.jit(recur), chunks0)
    nrows = 4 * C * K * 8
    emit(probe='scan_chunked_recurrence', chunk_rows=K, chunks=C, steps=4,
         ns_per_row=dt / nrows * 1e9, gbps=nrows * S * 4 / dt / 1e9)
    del chunks0, colsA, colsB, valsA, valsB

    # ---- E. MXU tile op economics ----------------------------------------
    for T, dt_a in ((2048, jnp.float32), (2048, jnp.bfloat16)):
        A = jnp.asarray(rng.normal(size=(T, 128, 128))).astype(dt_a)
        X = jnp.asarray(rng.normal(size=(T, 128, S)).astype(np.float32))

        def tiles(A, X):
            return jnp.einsum('tab,tbs->tas', A.astype(jnp.float32), X,
                              preferred_element_type=jnp.float32)

        d = timeit(jax.jit(tiles), A, X, n=5)
        emit(probe='mxu_tiles', n_tiles=T, a_dtype=str(dt_a.__name__),
             ns_per_tile=d / T * 1e9,
             tile_bytes=128 * 128 * (4 if dt_a == jnp.float32 else 2))
        del A, X

    # ---- F. one big matmul reference (what MXU peak looks like) ----------
    A = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
    B = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
    d = timeit(jax.jit(lambda a, b: a @ b), A, B, n=5)
    emit(probe='matmul_f32', flops=2 * 4096 ** 3,
         tflops=2 * 4096 ** 3 / d / 1e12)

    log('done')


if __name__ == '__main__':
    main()
