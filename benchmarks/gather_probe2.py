"""Microbenchmark v2: fused ELL-style gather cost vs operand size.

Fixes v1's methodology on this tunnel-attached chip: a device->host sync
costs ~35 ms RTT, so v1's per-iteration syncs swamped every op. Here each
measurement dispatches n async iterations and syncs ONCE on the last
output (device executes its queue in order), subtracting one RTT.

The measured op is the real hot-path inner pattern: w slot gathers from a
(R, S) table fused into an accumulate (XLA fuses the adds, so no giant
gather output is materialized) — i.e. one ELL level-0 pass.
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
    return float(jnp.sum(jnp.ravel(o)[:4]))


def emit(**kw):
    print(json.dumps(kw), flush=True)
    log(kw)


RTT = 0.0


def timeit(fn, *args, n=8):
    out = fn(*args)          # compile + warm
    sync(out)
    t0 = time.time()
    for _ in range(n - 1):
        fn(*args)            # enqueue, discard handle
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


def main():
    log(f'device: {jax.devices()[0]}')
    rng = np.random.default_rng(0)
    measure_rtt()

    S = 128
    ROUT = 1 << 20          # output rows per pass
    WSLOT = 8               # slots per output row -> 8M gathers per pass

    def ell_like(tab, cols, vals):
        y = jnp.zeros((cols.shape[0], tab.shape[1]), tab.dtype)
        for j in range(cols.shape[1]):
            y = y + vals[:, j:j + 1] * tab[cols[:, j]]
        return y

    f = jax.jit(ell_like)

    # ---- A. fused slot-gather cost vs operand rows ----------------------
    for logR in (13, 14, 15, 16, 17, 18, 19, 20, 21):
        R = 1 << logR
        tab = jnp.asarray(rng.normal(size=(R, S)).astype(np.float32))
        cols = jnp.asarray(
            rng.integers(0, R, size=(ROUT, WSLOT)).astype(np.int32))
        vals = jnp.asarray(
            rng.normal(size=(ROUT, WSLOT)).astype(np.float32))
        dt = timeit(f, tab, cols, vals)
        nrows = ROUT * WSLOT
        emit(probe='ell_fused', operand_rows=R, width_floats=S,
             n_gathers=nrows, ns_per_row=dt / nrows * 1e9,
             gbps=nrows * S * 4 / dt / 1e9)
        del tab, cols, vals

    # ---- B. width sweep at large operand --------------------------------
    R = 1 << 20
    for W in (64, 128, 256, 512):
        rout = (1 << 20) // (W // 64)   # keep per-pass bytes constant
        tab = jnp.asarray(rng.normal(size=(R, W)).astype(np.float32))
        cols = jnp.asarray(
            rng.integers(0, R, size=(rout, WSLOT)).astype(np.int32))
        vals = jnp.asarray(
            rng.normal(size=(rout, WSLOT)).astype(np.float32))
        dt = timeit(f, tab, cols, vals)
        nrows = rout * WSLOT
        emit(probe='ell_fused_width', operand_rows=R, width_floats=W,
             n_gathers=nrows, ns_per_row=dt / nrows * 1e9,
             gbps=nrows * W * 4 / dt / 1e9)
        del tab, cols, vals

    # ---- C. chunked: pre-split table, per-chunk local gathers -----------
    # simulates col-chunked ELL: all operands 2^17; includes nothing else
    R = 1 << 20
    for C in (8, 16):
        K = R // C
        tab3 = jnp.asarray(
            rng.normal(size=(C, K, S)).astype(np.float32))
        rout_c = ROUT // C
        cols = jnp.asarray(
            rng.integers(0, K, size=(C, rout_c, WSLOT)).astype(np.int32))
        vals = jnp.asarray(
            rng.normal(size=(C, rout_c, WSLOT)).astype(np.float32))

        def chunked(tab3, cols, vals):
            outs = []
            for c in range(tab3.shape[0]):
                outs.append(ell_like(tab3[c], cols[c], vals[c]))
            return jnp.concatenate(outs, 0)

        dt = timeit(jax.jit(chunked), tab3, cols, vals)
        nrows = ROUT * WSLOT // C * C
        emit(probe='ell_fused_chunked', operand_rows=K, chunks=C,
             width_floats=S, ns_per_row=dt / nrows * 1e9,
             gbps=nrows * S * 4 / dt / 1e9)
        del tab3, cols, vals

    # ---- D. dynamic-slice chunking from one big table -------------------
    C, K = 8, R // 8
    tab = jnp.asarray(rng.normal(size=(R, S)).astype(np.float32))
    rout_c = ROUT // C
    cols = jnp.asarray(
        rng.integers(0, K, size=(C, rout_c, WSLOT)).astype(np.int32))
    vals = jnp.asarray(
        rng.normal(size=(C, rout_c, WSLOT)).astype(np.float32))

    def sliced(tab, cols, vals):
        outs = []
        for c in range(C):
            xc = jax.lax.dynamic_slice(tab, (c * K, 0), (K, S))
            outs.append(ell_like(xc, cols[c], vals[c]))
        return jnp.concatenate(outs, 0)

    dt = timeit(jax.jit(sliced), tab, cols, vals)
    nrows = ROUT * WSLOT
    emit(probe='ell_fused_sliced', operand_rows=K, chunks=C,
         width_floats=S, ns_per_row=dt / nrows * 1e9,
         gbps=nrows * S * 4 / dt / 1e9)
    del cols, vals

    # ---- E. copy / reduce roofline reference ----------------------------
    dt = timeit(jax.jit(lambda a: a + 1.0), tab)
    emit(probe='copy', bytes=tab.nbytes * 2, secs=dt,
         gbps=tab.nbytes * 2 / dt / 1e9)
    dt = timeit(jax.jit(lambda a: jnp.sum(a, axis=1)), tab)
    emit(probe='read_reduce', bytes=tab.nbytes, secs=dt,
         gbps=tab.nbytes / dt / 1e9)

    # ---- F. unique scatter-add vs target size ---------------------------
    for logT in (14, 17, 20):
        T = 1 << logT
        NSC = min(T, 1 << 19)
        tgt = jnp.zeros((T, S), jnp.float32)
        uperm = jnp.asarray(rng.permutation(T)[:NSC].astype(np.int32))
        src = jnp.asarray(rng.normal(size=(NSC, S)).astype(np.float32))
        scat = jax.jit(lambda t, p, s: t.at[p].add(s, unique_indices=True))
        dt = timeit(scat, tgt, uperm, src)
        emit(probe='scatter_unique', target_rows=T, n_scatter=NSC,
             ns_per_row=dt / NSC * 1e9)
        del tgt, uperm, src

    # ---- G. bf16 table gather (half the bytes per row) ------------------
    R = 1 << 20
    tab16 = jnp.asarray(rng.normal(size=(R, S))).astype(jnp.bfloat16)
    cols = jnp.asarray(
        rng.integers(0, R, size=(ROUT, WSLOT)).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=(ROUT, WSLOT)).astype(np.float32))

    def ell_bf16(tab, cols, vals):
        y = jnp.zeros((cols.shape[0], tab.shape[1]), jnp.float32)
        for j in range(cols.shape[1]):
            y = y + vals[:, j:j + 1] * tab[cols[:, j]].astype(jnp.float32)
        return y

    dt = timeit(jax.jit(ell_bf16), tab16, cols, vals)
    nrows = ROUT * WSLOT
    emit(probe='ell_fused_bf16', operand_rows=R, width_floats=S,
         ns_per_row=dt / nrows * 1e9,
         gbps=nrows * S * 2 / dt / 1e9)

    log('done')


if __name__ == '__main__':
    main()
