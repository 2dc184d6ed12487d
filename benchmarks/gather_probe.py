"""Microbenchmark: characterize gather/scatter/copy primitives on this TPU.

Round-2 kernel design driver. The round-1 finding was a gather cliff:
~2.8 ns/row for operands <= 2^17 rows, ~11 ns/row above, reportedly flat
in row width up to ~256 floats. This probe maps the full surface:

  A. gather ns/row and GB/s over (operand_rows, row_width_floats)
  B. dynamic-slice (col-chunk) + local gather, including the slice cost
  C. unique-index scatter-add cost vs target size
  D. contiguous copy / read bandwidth reference points
  E. gather with locality-structured indices vs random

Timing: dispatch n iterations asynchronously and force completion ONCE
with a device->host read (this chip sits behind a network tunnel — a
per-iteration sync would pay one RTT each and swamp the measurement).

Emits one JSON line per measurement to stdout; run with nohup and poll
(CLAUDE.md: never kill a TPU process mid-flight).
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
    """Force completion with a device->host read (block_until_ready can
    no-op after axon backend restarts; a host read cannot lie)."""
    return float(jnp.sum(jnp.ravel(o)[:4]))


def emit(**kw):
    print(json.dumps(kw), flush=True)
    log(kw)


def timeit(fn, *args, n=10):
    out = fn(*args)   # compile + warm
    sync(out)
    t0 = time.time()
    outs = [fn(*args) for _ in range(n)]
    for o in outs:      # all dispatched; device queue drains serially
        sync(o)
    return (time.time() - t0) / n


def main():
    dev = jax.devices()[0]
    log(f'device: {dev}')
    rng = np.random.default_rng(0)

    # RTT floor of the timing harness itself
    tiny = jnp.zeros((8,), jnp.float32)
    dt = timeit(jax.jit(lambda a: a + 1.0), tiny, n=20)
    emit(probe='rtt_floor', secs=dt)

    # ---- D. copy bandwidth reference ------------------------------------
    big = jnp.asarray(rng.normal(size=(1 << 20, 128)).astype(np.float32))
    dt = timeit(jax.jit(lambda a: a + 1.0), big)
    emit(probe='copy', bytes=big.nbytes * 2, secs=dt,
         gbps=big.nbytes * 2 / dt / 1e9)
    dt = timeit(jax.jit(lambda a: jnp.sum(a, axis=0)), big)
    emit(probe='read_reduce', bytes=big.nbytes, secs=dt,
         gbps=big.nbytes / dt / 1e9)

    # ---- A. gather surface ----------------------------------------------
    gather = jax.jit(lambda tab, idx: tab[idx])
    for logR in (14, 16, 17, 18, 19, 20):
        R = 1 << logR
        for W in (128, 256, 512):
            nidx = min(1 << 22, (1 << 31) // (W * 4))   # output <= 2 GB
            if R * W * 4 > 2 << 30:
                continue
            tab = jnp.asarray(rng.normal(size=(R, W)).astype(np.float32))
            idx = jnp.asarray(rng.integers(0, R, size=nidx).astype(np.int32))
            dt = timeit(gather, tab, idx, n=5)
            emit(probe='gather', operand_rows=R, width_floats=W,
                 n_idx=nidx, ns_per_row=dt / nidx * 1e9,
                 gbps=nidx * W * 4 / dt / 1e9)
            del tab, idx

    # ---- E. locality-structured index gather ----------------------------
    R, W = 1 << 20, 128
    NIDX = 1 << 22
    tab = jnp.asarray(rng.normal(size=(R, W)).astype(np.float32))
    idxs = np.sort(rng.integers(0, R, size=NIDX).astype(np.int32))
    dt = timeit(gather, tab, jnp.asarray(idxs), n=5)
    emit(probe='gather_sorted', operand_rows=R, width_floats=W,
         ns_per_row=dt / NIDX * 1e9, gbps=NIDX * W * 4 / dt / 1e9)

    # windowed-local: index i stays within a sliding 2^17 window — tests
    # whether the cliff is operand footprint or index spread
    win = 1 << 17
    base = (np.arange(NIDX, dtype=np.int64) * (R - win) // NIDX)
    idxw = (base + rng.integers(0, win, size=NIDX)).astype(np.int32)
    dt = timeit(gather, tab, jnp.asarray(idxw), n=5)
    emit(probe='gather_windowed', operand_rows=R, width_floats=W,
         window=win, ns_per_row=dt / NIDX * 1e9,
         gbps=NIDX * W * 4 / dt / 1e9)

    # ---- B. col-chunked gather: slice + local gather --------------------
    C = 8
    K = R // C
    per = NIDX // C
    local_j = jnp.asarray(rng.integers(0, K, size=(C, per)).astype(np.int32))

    def chunked(tab, local_j):
        outs = []
        for c in range(C):
            xc = jax.lax.dynamic_slice(tab, (c * K, 0), (K, W))
            outs.append(xc[local_j[c]])
        return jnp.concatenate(outs, 0)

    dt = timeit(jax.jit(chunked), tab, local_j, n=5)
    emit(probe='gather_chunked', operand_rows=R, width_floats=W, chunks=C,
         ns_per_row=dt / NIDX * 1e9, gbps=NIDX * W * 4 / dt / 1e9)

    # chunked without the slice cost: table pre-split (C, K, W)
    tab3 = tab.reshape(C, K, W)

    def chunked_pre(tab3, local_j):
        return jnp.stack([tab3[c][local_j[c]] for c in range(C)])

    dt = timeit(jax.jit(chunked_pre), tab3, local_j, n=5)
    emit(probe='gather_chunked_presplit', operand_rows=R, width_floats=W,
         chunks=C, ns_per_row=dt / NIDX * 1e9,
         gbps=NIDX * W * 4 / dt / 1e9)
    del tab, tab3, local_j

    # ---- C. unique scatter-add vs target size ---------------------------
    for logT in (14, 17, 20):
        T = 1 << logT
        NSC = min(T, 1 << 20)
        tgt = jnp.zeros((T, 128), jnp.float32)
        uperm = jnp.asarray(rng.permutation(T)[:NSC].astype(np.int32))
        src = jnp.asarray(rng.normal(size=(NSC, 128)).astype(np.float32))
        scat = jax.jit(lambda t, p, s: t.at[p].add(s, unique_indices=True))
        dt = timeit(scat, tgt, uperm, src, n=5)
        emit(probe='scatter_unique', target_rows=T, n_scatter=NSC,
             ns_per_row=dt / NSC * 1e9,
             gbps=NSC * 128 * 4 * 2 / dt / 1e9)
        del tgt, uperm, src

    log('done')


if __name__ == '__main__':
    main()
