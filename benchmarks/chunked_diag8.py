"""Does optimization_barrier'd slicing of ONE big buffer restore
sub-cliff gather speed?

If yes, the chunked Chebyshev can carry a single (N, S) buffer and
re-chunk per step (16 blocks instead of 256 -> small program, fast
compile), instead of carrying a tuple of 16 chunk buffers.

Variants (N=2^20 rows, S=128, R=2^16, W=2 slots/row, 16 consumers — one
per src chunk, out rows = R each):
  B0 tuple buffers (control — expect ~3-4 ns/slot)
  B1 slices of one big buffer, no barrier (expect ~11)
  B2 slices + optimization_barrier on the tuple of slices
  B3 B2 inside a lax.scan carrying the big buffer (the real shape)

Run: nohup python benchmarks/chunked_diag8.py > /tmp/chunked_diag8.out 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp

S = 128
N = 1 << 20
R = 1 << 16
C = N // R
W = 2


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def measure(call, out_pick, n=8, reps=3):
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
    cols_np = rng.integers(0, R, size=(C, R, W)).astype(np.int32)
    vals_np = rng.normal(size=(C, R, W)).astype(np.float32)
    x = jnp.asarray(x_np)
    xt = tuple(jnp.asarray(x_np[c * R:(c + 1) * R]) for c in range(C))
    cols = jnp.asarray(cols_np)
    vals = jnp.asarray(vals_np)
    nslots = C * R * W

    want0 = sum(vals_np[c, 0, j] * x_np[c * R + cols_np[c, 0, j]]
                for c in range(C) for j in range(W))

    def consume(chunks):
        # out chunk i reads src chunk i's slots (one consumer per chunk,
        # like one out-chunk row-block of the real matrix)
        outs = []
        for c in range(C):
            t = None
            for j in range(W):
                u = vals[c, :, j:j + 1] * chunks[c][cols[c, :, j]]
                t = u if t is None else t + u
            outs.append(t)
        return sum(outs[1:], outs[0])

    def f_tuple(xt):
        return consume(xt)

    def f_slice(x):
        return consume([x[c * R:(c + 1) * R] for c in range(C)])

    def f_barrier(x):
        chunks = jax.lax.optimization_barrier(
            tuple(x[c * R:(c + 1) * R] for c in range(C)))
        return consume(chunks)

    for tag, fn, arg in (('B0_tuple', f_tuple, xt),
                         ('B1_slice', f_slice, x),
                         ('B2_barrier', f_barrier, x)):
        jf = jax.jit(fn)
        o = jf(arg)
        err = float(np.abs(np.asarray(o[0]) - want0).max()
                    / (np.abs(want0).max() + 1e-30))
        dt = measure(lambda: jf(arg), lambda o: o)
        emit(tag=tag, rel_err=err, ns_per_slot=dt / nslots * 1e9,
             ms=dt * 1e3)

    # B3: scan carrying ONE big buffer, barrier-rechunked each step
    def f_scan(x):
        def step(carry, _):
            chunks = jax.lax.optimization_barrier(
                tuple(carry[c * R:(c + 1) * R] for c in range(C)))
            y = consume(chunks)
            carry = jnp.concatenate([y] * C, axis=0) * 1e-3
            return carry, None
        carry, _ = jax.lax.scan(step, x, None, length=8)
        return carry

    jf = jax.jit(f_scan)
    o = jf(x)
    float(jnp.sum(o[::257, 0]))
    dt = measure(lambda: jf(x), lambda o: o, n=4)
    emit(tag='B3_scan_barrier', ns_per_slot=dt / (8 * nslots) * 1e9,
         ms=dt * 1e3)

    # B4: scan carrying the TUPLE (current design control)
    def f_scan_tuple(xt):
        def step(carry, _):
            y = consume(carry)
            carry = tuple(y * 1e-3 for _ in range(C))
            return carry, None
        carry, _ = jax.lax.scan(step, xt, None, length=8)
        return carry[0]

    jf = jax.jit(f_scan_tuple)
    o = jf(xt)
    float(jnp.sum(o[::257, 0]))
    dt = measure(lambda: jf(xt), lambda o: o, n=4)
    emit(tag='B4_scan_tuple', ns_per_slot=dt / (8 * nslots) * 1e9,
         ms=dt * 1e3)
    log('done')


if __name__ == '__main__':
    main()
