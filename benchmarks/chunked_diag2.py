"""Follow-up: does consumer ORDER around each chunk operand fix the slot
rate? Variants (same synthetic 8x8 block structure as chunked_diag A):

  A_imajor : i-major block order (known slow, ~11 ns/slot)
  B_cmajor : c-major order — all consumers of chunk c adjacent
  C_onegather: ONE concatenated (8R*W,) index gather per chunk, then
               reshape/multiply/segment-free reduce per block
  D_onegather_scan: C inside a 30-step scan with carried chunk tuple

Run: nohup python benchmarks/chunked_diag2.py > /tmp/chunked_diag2.out 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

N = 1 << 20
S = 128
C = 8
R = N // C
W = 2


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    log(kw)


def main():
    import jax
    import jax.numpy as jnp
    log(f'device: {jax.devices()[0]}')
    rng = np.random.default_rng(0)

    def timeit(fn, *args, n=3):
        out = fn(*args)
        o = out[0] if isinstance(out, (tuple, list)) else out
        float(jnp.sum(jnp.ravel(o)[::4096]))
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
            o = out[0] if isinstance(out, (tuple, list)) else out
            float(jnp.sum(jnp.ravel(o)[::4096]))
        return (time.time() - t0) / n

    chunks = tuple(jnp.asarray(rng.normal(size=(R, S)).astype(np.float32))
                   for _ in range(C))
    cols = jnp.asarray(rng.integers(0, R, size=(C, C, R, W)).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=(C, C, R, W)).astype(np.float32))
    nslots = C * C * R * W

    def spmm_imajor(chunks, cols, vals):
        y = []
        for i in range(C):
            acc = None
            for c in range(C):
                t = None
                for j in range(W):
                    u = vals[i, c, :, j:j + 1] * chunks[c][cols[i, c, :, j]]
                    t = u if t is None else t + u
                acc = t if acc is None else acc + t
            y.append(acc)
        return tuple(y)

    def spmm_cmajor(chunks, cols, vals):
        y = [None] * C
        for c in range(C):
            for i in range(C):
                t = None
                for j in range(W):
                    u = vals[i, c, :, j:j + 1] * chunks[c][cols[i, c, :, j]]
                    t = u if t is None else t + u
                y[i] = t if y[i] is None else y[i] + t
        return tuple(y)

    # one flat gather per source chunk; indices laid out (i, slot j, row)
    cols_flat = jnp.asarray(np.asarray(cols).transpose(1, 0, 3, 2).reshape(
        C, C * W * R))
    vals_t = jnp.asarray(np.asarray(vals).transpose(1, 0, 3, 2))  # (c,i,j,R)

    def spmm_onegather(chunks, cols_flat, vals_t):
        y = [None] * C
        for c in range(C):
            g = chunks[c][cols_flat[c]]              # (C*W*R, S)
            g = g.reshape(C, W, R, S)
            part = jnp.einsum('iwr,iwrs->irs', vals_t[c], g)
            for i in range(C):
                y[i] = part[i] if y[i] is None else y[i] + part[i]
        return tuple(y)

    dt = timeit(jax.jit(spmm_imajor), chunks, cols, vals)
    emit(tag='A_imajor', ns_per_slot=dt / nslots * 1e9)
    dt = timeit(jax.jit(spmm_cmajor), chunks, cols, vals)
    emit(tag='B_cmajor', ns_per_slot=dt / nslots * 1e9)
    dt = timeit(jax.jit(spmm_onegather), chunks, cols_flat, vals_t)
    emit(tag='C_onegather', ns_per_slot=dt / nslots * 1e9)

    def recur(chunks, cols_flat, vals_t):
        def step(carry, _):
            return spmm_onegather(carry, cols_flat, vals_t), None
        out, _ = jax.lax.scan(step, chunks, None, length=30)
        return out

    dt = timeit(jax.jit(recur), chunks, cols_flat, vals_t)
    emit(tag='D_onegather_scan', ns_per_slot=dt / 30 / nslots * 1e9)

    log('done')


if __name__ == '__main__':
    main()
