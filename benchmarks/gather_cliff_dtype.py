"""Is the slot-gather cliff a ROW-COUNT or a BYTES limit?

gather_probe2 measured ~2.8 ns/row for f32 S=128 operands up to 2^17
rows and ~11 ns/row above. If the cliff is VMEM bytes (2^17 x 512 B =
64 MB), a bf16 table (256 B rows) should stay fast to 2^18 rows — which
would let the weak-scale 2-D layouts double chunk_rows in the deployed
bf16 mode and pack at lambda=64 (pad ~1.03, /tmp/padsim2). If it is a
row-count limit, 2^17 is the max for both dtypes and the borrow-span-4
packing carries the remaining load.

Run ON the TPU (no env guard):  python benchmarks/gather_cliff_dtype.py
Emits one JSON line per point.
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
    return float(jnp.sum(jnp.ravel(o)[:4].astype(jnp.float32)))


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


def main():
    global RTT
    log(f'device: {jax.devices()[0]}')
    rng = np.random.default_rng(0)
    tiny = jnp.zeros((8,), jnp.float32)
    fid = jax.jit(lambda a: a + 1.0)
    sync(fid(tiny))
    ts = []
    for _ in range(5):
        t0 = time.time()
        sync(fid(tiny))
        ts.append(time.time() - t0)
    RTT = float(np.median(ts))
    log('rtt', RTT)

    S = 128
    WSLOT = 8
    N_GATHER = 1 << 23           # gathers per pass (fixed work)

    def ell_like(tab, cols, vals):
        # accumulate in f32 regardless of table dtype (the fold's
        # preferred_element_type contract)
        y = jnp.zeros((cols.shape[0], tab.shape[1]), jnp.float32)
        for j in range(cols.shape[1]):
            y = y + (vals[:, j:j + 1] * tab[cols[:, j]]).astype(jnp.float32)
        return y

    f = jax.jit(ell_like)
    out = []
    for dt_name, dt in (('float32', np.float32), ('bfloat16', jnp.bfloat16)):
        for logR in (16, 17, 18, 19):
            R = 1 << logR
            rout = N_GATHER // WSLOT
            tab = jnp.asarray(rng.normal(size=(R, S)).astype(np.float32)
                              ).astype(dt)
            cols = jnp.asarray(
                rng.integers(0, R, size=(rout, WSLOT)).astype(np.int32))
            vals = jnp.asarray(
                rng.normal(size=(rout, WSLOT)).astype(np.float32)).astype(dt)
            t = timeit(f, tab, cols, vals)
            itemsize = 2 if dt_name == 'bfloat16' else 4
            row = {'dtype': dt_name, 'operand_rows': R,
                   'operand_mb': round(R * S * itemsize / 2**20, 1),
                   'ns_per_row': round(t / N_GATHER * 1e9, 2),
                   'gbps': round(N_GATHER * S * itemsize / t / 1e9, 1)}
            out.append(row)
            print(json.dumps(row), flush=True)
            del tab, cols, vals

    with open('/root/repo/GATHER_CLIFF_r5.json', 'w') as fjson:
        json.dump({'metric': 'gather_cliff_vs_dtype', 'S': S,
                   'rows': out}, fjson, indent=1)


if __name__ == '__main__':
    main()
