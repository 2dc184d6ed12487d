"""Is the gather cliff about index LOCALITY rather than operand size?

diag8 showed gathers from slices of a big buffer run at tuple-chunk
speed. Here: gather from the FULL (2^20, 128) buffer with GLOBAL
indices, varying only how the indices are grouped per gather call.

  G0: 16 calls, call c's indices uniform in [c*2^16, (c+1)*2^16)
  G1: 16 calls, indices uniform over the full 2^20 range (control)
  G2: 8 calls, window 2^17 grouping
  G3: 1 call, all indices sorted ascending
  G4: 1 call, indices uniform (classic above-cliff control)

Run: nohup python benchmarks/chunked_diag9.py > /tmp/chunked_diag9.out 2>&1 &
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
NSLOT = 1 << 25   # 33.5M slots total, ~ the bench matrix


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(call, n=8, reps=3):
    o = call()
    float(jnp.sum(o[::257]))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(n - 1):
            call()
        o = call()
        float(jnp.sum(o[::257]))
        ts.append((time.time() - t0) / n)
    return float(np.median(ts))


def main():
    log(f'device: {jax.devices()[0]}')
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, S)).astype(np.float32))

    def run_calls(idx_list):
        arrs = tuple(jnp.asarray(ix) for ix in idx_list)

        def fn(x, arrs):
            acc = None
            for ix in arrs:
                g = jnp.sum(x[ix], axis=0)   # reduce so output stays small
                acc = g if acc is None else acc + g
            return acc

        jf = jax.jit(fn)
        dt = measure(lambda: jf(x, arrs))
        return dt / NSLOT * 1e9

    for tag, calls, window in (('G0', 16, 1 << 16), ('G1', 16, N),
                               ('G2', 8, 1 << 17)):
        per = NSLOT // calls
        idx = []
        for c in range(calls):
            base = c * window if window < N else 0
            idx.append((rng.integers(0, window, size=per) + base)
                       .astype(np.int32) % N)
        ns = run_calls(idx)
        print(json.dumps({'tag': tag, 'calls': calls, 'window': window,
                          'ns_per_slot': ns}), flush=True)

    allidx = rng.integers(0, N, size=NSLOT).astype(np.int32)
    ns = run_calls([np.sort(allidx)])
    print(json.dumps({'tag': 'G3_sorted_one_call', 'ns_per_slot': ns}),
          flush=True)
    ns = run_calls([allidx])
    print(json.dumps({'tag': 'G4_uniform_one_call', 'ns_per_slot': ns}),
          flush=True)
    log('done')


if __name__ == '__main__':
    main()
