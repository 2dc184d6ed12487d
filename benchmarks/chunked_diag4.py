"""Bisect probe2-fast (2.7 ns/slot) vs diag3-slow (127 ns/slot) at R=2^17.

Morph ONE attribute at a time from probe2's exact ell_fused:
  M0: probe2 verbatim (2D cols/vals, zeros-init, return array, async timing)
  M1: M0 + 3D cols/vals indexed with leading python int
  M2: M0 + first-term accumulation (no zeros init)
  M3: M0 + return [y] (list output)
  M4: M0 + tab passed as a 1-tuple
  M5: M0 + per-iteration sync timing (diag3 methodology)
  M6: M0 + bigger strided sync expression (diag3's [::257] sum)

Run: nohup python benchmarks/chunked_diag4.py > /tmp/chunked_diag4.out 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp

S = 128
R = 1 << 17
ROUT = 1 << 20
W = 8
NG = ROUT * W


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    log(kw)


RTT = 0.0


def sync4(o):
    return float(jnp.sum(jnp.ravel(o)[:4]))


def timeit_async(fn, *args, n=8):
    out = fn(*args)
    sync4(out[0] if isinstance(out, (tuple, list)) else out)
    t0 = time.time()
    for _ in range(n - 1):
        fn(*args)
    out = fn(*args)
    sync4(out[0] if isinstance(out, (tuple, list)) else out)
    return max((time.time() - t0 - RTT) / n, 1e-9)


def timeit_sync(fn, *args, n=3, syncer=None):
    out = fn(*args)
    o = out[0] if isinstance(out, (tuple, list)) else out
    (syncer or sync4)(o)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        o = out[0] if isinstance(out, (tuple, list)) else out
        (syncer or sync4)(o)
    return (time.time() - t0) / n


def main():
    global RTT
    log(f'device: {jax.devices()[0]}')
    rng = np.random.default_rng(0)
    tiny = jnp.zeros((8,), jnp.float32)
    f0 = jax.jit(lambda a: a + 1.0)
    sync4(f0(tiny))
    ts = []
    for _ in range(5):
        t0 = time.time()
        sync4(f0(tiny))
        ts.append(time.time() - t0)
    RTT = float(np.median(ts))
    emit(probe='rtt', secs=RTT)

    tab = jnp.asarray(rng.normal(size=(R, S)).astype(np.float32))
    cols2 = jnp.asarray(rng.integers(0, R, size=(ROUT, W)).astype(np.int32))
    vals2 = jnp.asarray(rng.normal(size=(ROUT, W)).astype(np.float32))
    cols3 = cols2[None]
    vals3 = vals2[None]

    def ell_m0(tab, cols, vals):
        y = jnp.zeros((cols.shape[0], tab.shape[1]), tab.dtype)
        for j in range(cols.shape[1]):
            y = y + vals[:, j:j + 1] * tab[cols[:, j]]
        return y

    def ell_m1(tab, cols, vals):
        y = jnp.zeros((cols.shape[1], tab.shape[1]), tab.dtype)
        for j in range(cols.shape[2]):
            y = y + vals[0, :, j:j + 1] * tab[cols[0, :, j]]
        return y

    def ell_m2(tab, cols, vals):
        y = None
        for j in range(cols.shape[1]):
            u = vals[:, j:j + 1] * tab[cols[:, j]]
            y = u if y is None else y + u
        return y

    def ell_m3(tab, cols, vals):
        return [ell_m0(tab, cols, vals)]

    def ell_m4(tabs, cols, vals):
        return ell_m0(tabs[0], cols, vals)

    dt = timeit_async(jax.jit(ell_m0), tab, cols2, vals2)
    emit(tag='M0_probe2_verbatim', ns_per_slot=dt / NG * 1e9)
    dt = timeit_async(jax.jit(ell_m1), tab, cols3, vals3)
    emit(tag='M1_3d_indexing', ns_per_slot=dt / NG * 1e9)
    dt = timeit_async(jax.jit(ell_m2), tab, cols2, vals2)
    emit(tag='M2_no_zeros_init', ns_per_slot=dt / NG * 1e9)
    dt = timeit_async(jax.jit(ell_m3), tab, cols2, vals2)
    emit(tag='M3_list_output', ns_per_slot=dt / NG * 1e9)
    dt = timeit_async(jax.jit(ell_m4), (tab,), cols2, vals2)
    emit(tag='M4_tuple_param', ns_per_slot=dt / NG * 1e9)
    dt = timeit_sync(jax.jit(ell_m0), tab, cols2, vals2)
    emit(tag='M5_sync_timing', ns_per_slot=dt / NG * 1e9)
    dt = timeit_sync(jax.jit(ell_m0), tab, cols2, vals2,
                     syncer=lambda o: float(jnp.sum(o[::257])))
    emit(tag='M6_strided_sync', ns_per_slot=dt / NG * 1e9)
    log('done')


if __name__ == '__main__':
    main()
