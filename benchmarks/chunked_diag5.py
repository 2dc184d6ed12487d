"""Isolate the sync-method cost interactions at R=2^17 (M0 structure).

Per-iteration syncers on the SAME jitted ell kernel:
  N0: jax.block_until_ready
  N1: float(jnp.sum(o))                (one reduce, no reshape/slice)
  N2: float(jnp.sum(o[::257]))         (strided slice)
  N3: float(jnp.sum(jnp.ravel(o)[:4])) (ravel - suspected full fetch)
  N4: list output + N2                  (diag3-V0 structure, no validation)
  N5: N4 preceded by np.asarray(outs[0][0]) validation fetch each iter
  N6: N4 preceded by ONE validation fetch before the loop (diag3 exact)

Run: nohup python benchmarks/chunked_diag5.py > /tmp/chunked_diag5.out 2>&1 &
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


def emit(**kw):
    print(json.dumps(kw), flush=True)
    print(kw, file=sys.stderr, flush=True)


def main():
    print(f'device: {jax.devices()[0]}', file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(R, S)).astype(np.float32))
    cols = jnp.asarray(rng.integers(0, R, size=(ROUT, W)).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=(ROUT, W)).astype(np.float32))

    def ell(tab, cols, vals):
        y = jnp.zeros((cols.shape[0], tab.shape[1]), tab.dtype)
        for j in range(cols.shape[1]):
            y = y + vals[:, j:j + 1] * tab[cols[:, j]]
        return y

    jf = jax.jit(ell)
    jf_list = jax.jit(lambda t, c, v: [ell(t, c, v)])

    def run(tag, call, syncer, pre=None, n=3):
        o = call()
        syncer(o)
        if pre:
            pre(o)
        t0 = time.time()
        for _ in range(n):
            o = call()
            if pre:
                pre(o)
            syncer(o)
        dt = (time.time() - t0) / n
        emit(tag=tag, ns_per_slot=dt / NG * 1e9)

    arr = lambda: jf(tab, cols, vals)
    lst = lambda: jf_list(tab, cols, vals)

    run('N0_block_until_ready', arr, jax.block_until_ready)
    run('N1_full_sum', arr, lambda o: float(jnp.sum(o)))
    run('N2_strided_sum', arr, lambda o: float(jnp.sum(o[::257])))
    run('N3_ravel4_sum', arr, lambda o: float(jnp.sum(jnp.ravel(o)[:4])))
    run('N2_again', arr, lambda o: float(jnp.sum(o[::257])))
    run('N4_list_strided', lst, lambda o: float(jnp.sum(o[-1][::257])))
    run('N5_list_rowfetch_each', lst,
        lambda o: float(jnp.sum(o[-1][::257])),
        pre=lambda o: np.asarray(o[0][0]))
    # N6: one row-fetch BEFORE the loop only
    o = lst()
    _ = np.asarray(o[0][0])
    run('N6_after_one_rowfetch', lst,
        lambda o: float(jnp.sum(o[-1][::257])))
    print('done', file=sys.stderr, flush=True)


if __name__ == '__main__':
    main()
