"""COO segment-sum matvec at weak-scale 2-D block geometry (round 5).

The windowed fold's per-slot cost degrades ~2-6x on fragmented blocks
(FRAGDIAG4/6) — the one-hot/product intermediates stop fusing at those
shapes. The 2-D engine's original COO path (jax.ops.segment_sum with
sorted rows, ell=None in _matvec_2d) was benched away in round 1 on
POWER-LAW hub rows; fragmented step matrices have deg/pr per row, so
the scatter serialization argument may no longer bind (hubs can also be
pre-extracted). Measure it at p in {4,16,64} device-0 geometry, f32 and
bf16-gather variants, against the same dense control.

Run ON the TPU:  python benchmarks/fragblock_diag7.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from fragblock_diag6 import device0_steps, log  # noqa: E402


def sync(o):
    return float(jnp.sum(o[::997, 0].astype(jnp.float32)))


def main():
    S = 128
    rng = np.random.default_rng(0)
    results = []

    def bench(rows, cols, nr, nc, tag, carry=None, n=10):
        order = np.argsort(rows, kind='stable')
        rows_s = jnp.asarray(rows[order].astype(np.int32))
        cols_s = jnp.asarray(cols[order].astype(np.int32))
        x = jnp.asarray(rng.normal(size=(nc, S)).astype(np.float32))
        if carry is not None:
            x = x.astype(carry)

        def mv(r, c, xv):
            g = xv[c].astype(jnp.float32)
            return jax.ops.segment_sum(g, r, num_segments=nr,
                                       indices_are_sorted=True)

        f = jax.jit(mv)
        t0 = time.time()
        sync(f(rows_s, cols_s, x))
        fc = time.time() - t0
        t0 = time.time()
        for _ in range(n - 1):
            f(rows_s, cols_s, x)
        sync(f(rows_s, cols_s, x))
        dt = (time.time() - t0) / n
        r = {'tag': tag, 'ms': round(dt * 1e3, 2), 'edges': int(rows.size),
             'ns_per_edge': round(dt / rows.size * 1e9, 2),
             'first_call_s': round(fc, 1)}
        results.append(r)
        print(json.dumps(r), flush=True)

    for p, logN in ((4, 22), (16, 24)):
        steps, nr, nc = device0_steps(logN, p)
        rows = np.concatenate([rk for rk, _ in steps])
        cols = np.concatenate([ck for _, ck in steps])
        # one combined segment-sum over the whole per-chip block (the
        # engine can also run per-step; combined is the upper bound)
        bench(rows, cols, nr, nc, f'p{p}_coo_f32')
        bench(rows, cols, nr, nc, f'p{p}_coo_bf16g', carry=jnp.bfloat16)
        if p == 16:
            # synthesized p64 (rows doubled, same edges)
            rng64 = np.random.default_rng(7)
            roff = rng64.integers(0, 2, size=rows.size) * nr
            bench(rows + roff, cols, 2 * nr, nc, 'p64_coo_bf16g',
                  carry=jnp.bfloat16)

    # dense control
    N1 = 1 << 20
    with np.load(os.path.join(REPO, '.bench_cache',
                              f'bafast_{N1}_8.npz')) as d:
        s1, t1 = d['src'], d['tgt']
    rows = np.concatenate([s1, t1]).astype(np.int64)
    cols = np.concatenate([t1, s1]).astype(np.int64)
    perm = np.random.default_rng(3).permutation(N1)
    bench(perm[rows], perm[cols], N1, N1, 'dense_coo_f32')
    bench(perm[rows], perm[cols], N1, N1, 'dense_coo_bf16g',
          carry=jnp.bfloat16)

    with open(os.path.join(REPO, 'FRAGDIAG7_r5.json'), 'w') as f:
        json.dump({'metric': 'coo_segment_sum_at_weak_geometry', 'S': S,
                   'rows': results}, f, indent=1)


if __name__ == '__main__':
    main()
