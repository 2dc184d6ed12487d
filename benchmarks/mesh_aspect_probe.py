"""Mesh-aspect sweep for the mono ring layout (bf16 fold output).

BF16OUT_r5 halved the fold's output-side traffic, which exposed the
next structural term: the window tensor + strip scale with the fold's
OUTPUT ROWS = pc·n_local — ∝ √p on square meshes — while gather bytes
track edges. The mono layout made tall meshes viable (ONE fold
regardless of pr, λ_w = P·deg_row/n_src with the FULL per-chip row
degree deg_row = E_c/(pc·n_local), which GROWS as pc shrinks), so the
mesh aspect is now a free layout knob:

  pc = 1  → the fold's output rows equal n_local (single-chip-like
            strip bytes), no 'col' reduction at all; the row ring
            carries (pr−1)·n_local·S — the classic all-gather SpMM.
  pc = 2  → halves output rows vs the square mesh at p = 16.

Cells (device-0 blocks at true weak share, R=2^17, P=128, bf16
vals+carry+out, levels stripped): p8 {8x1}, p16 {8x2, 16x1}.
Compare against BF16OUT_r5's square-mesh rows.

Run ON the TPU:
  nohup python benchmarks/mesh_aspect_probe.py > /tmp/aspect.log 2>&1 &
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from fragblock_diag9 import device0_block  # noqa: E402

S = 128
T0 = time.time()
RESULTS = []


def log(*a):
    print(f'[{time.time() - T0:7.1f}s]', *a, flush=True)


def sync(y):
    if isinstance(y, tuple):
        y = y[0]
    return float(jnp.sum(y[::997, 0].astype(jnp.float32)))


def run_cell(p, pr, pc, logN):
    from pygsp_tpu.core.chunked import chunk_signal
    from pygsp_tpu.core.windowed import windowed_from_host_coo

    R, P = 1 << 17, 128
    rk, ck, nr, ncol, n_local = device0_block(logN, pr, pc)
    nedges = rk.size
    log(f'--- p={p} {pr}x{pc}: {nedges} edges over {nr}x{ncol}')
    mat = windowed_from_host_coo(
        rk, ck, np.ones(rk.size, np.float32), nr, ncol,
        chunk_rows=R, window_rows=P, permute=None, dtype=np.float32)
    mat = dataclasses.replace(mat, levels=(),
                              level_rows=jnp.zeros(0, jnp.int32))
    mat = mat.astype(jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(ncol, S)).astype(np.float32)
    xc = tuple(c.astype(jnp.bfloat16) for c in
               chunk_signal(jnp.asarray(x), R))
    f = jax.jit(lambda m, c: m.spmm_chunks(c, out_dtype=jnp.bfloat16))
    t0 = time.time()
    sync(f(mat, xc))
    fc = time.time() - t0
    n = 12
    t0 = time.time()
    for _ in range(n - 1):
        f(mat, xc)
    sync(f(mat, xc))
    dt = (time.time() - t0) / n
    nslots = int(np.prod(mat.cols.shape))
    r = {'tag': f'mono_p{p}_{pr}x{pc}_bf16out', 'ms': round(dt * 1e3, 2),
         'ns_per_edge': round(dt / nedges * 1e9, 2),
         'pad': round(nslots / nedges, 3), 'L': int(mat.cols.shape[-1]),
         'n_out_rows': nr, 'ring_rows_per_chip': (pr - 1) * n_local,
         'first_call_s': round(fc, 1)}
    RESULTS.append(r)
    log(json.dumps(r))
    with open(os.path.join(REPO, 'MESH_ASPECT_r5.json'), 'w') as f_:
        json.dump({'metric': 'mono_mesh_aspect_bf16out', 'S': S,
                   'note': 'device-0 mono fold at true weak share; '
                   'tall meshes shrink the fold output-row space '
                   '(pc*n_local) that BF16OUT_r5 identified as the '
                   'residual weak-scale term; ring wire grows as '
                   '(pr-1)*n_local rows/chip (hidden/modeled in '
                   'SCALING_r5 rev)', 'rows': RESULTS}, f_, indent=1)
    del mat, xc


def main():
    log('device:', jax.devices()[0])
    for p, pr, pc, logN in ((8, 8, 1, 23), (16, 8, 2, 24),
                            (16, 16, 1, 24), (4, 4, 1, 22)):
        run_cell(p, pr, pc, logN)
    log('ASPECT_DONE')


if __name__ == '__main__':
    main()
