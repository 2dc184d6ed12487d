"""Round-4: 2-D layout overhead at 1x1 with the RING chunk-carried path.

VERDICT r3 item #3: the 2-D path carried 1.42x pure layout overhead at a
1x1 mesh (TWOD_ONCHIP_r3.json) and took no overlap credit. The ring
layout (twod_local_windowed(ring=True) + _cheby_op_2d_ring) carries
per-chunk recurrence state and issues each all-gather shift before the
fold it feeds. At 1x1 the collectives are no-ops, so the measured ratio
vs plain_auto is the per-chip compute term of the 2-D scaling model.

  plain_auto     single-chip windowed cheby_op (deployed fast path)
  twod_old_1x1   round-3 body (full-array carry, monolithic gather)
  twod_ring_1x1  ring chunk-carried body (the new deployed 2-D layout)

Run: nohup python benchmarks/twod_onchip_r4.py > /root/repo/TWOD_ONCHIP_r4.json 2>/tmp/twod4.err &
"""

import gc
import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, __file__.rsplit('/', 2)[0])

N = 1 << 20
K = 30
S = 128
SCALES = [5.0, 10.0, 25.0, 50.0]
CACHE = '/root/repo/.bench_cache'


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import bench as benchmod
    from pygsp_tpu.core import windowed as cw
    from pygsp_tpu.core.operators import LaplacianOp
    from pygsp_tpu.ops import chebyshev as cheby
    from pygsp_tpu.parallel import (cheby_op_2d, make_mesh_2d,
                                    partition_graph_2d, twod_local_windowed)

    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.path.join(CACHE, 'xla_cache'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception as e:  # noqa: BLE001
        log(f'compile cache unavailable: {e}')
    t0 = time.time()
    float(jnp.sum(jnp.ones((128, 128))))
    log(f'device: {jax.devices()[0]} (warm {time.time()-t0:.1f}s)')

    src, tgt = benchmod.get_graph()
    W = sps.csr_matrix(
        (np.ones(2 * len(src), dtype=np.float32),
         (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
        shape=(N, N))
    W.data[:] = 1.0
    W.sum_duplicates()
    nnz = W.nnz
    dw = np.ravel(W.sum(axis=1)).astype(np.float32)
    lmax = float(2 * dw.max())

    def evaluate(lam):
        return jnp.exp(-jnp.asarray(SCALES, jnp.float32)[:, None]
                       * lam[None, :] / lmax)

    c = cheby.cheby_coeff(evaluate, lmax, m=K, dtype=jnp.float32)
    x_host = np.random.default_rng(0).normal(size=(N, S)).astype(np.float32)
    cpu_eps, cpu_out = benchmod.reference_cpu_eps(
        W, lmax, np.asarray(c), x_host[:, :8])
    log('reference done')

    results = {}

    def timeit(run, *args, label, check):
        t0 = time.time()
        out = jax.block_until_ready(run(*args))
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        first_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(2):
                run(*args)
            out = run(*args)
            float(jnp.sum(jnp.ravel(out[0])[::65537]))
            times.append((time.time() - t0) / 3)
        dt = float(np.median(times))
        err = check(out)
        if not np.isfinite(err) or err > 1e-2:
            raise RuntimeError(f'{label}: mismatch rel err {err}')
        rec = {'mode': label, 'per_bank_ms': round(dt * 1e3, 1),
               'edge_ops_per_s': K * nnz * S / dt, 'rel_err': err,
               'first_call_s': round(first_s, 1)}
        results[label] = rec
        print(json.dumps(rec), flush=True)

    # --- plain single-chip fast path --------------------------------------
    Wneg = W.copy()
    Wneg.data = -Wneg.data
    t0 = time.time()
    H = cw.windowed_from_scipy(Wneg, dtype=np.float32)
    L = LaplacianOp(offdiag=H, diag=jnp.asarray(dw),
                    lap_type='combinatorial')
    log(f'plain layout in {time.time()-t0:.0f}s')
    x = jnp.asarray(x_host)

    def check_plain(out):
        dev = np.asarray(out[0, :, :8])
        return float(np.abs(dev - cpu_out).max()
                     / (np.abs(cpu_out).max() + 1e-30))

    run_plain = jax.jit(lambda L, c, x: cheby.cheby_op(L, lmax, c, x))
    timeit(run_plain, L, c, x, label='plain_auto', check=check_plain)
    del H, L, run_plain
    gc.collect()

    # --- 2-D paths, 1x1 mesh ----------------------------------------------
    t0 = time.time()
    tg = partition_graph_2d(W, 1, 1, dtype=np.float32)
    mesh = make_mesh_2d(1, 1)
    log(f'2-D partition in {time.time()-t0:.0f}s (n_local={tg.n_local})')
    perm = np.asarray(tg.perm)
    xpad = tg.pad_signal(x_host)

    def check_2d(out):
        dev = np.asarray(out[0])[perm][:, :8]
        return float(np.abs(dev - cpu_out).max()
                     / (np.abs(cpu_out).max() + 1e-30))

    for label, kw in (('twod_old_1x1', {}), ('twod_ring_1x1',
                                             {'ring': True})):
        t0 = time.time()
        ell = twod_local_windowed(tg, **kw)
        log(f'{label}: layout in {time.time()-t0:.0f}s')
        run2d = jax.jit(lambda tg, ell, c, x: cheby_op_2d(
            tg, lmax, c, x, mesh, ell=ell))
        with mesh:
            timeit(run2d, tg, ell, c, xpad, label=label, check=check_2d)
        del ell, run2d
        gc.collect()

    print(json.dumps({
        'mode': 'summary',
        'twod_ring_vs_plain_overhead': round(
            results['twod_ring_1x1']['per_bank_ms']
            / results['plain_auto']['per_bank_ms'], 3),
        'twod_old_vs_plain_overhead': round(
            results['twod_old_1x1']['per_bank_ms']
            / results['plain_auto']['per_bank_ms'], 3),
        'note': '1x1 mesh: collectives are no-ops, so the ratio is the '
                'pure block-layout cost — the per-chip compute term of '
                'the 2-D scaling model. r3 old body measured 1.42x.'}),
        flush=True)


if __name__ == '__main__':
    main()
