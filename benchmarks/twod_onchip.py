"""2-D edge-partition layout on the REAL chip (round-3 follow-up to
benchmarks/sharded_onchip.py).

The 2-D path (parallel/twod.py) is parity-tested on the virtual CPU mesh;
this measures its single-chip LAYOUT overhead at the bench config
(N=2^20 BA, K=30, S=128, Nf=4 heat bank): a 1x1 mesh makes the
all_gather/psum_scatter no-ops, so any slowdown vs the plain windowed
path is the cost of the block layout + shard_map wrapping itself (the
per-chip compute of a real pr x pc run).

  plain_auto   single-chip windowed cheby_op (the deployed fast path)
  twod_1x1     cheby_op_2d over a 1x1 mesh with windowed local blocks

Writes one JSON line per mode + a summary; redirect to TWOD_ONCHIP_r3.json.

Run: nohup python benchmarks/twod_onchip.py > /root/repo/TWOD_ONCHIP_r3.json 2>/tmp/twod_onchip.err &
"""

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
    log('device:', jax.devices()[0])

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
    del H, L
    import gc
    gc.collect()

    # --- 2-D path, 1x1 mesh ------------------------------------------------
    t0 = time.time()
    tg = partition_graph_2d(W, 1, 1, dtype=np.float32)
    ell = twod_local_windowed(tg)
    mesh = make_mesh_2d(1, 1)
    log(f'2-D layout in {time.time()-t0:.0f}s (n_local={tg.n_local})')
    perm = np.asarray(tg.perm)
    xpad = tg.pad_signal(x_host)

    def check_2d(out):
        dev = np.asarray(out[0])[perm][:, :8]
        return float(np.abs(dev - cpu_out).max()
                     / (np.abs(cpu_out).max() + 1e-30))

    run2d = jax.jit(lambda tg, ell, c, x: cheby_op_2d(
        tg, lmax, c, x, mesh, ell=ell))
    with mesh:
        timeit(run2d, tg, ell, c, xpad, label='twod_1x1', check=check_2d)

    print(json.dumps({
        'mode': 'summary',
        'twod_vs_plain_overhead': round(
            results['twod_1x1']['per_bank_ms']
            / results['plain_auto']['per_bank_ms'], 3),
        'note': '1x1 mesh: collectives are no-ops, so the ratio is the '
                'pure block-layout + shard_map cost — the per-chip '
                'compute term of the SCALING_r3 2-D model.'}), flush=True)


if __name__ == '__main__':
    main()
