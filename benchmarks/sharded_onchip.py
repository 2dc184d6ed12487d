"""Sharded windowed path on the REAL chip (VERDICT r2 #8).

The sharded windowed layout (parallel/windowed_shards) is parity-tested
on tiny CPU meshes and exercised by the driver dryrun, but round 2 had
no measured number for its overhead on real hardware. This runs the
bench config (N=2^20 BA, K=30, S=128, Nf=4 heat bank) three ways on the
single chip:

  plain_g1     single-chip windowed cheby_op, acc group forced to 1
               (the sharded path has no acc grouping — this isolates
               LAYOUT overhead from the grouping difference)
  sharded_1    sharded_cheby_op over a 1-device mesh, n_graph=1,
               windowed-shard layout with the interior/boundary split
  plain_auto   single-chip windowed cheby_op, auto acc grouping
               (the deployed fast path, for reference)

Writes one JSON line per mode + a summary line with the overhead ratio;
redirect to SHARDED_ONCHIP_r3.json.

Run: nohup python benchmarks/sharded_onchip.py > /root/repo/SHARDED_ONCHIP_r3.json 2>/tmp/shonchip.err &
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
    from pygsp_tpu.parallel import (make_mesh, partition_graph,
                                    shard_local_windowed, sharded_cheby_op)

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
        # force sync via host read (block_until_ready can no-op, CLAUDE.md)
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
        eps = K * nnz * S / dt
        rec = {'mode': label, 'per_bank_ms': round(dt * 1e3, 1),
               'edge_ops_per_s': eps, 'rel_err': err,
               'first_call_s': round(first_s, 1)}
        results[label] = rec
        print(json.dumps(rec), flush=True)
        return out

    # --- plain single-chip paths -----------------------------------------
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
    os.environ['PYGSP_CHEBY_ACC_GROUP'] = '1'
    timeit(run_plain, L, c, x, label='plain_g1', check=check_plain)
    del os.environ['PYGSP_CHEBY_ACC_GROUP']
    run_plain2 = jax.jit(lambda L, c, x: cheby.cheby_op(L, lmax, c, x))
    timeit(run_plain2, L, c, x, label='plain_auto', check=check_plain)
    del H, L
    import gc
    gc.collect()

    # --- sharded path, 1-device mesh -------------------------------------
    t0 = time.time()
    sg = partition_graph(W, 1, reorder='none', dtype=np.float32)
    ell = shard_local_windowed(sg, split_boundary=False)
    mesh = make_mesh(1, 1)
    log(f'sharded layout in {time.time()-t0:.0f}s '
        f'(n_local={sg.n_local}, halo={sg.halo_total})')
    perm = np.asarray(sg.perm)
    xp = jnp.asarray(x_host)  # n_graph=1, no reorder: perm is identity-ish
    xpad = sg.pad_signal(x_host)

    def check_sharded(out):
        dev = np.asarray(out[0])[perm][:, :8]
        return float(np.abs(dev - cpu_out).max()
                     / (np.abs(cpu_out).max() + 1e-30))

    run_sh = jax.jit(lambda sg, ell, c, x: sharded_cheby_op(
        sg, lmax, c, x, mesh, ell=ell))
    with mesh:
        timeit(run_sh, sg, ell, c, xpad, label='sharded_1',
               check=check_sharded)

    over = (results['sharded_1']['per_bank_ms']
            / results['plain_g1']['per_bank_ms'])
    print(json.dumps({
        'mode': 'summary',
        'sharded_vs_plain_g1_overhead': round(over, 3),
        'sharded_vs_plain_auto': round(
            results['sharded_1']['per_bank_ms']
            / results['plain_auto']['per_bank_ms'], 3),
        'note': 'plain_g1 is the like-for-like baseline (no acc '
                'grouping in the sharded recurrence); plain_auto is the '
                'deployed single-chip fast path.'}), flush=True)


if __name__ == '__main__':
    main()
