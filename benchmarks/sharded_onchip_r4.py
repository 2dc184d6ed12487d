"""Round-4 on-chip measurement of the CHUNK-CARRIED sharded recurrence.

VERDICT r3 item #2: the sharded path must close from 1.42x vs the
deployed single-chip fast path (plain_auto) to ≤1.10x, and the grouped
default (g=4, commit 6645a9f) needs an on-chip number. Runs the bench
config (N=2^20 BA, K=30, S=128, Nf=4 heat bank) on a 1-device mesh:

  plain_auto    single-chip windowed cheby_op, auto acc grouping
                (the deployed single-chip fast path)
  sh_comb_g4    sharded_cheby_op, combined windowed layout, default g=4
                — NOW the chunk-carried body (r3 measured the full-array
                carry at 3484 ms = 1.42x)
  sh_comb_g14   same, PYGSP_SHARDED_ACC_GROUP=14 (the single-chip auto
                choice at this config)
  sh_split_g4   interior/boundary split layout (the deployed multi-chip
                layout; halo empty at 1 shard so boundary is a no-op)

Writes one JSON line per mode + a summary; redirect to
SHARDED_ONCHIP_r4.json.

Run: nohup python benchmarks/sharded_onchip_r4.py > /root/repo/SHARDED_ONCHIP_r4.json 2>/tmp/shonchip4.err &
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
    from pygsp_tpu.parallel import (make_mesh, partition_graph,
                                    shard_local_windowed, sharded_cheby_op)

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
        return dt

    # --- plain single-chip fast path -------------------------------------
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

    # --- sharded paths, 1-device mesh ------------------------------------
    t0 = time.time()
    sg = partition_graph(W, 1, reorder='none', dtype=np.float32)
    mesh = make_mesh(1, 1)
    perm = np.asarray(sg.perm)
    xpad = sg.pad_signal(x_host)
    log(f'partition in {time.time()-t0:.0f}s '
        f'(n_local={sg.n_local}, halo={sg.halo_total})')

    def check_sharded(out):
        dev = np.asarray(out[0])[perm][:, :8]
        return float(np.abs(dev - cpu_out).max()
                     / (np.abs(cpu_out).max() + 1e-30))

    for label, split, g in (('sh_comb_g4', False, None),
                            ('sh_comb_g14', False, '14'),
                            ('sh_split_g4', True, None)):
        t0 = time.time()
        ell = shard_local_windowed(sg, split_boundary=split)
        log(f'{label}: layout in {time.time()-t0:.0f}s')
        if g is None:
            os.environ.pop('PYGSP_SHARDED_ACC_GROUP', None)
        else:
            os.environ['PYGSP_SHARDED_ACC_GROUP'] = g
        run_sh = jax.jit(lambda sg, ell, c, x: sharded_cheby_op(
            sg, lmax, c, x, mesh, ell=ell))
        with mesh:
            timeit(run_sh, sg, ell, c, xpad, label=label,
                   check=check_sharded)
        del ell, run_sh
        gc.collect()
    os.environ.pop('PYGSP_SHARDED_ACC_GROUP', None)

    best = min(('sh_comb_g4', 'sh_comb_g14', 'sh_split_g4'),
               key=lambda k: results[k]['per_bank_ms'])
    print(json.dumps({
        'mode': 'summary',
        'sharded_vs_plain_auto': {
            k: round(results[k]['per_bank_ms']
                     / results['plain_auto']['per_bank_ms'], 3)
            for k in ('sh_comb_g4', 'sh_comb_g14', 'sh_split_g4')},
        'best_mode': best,
        'note': 'round-4 chunk-carried sharded recurrence; r3 full-array '
                'carry was 1.42x vs plain_auto (SHARDED_ONCHIP_r3.json). '
                'plain_auto is the deployed single-chip fast path (auto '
                'acc grouping, g=14 at this config).'}), flush=True)


if __name__ == '__main__':
    main()
