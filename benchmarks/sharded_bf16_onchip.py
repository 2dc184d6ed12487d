"""On-chip: the DEPLOYED multi-chip fast mode at 1 device — bf16 carry
through the chunk-carried sharded engine (and the ring 2-D engine).

SHARDED_ONCHIP_r4 measured the sharded f32 path at 0.942x of plain_auto;
BF16_CARRY_r3 measured the single-chip bf16 fast mode at 1964 ms. This
fills the missing cell: bf16 carry THROUGH the sharded engine (halo
payload + gathers at half bytes) on the real chip, 1-device mesh — the
per-chip step time the SCALING_r4 deployed-mode rows assume via ratio.

  sh1_bf16_g14    sharded_cheby_op, combined layout, carry=bf16, g=14
  ring1_bf16      cheby_op_2d ring layout at 1x1, carry=bf16

Both layouts are cast to bf16 VALUES (ShardedWindowed.astype — exact for
this graph's unit weights): with f32 values the one-hot fold runs the
6-pass HIGHEST f32 emulation and the bf16 carry gains nothing (first
run of this probe measured 2384/2386 ms — the fold, not the gathers,
was the cap); bf16 values make it a single native MXU pass, matching
the single-chip bf16 mode (bench.py casts its slabs the same way).

Run: nohup python benchmarks/sharded_bf16_onchip.py > /root/repo/SHARDED_BF16_r4.json 2>/tmp/shbf16.err &
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
    from pygsp_tpu.ops import chebyshev as cheby
    from pygsp_tpu.parallel import (cheby_op_2d, make_mesh, make_mesh_2d,
                                    partition_graph, partition_graph_2d,
                                    shard_local_windowed, sharded_cheby_op,
                                    twod_local_windowed)

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
        if not np.isfinite(err) or err > 1.5e-2:
            raise RuntimeError(f'{label}: mismatch rel err {err}')
        print(json.dumps(
            {'mode': label, 'per_bank_ms': round(dt * 1e3, 1),
             'edge_ops_per_s': K * nnz * S / dt, 'rel_err': err,
             'pct_f32_roofline': round(
                 100 * (K * (nnz * (4 * S + 8) + N * S * 4) / 160e9) / dt,
                 1),
             'first_call_s': round(first_s, 1)}), flush=True)

    # --- sharded engine, 1-device mesh, bf16 carry ------------------------
    os.environ['PYGSP_SHARDED_ACC_GROUP'] = '14'
    sg = partition_graph(W, 1, reorder='none', dtype=np.float32)
    ell = shard_local_windowed(sg, split_boundary=False).astype(jnp.bfloat16)
    mesh = make_mesh(1, 1)
    perm = np.asarray(sg.perm)
    xpad = sg.pad_signal(x_host)

    def check_sharded(out):
        dev = np.asarray(out[0])[perm][:, :8]
        return float(np.abs(dev - cpu_out).max()
                     / (np.abs(cpu_out).max() + 1e-30))

    run16 = jax.jit(lambda sg, ell, c, x: sharded_cheby_op(
        sg, lmax, c, x, mesh, ell=ell, carry_dtype=jnp.bfloat16))
    with mesh:
        timeit(run16, sg, ell, c, xpad, label='sh1_bf16_g14',
               check=check_sharded)
    del sg, ell, run16, xpad
    gc.collect()

    # --- ring 2-D engine at 1x1, bf16 carry -------------------------------
    tg = partition_graph_2d(W, 1, 1, dtype=np.float32)
    ell2 = tuple(m.astype(jnp.bfloat16)
                 for m in twod_local_windowed(tg, ring=True))
    mesh2 = make_mesh_2d(1, 1)
    perm2 = np.asarray(tg.perm)
    xpad2 = tg.pad_signal(x_host)

    def check_2d(out):
        dev = np.asarray(out[0])[perm2][:, :8]
        return float(np.abs(dev - cpu_out).max()
                     / (np.abs(cpu_out).max() + 1e-30))

    run2d16 = jax.jit(lambda tg, ell, c, x: cheby_op_2d(
        tg, lmax, c, x, mesh2, ell=ell, carry_dtype=jnp.bfloat16))
    with mesh2:
        timeit(run2d16, tg, ell2, c, xpad2, label='ring1_bf16',
               check=check_2d)


if __name__ == '__main__':
    main()
