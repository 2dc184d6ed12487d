"""Re-measure ONLY the sharded_1 mode after a fix candidate.
SHARDED_ONCHIP_r3.json's first run showed sharded_1 at 4632.8 ms/bank vs
plain_g1 2901.4 / plain_auto 2452.2. Candidate 1 (chunk-materialization
barrier in local_spmm) measured 4633.6 — no change, gather-cliff
hypothesis dead. benchmarks/sharded_spmm_probe.py then isolated it: the
BARE local SpMM is 1.61x slower in the sharded layout, because
partition_graph kept degree-correlated vertex order within shards, so
hub rows cluster into the same 64-row output windows and blow up the
windowed layout's pooled slab width — exactly what the single-chip
builder's shuffle relabel prevents. Candidate 2 (this run): the
within-shard shuffle in partition_graph/pos_of_rank.

Appends the remeasured mode + updated summary lines; concatenate into
SHARDED_ONCHIP_r3.json.

Run: nohup python benchmarks/sharded_onchip_fix.py > /tmp/shfix.out 2>/tmp/shfix.err &
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
PLAIN_G1_MS = 2901.4      # measured, same graph/config (first run)
PLAIN_AUTO_MS = 2452.2


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import bench as benchmod
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

    t0 = time.time()
    sg = partition_graph(W, 1, reorder='none', dtype=np.float32)
    ell = shard_local_windowed(sg, split_boundary=False)
    mesh = make_mesh(1, 1)
    log(f'sharded layout in {time.time()-t0:.0f}s')
    perm = np.asarray(sg.perm)
    xpad = sg.pad_signal(x_host)

    run_sh = jax.jit(lambda sg, ell, c, x: sharded_cheby_op(
        sg, lmax, c, x, mesh, ell=ell))
    with mesh:
        t0 = time.time()
        out = run_sh(sg, ell, c, xpad)
        float(jnp.sum(jnp.ravel(out[0])[::65537]))
        first_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(2):
                run_sh(sg, ell, c, xpad)
            out = run_sh(sg, ell, c, xpad)
            float(jnp.sum(jnp.ravel(out[0])[::65537]))
            times.append((time.time() - t0) / 3)
    dt = float(np.median(times))
    dev = np.asarray(out[0])[perm][:, :8]
    err = float(np.abs(dev - cpu_out).max() / (np.abs(cpu_out).max() + 1e-30))
    if not np.isfinite(err) or err > 1e-2:
        raise RuntimeError(f'mismatch rel err {err}')
    print(json.dumps({
        'mode': 'sharded_1_shuffled',
        'per_bank_ms': round(dt * 1e3, 1),
        'edge_ops_per_s': K * nnz * S / dt, 'rel_err': err,
        'first_call_s': round(first_s, 1)}), flush=True)
    print(json.dumps({
        'mode': 'summary_after_fix',
        'sharded_vs_plain_g1_overhead': round(dt * 1e3 / PLAIN_G1_MS, 3),
        'sharded_vs_plain_auto': round(dt * 1e3 / PLAIN_AUTO_MS, 3),
        'note': 'within-shard shuffle relabel in partition_graph (hub-window '
                'dispersion, benchmarks/sharded_spmm_probe.py); plain '
                'baselines from the first run, same graph/config.'}), flush=True)


if __name__ == '__main__':
    main()
