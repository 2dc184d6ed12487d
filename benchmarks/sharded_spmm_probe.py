"""Isolate the sharded-path overhead (SHARDED_ONCHIP_r3 follow-up).

sharded_1 runs the bench bank 1.6x slower than plain_g1. The chunk-
materialization barrier changed nothing, so the gather-cliff hypothesis
is dead. This probe separates SpMM cost from recurrence structure:

  spmm_plain     10x windowed_spmm_chunks, chunk tuple carried (the
                 single-chip inner loop shape)
  spmm_sharded   10x ShardedWindowed.local_spmm inside a 1-device
                 shard_map (output feeds back)
  recur_plain    the exact sharded recurrence BODY (full-array t_old/
                 t_cur/acc elementwise, mv = windowed spmm + diag) but
                 WITHOUT shard_map — separates shard_map/layout cost
                 from the recurrence's unfused full-array elementwise

Run: nohup python benchmarks/sharded_spmm_probe.py > /tmp/shprobe.out 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, __file__.rsplit('/', 2)[0])

N = 1 << 20
S = 128
REPS = 10
K = 30
CACHE = '/root/repo/.bench_cache'


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import bench as benchmod
    from pygsp_tpu.core import windowed as cw
    from pygsp_tpu.core.chunked import chunk_signal
    from pygsp_tpu.parallel import (make_mesh, partition_graph,
                                    shard_local_windowed)

    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.path.join(CACHE, 'xla_cache'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception:  # noqa: BLE001
        pass
    log('device:', jax.devices()[0])

    src, tgt = benchmod.get_graph()
    W = sps.csr_matrix(
        (np.ones(2 * len(src), dtype=np.float32),
         (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
        shape=(N, N))
    W.data[:] = 1.0
    W.sum_duplicates()
    nnz = W.nnz
    x_host = np.random.default_rng(0).normal(size=(N, S)).astype(np.float32)

    def sync(o):
        return float(jnp.sum(jnp.ravel(o)[::65537]))

    def rate(dt):
        return REPS * nnz * S / dt

    # --- plain SpMM, chunk-carried ---------------------------------------
    mat = cw.windowed_from_scipy(W, dtype=np.float32)

    @jax.jit
    def spmm_plain(m, xc):
        for _ in range(REPS):
            xc = m.spmm_chunks(xc)
        return xc

    xc = chunk_signal(jnp.asarray(x_host), mat.chunk_rows)
    t0 = time.time()
    out = spmm_plain(mat, xc)
    sync(out[0])
    log(f'spmm_plain first {time.time()-t0:.0f}s')
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = spmm_plain(mat, xc)
        sync(out[0])
        best = min(best, time.time() - t0)
    print(json.dumps({'mode': 'spmm_plain',
                      'ms_per_spmm': round(best * 1e3 / REPS, 2),
                      'edge_ops_per_s': rate(best)}), flush=True)

    # --- sharded SpMM in shard_map (1 device) ----------------------------
    sg = partition_graph(W, 1, reorder='none', dtype=np.float32)
    ell = shard_local_windowed(sg, split_boundary=False)
    mesh = make_mesh(1, 1)
    from jax.sharding import PartitionSpec as P

    def body(ell, x_local):
        for _ in range(REPS):
            x_local = ell.local_spmm(x_local)
        return x_local

    ell_spec = jax.tree.map(lambda _: P('graph'), ell)
    spmm_sh = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(ell_spec, P('graph', 'batch')),
        out_specs=P('graph', 'batch')))
    xpad = sg.pad_signal(x_host)
    with mesh:
        t0 = time.time()
        out = spmm_sh(ell, xpad)
        sync(out)
        log(f'spmm_sharded first {time.time()-t0:.0f}s')
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            out = spmm_sh(ell, xpad)
            sync(out)
            best = min(best, time.time() - t0)
    print(json.dumps({'mode': 'spmm_sharded',
                      'ms_per_spmm': round(best * 1e3 / REPS, 2),
                      'edge_ops_per_s': rate(best)}), flush=True)

    # --- the sharded recurrence body WITHOUT shard_map --------------------
    dw = np.ravel(W.sum(axis=1)).astype(np.float32)
    lmax = float(2 * dw.max())
    Wneg = W.copy()
    Wneg.data = -Wneg.data
    matn = cw.windowed_from_scipy(Wneg, dtype=np.float32)
    diag = jnp.asarray(dw)
    SCALES = [5.0, 10.0, 25.0, 50.0]

    def evaluate(lam):
        return jnp.exp(-jnp.asarray(SCALES, jnp.float32)[:, None]
                       * lam[None, :] / lmax)

    from pygsp_tpu.ops import chebyshev as cheby
    c = cheby.cheby_coeff(evaluate, lmax, m=K, dtype=jnp.float32)
    nf = c.shape[0]

    @jax.jit
    def recur_plain(m, diag, c, x):
        from pygsp_tpu.core.chunked import chunk_signal as csig
        from pygsp_tpu.core.chunked import unchunk_signal as usig
        from pygsp_tpu.core.windowed import windowed_spmm_chunks

        def mv(t, scale=None, shift=None):
            off = usig(windowed_spmm_chunks(m, csig(t, m.chunk_rows)))
            d = diag if shift is None else diag - shift
            y = d[:, None] * t + off
            return y if scale is None else scale * y

        a1 = a2 = lmax / 2
        t_old = x
        t_cur = (mv(x) - a2 * x) / a1
        acc = (0.5 * c[:, 0][:, None, None] * x[None]
               + c[:, 1][:, None, None] * t_cur[None])

        def step(carry, ck):
            t_old, t_cur, acc = carry
            t_new = mv(t_cur, scale=2.0 / a1, shift=a2) - t_old
            acc = acc + ck[:, None, None] * t_new[None]
            return (t_cur, t_new, acc), None

        (_, _, acc), _ = jax.lax.scan(step, (t_old, t_cur, acc), c[:, 2:].T)
        return acc

    x = jnp.asarray(x_host)
    t0 = time.time()
    out = recur_plain(matn, diag, c, x)
    sync(out[0])
    log(f'recur_plain first {time.time()-t0:.0f}s')
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = recur_plain(matn, diag, c, x)
        sync(out[0])
        best = min(best, time.time() - t0)
    print(json.dumps({'mode': 'recur_noshardmap_bank',
                      'per_bank_ms': round(best * 1e3, 1),
                      'edge_ops_per_s': K * nnz * S / best}), flush=True)


if __name__ == '__main__':
    main()
