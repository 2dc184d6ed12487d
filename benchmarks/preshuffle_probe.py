"""Probe: is the plain path's 143 ms gap vs the 1-shard sharded path the
runtime shuffle permutes?

SHARDED_ONCHIP_r4 measured the 1-shard sharded chunk-carried path at
2311 ms/bank vs plain_auto's 2454 ms, with IDENTICAL layout statistics
(L=72, same slab count — layout ruled out by host comparison). The one
structural difference: `windowed_from_scipy(permute='shuffle')` pays
runtime entry/exit gathers (x in: 1 GB rw, bank out: 4 GB rw, both above
the 2^17-row gather cliff at ~11 ns/row), while the partitioner RELABELS
the graph host-side so its matrices run permute-free.

This probe relabels the bench graph on host (same hub-dispersal effect)
and builds with permute=None:

  plain_shuffle  current deployed single-chip path (runtime permutes)
  plain_pre      pre-relabeled graph, permute=None (no runtime permutes)

If plain_pre ≈ 2311 ms the hypothesis is confirmed and the pre-relabel
becomes the bench/config-5 configuration (validation stays exact: the
reference runs on the SAME relabeled graph — a vertex relabel is the
same graph).

Run: nohup python benchmarks/preshuffle_probe.py > /root/repo/PRESHUFFLE_r4.json 2>/tmp/preshuf.err &
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

    def run_variant(Wv, label, permute):
        dw = np.ravel(Wv.sum(axis=1)).astype(np.float32)
        lmax = float(2 * dw.max())
        Wneg = Wv.copy()
        Wneg.data = -Wneg.data
        t0 = time.time()
        H = cw.windowed_from_scipy(Wneg, dtype=np.float32,
                                   permute=permute)
        L = LaplacianOp(offdiag=H, diag=jnp.asarray(dw),
                        lap_type='combinatorial')
        log(f'{label}: layout in {time.time()-t0:.0f}s '
            f'(perm={"none" if H.perm is None else "runtime"})')

        def evaluate(lam):
            return jnp.exp(-jnp.asarray(SCALES, jnp.float32)[:, None]
                           * lam[None, :] / lmax)

        c = cheby.cheby_coeff(evaluate, lmax, m=K, dtype=jnp.float32)
        x = jax.jit(lambda: jax.random.normal(
            jax.random.PRNGKey(0), (N, S), jnp.float32))()
        x8 = np.asarray(x[:, :8])
        cpu_eps, cpu_out = benchmod.reference_cpu_eps(
            Wv, lmax, np.asarray(c), x8)

        run = jax.jit(lambda L, c, x: cheby.cheby_op(L, lmax, c, x))
        t0 = time.time()
        compiled = run.lower(L, c, x).compile()
        comp_s = time.time() - t0
        out = compiled(L, c, x)
        float(jnp.sum(out[0, ::4096, 0]))
        times = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(2):
                compiled(L, c, x)
            out = compiled(L, c, x)
            float(jnp.sum(out[0, ::4096, 0]))
            times.append((time.time() - t0) / 3)
        dt = float(np.median(times))
        err = float(np.abs(np.asarray(out[0, :, :8]) - cpu_out).max()
                    / (np.abs(cpu_out).max() + 1e-30))
        if not np.isfinite(err) or err > 1e-2:
            raise RuntimeError(f'{label}: rel err {err}')
        print(json.dumps({
            'mode': label, 'per_bank_ms': round(dt * 1e3, 1),
            'edge_ops_per_s': K * nnz * S / dt, 'rel_err': err,
            'compile_s': round(comp_s, 1)}), flush=True)
        del H, L, compiled, out, x
        gc.collect()
        return dt

    dt_shuf = run_variant(W, 'plain_shuffle', 'shuffle')

    # host relabel: same hub-dispersal the internal shuffle provides,
    # paid once at build instead of every entry/exit
    perm = np.random.default_rng(0x5EED).permutation(N)
    t0 = time.time()
    W2 = W[perm][:, perm].tocsr()
    log(f'host relabel in {time.time()-t0:.0f}s')
    dt_pre = run_variant(W2, 'plain_pre', None)

    print(json.dumps({
        'mode': 'summary',
        'pre_vs_shuffle': round(dt_pre / dt_shuf, 3),
        'note': 'plain_pre relabels the graph host-side and runs '
                'permute-free; sharded-1 measured 2311 ms '
                '(SHARDED_ONCHIP_r4) with the same trick built in'}),
        flush=True)


if __name__ == '__main__':
    main()
