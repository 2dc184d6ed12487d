"""bf16 recurrence carry at the bench config, on the real chip.

Measures the FULL K=30 heat filterbank (bench.py config: N=2^20 BA m=8,
nnz=16.7M stored, S=128, Nf=4) in three value/carry dtype modes:

  f32/f32    the round-2 baseline (2.62e10 edge-ops/s, 70.8% roofline)
  bf16/f32   bf16 slab values (exact: unit weights), f32 carry
  bf16/bf16  the opt-in carry mode — gather bytes AND state memory halved,
             fold accumulation f32 (preferred_element_type)

Each mode validates against the reference arithmetic on 8 columns before
its throughput is reported (same gate as bench.py). Writes one JSON line
per mode; redirect to BF16_CARRY_r3.json.

Run: nohup python benchmarks/bf16_carry_bench.py > /root/repo/BF16_CARRY_r3.json 2>/tmp/bf16carry.err &
"""

import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, __file__.rsplit('/', 2)[0])

N = 1 << 20
M_ATTACH = 8
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
    log(f'graph nnz={nnz}')

    Wneg = W.copy()
    Wneg.data = -Wneg.data
    t0 = time.time()
    H32 = cw.windowed_from_scipy(Wneg, dtype=np.float32)
    log(f'layout built in {time.time()-t0:.0f}s L={H32.cols.shape[3]}')

    def evaluate(lam):
        return jnp.exp(-jnp.asarray(SCALES, jnp.float32)[:, None]
                       * lam[None, :] / lmax)

    c = cheby.cheby_coeff(evaluate, lmax, m=K, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(N, S)).astype(np.float32))
    cpu_eps, cpu_out = benchmod.reference_cpu_eps(
        W, lmax, np.asarray(c), np.asarray(x)[:, :8])

    def sync(o):
        return float(jnp.sum(o[0, ::4096, 0]))

    read_bw = 160e9

    for vals_dt, carry_dt, tag in (
            (jnp.float32, None, 'f32/f32'),
            (jnp.bfloat16, None, 'bf16/f32'),
            (jnp.bfloat16, jnp.bfloat16, 'bf16/bf16')):
        H = H32 if vals_dt == jnp.float32 else H32.astype(vals_dt)
        L = LaplacianOp(offdiag=H, diag=jnp.asarray(dw),
                        lap_type='combinatorial')
        run = jax.jit(lambda L, c, x: cheby.cheby_op(
            L, lmax, c, x, carry_dtype=carry_dt, carry_tol=1.0))
        t0 = time.time()
        out = run(L, c, x)
        sync(out)
        first_s = time.time() - t0
        n_iter, reps = 3, 3
        times = []
        for _ in range(reps):
            t0 = time.time()
            for _ in range(n_iter - 1):
                run(L, c, x)
            out = run(L, c, x)
            sync(out)
            times.append((time.time() - t0) / n_iter)
        dt = float(np.median(times))
        dev = np.asarray(out[0, :, :8])
        err = float(np.abs(dev - cpu_out).max()
                    / (np.abs(cpu_out).max() + 1e-30))
        if not np.isfinite(err) or err > 3e-2:
            raise RuntimeError(f'{tag}: device mismatch rel err {err}')
        eps = K * nnz * S / dt
        # roofline at the mode's own gather bytes/row (metadata ~9B/slot
        # either way; values included in slot metadata for the slabs)
        sig_b = 2 if carry_dt == jnp.bfloat16 else 4
        val_b = 2 if vals_dt == jnp.bfloat16 else 4
        min_bytes = K * (nnz * (sig_b * S + 4 + 1 + val_b)
                         + N * S * 4)
        pct = 100.0 * (min_bytes / read_bw) / dt
        print(json.dumps({
            'mode': tag, 'per_bank_ms': round(dt * 1e3, 1),
            'edge_ops_per_s': eps, 'rel_err_vs_reference': err,
            'pct_roofline_own_bytes': round(pct, 1),
            'vs_f32_roofline': round(
                100.0 * (K * (nnz * (4 * S + 9) + N * S * 4) / read_bw)
                / dt, 1),
            'first_call_s': round(first_s, 1),
            'vs_reference_cpu': eps / cpu_eps}), flush=True)
        log(f'{tag}: {dt*1e3:.0f} ms/bank, rel err {err:.2e}')
        del H, L, out


if __name__ == '__main__':
    main()
