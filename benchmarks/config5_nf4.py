"""BASELINE config 5 with the REAL Nf=4 HEAT FILTERBANK (round 5).

VERDICT r4 #3: the north star reads "K=30 heat filterbank" but the r4
config-5 artifact ran a single Meyer kernel. This runs the 4-scale heat
bank (the bench config's bank) on the config-5 graph family at the
100M-stored-edge scale (N=2^21, where exact-f32 met the >=70% target)
and documents the memory ladder at N=2^22 (201M stored edges).

Memory vs Nf=1: the bank adds (Nf-1) extra f32 accumulators of
N*S*4 B each (1.07 GB at N=2^21, 2.15 GB at N=2^22) — the recurrence
terms are shared, so the K SpMMs are identical and per-bank time should
be ~= Nf=1 time + the accumulator FMA traffic.

Run: nohup python benchmarks/config5_nf4.py [N_log2] > /tmp/config5_nf4.out 2>&1 &
Candidates isolate per process via argv[2] = "vals,carry,g" as in
config5_100m.py. Emits one JSON line per phase; collect into
SINGLECHIP_r5.json.
"""

import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, '/root/repo')

N = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 21
os.environ['CONFIG5_N'] = str(N)
import benchmarks.config5_100m as c5   # noqa: E402  (reuses graph/layout)
c5.N = N
K = 30
SCALES = [5.0, 10.0, 25.0, 50.0]
if len(sys.argv) > 3:                  # Nf ladder knob (memory fits)
    SCALES = SCALES[:int(sys.argv[3])]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from pygsp_tpu.core.operators import LaplacianOp
    from pygsp_tpu.ops import chebyshev as cheby

    log(f'device: {jax.devices()[0]}')
    src, tgt = c5.get_graph()
    t0 = time.time()
    W = sps.csr_matrix(
        (np.ones(2 * len(src), dtype=np.float32),
         (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
        shape=(N, N))
    W.data[:] = 1.0
    W.sum_duplicates()
    nnz = W.nnz
    dw = np.ravel(W.sum(axis=1)).astype(np.float32)
    lmax = float(2 * dw.max())
    coo = W.tocoo()
    log(f'host CSR in {time.time() - t0:.1f}s: nnz={nnz}')
    Hh = c5.get_layout(coo)

    def evaluate(lam):
        return jnp.exp(-jnp.asarray(SCALES, jnp.float32)[:, None]
                       * lam[None, :] / lmax)

    c = cheby.cheby_coeff(evaluate, lmax, m=K, dtype=jnp.float32)
    x_host2 = np.random.default_rng(0).normal(
        size=(N, 2)).astype(np.float32)

    def sync(o):
        return float(jnp.sum(jnp.ravel(o)[::65537]))

    S = 128
    if len(sys.argv) > 2:
        v, ca, g = sys.argv[2].split(',')
        dt_ = {'bf16': jnp.bfloat16, 'f32': jnp.float32}
        ladder = [(dt_[v], dt_.get(ca), int(g))]
    else:
        ladder = [(jnp.bfloat16, jnp.bfloat16, 1),
                  (jnp.bfloat16, None, 1)]
    for val_dtype, carry, g in ladder:
        os.environ['PYGSP_CHEBY_ACC_GROUP'] = str(g)
        tagd = dict(N=N, S=S, nf=len(SCALES), K=K,
                    vals=str(np.dtype(val_dtype)),
                    carry='f32' if carry is None else str(np.dtype(carry)),
                    acc_group=g)
        H = Lop = compiled = None
        try:
            H = jax.device_put(Hh.astype(val_dtype))
            Lop = LaplacianOp(offdiag=H, diag=jnp.asarray(dw),
                              lap_type='combinatorial')
            run = jax.jit(lambda L, c, x: cheby.cheby_op(
                L, lmax, c, x, carry_dtype=carry, carry_tol=1.0),
                          donate_argnums=(2,))
            xs = jax.ShapeDtypeStruct((N, S), jnp.float32)
            t0 = time.time()
            compiled = run.lower(Lop, c, xs).compile()
            comp_s = time.time() - t0
            try:
                ma = compiled.memory_analysis()
                mem = dict(temp_gb=round(ma.temp_size_in_bytes / 2**30, 2),
                           arg_gb=round(
                               ma.argument_size_in_bytes / 2**30, 2),
                           out_gb=round(ma.output_size_in_bytes / 2**30, 2))
                # NO donation credit: with Nf>1 the (N,S) input cannot
                # alias the (Nf,N,S) output (measured: the 13.22 GB
                # credited estimate at N=2^21 Nf=4 bf16 OOMed at
                # execution)
                eff_gb = (mem['temp_gb'] + mem['arg_gb']
                          + mem['out_gb'])
                mem['effective_gb'] = round(eff_gb, 2)
            except Exception as e:  # noqa: BLE001
                mem = dict(memory_analysis=f'{type(e).__name__}')
                eff_gb = 0.0
            emit(tag='nf4_compile', compile_s=round(comp_s, 1), **tagd,
                 **mem)
            if eff_gb > 13.5:
                emit(tag='nf4_skip', reason='memory', **tagd, **mem)
                continue

            def make_x(seed):
                z = jax.random.normal(jax.random.PRNGKey(seed), (N, S),
                                      jnp.float32)
                return z.at[:, :2].set(jnp.asarray(x_host2))

            x = jax.block_until_ready(make_x(0))
            t0 = time.time()
            out = compiled(Lop, c, x)
            sync(out)
            first_s = time.time() - t0
            log(f'{tagd}: first run {first_s:.1f}s')
            dev = np.asarray(out[0, :, :2])   # reference = filter 0
            del out, x
            ts = []
            for _ in range(2):
                x = jax.block_until_ready(make_x(0))
                t0 = time.time()
                o = compiled(Lop, c, x)
                sync(o)
                ts.append(time.time() - t0)
                del o, x
            dt = float(np.median(ts))
            import bench as benchmod
            cpu_eps, cpu_out = benchmod.reference_cpu_eps(
                W, lmax, np.asarray(c), x_host2)
            err = float(np.abs(dev - cpu_out).max()
                        / (np.abs(cpu_out).max() + 1e-30))
            read_bw = 160e9
            f32_bytes = K * (nnz * (4 * S + 8) + N * S * 4)
            emit(tag='nf4_result', nnz=nnz,
                 per_bank_ms=round(dt * 1e3, 1), rel_err=err,
                 edge_ops_per_s=K * nnz * S / dt,
                 pct_roofline=round(100 * (f32_bytes / read_bw) / dt, 1),
                 vs_reference_cpu=K * nnz * S / dt / cpu_eps,
                 first_call_s=round(first_s, 1), **tagd)
        except Exception as e:  # noqa: BLE001
            log(f'{tagd} failed: {type(e).__name__}: {e}')
            emit(tag='nf4_fail', error=type(e).__name__, **tagd)
    log('done')


if __name__ == '__main__':
    main()
