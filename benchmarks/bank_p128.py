"""Single-chip FULL BANK at window_rows 64 vs 128 (round 5).

FRAGDIAG4 measured the dense f32 SpMM 12% faster at P=128; if it holds
in-bank this moves the headline bench number. One config per process
invocation (argv: P mode) to isolate memory; g=14 accumulator grouping
(the measured frontier).

Run ON the TPU:
  for cfg in "64 f32" "128 f32" "64 bf16" "128 bf16"; do
      python benchmarks/bank_p128.py $cfg; done
Rows append to BANKP128_rows.jsonl.
"""

import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sps

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ['PYGSP_CHEBY_ACC_GROUP'] = '14'

K = 30
S = 128
SCALES = [5.0, 10.0, 25.0, 50.0]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    P_ = int(sys.argv[1])
    mode = sys.argv[2]
    import jax
    import jax.numpy as jnp
    from pygsp_tpu.core.operators import LaplacianOp
    from pygsp_tpu.core.windowed import windowed_from_scipy
    from pygsp_tpu.ops import chebyshev as cheby
    log('device:', jax.devices()[0])

    N1 = 1 << 20
    with np.load(os.path.join(REPO, '.bench_cache',
                              f'bafast_{N1}_8.npz')) as d:
        s1, t1 = d['src'], d['tgt']
    W1 = sps.csr_matrix(
        (np.ones(2 * len(s1), np.float32),
         (np.concatenate([s1, t1]), np.concatenate([t1, s1]))),
        shape=(N1, N1))
    W1.data[:] = 1.0
    W1.sum_duplicates()
    nnz = W1.nnz
    dw = np.ravel(W1.sum(axis=1)).astype(np.float32)
    lmax = float(2 * dw.max())

    def evaluate(lam):
        return jnp.exp(-jnp.asarray(SCALES, jnp.float32)[:, None]
                       * lam[None, :] / lmax)

    c = cheby.cheby_coeff(evaluate, lmax, m=K, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x_host = rng.normal(size=(N1, S)).astype(np.float32)
    import bench as benchmod
    cpu_eps, cpu_out = benchmod.reference_cpu_eps(
        W1, lmax, np.asarray(c), x_host[:, :2])

    t0 = time.time()
    Hh = windowed_from_scipy(W1, dtype=np.float32, window_rows=P_)
    log(f'layout built in {time.time() - t0:.0f}s L={Hh.cols.shape[-1]}')
    vdt = jnp.bfloat16 if mode == 'bf16' else None
    cdt = jnp.bfloat16 if mode == 'bf16' else None
    H = Hh.astype(vdt) if vdt is not None else Hh
    Lop = LaplacianOp(offdiag=jax.device_put(H), diag=jnp.asarray(dw),
                      lap_type='combinatorial')
    run = jax.jit(lambda L_, c_, x_: cheby.cheby_op(
        L_, lmax, c_, x_, carry_dtype=cdt, carry_tol=1.0))

    def sync(o):
        return float(jnp.sum(jnp.ravel(o)[::65537]))

    x = jnp.asarray(x_host)
    t0 = time.time()
    out = run(Lop, c, x)
    sync(out)
    fc = time.time() - t0
    dev = np.asarray(out[0, :, :2])   # reference returns filter 0
    err = float(np.abs(dev - cpu_out).max()
                / (np.abs(cpu_out).max() + 1e-30))
    del out
    ts = []
    for _ in range(4):
        t0 = time.time()
        o = run(Lop, c, x)
        sync(o)
        ts.append(time.time() - t0)
        del o
    dt = float(np.median(ts))
    f32_bytes = K * (nnz * (4 * S + 8) + N1 * S * 4)
    r = {'tag': f'bank_P{P_}_{mode}', 'per_bank_ms': round(dt * 1e3, 1),
         'pct_f32_roofline': round(100 * (f32_bytes / 160e9) / dt, 1),
         'rel_err': err, 'first_call_s': round(fc, 1),
         'L': int(Hh.cols.shape[-1]),
         'edge_ops_per_s': K * nnz * S / dt}
    with open(os.path.join(REPO, 'BANKP128_rows.jsonl'), 'a') as f:
        f.write(json.dumps(r) + '\n')
    print(json.dumps(r), flush=True)


if __name__ == '__main__':
    main()
