"""Fresh-compile time of the bench-config Chebyshev program (VERDICT r2
#5): the acc-group inner-scan restructure vs the round-2 unrolled body.

Round 2's fresh compile was 177 s at the bench config (g=14 unrolled
recurrence steps × 16 per-src-chunk gathers per scan body). The inner
lax.scan over the g group steps traces `recur` once, cutting the program
~g-fold; this measures BOTH paths' cold compile (persistent cache
DISABLED) and steady-state throughput (must stay within 5%).

One mode per process invocation (the env knob is read at trace time but
a shared process would share XLA subcomputation caches):

  python benchmarks/compile_time_probe.py scan     # default path
  python benchmarks/compile_time_probe.py unroll   # round-2 body

Appends one JSON line to stdout; collect into COMPILE_r3.json.
"""

import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, __file__.rsplit('/', 2)[0])

MODE = sys.argv[1] if len(sys.argv) > 1 else 'scan'
# unrolled is the library default since the A/B (13% throughput edge);
# 'scan' probes the fast-compile opt-in body
os.environ['PYGSP_CHEBY_GROUP_UNROLL'] = '1' if MODE == 'unroll' else '0'

N = 1 << 20
K = 30
S = 128
SCALES = [5.0, 10.0, 25.0, 50.0]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import bench as benchmod
    from pygsp_tpu.core import windowed as cw
    from pygsp_tpu.core.operators import LaplacianOp
    from pygsp_tpu.ops import chebyshev as cheby

    log('device:', jax.devices()[0], 'mode:', MODE)
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
    Wneg = W.copy()
    Wneg.data = -Wneg.data
    H = cw.windowed_from_scipy(Wneg, dtype=np.float32)
    L = LaplacianOp(offdiag=H, diag=jnp.asarray(dw),
                    lap_type='combinatorial')

    def evaluate(lam):
        return jnp.exp(-jnp.asarray(SCALES, jnp.float32)[:, None]
                       * lam[None, :] / lmax)

    c = cheby.cheby_coeff(evaluate, lmax, m=K, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(N, S)).astype(np.float32))
    cpu_eps, cpu_out = benchmod.reference_cpu_eps(
        W, lmax, np.asarray(c), np.asarray(x)[:, :8])

    run = jax.jit(lambda L, c, x: cheby.cheby_op(L, lmax, c, x))
    t0 = time.time()
    lowered = run.lower(L, c, x)
    trace_s = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    compile_s = time.time() - t0
    log(f'trace {trace_s:.1f}s compile {compile_s:.1f}s')

    def sync(o):
        return float(jnp.sum(o[0, ::4096, 0]))

    out = compiled(L, c, x)
    sync(out)
    times = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(2):
            compiled(L, c, x)
        out = compiled(L, c, x)
        sync(out)
        times.append((time.time() - t0) / 3)
    dt = float(np.median(times))
    dev = np.asarray(out[0, :, :8])
    err = float(np.abs(dev - cpu_out).max()
                / (np.abs(cpu_out).max() + 1e-30))
    if not np.isfinite(err) or err > 1e-2:
        raise RuntimeError(f'mismatch rel err {err}')
    print(json.dumps({
        'mode': MODE, 'trace_s': round(trace_s, 1),
        'compile_s': round(compile_s, 1),
        'per_bank_ms': round(dt * 1e3, 1),
        'edge_ops_per_s': K * nnz * S / dt,
        'rel_err': err}), flush=True)


if __name__ == '__main__':
    main()
