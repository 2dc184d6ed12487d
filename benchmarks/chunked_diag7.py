"""Validate the chunked-path fixes on the real bench matrix (TPU).

After: builder single-pytree device_put, combined per-out-chunk level
scatter, CHUNK_ROWS=2^16, min_level_width=2.

Reports: build wall time, SpMM ms (levels included, validated), and the
integrated K=30 heat-bank Chebyshev time (validated vs host reference
arithmetic).

Run: nohup python benchmarks/chunked_diag7.py > /tmp/chunked_diag7.out 2>&1 &
"""

import json
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp

S = 128
N = 1 << 20
K = 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def measure(call, out_pick, n=8, reps=3):
    """median over reps of (enqueue n async, one strided sync)/n."""
    o = call()
    float(jnp.sum(out_pick(o)[::257]))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(n - 1):
            call()
        o = call()
        float(jnp.sum(out_pick(o)[::257]))
        ts.append((time.time() - t0) / n)
    return float(np.median(ts))


def main():
    log(f'device: {jax.devices()[0]}')
    rng = np.random.default_rng(0)
    import bench as benchmod
    from pygsp_tpu.core import chunked as ck
    from pygsp_tpu.core import sparse as sp
    from pygsp_tpu.core.operators import laplacian_op
    from pygsp_tpu.ops import chebyshev as cheby

    src, tgt = benchmod.get_graph()
    Wm = sps.csr_matrix(
        (np.ones(2 * len(src), dtype=np.float32),
         (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
        shape=(N, N))
    Wm.data[:] = 1.0
    Wm.sum_duplicates()
    nnz = Wm.nnz
    xfull = rng.normal(size=(N, S)).astype(np.float32)
    want_head = Wm[:4096] @ xfull

    # ---- SpMM with levels ------------------------------------------------
    t0 = time.time()
    H = ck.chunked_from_scipy(Wm, dtype=np.float32)
    jax.block_until_ready(H.blocks[0].vals)
    build_s = time.time() - t0
    slots = sum(b.cols.shape[0] * b.cols.shape[1] for b in H.blocks)
    slots += sum(l.cols.shape[0] * l.cols.shape[1] for l in H.levels)
    srows = int(H.level_rows.shape[0])
    cr = H.chunk_rows
    xc = tuple(jnp.asarray(xfull[s:s + cr]) for s in range(0, N, cr))
    jf = jax.jit(ck.chunked_spmm_chunks)
    t0 = time.time()
    o = jf(H, xc)
    float(jnp.sum(o[0][::257]))
    compile_spmm_s = time.time() - t0
    got = np.asarray(o[0][:4096])
    err = float(np.abs(got - want_head).max()
                / (np.abs(want_head).max() + 1e-30))
    dt = measure(lambda: jf(H, xc), lambda o: o[0])
    emit(tag='spmm_levels', chunk_rows=cr, blocks=len(H.blocks),
         slots=slots, scat_rows=srows, pad=round(slots / nnz, 2),
         build_s=round(build_s, 1), compile_s=round(compile_spmm_s, 1),
         rel_err=err, ns_per_slot=dt / slots * 1e9,
         ns_per_edge=dt / nnz * 1e9, ms=dt * 1e3)

    # ---- integrated Chebyshev heat bank ---------------------------------
    Wj = sp.from_scipy(Wm)
    L = laplacian_op(Wj, 'combinatorial')
    Lc = type(L)(offdiag=H.scale_vals(-1.0), diag=L.diag,
                 lap_type='combinatorial')
    lmax = float(benchmod.LMAX) if hasattr(benchmod, 'LMAX') else None
    if lmax is None:
        from pygsp_tpu.ops.eigen import estimate_lmax_lanczos
        lmax = float(estimate_lmax_lanczos(L))
    scales = jnp.asarray([0.5, 2.0, 8.0, 32.0], jnp.float32)
    c = cheby.cheby_coeff(
        lambda lam: jnp.exp(-scales[:, None] * lam[None, :] / lmax),
        lmax, m=K)
    xj = jnp.asarray(xfull)
    jbank = jax.jit(lambda Lc, c, x: cheby.cheby_op(Lc, lmax, c, x))
    t0 = time.time()
    o = jbank(Lc, c, xj)
    float(jnp.sum(o[0, ::257, 0]))
    compile_bank_s = time.time() - t0
    dt = measure(lambda: jbank(Lc, c, xj), lambda o: o[0], n=4)
    # validate head rows vs host float64 reference recurrence
    Lh = sps.csr_matrix(sps.diags(np.asarray(L.diag, np.float64))
                        - Wm.astype(np.float64))
    xv = xfull[:, :8].astype(np.float64)
    a1 = a2 = lmax / 2
    t_old, t_cur = xv, (Lh @ xv - a2 * xv) / a1
    ch = np.asarray(c, np.float64)
    want = 0.5 * ch[:, 0, None, None] * t_old + ch[:, 1, None, None] * t_cur
    for k in range(2, K + 1):
        t_new = (2.0 / a1) * (Lh @ t_cur - a2 * t_cur) - t_old
        want += ch[:, k, None, None] * t_new
        t_old, t_cur = t_cur, t_new
    got = np.asarray(o[:, :, :8], np.float64)
    err = float(np.abs(got - want).max() / (np.abs(want).max() + 1e-30))
    E = nnz // 2
    emit(tag='cheby_bank', K=K, S=S, nf=4, compile_s=round(compile_bank_s, 1),
         per_bank_ms=dt * 1e3, rel_err=err,
         edge_ops_per_s=K * E * S / dt)
    log('done')


if __name__ == '__main__':
    main()
