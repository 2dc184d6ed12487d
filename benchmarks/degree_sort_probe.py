"""Measure the degree-sorted chunked layout on the bench BA graph (TPU).

Degree-sort relabeling (core.chunked permute='degree') should collapse
slot padding (2.07 unsorted, chunked_diag7b) because per-chunk row
degrees become homogeneous, and shrink the overflow scatter. Reports
build time, pad, SpMM ms, and the integrated K=30 4-filter heat bank
(validated against host float64 recurrence arithmetic).

Persistent compile cache is enabled ( .jax_cache ); run the probe twice
to measure its effect on a real workload's first-compile.

Run: nohup python benchmarks/degree_sort_probe.py > /tmp/degree_sort.out 2>&1 &
"""

import json
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

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
    t_dev = time.time()
    log(f'device: {jax.devices()[0]} ({time.time() - t_dev:.1f}s claim)')
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

    # ---- degree-sorted chunked build ------------------------------------
    t0 = time.time()
    H = ck.chunked_from_scipy(Wm, dtype=np.float32)  # permute='degree'
    jax.block_until_ready(H.blocks[0].vals)
    build_s = time.time() - t0
    assert H.perm is not None
    slots = sum(b.cols.shape[0] * b.cols.shape[1] for b in H.blocks)
    lslots = sum(l.cols.shape[0] * l.cols.shape[1] for l in H.levels)
    srows = int(H.level_rows.shape[0])
    widths = sorted(b.cols.shape[1] for b in H.blocks)
    emit(tag='layout', chunk_rows=H.chunk_rows, blocks=len(H.blocks),
         main_slots=slots, level_slots=lslots, scat_rows=srows,
         pad=round((slots + lslots) / nnz, 3), build_s=round(build_s, 1),
         w_min=widths[0], w_med=widths[len(widths) // 2], w_max=widths[-1],
         n_levels=len(H.levels))
    slots += lslots

    # ---- SpMM (full contract incl. entry/exit permutes) ------------------
    xj = jnp.asarray(xfull)
    jf = jax.jit(ck.chunked_spmm)
    t0 = time.time()
    o = jf(H, xj)
    float(jnp.sum(o[::257, 0]))
    compile_s = time.time() - t0
    err = float(np.abs(np.asarray(o[:4096]) - want_head).max()
                / (np.abs(want_head).max() + 1e-30))
    dt = measure(lambda: jf(H, xj), lambda o: o)
    emit(tag='spmm_sorted', compile_s=round(compile_s, 1), rel_err=err,
         ns_per_slot=dt / slots * 1e9, ns_per_edge=dt / nnz * 1e9,
         ms=dt * 1e3)

    # ---- inner SpMM only (no permutes; the cheby steady-state cost) ------
    cr = H.chunk_rows
    xp = np.asarray(xfull)[np.asarray(H.perm)]
    xc = tuple(jnp.asarray(xp[s:s + cr]) for s in range(0, N, cr))
    jfc = jax.jit(ck.chunked_spmm_chunks)
    o = jfc(H, xc)
    float(jnp.sum(o[0][::257]))
    dt = measure(lambda: jfc(H, xc), lambda o: o[0])
    emit(tag='spmm_inner', ns_per_slot=dt / slots * 1e9,
         ns_per_edge=dt / nnz * 1e9, ms=dt * 1e3)

    # ---- integrated Chebyshev heat bank ---------------------------------
    Wj = sp.from_scipy(Wm)
    L = laplacian_op(Wj, 'combinatorial')
    Lc = type(L)(offdiag=H.scale_vals(-1.0), diag=L.diag,
                 lap_type='combinatorial')
    from pygsp_tpu.ops.eigen import estimate_lmax_lanczos
    lmax = float(estimate_lmax_lanczos(L))
    scales = jnp.asarray([0.5, 2.0, 8.0, 32.0], jnp.float32)
    c = cheby.cheby_coeff(
        lambda lam: jnp.exp(-scales[:, None] * lam[None, :] / lmax),
        lmax, m=K)
    jbank = jax.jit(lambda Lc, c, x: cheby.cheby_op(Lc, lmax, c, x))
    t0 = time.time()
    o = jbank(Lc, c, xj)
    float(jnp.sum(o[0, ::257, 0]))
    compile_bank_s = time.time() - t0
    dt = measure(lambda: jbank(Lc, c, xj), lambda o: o[0], n=4)
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
    emit(tag='cheby_bank', K=K, S=S, nf=4,
         compile_s=round(compile_bank_s, 1), per_bank_ms=dt * 1e3,
         rel_err=err, edge_ops_per_s=K * nnz * S / dt)
    log('done')


if __name__ == '__main__':
    main()
