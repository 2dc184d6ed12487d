"""BASELINE config 5 single-chip datapoint: K=30 Meyer filterbank on a
100M-edge Barabási–Albert graph (N=2^22, m=24 -> 100.7M directed /
~201M stored edges) through the windowed-compact format.

The intended target is multi-chip (v5p-16); this measures the largest
single-chip result this 16 GB v5e can hold. Signal batch S and filter
count are stepped down until a config fits: the recurrence carries
2 state buffers + Nf accumulators of (N, S) f32 next to the ~2.2 GB
slot arrays, so S=64/nf=4 is ~12 GB and S=128/nf=4 does not fit.

Round-1 note for contrast (STATUS.md): the per-row block-chunked format
crashed the TPU worker even at S=16.

Run: nohup python benchmarks/config5_100m.py > /tmp/config5.out 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, '/root/repo')

N = 1 << 22
M_ATTACH = 24
K = 30
CACHE = '/root/repo/.bench_cache'


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def get_graph():
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f'bafast_{N}_{M_ATTACH}.npz')
    if os.path.exists(path):
        with np.load(path) as d:
            return d['src'], d['tgt']
    from pygsp_tpu.graphs.barabasialbert import ba_edges_fast
    t0 = time.time()
    src, tgt = ba_edges_fast(N, m0=M_ATTACH, m=M_ATTACH, seed=42)
    log(f'BA generated in {time.time() - t0:.1f}s: {len(src)} edges')
    np.savez(path, src=src, tgt=tgt)
    return src, tgt


def main():
    import jax
    import jax.numpy as jnp
    from pygsp_tpu.core import windowed as wd
    from pygsp_tpu.core.operators import LaplacianOp
    from pygsp_tpu.ops import chebyshev as cheby

    log(f'device: {jax.devices()[0]}')
    src, tgt = get_graph()
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

    t0 = time.time()
    H = wd.windowed_from_host_coo(coo.row, coo.col, -coo.data, N, N,
                                  dtype=np.float32)
    build_s = time.time() - t0
    lvl_slots = sum(int(np.prod(l.cols.shape)) for l in H.levels)
    emit(tag='layout', L=H.cols.shape[3], slab_slots=H.n_slots,
         level_slots=lvl_slots, level_rows=int(H.level_rows.shape[0]),
         pad=round((H.n_slots + lvl_slots) / nnz, 3),
         build_s=round(build_s, 1))
    Lop = LaplacianOp(offdiag=H, diag=jnp.asarray(dw),
                      lap_type='combinatorial')

    # Meyer bank kernels: closed-form in lambda given lmax (cite
    # reference pygsp/filters/meyer.py:41-89); evaluate via the zoo class
    # on a tiny carrier graph with lmax pinned to the big graph's.
    import pygsp_tpu as gsp
    Gc = gsp.graphs.Ring(16)
    Gc._lmax = lmax

    def make_eval(nf):
        return gsp.filters.Meyer(Gc, Nf=nf).evaluate

    def sync(o):
        return float(jnp.sum(jnp.ravel(o)[::65537]))

    # Memory model at N=4.2M (OOM dumps /tmp/config5*.out): every (N, S)
    # f32 state buffer lane-pads S up to 128 (2.15 GB each REGARDLESS of
    # S <= 128 — small S wastes lanes without saving memory), and the
    # grouped Chebyshev accumulation holds g extra term buffers. So:
    # run FULL S=128 lanes, g=1 (+1 transient buffer instead of +4),
    # and sub-chunk the windowed scan body (inner scan, bounded temps).
    os.environ.setdefault('PYGSP_WINDOWED_BODY_MB', '512')
    os.environ.setdefault('PYGSP_CHEBY_ACC_GROUP', '1')
    rng = np.random.default_rng(0)
    for S, nf in ((128, 1), (64, 1), (32, 1)):
        try:
            evaluate = make_eval(max(nf, 2))
            c = cheby.cheby_coeff(evaluate, lmax, m=K,
                                  dtype=jnp.float32)[:nf]
            x = jnp.asarray(rng.normal(size=(N, S)).astype(np.float32))
            run = jax.jit(lambda L, c, x: cheby.cheby_op(L, lmax, c, x))
            t0 = time.time()
            out = run(Lop, c, x)
            sync(out[0])
            comp = time.time() - t0
            log(f'S={S} nf={nf}: compiled+ran in {comp:.1f}s')
            # pull validation columns to host, then FREE the (nf, N, S)
            # output before re-running — holding it doubles the
            # live-output footprint (4.3 GB at S=64/nf=4)
            dev = np.asarray(out[0, :, :2])
            del out
            ts = []
            for _ in range(2):
                t0 = time.time()
                o = run(Lop, c, x)
                sync(o[0])
                ts.append(time.time() - t0)
                del o
            dt = float(np.median(ts))
            # validate vs reference arithmetic on 2 columns
            import bench as benchmod
            cpu_eps, cpu_out = benchmod.reference_cpu_eps(
                W, lmax, np.asarray(c), np.asarray(x)[:, :2])
            err = float(np.abs(dev - cpu_out).max()
                        / (np.abs(cpu_out).max() + 1e-30))
            emit(tag='config5_bank', S=S, nf=nf, K=K, nnz=nnz,
                 compile_s=round(comp, 1), per_bank_ms=dt * 1e3,
                 rel_err=err, edge_ops_per_s=K * nnz * S / dt,
                 vs_reference_cpu=K * nnz * S / dt / cpu_eps)
            break
        except Exception as e:  # noqa: BLE001 — OOM fallback ladder
            log(f'S={S} nf={nf} failed: {type(e).__name__}: {e}')
            emit(tag='config5_fail', S=S, nf=nf, error=type(e).__name__)
    log('done')


if __name__ == '__main__':
    main()
