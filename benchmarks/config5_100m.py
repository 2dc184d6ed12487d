"""BASELINE config 5 single-chip datapoint: K=30 Meyer-kernel filtering on
a 100M-edge Barabási–Albert graph (N=2^22, m=24 -> 100.7M directed /
~201M stored edges) through the windowed-compact format.

The intended target is multi-chip (v5p-16); this measures the largest
single-chip result this 16 GB v5e can hold and documents the ceiling.

Memory model at N=4.2M (OOM dumps /tmp/config5*.out): every (N, S) f32
state buffer lane-pads S up to 128 (2.15 GB each regardless of S <= 128
— small S wastes lanes without saving memory), and the grouped Chebyshev
accumulation holds g extra term buffers. Round 2 fit the graph with one
filter, acc group g=1, donated signals, sub-chunked windowed scan body,
bf16 slab values (exact for unit weights) — 1.31e10 edge-ops/s = 33% of
the read roofline, memory-starved. Round 3 (VERDICT #1) adds the bf16
recurrence CARRY: gather bytes per slot halve AND each term buffer drops
to 1.07 GB, so the ladder can raise the accumulator group above g=1.
Candidates run best-first: (bf16 carry, g=4/3/2/1) then the f32-carry
fallbacks.

Each candidate is AOT-compiled first and its memory_analysis printed, so
the fit/no-fit boundary is recorded even for configs never executed.

Run: nohup python benchmarks/config5_100m.py > /tmp/config5.out 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, '/root/repo')

N = int(os.environ.get('CONFIG5_N', 1 << 22))   # bisect knob
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


def get_layout(coo):
    """HOST-side windowed slabs for -W, cached on disk (packing ~320 s).

    Kept as numpy so each ladder candidate device_puts ONLY its own
    value-dtype variant (a device-side astype would keep both copies
    of the 2.2 GB slabs alive).
    """
    from pygsp_tpu.core import windowed as wd
    from pygsp_tpu.core.chunked import ChunkLevel

    path = os.path.join(CACHE, f'wd_{N}_{M_ATTACH}.npz')
    if not os.path.exists(path):
        t0 = time.time()
        H = wd.windowed_from_host_coo(coo.row, coo.col, -coo.data, N, N,
                                      dtype=np.float32)
        log(f'windowed layout built in {time.time() - t0:.1f}s')
        data = dict(cols=np.asarray(H.cols), vals=np.asarray(H.vals),
                    rowid=np.asarray(H.rowid),
                    level_rows=np.asarray(H.level_rows),
                    rowptr=np.asarray(H.rowptr), nnz=H.nnz,
                    chunk_rows=H.chunk_rows, window_rows=H.window_rows,
                    perm=np.asarray(H.perm), iperm=np.asarray(H.iperm),
                    n_levels=len(H.levels))
        for i, lv in enumerate(H.levels):
            data[f'lv{i}_cols'] = np.asarray(lv.cols)
            data[f'lv{i}_vals'] = np.asarray(lv.vals)
            data[f'lv{i}_src'] = lv.src_chunk
        np.savez(path, **data)
        del H
    d = dict(np.load(path))
    levels = tuple(
        ChunkLevel(cols=d[f'lv{i}_cols'], vals=d[f'lv{i}_vals'],
                   src_chunk=int(d[f'lv{i}_src']))
        for i in range(int(d['n_levels'])))
    return wd.WindowedELLMatrix(
        cols=d['cols'], vals=d['vals'], rowid=d['rowid'], levels=levels,
        level_rows=d['level_rows'], rowptr=d['rowptr'],
        n_rows=N, n_cols=N, nnz=int(d['nnz']),
        chunk_rows=int(d['chunk_rows']), window_rows=int(d['window_rows']),
        perm=d['perm'], iperm=d['iperm'])


def main():
    import jax
    import jax.numpy as jnp
    from pygsp_tpu.core.operators import LaplacianOp
    from pygsp_tpu.ops import chebyshev as cheby

    # Round 2 capped the windowed scan body at 512 MB to fit; that forced
    # nw_sub=128/64 window groups whose ~1 MB per-src-chunk gathers go
    # LATENCY-bound — the real cause of round 2's 33%-of-roofline result
    # (measured sweep at N=2^22, bf16 carry: nw_sub 64 -> 36%, 256 ->
    # 70.2%, 512 -> 86.9%, 1024 -> 86.6%; f32 carry at 512 -> 65.0%).
    # nw_sub=128 at this scale crashes the TPU worker (isolated shape
    # fault — 64, 256, 512, 1024 all execute). The dtype-aware body
    # estimate at the library-default 2048 MB cap now picks 512 for both
    # carry dtypes; PYGSP_WINDOW_STEP overrides for probes.

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

    Hh = get_layout(coo)       # host-side
    lvl_slots = sum(int(np.prod(l.cols.shape)) for l in Hh.levels)
    emit(tag='layout', L=Hh.cols.shape[3], slab_slots=Hh.n_slots,
         level_slots=lvl_slots, pad=round((Hh.n_slots + lvl_slots) / nnz, 3))

    # Meyer wavelet kernel (band 1), closed-form given lmax (cite
    # reference pygsp/filters/meyer.py:41-89); evaluated via the zoo
    # class on a tiny carrier graph with lmax pinned to this graph's.
    import pygsp_tpu as gsp
    Gc = gsp.graphs.Ring(16)
    Gc._lmax = lmax
    evaluate = gsp.filters.Meyer(Gc, Nf=2).evaluate

    def sync(o):
        return float(jnp.sum(jnp.ravel(o)[::65537]))

    c_all = cheby.cheby_coeff(evaluate, lmax, m=K, dtype=jnp.float32)
    x_host2 = np.random.default_rng(0).normal(
        size=(N, 2)).astype(np.float32)   # validation columns

    # ladder: best candidate first. bf16 carry halves gather bytes and
    # term-buffer memory (acc stays f32 via preferred_element_type); g is
    # the Chebyshev accumulator group (benchmarks/accgroup_sweep.py).
    # argv[1] = "vals,carry,g" (e.g. "bf16,bf16,1") pins ONE candidate —
    # crash isolation: an over-budget execution kills the TPU worker and
    # every later candidate in the same process (measured: the g=2
    # candidate at 13.72 effective GB crashed the worker despite passing
    # the 15.2 gate, so the true execution budget on this chip is below
    # 13.7 and the gate below is set under the measured crash point).
    def cand(spec):
        v, ca, g = spec.split(',')
        dt = {'bf16': jnp.bfloat16, 'f32': jnp.float32}
        return (128, dt[v], dt.get(ca), int(g))

    if len(sys.argv) > 1:
        ladder = [cand(sys.argv[1])]
    else:
        ladder = [(128, jnp.bfloat16, jnp.bfloat16, 1),
                  (128, jnp.bfloat16, None, 1), (128, jnp.float32, None, 1)]
    for S, val_dtype, carry, g in ladder:
        os.environ['PYGSP_CHEBY_ACC_GROUP'] = str(g)
        tagd = dict(S=S, nf=1, K=K, vals=str(np.dtype(val_dtype)),
                    carry='f32' if carry is None else str(np.dtype(carry)),
                    acc_group=g)
        H = Lop = compiled = None      # free the previous candidate's
        try:                           # device arrays before uploading
            H = jax.device_put(Hh.astype(val_dtype))
            Lop = LaplacianOp(offdiag=H, diag=jnp.asarray(dw),
                              lap_type='combinatorial')
            c = c_all[:1]
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
                           arg_gb=round(ma.argument_size_in_bytes / 2**30, 2),
                           out_gb=round(ma.output_size_in_bytes / 2**30, 2))
                # donated x aliases the output buffer
                eff_gb = (mem['temp_gb'] + mem['arg_gb'] + mem['out_gb']
                          - N * S * 4 / 2**30)
                mem['effective_gb'] = round(eff_gb, 2)
            except Exception as e:  # noqa: BLE001
                mem = dict(memory_analysis=f'{type(e).__name__}')
                eff_gb = 0.0
            emit(tag='config5_compile', compile_s=round(comp_s, 1),
                 **tagd, **mem)
            if eff_gb > 13.5:
                # executing an over-budget program CRASHES the TPU worker
                # (and every later ladder candidate with it) — record the
                # fit boundary and move on
                emit(tag='config5_skip', reason='memory', **tagd, **mem)
                continue

            def make_x(seed):
                z = jax.random.normal(jax.random.PRNGKey(seed), (N, S),
                                      jnp.float32)
                # overwrite first 2 columns with the host validation
                # columns so the reference check has known inputs
                return z.at[:, :2].set(jnp.asarray(x_host2))

            x = jax.block_until_ready(make_x(0))
            t0 = time.time()
            out = compiled(Lop, c, x)
            sync(out)
            first_s = time.time() - t0
            log(f'{tagd}: first run {first_s:.1f}s')
            dev = np.asarray(out[0, :, :2])
            del out, x
            ts = []
            for i in range(2):
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
            # %-of-roofline in bench.py's f32-byte definition (the
            # BASELINE metric) and at the mode's own gather bytes
            read_bw = 160e9
            f32_bytes = K * (nnz * (4 * S + 8) + N * S * 4)
            sig_b = (np.dtype(carry).itemsize if carry is not None
                     else np.dtype(np.float32).itemsize)
            val_b = np.dtype(val_dtype).itemsize
            own_bytes = K * (nnz * (sig_b * S + 4 + 1 + val_b)
                             + N * S * 4)
            emit(tag='config5_result', nnz=nnz, per_filter_ms=dt * 1e3,
                 rel_err=err, edge_ops_per_s=K * nnz * S / dt,
                 pct_roofline=round(100 * (f32_bytes / read_bw) / dt, 1),
                 pct_roofline_own_bytes=round(
                     100 * (own_bytes / read_bw) / dt, 1),
                 vs_reference_cpu=K * nnz * S / dt / cpu_eps, **tagd)
            break
        except Exception as e:  # noqa: BLE001 — OOM fallback ladder
            log(f'{tagd} failed: {type(e).__name__}: {e}')
            emit(tag='config5_fail', error=type(e).__name__, **tagd)
    log('done')


if __name__ == '__main__':
    main()
