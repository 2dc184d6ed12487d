"""Bisect why chunked_spmm runs at ~9.7 ns/slot instead of ~2.7.

Variants, each timed on the real chip with forced host-read sync:
  A. synthetic 8x8 blocks, w=2, tuple-of-chunk params, no scan  (probe-like)
  B. A + sentinel (== R) out-of-range indices in ~30% of slots
  C. real matrix main blocks only (no levels), tuple params, no scan
  D. C + levels
  E. D inside a 30-step scan carrying the chunk tuple (real recurrence)

Run: nohup python benchmarks/chunked_diag.py > /tmp/chunked_diag.out 2>&1 &
"""

import json
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, '/root/repo')

N = 1 << 20
S = 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    log(kw)


def main():
    import jax
    import jax.numpy as jnp
    log(f'device: {jax.devices()[0]}')
    rng = np.random.default_rng(0)

    def timeit(fn, *args, n=3):
        out = fn(*args)
        o = out[0] if isinstance(out, (tuple, list)) else out
        float(jnp.sum(jnp.ravel(o)[::4096]))
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
            o = out[0] if isinstance(out, (tuple, list)) else out
            float(jnp.sum(jnp.ravel(o)[::4096]))
        return (time.time() - t0) / n

    C = 8
    R = N // C
    W = 2

    # ---- A: synthetic blocks, no sentinels --------------------------------
    chunks = tuple(jnp.asarray(rng.normal(size=(R, S)).astype(np.float32))
                   for _ in range(C))
    cols = jnp.asarray(rng.integers(0, R, size=(C, C, R, W)).astype(np.int32))
    vals = jnp.asarray(rng.normal(size=(C, C, R, W)).astype(np.float32))

    def spmm_synth(chunks, cols, vals):
        y = []
        for i in range(C):
            acc = None
            for c in range(C):
                t = None
                for j in range(W):
                    u = vals[i, c, :, j:j + 1] * chunks[c][cols[i, c, :, j]]
                    t = u if t is None else t + u
                acc = t if acc is None else acc + t
            y.append(acc)
        return tuple(y)

    dt = timeit(jax.jit(spmm_synth), chunks, cols, vals)
    nslots = C * C * R * W
    emit(tag='A_synth', ns_per_slot=dt / nslots * 1e9,
         gbps=nslots * S * 4 / dt / 1e9)

    # ---- B: with sentinel out-of-range indices ----------------------------
    colsb = np.asarray(cols)
    mask = rng.random(size=colsb.shape) < 0.3
    colsb = np.where(mask, R, colsb).astype(np.int32)
    colsb = jnp.asarray(colsb)
    dt = timeit(jax.jit(spmm_synth), chunks, colsb, vals)
    emit(tag='B_sentinel', ns_per_slot=dt / nslots * 1e9)
    del cols, colsb, vals

    # ---- real matrix ------------------------------------------------------
    import bench as benchmod
    from pygsp_tpu.core import chunked as ck
    src, tgt = benchmod.get_graph()
    Wm = sps.csr_matrix(
        (np.ones(2 * len(src), dtype=np.float32),
         (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
        shape=(N, N))
    Wm.data[:] = 1.0
    Wm.sum_duplicates()
    nnz = Wm.nnz
    t0 = time.time()
    H = ck.chunked_from_scipy(Wm, dtype=np.float32)
    main_slots = sum(b.cols.shape[0] * b.cols.shape[1] for b in H.blocks)
    lev_slots = sum(l.cols.shape[0] * l.cols.shape[1]
                    for b in H.blocks for l in b.levels)
    log(f'build {time.time()-t0:.0f}s main_slots={main_slots} '
        f'lev_slots={lev_slots} nnz={nnz}')

    xc = tuple(jnp.asarray(rng.normal(size=(R, S)).astype(np.float32))
               for _ in range(C))

    Hmain = ck.ChunkedELLMatrix(
        blocks=tuple(ck.ChunkBlock(cols=b.cols, vals=b.vals, levels=())
                     for b in H.blocks),
        rowptr=H.rowptr, block_keys=H.block_keys, n_rows=H.n_rows,
        n_cols=H.n_cols, nnz=H.nnz, chunk_rows=H.chunk_rows)

    dt = timeit(jax.jit(ck.chunked_spmm_chunks), Hmain, xc)
    emit(tag='C_real_main_only', ns_per_slot=dt / main_slots * 1e9,
         ns_per_edge=dt / nnz * 1e9)

    dt = timeit(jax.jit(ck.chunked_spmm_chunks), H, xc)
    emit(tag='D_real_with_levels',
         ns_per_slot=dt / (main_slots + lev_slots) * 1e9,
         ns_per_edge=dt / nnz * 1e9)

    # ---- E: 30-step scan over the real matrix -----------------------------
    def recur(H, xc):
        def step(carry, _):
            return ck.chunked_spmm_chunks(H, carry), None
        out, _ = jax.lax.scan(step, xc, None, length=30)
        return out

    dt = timeit(jax.jit(recur), H, xc)
    emit(tag='E_scan30', ns_per_slot=dt / 30 / (main_slots + lev_slots) * 1e9,
         ns_per_edge=dt / 30 / nnz * 1e9)

    log('done')


if __name__ == '__main__':
    main()
