"""Three design questions for the chunked SpMM, measured:

  D1: bf16 gather operand — is the slot gather ~2x faster than f32?
      (re-test: round-1 ruling-out used the broken sync methodology)
  D2: scan-over-out-chunks with stacked uniform-width slot arrays —
      same gather speed as unrolled blocks? compile time?
  D3: compile time of the 256-block SpMM without levels vs with
      (isolates what the 168 s compile is spent on).

Run: nohup python benchmarks/chunked_diag10.py > /tmp/chunked_diag10.out 2>&1 &
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
R = 1 << 16
C = N // R


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def measure(call, out_pick, n=8, reps=3):
    o = call()
    float(jnp.sum(out_pick(o)[::257].astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(n - 1):
            call()
        o = call()
        float(jnp.sum(out_pick(o)[::257].astype(jnp.float32)))
        ts.append((time.time() - t0) / n)
    return float(np.median(ts))


def main():
    log(f'device: {jax.devices()[0]}')
    rng = np.random.default_rng(0)

    # ---- D1: bf16 vs f32 operand, W=2, 16 chunk operands -------------
    W = 2
    cols_np = rng.integers(0, R, size=(C, R, W)).astype(np.int32)
    vals = jnp.asarray(rng.normal(size=(C, R, W)).astype(np.float32))
    cols = jnp.asarray(cols_np)
    x_np = rng.normal(size=(N, S)).astype(np.float32)
    nslots = C * R * W

    def consume(chunks, cols, vals):
        outs = []
        for c in range(C):
            t = None
            for j in range(W):
                g = chunks[c][cols[c, :, j]].astype(jnp.float32)
                u = vals[c, :, j:j + 1] * g
                t = u if t is None else t + u
            outs.append(t)
        return sum(outs[1:], outs[0])

    for tag, dt_ in (('D1_f32', jnp.float32), ('D1_bf16', jnp.bfloat16)):
        xt = tuple(jnp.asarray(x_np[c * R:(c + 1) * R]).astype(dt_)
                   for c in range(C))
        jf = jax.jit(consume)
        dt = measure(lambda: jf(xt, cols, vals), lambda o: o)
        emit(tag=tag, ns_per_slot=dt / nslots * 1e9, ms=dt * 1e3)

    # ---- D2: scan over out chunks, stacked (C_out, R, W) slots -------
    # body: out chunk i gathers from all 16 src chunk operands
    cols2 = jnp.asarray(
        rng.integers(0, R, size=(C, C, R, W)).astype(np.int32))  # [i, c]
    vals2 = jnp.asarray(
        rng.normal(size=(C, C, R, W)).astype(np.float32))
    xt = tuple(jnp.asarray(x_np[c * R:(c + 1) * R]) for c in range(C))

    def f_scan_out(xt, cols2, vals2):
        def body(carry, slc):
            co, va = slc  # (C, R, W) for this out chunk
            t = None
            for c in range(C):
                for j in range(W):
                    u = va[c, :, j:j + 1] * xt[c][co[c, :, j]]
                    t = u if t is None else t + u
            return carry, t
        _, ys = jax.lax.scan(body, 0, (cols2, vals2))
        return ys

    jf = jax.jit(f_scan_out)
    t0 = time.time()
    o = jf(xt, cols2, vals2)
    float(jnp.sum(o[0][::257, 0]))
    comp = time.time() - t0
    dt = measure(lambda: jf(xt, cols2, vals2), lambda o: o[0], n=4)
    emit(tag='D2_scan_out_stacked', compile_s=round(comp, 1),
         ns_per_slot=dt / (C * C * R * W) * 1e9, ms=dt * 1e3)

    # ---- D3: real-matrix SpMM compile, no levels ----------------------
    import bench as benchmod
    from pygsp_tpu.core import chunked as ck
    src, tgt = benchmod.get_graph()
    Wm = sps.csr_matrix(
        (np.ones(2 * len(src), dtype=np.float32),
         (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
        shape=(N, N))
    Wm.data[:] = 1.0
    Wm.sum_duplicates()
    H = ck.chunked_from_scipy(Wm, dtype=np.float32)
    Hn = ck.ChunkedELLMatrix(
        blocks=tuple(ck.ChunkBlock(cols=b.cols, vals=b.vals, levels=())
                     for b in H.blocks),
        rowptr=H.rowptr, block_keys=H.block_keys, n_rows=H.n_rows,
        n_cols=H.n_cols, nnz=H.nnz, chunk_rows=H.chunk_rows)
    xc = tuple(jnp.asarray(x_np[s:s + R]) for s in range(0, N, R))
    for tag, M in (('D3_nolevels', Hn), ('D3_levels', H)):
        jf = jax.jit(ck.chunked_spmm_chunks)
        t0 = time.time()
        o = jf(M, xc)
        float(jnp.sum(o[0][::257, 0]))
        comp = time.time() - t0
        dt = measure(lambda: jf(M, xc), lambda o: o[0], n=4)
        emit(tag=tag, compile_s=round(comp, 1), ms=dt * 1e3)
    log('done')


if __name__ == '__main__':
    main()
