"""Rigorous chunk-size / consumer-count sweep with trustworthy timing.

Methodology per config: warm+validate, then 3 repeats of [enqueue 8 calls
async, one strided-slice sync]; report the median repeat. Sync cost is
amortised 1/8 and the strided sync never reshapes (no full-array fetch).

  P1: 8 chunks R=2^17, 1 consumer/chunk, W=8   (expect fast if footprint ok)
  P2: 8 chunks R=2^17, 8 consumers/chunk, W=2  (bench-like interleave)
  P3: 16 chunks R=2^16, 16 consumers/chunk, W=2
  P4: 32 chunks R=2^15, 32 consumers/chunk, W=2 (full 2^20 space, tiny chunks)
  P5: real BA matrix, main slots only, chunk_rows=2^17
  P6: real BA matrix, main slots only, chunk_rows=2^16
  P7: real BA matrix, main slots only, chunk_rows=2^15
  P8: P6 + levels

Run: nohup python benchmarks/chunked_diag6.py > /tmp/chunked_diag6.out 2>&1 &
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    log(kw)


def measure(call, out_pick, n=8, reps=3):
    """median over reps of (enqueue n async, sync once)/n."""
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


def synth(tag, C, R, consumers, W, rng):
    total_calls = C * consumers
    rout = R  # one output row per operand row per consumer
    chunks_np = [rng.normal(size=(R, S)).astype(np.float32) for _ in range(C)]
    chunks = tuple(jnp.asarray(a) for a in chunks_np)
    cols_np = rng.integers(0, R, size=(total_calls, rout, W)).astype(np.int32)
    vals_np = rng.normal(size=(total_calls, rout, W)).astype(np.float32)
    cols = jnp.asarray(cols_np)
    vals = jnp.asarray(vals_np)
    nslots = total_calls * rout * W

    def fn(chunks, cols, vals):
        outs = []
        k = 0
        for c in range(C):
            for _ in range(consumers):
                t = None
                for j in range(W):
                    u = vals[k, :, j:j + 1] * chunks[c][cols[k, :, j]]
                    t = u if t is None else t + u
                outs.append(t)
                k += 1
        # fold outputs so the program output stays small-ish
        return sum(outs[1:], outs[0])

    jf = jax.jit(fn)
    # validation of row 0 (consumer 0 reads chunk 0)
    o = jf(chunks, cols, vals)
    want = np.zeros(S, np.float32)
    for k in range(total_calls):
        c = k // consumers
        for j in range(W):
            want += vals_np[k, 0, j] * chunks_np[c][cols_np[k, 0, j]]
    err = float(np.abs(np.asarray(o[0]) - want).max()
                / (np.abs(want).max() + 1e-30))
    dt = measure(lambda: jf(chunks, cols, vals), lambda o: o)
    emit(tag=tag, C=C, R=R, consumers=consumers, W=W, rel_err=err,
         ns_per_slot=dt / nslots * 1e9, ms=dt * 1e3)


def main():
    log(f'device: {jax.devices()[0]}')
    rng = np.random.default_rng(0)

    synth('P1', C=8, R=1 << 17, consumers=1, W=8, rng=rng)
    synth('P2', C=8, R=1 << 17, consumers=8, W=2, rng=rng)
    synth('P3', C=16, R=1 << 16, consumers=16, W=2, rng=rng)
    synth('P4', C=32, R=1 << 15, consumers=32, W=2, rng=rng)

    # ---- real matrix --------------------------------------------------
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
    xfull = rng.normal(size=(N, S)).astype(np.float32)
    want_full = Wm[:4096] @ xfull  # reference slice

    for tag, cr, with_levels in (('P5', 1 << 17, False),
                                 ('P6', 1 << 16, False),
                                 ('P7', 1 << 15, False),
                                 ('P8', 1 << 16, True)):
        t0 = time.time()
        H = ck.chunked_from_scipy(Wm, dtype=np.float32, chunk_rows=cr)
        if not with_levels:
            H = ck.ChunkedELLMatrix(
                blocks=tuple(ck.ChunkBlock(cols=b.cols, vals=b.vals,
                                           levels=())
                             for b in H.blocks),
                rowptr=H.rowptr, block_keys=H.block_keys, n_rows=H.n_rows,
                n_cols=H.n_cols, nnz=H.nnz, chunk_rows=H.chunk_rows)
        slots = sum(b.cols.shape[0] * b.cols.shape[1] for b in H.blocks)
        slots += sum(l.cols.shape[0] * l.cols.shape[1]
                     for b in H.blocks for l in b.levels)
        xc = tuple(jnp.asarray(xfull[s:s + cr]) for s in range(0, N, cr))
        jf = jax.jit(ck.chunked_spmm_chunks)
        o = jf(H, xc)
        got = np.asarray(o[0][:4096])
        err = float(np.abs(got - want_full).max()
                    / (np.abs(want_full).max() + 1e-30))
        dt = measure(lambda: jf(H, xc), lambda o: o[0])
        emit(tag=tag, chunk_rows=cr, blocks=len(H.blocks), slots=slots,
             pad=round(slots / nnz, 2), with_levels=with_levels,
             build_s=round(time.time() - t0, 1), rel_err=err,
             ns_per_slot=dt / slots * 1e9, ns_per_edge=dt / nnz * 1e9,
             ms=dt * 1e3)
        del H, xc, o
    log('done')


if __name__ == '__main__':
    main()
