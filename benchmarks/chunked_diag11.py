"""Pinpoint the chunked-SpMM compile hog: level gathers vs the scatter.

Real bench matrix, merged levels (tier-capped). Compile+run of:
  C1: full SpMM (main + levels + scatter)   [expect < diag7b's 140 s]
  C2: main + level gathers, NO scatter (ps summed into row 0 band)
  C3: main + scatter of dummy ps (reuses x chunk heads, no level gathers)

Run: nohup python benchmarks/chunked_diag11.py > /tmp/chunked_diag11.out 2>&1 &
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


def measure(call, out_pick, n=8, reps=3):
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
    from pygsp_tpu.core.sparse import _slot_block_sum

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
    jax.block_until_ready(H.blocks[0].vals)
    log(f'build {time.time()-t0:.1f}s  n_levels={len(H.levels)} '
        f'lrows={H.level_rows.shape[0]}')
    xfull = rng.normal(size=(N, S)).astype(np.float32)
    cr = H.chunk_rows
    xc = tuple(jnp.asarray(xfull[s:s + cr]) for s in range(0, N, cr))
    want_head = Wm[:4096] @ xfull

    def spmm_main(mat, x_chunks):
        n_out = mat.n_out_chunks
        y = [None] * n_out
        for (i, c), blk in zip(mat.block_keys, mat.blocks):
            if blk.cols.shape[1] > 0:
                t = _slot_block_sum(blk.cols, blk.vals, x_chunks[c])
                y[i] = t if y[i] is None else y[i] + t
        return y

    def f_full(mat, x_chunks):
        return ck.chunked_spmm_chunks(mat, x_chunks)

    def f_noscatter(mat, x_chunks):
        y = spmm_main(mat, x_chunks)
        ps = [_slot_block_sum(l.cols, l.vals, x_chunks[l.src_chunk])
              for l in mat.levels]
        extra = sum(jnp.sum(p, axis=0) for p in ps)
        return (y[0] + extra[None, :],) + tuple(y[1:])

    def f_scatteronly(mat, x_chunks):
        y = spmm_main(mat, x_chunks)
        m = mat.level_rows.shape[0]
        ps = jnp.concatenate(
            [x_chunks[0]] * (m // cr) + [x_chunks[0][:m % cr]])
        yf = jnp.concatenate(y)
        yf = yf.at[mat.level_rows].add(ps, mode='drop')
        return tuple(yf[i * cr:(i + 1) * cr]
                     for i in range(mat.n_out_chunks))

    for tag, fn, check in (('C1_full', f_full, True),
                           ('C2_noscatter', f_noscatter, False),
                           ('C3_scatteronly', f_scatteronly, False)):
        jf = jax.jit(fn)
        t0 = time.time()
        o = jf(H, xc)
        float(jnp.sum(o[0][::257, 0]))
        comp = time.time() - t0
        err = None
        if check:
            got = np.asarray(o[0][:4096])
            err = float(np.abs(got - want_head).max()
                        / (np.abs(want_head).max() + 1e-30))
        dt = measure(lambda: jf(H, xc), lambda o: o[0], n=4)
        emit(tag=tag, compile_s=round(comp, 1), ms=dt * 1e3, rel_err=err)
    log('done')


if __name__ == '__main__':
    main()
