"""Fold-precision and window-size sweep on the real bench graph.

The one-hot fold at HIGHEST precision emulates f32 with ~6 bf16 MXU
passes: slots x 2P x S x 2 x 6 ~= 3.7 TFLOP per SpMM — tens of ms if
not fully overlapped with the gather stream. Sweep:

  P=64  precision DEFAULT / HIGH / HIGHEST   (error vs speed)
  P=32  HIGH+HIGHEST  (halves fold FLOPs, worse padding)
  P=128 HIGH          (better padding, doubles fold FLOPs)

Run: nohup python benchmarks/windowed_diag7.py > /tmp/windowed_diag7.out 2>&1 &
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


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from pygsp_tpu.core import windowed as wd
    from pygsp_tpu.core.chunked import chunk_signal, permute_in

    log(f'device: {jax.devices()[0]}')
    with np.load('/root/repo/.bench_cache/bafast_1048576_8.npz') as d:
        src, tgt = d['src'], d['tgt']
    W = sps.csr_matrix(
        (np.ones(2 * len(src), dtype=np.float32),
         (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
        shape=(N, N))
    W.data[:] = 1.0
    W.sum_duplicates()
    nnz = W.nnz
    coo = W.tocoo()
    x_np = np.random.default_rng(0).normal(size=(N, S)).astype(np.float32)
    R = 1 << 16

    prec = {'DEFAULT': lax.Precision.DEFAULT, 'HIGH': lax.Precision.HIGH,
            'HIGHEST': lax.Precision.HIGHEST}

    ref = None
    for P, pnames in ((64, ('HIGHEST', 'HIGH', 'DEFAULT')),
                      (32, ('HIGHEST', 'HIGH')),
                      (128, ('HIGHEST', 'HIGH'))):
        t0 = time.time()
        H = wd.windowed_from_host_coo(coo.row, coo.col, coo.data, N, N,
                                      chunk_rows=R, window_rows=P,
                                      dtype=np.float32)
        build_s = time.time() - t0
        n_slots = H.n_slots + sum(
            l.cols.shape[0] * l.cols.shape[1] for l in H.levels)
        xc = chunk_signal(permute_in(H, jnp.asarray(x_np)), R)
        for pname in pnames:
            wd.FOLD_PRECISION = prec[pname]
            jf = jax.jit(lambda m, xs: m.spmm_chunks(xs))
            t0 = time.time()
            o = jf(H, xc)
            float(jnp.sum(o[0][::257, 0]))
            comp = time.time() - t0
            ts = []
            for _ in range(3):
                t0 = time.time()
                for _ in range(5):
                    o = jf(H, xc)
                float(jnp.sum(o[0][::257, 0]))
                ts.append((time.time() - t0) / 5)
            dt = float(np.median(ts))
            full = jnp.concatenate(o)
            if ref is None:
                ref, err = full, 0.0
            else:
                err = float(jnp.max(jnp.abs(full - ref))
                            / (jnp.max(jnp.abs(ref)) + 1e-30))
            emit(P=P, precision=pname, L=int(H.cols.shape[3]),
                 slot_pad=round(n_slots / nnz, 3),
                 build_s=round(build_s, 1), compile_s=round(comp, 1),
                 ms=dt * 1e3, ns_per_edge=dt / nnz * 1e9, rel_err=err)
            jf.clear_cache()
    wd.FOLD_PRECISION = prec['HIGHEST']
    log('done')


if __name__ == '__main__':
    main()
