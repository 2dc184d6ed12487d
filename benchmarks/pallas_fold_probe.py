"""Pallas fold kernel vs the XLA one-hot einsum at weak-scale geometry.

SCALING_r5 names the unproven lever for the missed >=0.80 weak-scaling
target at 8-16 chips: "a custom fold kernel for fragmented shapes" —
below per-slab demand λ_w ≈ 16 the windowed fold executes progressively
below the gather roofline (mono bf16 ns/edge 4.34 → 4.82 → 7.89 at
p = 4 → 8 → 16, FRAGDIAG9_r5). This probe decomposes the mono matvec
and measures a Mosaic/Pallas fold kernel at the exact deployed shapes:

  a_full    the deployed fused gather+einsum SpMM (diag9 reproduction)
  b_gather  gather+product only, fold replaced by a slot-axis sum
            (the gather floor — XLA keeps the gather fused)
  c_xfold   the one-hot einsum alone on a MATERIALIZED product tensor
  d_pfold   Pallas fold kernel on the same inputs (grid over windows,
            one-hot built in VMEM, MXU dot, f32 accumulation)
  d8_pfold  same with 8 windows per grid step
  e_integr  full matvec with the Pallas fold: gather+product
            materializes p per out chunk (XLA cannot fuse into a Pallas
            call — the honest integration cost), fold in Pallas, strip
            overlap-add in XLA; validated against a_full
  copy_p    jnp.copy of the product tensor (session bandwidth calib)

Geometry: device-0 mono ring blocks at p in {4, 16, 64} weak-scale
share (fragblock_diag9.device0_block), R=2^17, P=128, bf16 vals+carry,
f32 accumulation — the deployed fast mode.

Run ON the TPU:
  nohup python benchmarks/pallas_fold_probe.py > /tmp/pfold.log 2>&1 &
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fragblock_diag9 import device0_block  # noqa: E402

S = 128
BUDGET_S = float(os.environ.get('PROBE_BUDGET_S', 1100))
T0 = time.time()
RESULTS = []


def log(*a):
    print(f'[{time.time() - T0:7.1f}s]', *a, flush=True)


def sync(y):
    if isinstance(y, tuple):
        y = y[0]
    return float(jnp.sum(y[::997, 0].astype(jnp.float32)))


def bench(fn, args, tag, nedges, n=12, extra=None):
    f = jax.jit(fn)
    t0 = time.time()
    sync(f(*args))
    fc = time.time() - t0
    t0 = time.time()
    for _ in range(n - 1):
        f(*args)
    sync(f(*args))
    dt = (time.time() - t0) / n
    r = {'tag': tag, 'ms': round(dt * 1e3, 2),
         'ns_per_edge': round(dt / nedges * 1e9, 2),
         'first_call_s': round(fc, 1)}
    if extra:
        r.update(extra)
    RESULTS.append(r)
    log(json.dumps(r))
    return dt


def make_pallas_fold(NW, Lt, KP, G=1):
    """(NW, Lt) int32 rowids + (NW, Lt, S) products -> (NW, KP, S) f32.

    Grid over window groups; per step the one-hot (KP, Lt) is built on
    the VPU (iota-compare, exact 0/1 in the product dtype) and folded
    with one MXU dot, accumulating in f32."""
    assert NW % G == 0

    def kernel(rid_ref, p_ref, o_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (KP, Lt), 0)
        for g in range(G):
            oh = (iota == rid_ref[g:g + 1, :]).astype(p_ref.dtype)
            o_ref[g] = jax.lax.dot_general(
                oh, p_ref[g], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    def fold(rid, p):
        return pl.pallas_call(
            kernel,
            grid=(NW // G,),
            out_shape=jax.ShapeDtypeStruct((NW, KP, S), jnp.float32),
            in_specs=[
                pl.BlockSpec((G, Lt), lambda w: (w, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, Lt, S), lambda w: (w, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, KP, S), lambda w: (w, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=bool(int(os.environ.get('PYGSP_PALLAS_INTERPRET',
                                              '0'))),
        )(rid, p)

    return fold


def run_cell(p, pr, pc, logN):
    from pygsp_tpu.core.chunked import chunk_signal
    from pygsp_tpu.core.windowed import windowed_from_host_coo

    R, P = 1 << 17, 128
    rk, ck, nr, ncol, n_local = device0_block(logN, pr, pc)
    nedges = rk.size
    log(f'--- p={p} ({pr}x{pc}): {nedges} edges over {nr}x{ncol}')
    mat = windowed_from_host_coo(
        rk, ck, np.ones(rk.size, np.float32), nr, ncol,
        chunk_rows=R, window_rows=P, permute=None, dtype=np.float32)
    mat = dataclasses.replace(mat, levels=(),
                              level_rows=jnp.zeros(0, jnp.int32))
    mat = mat.astype(jnp.bfloat16)
    n_out, NW, n_src, L = mat.cols.shape
    K = mat.borrow_span
    assert K == 2, f'probe assumes span-2 borrow, got {K}'
    KP, Lt = K * P, n_src * L
    cell = {'p': p, 'R': R, 'P': P, 'L': L, 'K': K, 'n_out': n_out,
            'NW': NW, 'n_src': n_src, 'Lt': Lt,
            'lambda_w': round(nedges / (n_out * NW * n_src * L) * L, 1)}
    log('cell:', json.dumps(cell))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(ncol, S)).astype(np.float32)
    xc = tuple(c.astype(jnp.bfloat16) for c in
               chunk_signal(jnp.asarray(x), R))

    # a: the deployed fused path
    bench(lambda m, c: m.spmm_chunks(c, out_dtype=jnp.float32), (mat, xc),
          f'a_full_p{p}', nedges, extra=cell)

    # b: gather+product floor (slot-axis sum instead of the fold)
    def gather_only(m, x2):
        def body(_, slab):
            co, va, ri = slab
            ps = [va[:, c][..., None] * x2[c][co[:, c]]
                  for c in range(n_src)]
            pp = jnp.stack(ps, 1).reshape(NW, Lt, S)
            return _, jnp.sum(pp, axis=1, dtype=jnp.float32)
        _, ys = lax.scan(body, 0, (m.cols, m.vals, m.rowid))
        return ys

    bench(gather_only, (mat, xc), f'b_gather_p{p}', nedges)

    # fold-only inputs: ONE out chunk's worth of products, real rowids
    rid1 = jnp.asarray(np.asarray(mat.rowid[0]).reshape(NW, Lt)
                       .astype(np.int32))
    p1 = jnp.asarray(rng.normal(size=(NW, Lt, S)), dtype=jnp.bfloat16)
    per_chunk = nedges / n_out

    bench(lambda q: jnp.copy(q), (p1,), f'copy_p_p{p}', per_chunk)

    iota = jnp.arange(KP, dtype=jnp.int32)

    def xfold(rid, q):
        oh = (rid[..., None] == iota).astype(q.dtype)
        return jnp.einsum('wlp,wls->wps', oh, q,
                          preferred_element_type=jnp.float32)

    bench(xfold, (rid1, p1), f'c_xfold_p{p}', per_chunk)

    pf1 = make_pallas_fold(NW, Lt, KP, G=1)
    t_out = None
    try:
        bench(pf1, (rid1, p1), f'd_pfold_p{p}', per_chunk)
        t_out = pf1(rid1, p1)
    except Exception as e:  # noqa: BLE001
        log('d_pfold failed:', repr(e))
        RESULTS.append({'tag': f'd_pfold_p{p}', 'error': repr(e)[:300]})
    pf8 = make_pallas_fold(NW, Lt, KP, G=8)
    try:
        bench(pf8, (rid1, p1), f'd8_pfold_p{p}', per_chunk)
        if t_out is None:
            t_out = pf8(rid1, p1)
    except Exception as e:  # noqa: BLE001
        log('d8_pfold failed:', repr(e))
        RESULTS.append({'tag': f'd8_pfold_p{p}', 'error': repr(e)[:300]})

    if t_out is not None:
        ref = xfold(rid1[:8], p1[:8])
        err = float(jnp.max(jnp.abs(t_out[:8] - ref))
                    / (float(jnp.max(jnp.abs(ref))) or 1.0))
        log(f'pallas fold vs einsum rel err: {err:.2e}')
        RESULTS.append({'tag': f'pfold_err_p{p}', 'rel_err': err})
        del t_out, ref

        # e: full matvec with the Pallas fold in the scan body
        def integr(m, x2):
            def body(_, slab):
                co, va, ri = slab
                ps = [va[:, c][..., None] * x2[c][co[:, c]]
                      for c in range(n_src)]
                pp = jnp.stack(ps, 1).reshape(NW, Lt, S)
                rid = ri.reshape(NW, Lt).astype(jnp.int32)
                t = pf8(rid, pp)
                y = t[:, :P, :].reshape(NW * P, S)
                a = t[:, P:2 * P, :].reshape(NW * P, S)
                y = y + jnp.concatenate(
                    [jnp.zeros((P, S), jnp.float32), a[:-P]])
                return _, y
            _, ys = lax.scan(body, 0, (m.cols, m.vals, m.rowid))
            return ys.reshape(n_out * NW * P, S)

        try:
            bench(integr, (mat, xc), f'e_integr_p{p}', nedges)
            ya = jnp.concatenate(
                jax.jit(lambda m, c: m.spmm_chunks(
                    c, out_dtype=jnp.float32))(mat, xc))
            ye = jax.jit(integr)(mat, xc)
            derr = float(jnp.max(jnp.abs(ya - ye))
                         / (float(jnp.max(jnp.abs(ya))) or 1.0))
            log(f'integrated vs deployed rel err: {derr:.2e}')
            RESULTS.append({'tag': f'integr_err_p{p}', 'rel_err': derr})
            del ya, ye
        except Exception as e:  # noqa: BLE001
            log('e_integr failed:', repr(e))
            RESULTS.append({'tag': f'e_integr_p{p}',
                            'error': repr(e)[:300]})

    del mat, xc, p1, rid1


def dump():
    with open(os.path.join(REPO, 'PALLAS_FOLD_r5.json'), 'w') as f:
        json.dump({'metric': 'pallas_fold_vs_xla_fold',
                   'S': S, 'note': 'bf16 vals+carry, f32 accumulation; '
                   'fold-only rows timed on one out chunk (ns_per_edge '
                   'uses that chunk share)',
                   'rows': RESULTS}, f, indent=1)


def main():
    log('device:', jax.devices()[0])
    for p, pr, pc, logN in ((16, 4, 4, 24), (4, 2, 2, 22), (64, 8, 8, 24)):
        if time.time() - T0 > BUDGET_S:
            log('budget reached, stopping')
            break
        run_cell(p, pr, pc, logN)
        dump()
    log('PROBE_DONE')


if __name__ == '__main__':
    main()
