"""Windowed-compact SpMM probe: exact-packed slots + MXU one-hot fold.

Design under test (candidate chunked-ELL v2 main path): slots for each
(P-row output window, src chunk) are exact-packed (no per-row
alignment), each slot carrying (col, val, rowid-in-window). The fold to
output rows is a one-hot contraction over the window dim — tiny MXU
flops — which `mxu_segsum_probe.py` showed fuses with the gather.

Padding moves from per-row (Poisson(1) -> ~2.07x) to per-window
(Poisson(P) -> ~1.2-1.3x with tiering), so at the measured 2.7 ns/slot
gather roofline this is the route to >=70%-of-roofline.

Questions measured here (bench-scale shapes, scan over out chunks like
chunked_diag10 D2):
  Q1 ns/slot of gather+mul+onehot-einsum, P=32 vs P=128, vs plain-ELL
     control in the same scan structure
  Q2 accuracy: f32-default (1 bf16 MXU pass), HIGH (3 passes),
     hi/lo bf16 split (2 passes)
  Q3 window-aligned scatter-add (m, P*S)-wide rows: row-rate or
     byte-rate? (decides overflow-tier fold cost)

Run: nohup python benchmarks/windowed_compact_probe.py > /tmp/windowed_compact.out 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
from jax import lax

S = 128
N = 1 << 20
R = 1 << 16
C = N // R          # 16 chunks each way


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def measure(call, out_pick, n=6, reps=3):
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


def build_layout(rng, P, L):
    """Synthetic per-(out,src) block layouts shaped like the bench BA
    graph: per-window slot counts ~ Poisson(P) clipped to L (overflow
    handled by tiers in the real format; here main-only + a reference
    result computed from the packed slots themselves, so correctness is
    exact regardless of clipping)."""
    NW = R // P
    # (C_out, C_src, NW, L)
    cols = rng.integers(0, R, size=(C, C, NW, L)).astype(np.int32)
    vals = rng.random(size=(C, C, NW, L)).astype(np.float32) - 0.5
    counts = np.minimum(rng.poisson(P, size=(C, C, NW)), L)
    slot_live = np.arange(L)[None, None, None, :] < counts[..., None]
    vals = np.where(slot_live, vals, 0.0).astype(np.float32)
    # rowid in [0, P), sorted per window over the LIVE slots
    rowid = np.sort(rng.integers(0, P, size=(C, C, NW, L)), axis=-1)
    rowid = np.where(slot_live, rowid, P - 1).astype(np.int8)
    live = int(counts.sum())
    return (jnp.asarray(cols), jnp.asarray(vals), jnp.asarray(rowid),
            live, slot_live)


def host_reference(cols, vals, rowid, x_np, P):
    """Exact fold on host for one out chunk (chunk 0)."""
    NW, L = cols.shape[2], cols.shape[3]
    y = np.zeros((R, S), np.float64)
    for c in range(C):
        xc = x_np[c * R:(c + 1) * R].astype(np.float64)
        g = xc[np.asarray(cols[0, c]).ravel()].reshape(NW, L, S)
        p = np.asarray(vals[0, c], np.float64)[..., None] * g
        rid = np.asarray(rowid[0, c], np.int64)
        out_rows = (np.arange(NW)[:, None] * P + rid).ravel()
        np.add.at(y, out_rows, p.reshape(NW * L, S))
    return y


def main():
    log(f'device: {jax.devices()[0]}')
    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(N, S)).astype(np.float32)
    xt = tuple(jnp.asarray(x_np[c * R:(c + 1) * R]) for c in range(C))

    for P, L in ((32, 32), (128, 128)):
        cols, vals, rowid, live, _ = build_layout(rng, P, L)
        NW = R // P
        slots = C * C * NW * L
        log(f'P={P} L={L}: slots={slots/1e6:.1f}M live={live/1e6:.1f}M '
            f'pad_at_poisson={slots/live:.2f}')

        def fold_f32(p, oh):
            return jnp.einsum('wlp,wls->wps', oh.astype(jnp.float32), p,
                              preferred_element_type=jnp.float32)

        def fold_high(p, oh):
            return jnp.einsum('wlp,wls->wps', oh.astype(jnp.float32), p,
                              preferred_element_type=jnp.float32,
                              precision=lax.Precision.HIGHEST)

        def fold_hilo(p, oh):
            ohb = oh.astype(jnp.bfloat16)
            hi = p.astype(jnp.bfloat16)
            lo = (p - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dn = (((1,), (1,)), ((0,), (0,)))
            acc = lax.dot_general(ohb, hi, dn,
                                  preferred_element_type=jnp.float32)
            return acc + lax.dot_general(ohb, lo, dn,
                                         preferred_element_type=jnp.float32)

        def spmm(xt, cols, vals, rowid, fold):
            iota = jnp.arange(P, dtype=jnp.int32)

            def body(carry, slab):
                co, va, ri = slab          # (C, NW, L[, ...]) this out chunk
                y = None
                for c in range(C):
                    p = xt[c][co[c]] * va[c][..., None]       # (NW, L, S)
                    oh = ri[c].astype(jnp.int32)[..., None] == iota
                    t = fold(p, oh)                           # (NW, P, S)
                    y = t if y is None else y + t
                return carry, y.reshape(R, S)

            _, ys = lax.scan(body, 0, (cols, vals, rowid))
            return ys

        variants = [('f32', fold_f32), ('hilo', fold_hilo),
                    ('high', fold_high)]
        want = None
        for tag, fold in variants:
            jf = jax.jit(lambda xt, c, v, r, _f=fold: spmm(xt, c, v, r, _f))
            t0 = time.time()
            o = jf(xt, cols, vals, rowid)
            float(jnp.sum(o[0, ::257, 0]))
            comp = time.time() - t0
            dt = measure(lambda: jf(xt, cols, vals, rowid),
                         lambda o: o[0, :, 0])
            if want is None:
                want = host_reference(cols, vals, rowid, x_np, P)
            got = np.asarray(o[0], np.float64)
            err = float(np.abs(got - want).max()
                        / (np.abs(want).max() + 1e-30))
            emit(tag=f'P{P}_{tag}', compile_s=round(comp, 1),
                 ns_per_slot=dt / slots * 1e9,
                 ns_per_live=dt / (live) * 1e9, ms=dt * 1e3, rel_err=err)

        # control: plain W-aligned ELL in the same scan (no fold), same
        # TOTAL slot count as the windowed layout for apples-to-apples
        W = L // P if L >= P else 1
        W = max((C * C * NW * L) // (C * C * R), 1)
        cols_e = jnp.asarray(
            rng.integers(0, R, size=(C, C, R, W)).astype(np.int32))
        vals_e = jnp.asarray(
            rng.random(size=(C, C, R, W)).astype(np.float32))

        def spmm_ell(xt, cols, vals):
            def body(carry, slab):
                co, va = slab
                y = None
                for c in range(C):
                    t = jnp.sum(xt[c][co[c]] * va[c][..., None], axis=1)
                    y = t if y is None else y + t
                return carry, y
            _, ys = lax.scan(body, 0, (cols, vals))
            return ys

        je = jax.jit(spmm_ell)
        t0 = time.time()
        o = je(xt, cols_e, vals_e)
        float(jnp.sum(o[0, ::257, 0]))
        comp = time.time() - t0
        dt = measure(lambda: je(xt, cols_e, vals_e), lambda o: o[0, :, 0])
        emit(tag=f'P{P}_ell_control', compile_s=round(comp, 1),
             ns_per_slot=dt / (C * C * R * W) * 1e9, ms=dt * 1e3)

    # ---- Q3: window-aligned scatter-add width scaling -------------------
    y0 = jnp.zeros((N // 128, 128 * S), jnp.float32)
    for m in (1 << 12, 1 << 15):
        widx = jnp.asarray(np.sort(rng.choice(N // 128, m, replace=False))
                           .astype(np.int32))
        ups = jnp.asarray(rng.random(size=(m, 128 * S)).astype(np.float32))
        jsc = jax.jit(lambda y, w, u: y.at[w].add(u, mode='drop',
                                                  unique_indices=True))
        jsc(y0, widx, ups)
        dt = measure(lambda: jsc(y0, widx, ups), lambda o: o[0])
        emit(tag='window_scatter', m=m, ns_per_row=dt / m * 1e9,
             gbps=m * 128 * S * 4 / dt / 1e9, ms=dt * 1e3)
    log('done')


if __name__ == '__main__':
    main()
