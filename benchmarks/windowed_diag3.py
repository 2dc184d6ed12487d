"""Fold-output traffic fix: one einsum per OUT CHUNK instead of one per
(out, src) pair.

diag2 showed SpMM time is ~90-100 ms regardless of slot count: the
per-pair einsum writes a (NW, 2P, S) = 64 MB output 16x per out chunk
(~17 GB+reads per SpMM) — accumulation traffic, not gathers, is the
floor. Restructure: slabs (NW, n_src, L); per-src gathers stacked along
axis 1 and reshaped to (NW, n_src*L, S); ONE one-hot contraction per
out chunk writes the output once (1 GB total). Question: do the 16
gathers fuse through stack+reshape into the dot rhs, or does the
600 MB p materialize (write+read ~19 GB — no worse than now)?

  V1 per-pair loop (current windowed_spmm_chunks structure, control)
  V2 stacked single-dot per out chunk
  V4 window-group tiling (scan over groups of 128 windows, per-pair
     dots on VMEM-sized accumulators)

Run: nohup python benchmarks/windowed_diag3.py > /tmp/windowed_diag3.out 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
from jax import lax

N = 1 << 20
R = 1 << 16
C = N // R
S = 128
P = 64
L = 72
NW = R // P


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def measure(call, out_pick, n=6, reps=3):
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


def overlap_add(t):
    a = t[:, :P, :].reshape(R, S)
    b = t[:, P:, :].reshape(R, S)
    return a.at[P:].add(b[:-P])


def main():
    log(f'device: {jax.devices()[0]}')
    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(N, S)).astype(np.float32)
    xt = tuple(jnp.asarray(x_np[c * R:(c + 1) * R]) for c in range(C))
    slots = C * C * NW * L
    iota = jnp.arange(2 * P, dtype=jnp.int32)
    hp = lax.Precision.HIGHEST

    # V1 layout: (C_out, C_src, NW, L); V2 layout: (C_out, NW, C_src, L)
    cols1 = rng.integers(0, R, size=(C, C, NW, L)).astype(np.int32)
    vals1 = rng.random(size=(C, C, NW, L)).astype(np.float32)
    rid1 = np.sort(rng.integers(0, 2 * P, size=(C, C, NW, L)),
                   axis=-1).astype(np.uint8)
    j1 = (jnp.asarray(cols1), jnp.asarray(vals1), jnp.asarray(rid1))
    j2 = tuple(jnp.asarray(np.ascontiguousarray(a.transpose(0, 2, 1, 3)))
               for a in (cols1, vals1, rid1))

    def spmm_v1(xs, cols, vals, rid):
        def body(carry, slab):
            co, va, ri = slab
            t = None
            for c in range(C):
                p = va[c][..., None] * xs[c][co[c]]
                oh = (ri[c].astype(jnp.int32)[..., None] == iota
                      ).astype(jnp.float32)
                u = jnp.einsum('wlp,wls->wps', oh, p, precision=hp,
                               preferred_element_type=jnp.float32)
                t = u if t is None else t + u
            return carry, overlap_add(t)
        _, ys = lax.scan(body, 0, (cols, vals, rid))
        return ys

    def spmm_v2(xs, cols, vals, rid):
        def body(carry, slab):
            co, va, ri = slab          # (NW, C, L)
            ps = [va[:, c][..., None] * xs[c][co[:, c]] for c in range(C)]
            p = jnp.stack(ps, axis=1).reshape(NW, C * L, S)
            oh = (ri.reshape(NW, C * L).astype(jnp.int32)[..., None]
                  == iota).astype(jnp.float32)
            t = jnp.einsum('wlp,wls->wps', oh, p, precision=hp,
                           preferred_element_type=jnp.float32)
            return carry, overlap_add(t)
        _, ys = lax.scan(body, 0, (cols, vals, rid))
        return ys

    WG = 128  # windows per inner tile for V4

    def spmm_v4(xs, cols, vals, rid):
        def body(carry, slab):
            co, va, ri = slab          # (C, NW, L)

            def tile(carry2, sl2):
                co2, va2, ri2 = sl2    # (C, WG, L)
                t = None
                for c in range(C):
                    p = va2[c][..., None] * xs[c][co2[c]]
                    oh = (ri2[c].astype(jnp.int32)[..., None] == iota
                          ).astype(jnp.float32)
                    u = jnp.einsum('wlp,wls->wps', oh, p, precision=hp,
                                   preferred_element_type=jnp.float32)
                    t = u if t is None else t + u
                return carry2, t

            xs2 = (co.reshape(C, NW // WG, WG, L).transpose(1, 0, 2, 3),
                   va.reshape(C, NW // WG, WG, L).transpose(1, 0, 2, 3),
                   ri.reshape(C, NW // WG, WG, L).transpose(1, 0, 2, 3))
            _, ts = lax.scan(tile, 0, xs2)
            return carry, overlap_add(ts.reshape(NW, 2 * P, S))
        _, ys = lax.scan(body, 0, (cols, vals, rid))
        return ys

    # xt must be a jit ARGUMENT: closed-over chunks get baked as
    # constants into the remote-compile payload (HTTP 413 at 512 MB).
    for tag, fn, args in (('V1_per_pair', spmm_v1, j1),
                          ('V2_stacked_dot', spmm_v2, j2),
                          ('V4_window_tiles', spmm_v4, j1)):
        jf = jax.jit(lambda xs, c, v, r, _f=fn: _f(xs, c, v, r))
        t0 = time.time()
        o = jf(xt, *args)
        float(jnp.sum(o[0][::257, 0]))
        comp = time.time() - t0
        dt = measure(lambda: jf(xt, *args), lambda o: o[0][:, 0])
        emit(tag=tag, compile_s=round(comp, 1),
             ns_per_slot=dt / slots * 1e9, ms=dt * 1e3)

    # V2 correctness vs V1 on the same logical slots
    o1 = jax.jit(spmm_v1)(xt, *j1)
    o2 = jax.jit(spmm_v2)(xt, *j2)
    err = float(jnp.max(jnp.abs(o1 - o2)) / (jnp.max(jnp.abs(o1)) + 1e-30))
    emit(tag='v2_vs_v1', rel_err=err)
    log('done')


if __name__ == '__main__':
    main()
