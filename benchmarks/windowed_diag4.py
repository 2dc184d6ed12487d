"""Close the 81 ms (V2) -> ~66 ms (gather floor) gap in the windowed
SpMM fold.

diag3: per-pair einsum (V1) 95 ms; one stacked dot per out chunk (V2)
81 ms ~= copy-BW bound on the materialized p = vals*x[cols] operand
(604 MB/out-chunk write+read). Variants here:

  G2/G4/G8   stack G src chunks per dot, accumulate C/G partials —
             trades p-materialization traffic against fold-output
             accumulation traffic.
  V3         vals folded into the one-hot LHS, dot RHS is a PURE
             gather x[cols] — tests whether a bare gather fuses into
             the dot operand where (vals * gather) does not.
  V3swap     same, operand order swapped in the einsum.
  V2half     V2 with the S axis split in two sequential dots —
             halves the live p buffer (VMEM pressure probe).

Run: nohup python benchmarks/windowed_diag4.py > /tmp/windowed_diag4.out 2>&1 &
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

    # layout (C_out, NW, C_src, L) as in diag3's V2
    cols1 = rng.integers(0, R, size=(C, C, NW, L)).astype(np.int32)
    vals1 = rng.random(size=(C, C, NW, L)).astype(np.float32)
    rid1 = np.sort(rng.integers(0, 2 * P, size=(C, C, NW, L)),
                   axis=-1).astype(np.uint8)
    j2 = tuple(jnp.asarray(np.ascontiguousarray(a.transpose(0, 2, 1, 3)))
               for a in (cols1, vals1, rid1))

    def make_grouped(G):
        def spmm(xs, cols, vals, rid):
            def body(carry, slab):
                co, va, ri = slab          # (NW, C, L)
                t = None
                for g in range(0, C, G):
                    ps = [va[:, c][..., None] * xs[c][co[:, c]]
                          for c in range(g, g + G)]
                    p = (jnp.stack(ps, axis=1).reshape(NW, G * L, S)
                         if G > 1 else ps[0])
                    rg = ri[:, g:g + G].reshape(NW, G * L)
                    oh = (rg.astype(jnp.int32)[..., None]
                          == iota).astype(jnp.float32)
                    u = jnp.einsum('wlp,wls->wps', oh, p, precision=hp,
                                   preferred_element_type=jnp.float32)
                    t = u if t is None else t + u
                return carry, overlap_add(t)
            _, ys = lax.scan(body, 0, (cols, vals, rid))
            return ys
        return spmm

    def spmm_v3(xs, cols, vals, rid):
        def body(carry, slab):
            co, va, ri = slab              # (NW, C, L)
            xg = jnp.concatenate(
                [xs[c][co[:, c]] for c in range(C)], axis=1)   # (NW, CL, S)
            ohv = ((ri.reshape(NW, C * L).astype(jnp.int32)[..., None]
                    == iota).astype(jnp.float32)
                   * va.reshape(NW, C * L)[..., None])
            t = jnp.einsum('wlp,wls->wps', ohv, xg, precision=hp,
                           preferred_element_type=jnp.float32)
            return carry, overlap_add(t)
        _, ys = lax.scan(body, 0, (cols, vals, rid))
        return ys

    def spmm_v3swap(xs, cols, vals, rid):
        def body(carry, slab):
            co, va, ri = slab
            xg = jnp.concatenate(
                [xs[c][co[:, c]] for c in range(C)], axis=1)
            ohv = ((ri.reshape(NW, C * L).astype(jnp.int32)[..., None]
                    == iota).astype(jnp.float32)
                   * va.reshape(NW, C * L)[..., None])
            t = jnp.einsum('wls,wlp->wps', xg, ohv, precision=hp,
                           preferred_element_type=jnp.float32)
            return carry, overlap_add(t)
        _, ys = lax.scan(body, 0, (cols, vals, rid))
        return ys

    def spmm_v2half(xs, cols, vals, rid):
        def body(carry, slab):
            co, va, ri = slab
            rg = ri.reshape(NW, C * L)
            oh = (rg.astype(jnp.int32)[..., None] == iota
                  ).astype(jnp.float32)
            halves = []
            for s0 in (0, S // 2):
                ps = [va[:, c][..., None]
                      * xs[c][:, s0:s0 + S // 2][co[:, c]]
                      for c in range(C)]
                p = jnp.stack(ps, axis=1).reshape(NW, C * L, S // 2)
                halves.append(jnp.einsum('wlp,wls->wps', oh, p,
                                         precision=hp,
                                         preferred_element_type=jnp.float32))
            return carry, overlap_add(jnp.concatenate(halves, axis=-1))
        _, ys = lax.scan(body, 0, (cols, vals, rid))
        return ys

    variants = [('G2', make_grouped(2)), ('G4', make_grouped(4)),
                ('G8', make_grouped(8)), ('V3_pure_gather', spmm_v3),
                ('V3_swap', spmm_v3swap), ('V2_half_S', spmm_v2half)]
    ref = None
    for tag, fn in variants:
        jf = jax.jit(lambda xs, c, v, r, _f=fn: _f(xs, c, v, r))
        t0 = time.time()
        o = jf(xt, *j2)
        float(jnp.sum(o[0][::257, 0]))
        comp = time.time() - t0
        dt = measure(lambda: jf(xt, *j2), lambda o: o[0][:, 0])
        if ref is None:
            ref = o
            err = 0.0
        else:
            err = float(jnp.max(jnp.abs(ref - o))
                        / (jnp.max(jnp.abs(ref)) + 1e-30))
        emit(tag=tag, compile_s=round(comp, 1),
             ns_per_slot=dt / slots * 1e9, ms=dt * 1e3, rel_err=err)
    log('done')


if __name__ == '__main__':
    main()
