"""Last 15 ms: overlap-add traffic in the V2 stacked-dot windowed SpMM.

diag4: V2 (one stacked dot per out chunk) is the winner at 81 ms vs a
~66 ms gather floor. Suspect: ``a.at[P:].add(b[:-P])`` lowers to a
copy+scatter region (t materialized 64 MB, read back, y written 32 MB
-> ~2.5 GB/SpMM extra). Variants:

  V2_base    control (diag4 V2)
  V2_noadd   no overlap-add at all (returns t) — the floor incl. dot
  V2_pad     overlap-add as pad+slice+add (pure elementwise, fusable)
  V2_roll    overlap-add on the flat (R, S) view via concatenate
  V2_S256    control at S=256 — per-row gather is ~flat to 256 floats,
             so edge-ops/s should nearly double (bench upgrade probe)

Run: nohup python benchmarks/windowed_diag5.py > /tmp/windowed_diag5.out 2>&1 &
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


def main():
    log(f'device: {jax.devices()[0]}')
    rng = np.random.default_rng(0)
    slots = C * C * NW * L
    iota = jnp.arange(2 * P, dtype=jnp.int32)
    hp = lax.Precision.HIGHEST

    cols1 = rng.integers(0, R, size=(C, C, NW, L)).astype(np.int32)
    vals1 = rng.random(size=(C, C, NW, L)).astype(np.float32)
    rid1 = np.sort(rng.integers(0, 2 * P, size=(C, C, NW, L)),
                   axis=-1).astype(np.uint8)
    j2 = tuple(jnp.asarray(np.ascontiguousarray(a.transpose(0, 2, 1, 3)))
               for a in (cols1, vals1, rid1))

    def make_v2(S, mode):
        def spmm(xs, cols, vals, rid):
            def body(carry, slab):
                co, va, ri = slab          # (NW, C, L)
                ps = [va[:, c][..., None] * xs[c][co[:, c]]
                      for c in range(C)]
                p = jnp.stack(ps, axis=1).reshape(NW, C * L, S)
                oh = (ri.reshape(NW, C * L).astype(jnp.int32)[..., None]
                      == iota).astype(jnp.float32)
                t = jnp.einsum('wlp,wls->wps', oh, p, precision=hp,
                               preferred_element_type=jnp.float32)
                if mode == 'noadd':
                    return carry, t
                a = t[:, :P, :].reshape(R, S)
                b = t[:, P:, :].reshape(R, S)
                if mode == 'at':
                    y = a.at[P:].add(b[:-P])
                elif mode == 'pad':
                    y = a + jnp.pad(b[:-P], ((P, 0), (0, 0)))
                elif mode == 'roll':
                    y = a + jnp.concatenate(
                        [jnp.zeros((P, S), jnp.float32), b[:-P]])
                return carry, y
            _, ys = lax.scan(body, 0, (cols, vals, rid))
            return ys
        return spmm

    def run(tag, S, mode, ref=None):
        x_np = rng.normal(size=(N, S)).astype(np.float32)
        xt = tuple(jnp.asarray(x_np[c * R:(c + 1) * R]) for c in range(C))
        fn = make_v2(S, mode)
        jf = jax.jit(lambda xs, c, v, r, _f=fn: _f(xs, c, v, r))
        t0 = time.time()
        o = jf(xt, *j2)
        float(jnp.sum(o[0].reshape(-1)[::257]))
        comp = time.time() - t0
        dt = measure(lambda: jf(xt, *j2), lambda o: o[0].reshape(-1))
        err = (float(jnp.max(jnp.abs(ref - o))
                     / (jnp.max(jnp.abs(ref)) + 1e-30))
               if ref is not None and ref.shape == o.shape else -1.0)
        emit(tag=tag, S=S, compile_s=round(comp, 1),
             ns_per_slot=dt / slots * 1e9, ms=dt * 1e3, rel_err=err)
        return o

    rng = np.random.default_rng(0)   # same x for the S=128 variants
    ref = run('V2_base', 128, 'at')
    rng = np.random.default_rng(0)
    run('V2_noadd', 128, 'noadd')
    rng = np.random.default_rng(0)
    run('V2_pad', 128, 'pad', ref)
    rng = np.random.default_rng(0)
    run('V2_roll', 128, 'roll', ref)
    run('V2_S256', 256, 'pad')
    log('done')


if __name__ == '__main__':
    main()
