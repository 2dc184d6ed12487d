"""Can a compact (pad-free) slot stream + MXU one-hot segment-sum beat
padded ELL?

The chunked-ELL fill ceiling is structural: per-(row, src-chunk) edge
counts on the bench BA graph are ~Poisson(<=1), so aligned slots are
~half empty (pad 2.1-2.2 measured, degree sort included). A compact
layout stores each (output-tile, chunk) run exactly (pad ~= tile-level
only) and reduces with y_tile = onehot(rowid)^T @ P on the MXU
(~0.6 TFLOP for the whole graph — noise IF XLA fuses the slot gather
and the iota-built onehot into the dot WITHOUT materializing the
(slots, 128)-sized operands (2x9.5 GB of traffic if it does not).

Variants, synthetic edges at bench scale (m=16.8M slots, one chunk
measured, extrapolation is linear in chunks):
  A  control: ELL gather+rowsum, same slot count (known ~2.7-4 ns/slot)
  B  compact gather + einsum with f32 onehot from iota
  C  compact gather + dot_general, bf16 onehot (exact 0/1), f32 accum
  D  B with P pre-multiplied by vals (checks mul fusion too)

ns/slot <= ~4.5 => fusion works, the format wins; >= ~10 => operands
materialize, stay with padded ELL.

Run: nohup python benchmarks/mxu_segsum_probe.py > /tmp/mxu_segsum.out 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp

S = 128
R = 1 << 16          # chunk rows (gather operand)
TILE = 128           # output rows per segment tile
L = 256              # slots per (tile, chunk) after tiering
T = 512              # tiles per out chunk (T*TILE = 65536 output rows)
# total slots = T * L = 131072 ... scale up: measure over TB tiles
TB = 128             # batches to reach bench-scale slot counts


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
    x = jnp.asarray(rng.normal(size=(R, S)).astype(np.float32))

    nt = T * TB // 4   # keep arrays ~0.5 GB-scale: nt tiles of (L, S)
    slots = nt * L
    cols = jnp.asarray(rng.integers(0, R, size=(nt, L)).astype(np.int32))
    vals = jnp.asarray(rng.random(size=(nt, L)).astype(np.float32))
    # sorted rowids within each tile (runs), like a real CSR tile
    rowid = np.sort(rng.integers(0, TILE, size=(nt, L)), axis=1)
    rowid = jnp.asarray(rowid.astype(np.int32))

    # ---- A control: ELL rowsum on the same slot count -------------------
    cols_ell = cols.reshape(nt * L // 4, 4)
    vals_ell = vals.reshape(nt * L // 4, 4)

    def ell(cols_e, vals_e, x):
        return jnp.sum(x[cols_e] * vals_e[..., None], axis=1)

    jell = jax.jit(ell)
    dt = measure(lambda: jell(cols_ell, vals_ell, x), lambda o: o[:, 0])
    emit(tag='A_ell_control', ns_per_slot=dt / slots * 1e9, ms=dt * 1e3)

    # ---- B compact + einsum f32 onehot -----------------------------------
    def segsum_f32(cols, vals, rowid, x):
        p = x[cols] * vals[..., None]                       # (nt, L, S)
        oh = (rowid[:, :, None]
              == jnp.arange(TILE, dtype=jnp.int32)[None, None, :])
        return jnp.einsum('tlr,tls->trs', oh.astype(jnp.float32), p,
                          preferred_element_type=jnp.float32)

    jb = jax.jit(segsum_f32)
    t0 = time.time()
    o = jb(cols, vals, rowid, x)
    float(jnp.sum(o[:, 0, 0][::257]))
    compile_s = time.time() - t0
    dt = measure(lambda: jb(cols, vals, rowid, x), lambda o: o[:, 0, 0])
    emit(tag='B_einsum_f32', compile_s=round(compile_s, 1),
         ns_per_slot=dt / slots * 1e9, ms=dt * 1e3)

    # ---- C dot_general, bf16 onehot --------------------------------------
    def segsum_bf16(cols, vals, rowid, x):
        p = x[cols] * vals[..., None]
        oh = (rowid[:, :, None]
              == jnp.arange(TILE, dtype=jnp.int32)[None, None, :])
        return jax.lax.dot_general(
            oh.astype(jnp.bfloat16), p.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    jc = jax.jit(segsum_bf16)
    o = jc(cols, vals, rowid, x)
    float(jnp.sum(o[:, 0, 0][::257]))
    dt = measure(lambda: jc(cols, vals, rowid, x), lambda o: o[:, 0, 0])
    emit(tag='C_dot_bf16oh', ns_per_slot=dt / slots * 1e9, ms=dt * 1e3)

    # ---- D correctness spot-check of B vs segment-sum -------------------
    got = np.asarray(jb(cols, vals, rowid, x))[0]
    want = np.zeros((TILE, S), np.float32)
    pc = np.asarray(x)[np.asarray(cols[0])] * np.asarray(vals[0])[:, None]
    np.add.at(want, np.asarray(rowid[0]), pc)
    err = float(np.abs(got - want).max() / (np.abs(want).max() + 1e-30))
    emit(tag='D_check', rel_err=err)
    log('done')


if __name__ == '__main__':
    main()
