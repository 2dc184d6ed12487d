"""Ground-truth re-measurement: which chunked-gather structures are fast?

probe3's late numbers (MXU "17 PFLOPs") prove its timing broke mid-run,
so tuple_param_chunks/scan_chunked_recurrence (2.1-2.7 ns/row) may be
fiction. Every variant here validates ONE output row against NumPy before
its timing is reported (a lying backend fails the check).

  V0: single operand 2^17 x 128, 8 slots (probe2 ell_fused replica; 2.7?)
  V1: tuple of 8 chunks (2^17 rows), ONE 8-slot consumer per chunk
      (probe3 tuple_param_chunks replica)
  V2: tuple of 8 chunks (2^14 rows = 8 MB; 64 MB total), one consumer each
  V3: tuple of 64 chunks (2^14 rows; full 2^20 vertex space), one consumer
      each, same total gather count as V1
  V4: V3 but gathers spread over 64x64 consumers (bench-like interleave,
      W=2... scaled down to keep build light: 16x16 consumers)

Run: nohup python benchmarks/chunked_diag3.py > /tmp/chunked_diag3.out 2>&1 &
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

S = 128
NG = 1 << 23          # total gathers per variant (fixed work)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)
    log(kw)


def main():
    import jax
    import jax.numpy as jnp
    log(f'device: {jax.devices()[0]}')
    rng = np.random.default_rng(0)

    def run_variant(tag, C, R, consumers_per_chunk, wslot=8):
        """C chunks of R rows; gathers split evenly among
        C*consumers_per_chunk ell-style calls of wslot slots each."""
        total_calls = C * consumers_per_chunk
        rout = NG // (total_calls * wslot)
        chunks_np = [rng.normal(size=(R, S)).astype(np.float32)
                     for _ in range(C)]
        chunks = tuple(jnp.asarray(a) for a in chunks_np)
        cols_np = rng.integers(
            0, R, size=(total_calls, rout, wslot)).astype(np.int32)
        vals_np = rng.normal(size=(total_calls, rout, wslot)).astype(np.float32)
        cols = jnp.asarray(cols_np)
        vals = jnp.asarray(vals_np)

        def fn(chunks, cols, vals):
            outs = []
            k = 0
            for c in range(C):
                for _ in range(consumers_per_chunk):
                    t = None
                    for j in range(wslot):
                        u = vals[k, :, j:j + 1] * chunks[c][cols[k, :, j]]
                        t = u if t is None else t + u
                    outs.append(t)
                    k += 1
            return outs

        jf = jax.jit(fn)
        outs = jf(chunks, cols, vals)
        # validation: recompute call 0 row 0 on host
        want = np.zeros(S, np.float32)
        for j in range(wslot):
            want += vals_np[0, 0, j] * chunks_np[0][cols_np[0, 0, j]]
        got = np.asarray(outs[0][0])
        err = float(np.abs(got - want).max() / (np.abs(want).max() + 1e-30))
        if err > 1e-4:
            emit(tag=tag, error='VALIDATION FAILED', rel_err=err)
            return
        t0 = time.time()
        n = 3
        for _ in range(n):
            outs = jf(chunks, cols, vals)
            float(jnp.sum(outs[-1][::257]))
        dt = (time.time() - t0) / n
        emit(tag=tag, C=C, R=R, calls=total_calls,
             ns_per_slot=dt / NG * 1e9, rel_err=err,
             gbps=NG * S * 4 / dt / 1e9)

    run_variant('V0_single_2e17', C=1, R=1 << 17, consumers_per_chunk=1)
    run_variant('V1_tuple8_2e17', C=8, R=1 << 17, consumers_per_chunk=1)
    run_variant('V2_tuple8_2e14', C=8, R=1 << 14, consumers_per_chunk=1)
    run_variant('V3_tuple64_2e14', C=64, R=1 << 14, consumers_per_chunk=1)
    run_variant('V4_16x16_2e16', C=16, R=1 << 16, consumers_per_chunk=16,
                wslot=2)
    log('done')


if __name__ == '__main__':
    main()
