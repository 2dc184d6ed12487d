"""Benchmark: K=30 Chebyshev heat filterbank throughput (edges/s/chip).

Primary BASELINE.json metric. Measures the hot path — the shared-SpMM
Chebyshev recurrence — on a Barabási–Albert graph on the available device
(TPU when present), and compares against the reference algorithm's
SciPy-CSR arithmetic on host CPU (the reference publishes no numbers, so
`vs_baseline` is the measured speedup over the reference implementation on
the same graph and task).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Robustness contract (round-4): the run must produce its JSON line under
worst-case driver conditions (cold tunnel, cold XLA cache, external
timeout). Three mechanisms:
  * a wall-clock budget (env PYGSP_BENCH_BUDGET_S, default 1500 s) checked
    between phases — when short on time the run drops to single-shot
    timing and skips the bf16 pass;
  * the best VALIDATED result so far is kept in a module global and a
    SIGTERM/SIGINT handler prints it before exiting, so an external
    `timeout` (which SIGTERMs first) still yields a parsed line — round 3
    died with a fully validated f32 result unprinted;
  * host→device bytes are minimized (signals are generated on-device;
    format arrays are staged explicitly with progress logs) because the
    round-3 failure was a 1576 s first call dominated by staging over a
    degraded tunnel.

Metric continuity: `value`/`pct_roofline` refer to the best validated
mode (bf16 carry when it passes its gate, else exact f32), and the exact
f32 series is ALWAYS present as `value_f32_exact`/`pct_roofline_f32`/
`per_bank_ms_f32`/`rel_err_f32` so round-over-round comparisons never mix
arithmetic. The bf16 acceptance gate is 1.5e-2 (measured budget 4.6e-3
× ~3 margin, BF16_ERRORS_r3.json), not the old 3e-2.
"""

import atexit
import gc
import json
import os
import signal
import sys
import time

import numpy as np

START = time.time()
BUDGET = float(os.environ.get('PYGSP_BENCH_BUDGET_S', '1500'))

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     '.bench_cache')

# Bench configuration (sized for one chip; BA ~8.4M stored edges)
N = 1 << 20
M_ATTACH = 8
K_ORDER = 30
N_SIGNALS = 128
N_FILTERS = 4
SCALES = [5.0, 10.0, 25.0, 50.0]

_result = None     # best validated result so far (printed exactly once)
_printed = False


def log(*args):
    print(f'[{time.time() - START:7.1f}s]', *args, file=sys.stderr,
          flush=True)


def elapsed():
    return time.time() - START


def remaining():
    return BUDGET - elapsed()


def _emit():
    global _printed
    if _printed or _result is None:
        return
    _printed = True
    print(json.dumps(_result), flush=True)


def _on_signal(signum, frame):  # noqa: ARG001
    log(f'signal {signum} received — emitting best validated result '
        f'({"available" if _result is not None else "NONE"})')
    _emit()
    # os._exit: skip interpreter teardown — the axon tunnel teardown can
    # hang, and the line is already flushed.
    os._exit(0 if _result is not None else 1)


signal.signal(signal.SIGTERM, _on_signal)
signal.signal(signal.SIGINT, _on_signal)
atexit.register(_emit)


def get_graph():
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f'bafast_{N}_{M_ATTACH}.npz')
    if os.path.exists(path):
        with np.load(path) as d:
            return d['src'], d['tgt']
    from pygsp_tpu.graphs.barabasialbert import ba_edges_fast
    t0 = time.time()
    src, tgt = ba_edges_fast(N, m0=M_ATTACH, m=M_ATTACH, seed=42)
    log(f'BA graph generated in {time.time() - t0:.1f}s: {len(src)} edges')
    np.savez(path, src=src, tgt=tgt)
    return src, tgt


def main():
    global _result
    log(f'wall-clock budget: {BUDGET:.0f}s '
        f'(env PYGSP_BENCH_BUDGET_S to override)')

    import jax
    import jax.numpy as jnp

    # Persistent XLA compilation cache: the K=30 program at N=1M takes
    # minutes to compile cold; repeat runs (driver re-runs, iteration)
    # should pay seconds. Cache entries are environment/backend-keyed,
    # so a stale cache is a miss, never a wrong program.
    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.path.join(CACHE, 'xla_cache'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception as e:  # cache support missing on some backends
        log(f'compilation cache unavailable: {e}')

    # Tunnel prewarm: a tiny op claims the TPU tunnel and reveals a sick
    # link EARLY (round 3 found out 26 minutes into the first big call).
    t0 = time.time()
    dev = jax.devices()[0]
    float(jnp.sum(jnp.ones((128, 128))))
    log(f'device claim + tiny-op warmup: {time.time() - t0:.1f}s '
        f'({dev})')

    src, tgt = get_graph()
    # symmetric COO (both directions), unit weights
    import scipy.sparse as sps
    W = sps.csr_matrix(
        (np.ones(2 * len(src), dtype=np.float32),
         (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
        shape=(N, N))
    W.data[:] = 1.0
    W.sum_duplicates()
    # Host relabel (same hub dispersal the builder's internal shuffle
    # provides) so the windowed format runs permute-free: the runtime
    # entry/exit gathers cost ~3% per bank at this config
    # (PRESHUFFLE_r4.json: 2375.8 vs 2450.3 ms). A vertex relabel is the
    # same graph; the reference runs on the relabeled matrix too.
    relperm = np.random.default_rng(0x5EED).permutation(N)
    W = W[relperm][:, relperm].tocsr()
    nnz = W.nnz
    log(f'graph: N={N}, nnz={nnz} (host-relabeled)')

    dw = np.ravel(W.sum(axis=1)).astype(np.float32)
    lmax = float(2 * dw.max())  # Gershgorin bound; exactness irrelevant here

    from pygsp_tpu.core import windowed as core_windowed
    from pygsp_tpu.core.operators import LaplacianOp
    from pygsp_tpu.ops import chebyshev as cheby

    t0 = time.time()
    Wneg = W.copy()
    Wneg.data = -Wneg.data
    H = core_windowed.windowed_from_scipy(Wneg, dtype=np.float32,
                                          permute=None)
    log(f'windowed format built in {time.time() - t0:.1f}s; '
        f'L={H.cols.shape[3]} slot_pad={(H.n_slots + sum(l.cols.shape[0] * l.cols.shape[1] for l in H.levels)) / nnz:.2f}')

    # Stage the operator arrays explicitly (with progress visible in the
    # log) instead of letting the first jit call do it silently: staging
    # over a degraded tunnel was the round-3 26-minute black box.
    t0 = time.time()
    n_bytes = sum(a.nbytes for a in jax.tree.leaves(H)) + dw.nbytes
    H = jax.device_put(H, dev)
    diag = jax.device_put(jnp.asarray(dw), dev)
    jax.block_until_ready(jax.tree.leaves(H))
    stage_s = time.time() - t0
    log(f'staged {n_bytes / 1e6:.0f} MB of operator arrays in '
        f'{stage_s:.1f}s ({n_bytes / 1e6 / max(stage_s, 1e-9):.0f} MB/s)')
    L = LaplacianOp(offdiag=H, diag=diag, lap_type='combinatorial')

    def evaluate(lam):
        return jnp.exp(-jnp.asarray(SCALES, jnp.float32)[:, None]
                       * lam[None, :] / lmax)

    c = cheby.cheby_coeff(evaluate, lmax, m=K_ORDER, dtype=jnp.float32)

    # Signals generated ON DEVICE (512 MB that never crosses the tunnel);
    # the 8 validation columns are pulled back for the host reference.
    x = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (N, N_SIGNALS), jnp.float32))()
    t0 = time.time()
    x8 = np.asarray(x[:, :8])
    log(f'pulled validation columns ({x8.nbytes / 1e6:.0f} MB) in '
        f'{time.time() - t0:.1f}s')

    # L passed as a pytree ARGUMENT: closing over it would inline the edge
    # arrays as compile-time constants (compile-time/memory blowup).
    run = jax.jit(lambda L, c, x: cheby.cheby_op(L, lmax, c, x))

    def sync(o):
        # force completion with a device->host read: on this TPU relay,
        # block_until_ready can return early after backend restarts, which
        # would make the timings fictional. A host read cannot lie.
        return float(jnp.sum(o[0, ::4096, 0]))

    # compile_s = pure AOT compile (the COMPILE_r3.json definition);
    # first_call_s = first execution (data already staged) — reported
    # separately so the two are never conflated.
    t0 = time.time()
    compiled = run.lower(L, c, x).compile()
    compile_s = time.time() - t0
    run = compiled
    t0 = time.time()
    out = run(L, c, x)
    sync(out)
    first_call_s = time.time() - t0
    log(f'compile: {compile_s:.1f}s  first call: {first_call_s:.1f}s')

    # One timed single-shot run immediately — enough for a validated
    # result if the budget is nearly gone.
    t0 = time.time()
    out = run(L, c, x)
    sync(out)
    dt = time.time() - t0
    log(f'single-shot: {dt * 1e3:.1f} ms/filterbank')

    # ---- reference implementation (SciPy CSR, reference cheby_op math) ----
    # throughput is per-edge-op, so measure on a column subsample to keep
    # the bench fast; the metric is work-normalized.
    cpu_eps, cpu_out = reference_cpu_eps(W, lmax, np.asarray(c), x8)
    log(f'reference scipy: {cpu_eps:.3e} edge-ops/s')

    # CORRECTNESS GATE: a silently-faulting device can return instantly
    # with garbage; the throughput number is only valid if the outputs
    # match the reference arithmetic.
    dev_slice = np.asarray(out[0, :, :8])
    err = np.abs(dev_slice - cpu_out).max() / (np.abs(cpu_out).max() + 1e-30)
    log(f'device-vs-reference rel err: {err:.2e}')
    if not np.isfinite(err) or err > 1e-2:
        raise RuntimeError(f'device output mismatch (rel err {err}); '
                           'refusing to report throughput')

    # edge-operations per second: each of the K SpMM steps touches every
    # stored edge once per signal column (shared across the Nf filters).
    edge_ops = K_ORDER * nnz * N_SIGNALS

    # %-of-roofline: format-independent minimum HBM traffic for one bank
    # = K steps x (gather x[col] for every stored edge + 8B slot metadata
    # + one output-buffer write), at this chip's measured sequential read
    # bandwidth (~160 GB/s, benchmarks/gather_probe2.py).
    read_bw = 160e9
    min_bytes = K_ORDER * (nnz * (4 * N_SIGNALS + 8) + N * N_SIGNALS * 4)
    roofline_s = min_bytes / read_bw

    def f32_fields(dt):
        return {
            'value': edge_ops / dt,
            'vs_baseline': edge_ops / dt / cpu_eps,
            'pct_roofline': 100.0 * roofline_s / dt,
            'per_bank_ms': dt * 1e3,
            'carry': 'f32',
            'rel_err': float(err),
            # exact-f32 series ALWAYS present under its own names so the
            # cross-round comparison never mixes arithmetic
            'value_f32_exact': edge_ops / dt,
            'pct_roofline_f32': 100.0 * roofline_s / dt,
            'per_bank_ms_f32': dt * 1e3,
            'rel_err_f32': float(err),
            'compile_s': compile_s,
            'first_call_s': first_call_s,
            'stage_mb_s': n_bytes / 1e6 / max(stage_s, 1e-9),
            'budget_s': BUDGET,
        }

    _result = {'metric': 'cheby_K30_heatbank_edge_ops_per_s',
               'unit': 'edge-ops/s/chip', **f32_fields(dt)}
    log(f'validated f32 single-shot result banked '
        f'({_result["pct_roofline"]:.0f}% roofline)')

    # Refine with a proper repeated measurement if time allows: enqueue
    # n_iter calls ASYNC, then ONE device->host sync (per-iteration syncs
    # pay a tunnel round trip each — measured 40x inflation on ms-scale
    # kernels, benchmarks/chunked_diag5.py).
    n_iter, reps = 3, 3
    if remaining() > n_iter * reps * dt + 60:
        times = []
        for _ in range(reps):
            t0 = time.time()
            for _ in range(n_iter - 1):
                run(L, c, x)
            out = run(L, c, x)
            sync(out)
            times.append((time.time() - t0) / n_iter)
        dt = float(np.median(times))
        _result.update(f32_fields(dt))
        log(f'refined: {dt * 1e3:.1f} ms/filterbank -> '
            f'{edge_ops / dt:.3e} edge-ops/s, '
            f'{100.0 * roofline_s / dt:.0f}% of roofline')
    else:
        log(f'budget short ({remaining():.0f}s left) — keeping '
            'single-shot timing')

    # ---- bf16 recurrence carry (the deployed fast mode) ------------------
    # Halves gather bytes + recurrence state; fold accumulation stays f32.
    # Measured error budget: BF16_ERRORS_r3.json / STATUS.md. Validated
    # against the same reference arithmetic before it may become the
    # headline; any failure falls back to the exact-f32 numbers above.
    bf16_cost = 1.5 * compile_s + 5 * dt + 60
    if os.environ.get('PYGSP_BENCH_SKIP_BF16'):
        log('PYGSP_BENCH_SKIP_BF16 set — reporting f32 only')
        _emit()
        return
    if remaining() < bf16_cost:
        log(f'budget short for bf16 pass (need ~{bf16_cost:.0f}s, have '
            f'{remaining():.0f}s) — reporting f32 only')
        _emit()
        return
    try:
        # free the f32 program state first: its 2 GB output + executable
        # alongside the bf16 run's own temps exhaust the 16 GB chip
        del out, run, compiled
        gc.collect()
        # the PUBLIC fast-mode knobs: bf16 carry (half gather/state
        # bytes) + bf16 values (single-pass MXU fold; exact for this
        # graph's unit weights) — the in-program cast is negligible
        run16 = jax.jit(lambda L, c, x: cheby.cheby_op(
            L, lmax, c, x, carry_dtype=jnp.bfloat16,
            vals_dtype=jnp.bfloat16))
        t0 = time.time()
        run16c = run16.lower(L, c, x).compile()
        compile16_s = time.time() - t0
        out16 = run16c(L, c, x)
        sync(out16)
        log(f'bf16 compile: {compile16_s:.1f}s')
        t0 = time.time()
        out16 = run16c(L, c, x)
        sync(out16)
        dt16 = time.time() - t0
        err16 = float(np.abs(np.asarray(out16[0, :, :8]) - cpu_out).max()
                      / (np.abs(cpu_out).max() + 1e-30))
        log(f'bf16 carry single-shot: {dt16 * 1e3:.1f} ms/bank, '
            f'rel err {err16:.2e}')
        # acceptance gate: measured budget (4.6e-3, BF16_CARRY_r3.json)
        # × ~3 margin — NOT the old 3e-2
        if np.isfinite(err16) and err16 < 1.5e-2 and dt16 < dt:
            if remaining() > n_iter * reps * dt16 + 30:
                times16 = []
                for _ in range(reps):
                    t0 = time.time()
                    for _ in range(n_iter - 1):
                        run16c(L, c, x)
                    out16 = run16c(L, c, x)
                    sync(out16)
                    times16.append((time.time() - t0) / n_iter)
                dt16 = float(np.median(times16))
            _result.update({
                'value': edge_ops / dt16,
                'vs_baseline': edge_ops / dt16 / cpu_eps,
                'pct_roofline': 100.0 * roofline_s / dt16,
                'per_bank_ms': dt16 * 1e3,
                'carry': 'bf16',
                'rel_err': err16,
                'compile_s_bf16': compile16_s,
                'roofline_note': 'pct_roofline is the BASELINE f32-byte '
                                 'read roofline for both modes',
            })
            log(f'bf16 headline: {dt16 * 1e3:.1f} ms/bank -> '
                f'{100.0 * roofline_s / dt16:.0f}% of f32 roofline')
        else:
            log('bf16 gate failed — reporting f32')
    except Exception as e:  # noqa: BLE001 — exact path is the fallback
        log(f'bf16 carry mode unavailable ({e}); reporting f32 only')

    _emit()


def reference_cpu_eps(W, lmax, c, x):
    """Reference algorithm arithmetic (``approximations.py:58-114``) with
    SciPy CSR on host — the baseline implementation."""
    import scipy.sparse as sps
    L = sps.diags(np.ravel(W.sum(axis=1))) - W
    L = L.tocsr().astype(np.float32)
    a1 = a2 = lmax / 2
    nf, m1 = c.shape

    t0 = time.time()
    twf_old = x
    twf_cur = (L.dot(x) - a2 * x) / a1
    r = [0.5 * c[i, 0] * twf_old + c[i, 1] * twf_cur for i in range(nf)]
    for k in range(2, m1):
        twf_new = (2.0 / a1) * (L.dot(twf_cur) - a2 * twf_cur) - twf_old
        for i in range(nf):
            r[i] += c[i, k] * twf_new
        twf_old, twf_cur = twf_cur, twf_new
    dt = time.time() - t0
    edge_ops = (m1 - 1) * L.nnz * x.shape[1]
    return edge_ops / dt, r[0]


if __name__ == '__main__':
    main()
