"""Cold vs warm first-call of the MULTI-CHIP engines (round 5).

VERDICT r4 #6: the deployed engines' first calls are heavy —
387 s (sharded g14, SHARDED_ONCHIP_r4) / 197 s (ring 2-D,
SHARDED_BF16_r4) — and the COMPILE_r3 persistent-cache treatment had
only been applied to the single-chip program. This measures both
shard_map engines' first call at the bench config, 1-device mesh, with
a dedicated persistent XLA cache: a 'cold' run (cache wiped) and a
'warm' run (fresh process, cache populated). A deployed job's first
step should drop from minutes to seconds-to-a-minute.

Run ON the TPU (two processes, sequentially):
  python benchmarks/compile_multichip_r5.py cold
  python benchmarks/compile_multichip_r5.py warm     # also writes COMPILE_r5.json
"""

import json
import os
import shutil
import sys
import time

import numpy as np
import scipy.sparse as sps

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = 1 << 20
K = 30
S = 128
SCALES = [5.0, 10.0, 25.0, 50.0]
CACHE_DIR = os.path.join(REPO, '.bench_cache', 'xla_cache_mc')
ROWS = os.path.join(REPO, 'COMPILE_r5_rows.jsonl')


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    phase = sys.argv[1]
    engines = sys.argv[2] if len(sys.argv) > 2 else 'both'
    # engines run in SEPARATE processes: the first engine's HBM is not
    # reliably reclaimed in-process (measured ResourceExhausted on the
    # second build)
    if phase == 'cold' and engines in ('both', 'sharded') \
            and os.path.isdir(CACHE_DIR):
        shutil.rmtree(CACHE_DIR)

    import jax
    import jax.numpy as jnp
    import bench as benchmod
    from pygsp_tpu.ops import chebyshev as cheby
    from pygsp_tpu.parallel import (cheby_op_2d, make_mesh, make_mesh_2d,
                                    partition_graph, partition_graph_2d,
                                    shard_local_windowed,
                                    sharded_cheby_op, twod_local_windowed)

    jax.config.update('jax_compilation_cache_dir', CACHE_DIR)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)

    t0 = time.time()
    float(jnp.sum(jnp.ones((128, 128))))
    log(f'device: {jax.devices()[0]} (warm {time.time() - t0:.1f}s)')

    src, tgt = benchmod.get_graph()
    W = sps.csr_matrix(
        (np.ones(2 * len(src), dtype=np.float32),
         (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
        shape=(N, N))
    W.data[:] = 1.0
    W.sum_duplicates()
    dw = np.ravel(W.sum(axis=1)).astype(np.float32)
    lmax = float(2 * dw.max())

    def evaluate(lam):
        return jnp.exp(-jnp.asarray(SCALES, jnp.float32)[:, None]
                       * lam[None, :] / lmax)

    c = cheby.cheby_coeff(evaluate, lmax, m=K, dtype=jnp.float32)
    x_host = np.random.default_rng(0).normal(size=(N, S)).astype(np.float32)

    def rec(**kw):
        kw['phase'] = phase
        with open(ROWS, 'a') as f:
            f.write(json.dumps(kw) + '\n')
        print(json.dumps(kw), flush=True)

    os.environ['PYGSP_SHARDED_ACC_GROUP'] = '14'
    if engines in ('both', 'sharded'):
        # --- sharded engine (combined windowed layout, g=14, bf16) ---
        t0 = time.time()
        sg = partition_graph(W, 1, reorder='none', dtype=np.float32)
        ell = shard_local_windowed(sg, split_boundary=False
                                   ).astype(jnp.bfloat16)
        mesh = make_mesh(1, 1)
        build_s = time.time() - t0
        xpad = sg.pad_signal(x_host)
        t0 = time.time()
        out = sharded_cheby_op(sg, lmax, c, xpad, mesh, ell=ell,
                               carry_dtype=jnp.bfloat16)
        s0 = float(jnp.sum(jnp.ravel(out[0])[::65537]))
        rec(engine='sharded_g14_bf16', build_s=round(build_s, 1),
            first_call_s=round(time.time() - t0, 1), check=round(s0, 4))
        del out, sg, ell, xpad

    if engines in ('both', 'ring2d'):
        # --- ring 2-D engine at 1x1 (bf16 values + carry) ------------
        t0 = time.time()
        tg = partition_graph_2d(W, 1, 1, dtype=np.float32)
        ell2 = tuple(m.astype(jnp.bfloat16)
                     for m in twod_local_windowed(tg, ring=True))
        mesh2 = make_mesh_2d(1, 1)
        build_s = time.time() - t0
        xp = tg.pad_signal(x_host)
        t0 = time.time()
        out2 = cheby_op_2d(tg, lmax, c, xp, mesh2, ell=ell2,
                           carry_dtype=jnp.bfloat16)
        s1 = float(jnp.sum(jnp.ravel(out2[0])[::65537]))
        rec(engine='ring2d_1x1_bf16', build_s=round(build_s, 1),
            first_call_s=round(time.time() - t0, 1), check=round(s1, 4))

    if phase == 'warm' and engines in ('both', 'finalize', 'ring2d'):
        rows = [json.loads(l) for l in open(ROWS)]
        latest = {}
        for r in rows:
            latest[(r['engine'], r['phase'])] = r
        out = {
            'metric': 'multichip_engine_first_call_cold_vs_warm',
            'config': 'bench graph (N=2^20, 16.7M edges), K=30, Nf=4, '
                      'S=128, 1-device mesh, bf16 fast mode',
            'cache': 'dedicated persistent XLA compilation cache '
                     '(jax_compilation_cache_dir), COMPILE_r3 treatment '
                     'extended to the shard_map engines',
            'rows': sorted(latest.values(),
                           key=lambda r: (r['engine'], r['phase'])),
            'r4_reference': {'sharded_g14_first_call_s': 387,
                             'ring2d_first_call_s': 197.5},
        }
        with open(os.path.join(REPO, 'COMPILE_r5.json'), 'w') as f:
            json.dump(out, f, indent=1)
        log('COMPILE_r5.json written')


if __name__ == '__main__':
    main()
