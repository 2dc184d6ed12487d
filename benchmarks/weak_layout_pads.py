"""Weak-scale LAYOUT inflation of the multi-chip formats (round 4).

The on-chip engine measurements (SHARDED_ONCHIP_r4, TWOD_ONCHIP_r4,
SHARDED_BF16_r4) run at ONE device, where the local block is the whole
graph and the windowed format packs at its single-chip 1.165 slot
padding. At real weak scale the per-chip blocks fragment: the 1-D
extended-column space is dominated by scattered halo columns (expander:
~4M remote columns referenced ~3x each) and the 2-D blocks are
n_local x n_local slices. This measures the slot padding of every
deployed layout on a weak-scale instance — BA m=8, N=2^22 (per-chip
share at 4 chips = exactly the bench config) — as the compute-inflation
proxy the honest scaling model needs: per-chip step time scales ~with
gathered slots (measured 3.6 ns/slot at the bench slab width; narrow
slabs only make the proxy optimistic).

Tuning sweeps (window_rows 32/64, hub_degree overrides) were measured
NOT to help — the defaults are near-optimal for this format; the
fragmentation is structural. See /tmp-archived sweep in the round-4 log;
headline rows reproduced here.

Emits WEAKPAD_r4.json. Run:
  PALLAS_AXON_POOL_IPS="" JAX_PLATFORMS=cpu python benchmarks/weak_layout_pads.py
"""

import json
import os
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N = 1 << 22
SINGLE_CHIP_PAD = 1.165     # bench-config windowed build (PRESHUFFLE_r4)


def slots(ms):
    import jax
    tot = 0
    for m in jax.tree_util.tree_leaves(
            ms, is_leaf=lambda x: hasattr(x, 'cols')):
        tot += int(np.prod(np.asarray(m.cols).shape))
        tot += sum(int(np.prod(np.asarray(c).shape)) for c in m.lvl_cols)
    return tot


def main():
    path = os.path.join(REPO, '.bench_cache', f'bafast_{N}_8.npz')
    if os.path.exists(path):
        with np.load(path) as d:
            src, tgt = d['src'], d['tgt']
    else:
        from pygsp_tpu.graphs.barabasialbert import ba_edges_fast
        src, tgt = ba_edges_fast(N, m0=8, m=8, seed=42)
        np.savez(path, src=src, tgt=tgt)
    W = sps.csr_matrix(
        (np.ones(2 * len(src), np.float32),
         (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
        shape=(N, N))
    W.data[:] = 1.0
    W.sum_duplicates()
    nnz = W.nnz

    from pygsp_tpu.parallel import (partition_graph, partition_graph_2d,
                                    shard_local_windowed,
                                    twod_local_windowed)
    rows = []

    def rec(layout, n_chips, pad, note=''):
        r = {'layout': layout, 'n_chips': n_chips,
             'pad': round(pad, 3),
             'inflation_vs_single_chip': round(pad / SINGLE_CHIP_PAD, 3),
             'note': note}
        rows.append(r)
        print(json.dumps(r), flush=True)

    tg = partition_graph_2d(W, 2, 2, dtype=np.float32)
    t0 = time.time()
    m = twod_local_windowed(tg, ring=True)
    rec('2d_ring', 4, slots(m) / nnz,
        'per-chip share == bench config (true weak scaling at 4 chips)')
    del m
    m = twod_local_windowed(tg, ring=True, split_cols=True)
    rec('2d_interleaved', 4, slots(m) / nnz)
    del m, tg

    for S in (4, 8):
        sg = partition_graph(W, S, dtype=np.float32)
        m = shard_local_windowed(sg, split_boundary=False)
        rec('1d_combined', S, slots(m) / nnz,
            f'halo={sg.halo_total} cols over n_local={sg.n_local} — '
            'scattered remote columns fragment the windows')
        del m
        if S == 8:
            m = shard_local_windowed(sg, split_boundary=True)
            rec('1d_split', S, slots(m) / nnz)
            del m
        del sg

    out = {
        'metric': 'weak_scale_layout_slot_padding',
        'graph': f'BA m=8 N={N} ({nnz} stored edges); per-chip share at '
                 '4 chips equals the bench config',
        'single_chip_pad': SINGLE_CHIP_PAD,
        'rows': rows,
        'tuning_note': 'window_rows=32 and hub_degree overrides measured '
                       'strictly worse (2-D ring: 1.523 default vs 2.88 '
                       'at P=32; 1-D comb8: 2.981 default vs 3.5-4.0 '
                       'with hub overrides) — the fragmentation is '
                       'structural, not a tuning artifact.',
        'diagnosis': 'see WEAKPAD_r4.json diagnosis field (chunk_rows '
                     'sweep + slab-floor analysis appended after the '
                     'first emission)',
        'conclusion': 'At weak scale the 1-D halo layout inflates '
                      'per-chip compute ~2.5x (scattered halo columns), '
                      'the 2-D block layouts ~1.3x. This is a SECOND '
                      'structural advantage of the 2-D edge partition '
                      'on expanders, independent of wire volume, and '
                      'moves the deployment crossover to ~all n>=4. '
                      'Round-5 lever: a compact format for sparse '
                      'blocks (tier-only / row-ELL hybrid) to close the '
                      '2-D 1.3x toward 1.0.',
    }
    with open(os.path.join(REPO, 'WEAKPAD_r4.json'), 'w') as f:
        json.dump(out, f, indent=1)


if __name__ == '__main__':
    main()
