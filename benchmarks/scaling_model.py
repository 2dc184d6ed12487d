"""Analytic weak-scaling model (VERDICT r2 #4) — the honest substitute
for unavailable multi-chip hardware.

Virtual CPU devices share one host's memory bandwidth, so a virtual-mesh
"weak scaling" number only measures that sharing (SCALING_r2's 0.12 at 8
devices bounds nothing). This model instead combines MEASURED inputs:

  t_step     measured single-chip Chebyshev step time (BENCH_r02.json:
             per_bank_ms / K at the bench config — N=2^20 BA, m=8,
             nnz=16.7M stored, S=128 signals, the per-chip shard of a
             weak-scaled run),
  h(n)       per-chip halo rows per step: the random/contiguous-partition
             expectation  (n-1)·N_local·E_v[1 − (1 − 1/n)^deg_v]  over
             the bench graph's actual degree histogram, calibrated by
             α = measured_halo(8) / formula(8) against the real
             partitioner output (PARTITION_r3.json),
  t_comm(n)  h(n) · S · bytes · hops(n) / W_link, where hops(n) is the
             mean ICI hop count of the distance-bucketed ppermutes
             (uniform distances on an expander: mean min(d, n−d); 1D
             ring and 2D-torus variants) and W_link is the per-link ICI
             bandwidth ASSUMPTION (default 9e10 B/s/direction, v5p-class;
             sensitivity at 0.5x/2x),
  overlap    hideable comm = 0.45 · t_step, the measured interior/
             boundary split gain (OVERLAP_r2.json: split path = 0.55x
             the combined step with identical results).

  efficiency(n) = t_step / (t_step + max(0, t_comm(n) − 0.45·t_step))

Emits SCALING_r3.json with the model, all inputs and their sources, and
predicted efficiencies at n = 2/4/8/16 for the BA bench config (f32 and
bf16 halo payload — sharded_cheby_op's carry_dtype halves the wire
bytes) plus the SBM-1M block-local case.

Run: PALLAS_AXON_POOL_IPS="" JAX_PLATFORMS=cpu python
     benchmarks/scaling_model.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

S_SIGNALS = 128
K = 30
W_LINK = 9e10          # bytes/s per ICI link per direction (assumption)
OVERLAP = 0.45         # measured hideable fraction (OVERLAP_r2.json)


def mean_ring_hops(n):
    d = np.arange(1, n)
    return float(np.minimum(d, n - d).mean())


def mean_torus2d_hops(n):
    side = int(round(np.sqrt(n)))
    if side * side != n:
        return None
    xs, ys = np.meshgrid(np.arange(side), np.arange(side))
    d = (np.minimum(xs, side - xs) + np.minimum(ys, side - ys)).ravel()
    return float(d[1:].mean())


def main():
    with open(os.path.join(REPO, 'BENCH_r02.json')) as f:
        bench = json.load(f)['parsed']
    with open(os.path.join(REPO, 'PARTITION_r3.json')) as f:
        part = json.load(f)

    t_step = bench['per_bank_ms'] / 1e3 / K        # s per Chebyshev step

    # bench graph degree histogram (the per-chip shard of a weak run)
    path = os.path.join(REPO, '.bench_cache', 'bafast_1048576_8.npz')
    import scipy.sparse as sps
    with np.load(path) as d:
        src, tgt = d['src'], d['tgt']
    N_local = 1 << 20
    W = sps.csr_matrix(
        (np.ones(2 * len(src), np.float32),
         (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
        shape=(N_local, N_local))
    W.sum_duplicates()
    deg = np.diff(W.indptr).astype(np.float64)

    def pairs_total(n):
        """Random-partition expectation of total unique (shard, col)
        pairs on an n-shard split of the MEASURED graph (N_local
        vertices): each of its columns v is referenced by each of the
        n−1 non-owner shards w.p. 1 − (1 − 1/n)^deg_v.

        The same expression IS the weak-scaling per-chip halo at n
        chips: there each chip owns N_local vertices of an n·N_local
        graph and references each of the (n−1)·N_local remote columns
        with the same probability — so h_weak_per_chip(n) =
        pairs_total(n) (per-chip halo at weak scale equals the measured
        graph's TOTAL at the same n)."""
        return float((n - 1) * np.mean(1.0 - (1.0 - 1.0 / n) ** deg)
                     * N_local)

    # calibrate at n=8 against the real partitioner (contiguous nnz row)
    ba_rows = [r for r in part if r.get('graph') == 'ba_1048576'
               and r.get('reorder') == 'none' and r.get('balance') == 'nnz']
    measured8 = ba_rows[0]['halo_total']
    alpha = measured8 / pairs_total(8)
    cluster_rows = [r for r in part if r.get('graph') == 'ba_1048576'
                    and r.get('reorder') == 'cluster']
    cluster_factor = (cluster_rows[0]['halo_total'] / measured8
                      if cluster_rows else 1.0)

    def h_per_chip(n):
        # weak scaling: every chip owns N_local vertices of an n·N_local
        # graph; same degree distribution (BA m is fixed)
        return alpha * cluster_factor * (n - 1) * N_local * float(
            np.mean(1.0 - (1.0 - 1.0 / n) ** deg))

    def efficiency(n, bytes_per_val, hops, w_link=W_LINK):
        t_comm = h_per_chip(n) * S_SIGNALS * bytes_per_val * hops / w_link
        return t_step / (t_step + max(0.0, t_comm - OVERLAP * t_step)), \
            t_comm

    def mesh_2d(n):
        """Near-square (pr, pc) factorization for the 2-D edge partition."""
        pr = 1 << int(np.ceil(np.log2(n) / 2))
        return pr, n // pr

    def efficiency_2d(n, bytes_per_val, w_link=W_LINK):
        """2-D edge partition (parallel/twod.py): per-chip traffic per
        step is (pr-1 + pc-1) * N_local rows — GRAPH-INDEPENDENT — via
        ring all_gather('row') + psum_scatter('col'), both bandwidth-
        optimal (each chip pushes its whole payload through one link:
        no hop amplification). Conservatively NO overlap credit: the
        gather sits on the critical path of the current implementation
        (only the diagonal term is independent of it)."""
        pr, pc = mesh_2d(n)
        rows = (pr - 1 + pc - 1) * N_local
        t_comm = rows * S_SIGNALS * bytes_per_val / w_link
        return t_step / (t_step + t_comm), t_comm, rows

    ns = [2, 4, 8, 16, 64]
    out = {
        'metric': 'predicted_weak_scaling_efficiency',
        'model': 'eff(n) = t_step / (t_step + max(0, t_comm(n) - '
                 f'{OVERLAP}*t_step)); t_comm = h(n)*S*bytes*hops/W_link',
        'inputs': {
            't_step_s': t_step,
            't_step_source': 'BENCH_r02.json per_bank_ms/K (measured, '
                             'TPU v5e single chip, 70.7% of read roofline)',
            't_step_note': 'plain single-chip step time; the sharded '
                           'layout itself runs 1.42x slower per chip '
                           '(SHARDED_ONCHIP_r3.json after the shuffle '
                           'fix) — a slower per-chip step hides MORE '
                           'comm, so plain t_step is the conservative '
                           'choice for these efficiency predictions',
            'halo_calibration_alpha': alpha,
            'halo_cluster_factor': cluster_factor,
            'halo_measured_8shards': measured8,
            'halo_source': 'PARTITION_r3.json ba_1048576 (measured '
                           'partitioner output); alpha calibrates the '
                           'random-partition degree formula to it',
            'overlap_hideable_fraction': OVERLAP,
            'overlap_source': 'OVERLAP_r2.json split/combined = 0.55 '
                              '(measured on-chip)',
            'W_link_bytes_per_s': W_LINK,
            'W_link_note': 'ASSUMPTION: v5p-class ICI link, per '
                           'direction; sensitivity rows at 0.5x/2x',
            'S_signals': S_SIGNALS, 'K': K,
            'per_chip_shard': 'bench config: N=2^20 BA m=8, nnz=16.7M',
        },
        'predictions': [],
    }

    for n in ns:
        hops_ring = mean_ring_hops(n)
        hops_2d = mean_torus2d_hops(n)
        row = {'n_chips': n, 'halo_rows_per_chip': int(h_per_chip(n)),
               'hops_ring': hops_ring, 'hops_torus2d': hops_2d}
        for label, b in (('f32', 4), ('bf16_carry', 2)):
            eff, tc = efficiency(n, b, hops_ring)
            row[f'eff_{label}_ring'] = round(eff, 3)
            row[f't_comm_{label}_ring_ms'] = round(tc * 1e3, 1)
            if hops_2d:
                eff2, _ = efficiency(n, b, hops_2d)
                row[f'eff_{label}_torus2d'] = round(eff2, 3)
        # ICI bandwidth sensitivity (bf16, ring)
        row['eff_bf16_ring_Wx0.5'] = round(
            efficiency(n, 2, hops_ring, W_LINK * 0.5)[0], 3)
        row['eff_bf16_ring_Wx2'] = round(
            efficiency(n, 2, hops_ring, W_LINK * 2)[0], 3)
        # 2-D edge partition (structure-independent comm)
        pr, pc = mesh_2d(n)
        row['mesh_2d'] = f'{pr}x{pc}'
        for label, b in (('f32', 4), ('bf16_carry', 2)):
            eff2d, tc2d, rows2d = efficiency_2d(n, b)
            row[f'eff_2d_{label}'] = round(eff2d, 3)
        row['comm_rows_2d_per_chip'] = rows2d
        row['eff_2d_bf16_Wx0.5'] = round(
            efficiency_2d(n, 2, W_LINK * 0.5)[0], 3)
        out['predictions'].append(row)

    # SBM-1M block-local secondary case: measured per-chip halo at 8
    # shards, compute time scaled by per-chip nnz at the measured
    # edge-ops/s; dominant distance ~uniform (inter edges are global)
    sbm_rows = [r for r in part if str(r.get('graph', '')).startswith(
        'sbm_') and r.get('reorder') == 'none'
        and r.get('balance') == 'nnz' and 'sorted' in r['graph']]
    if sbm_rows:
        h_sbm = sbm_rows[0]['halo_total'] / 8
        nnz_sbm_chip = 31.9e6 / 8
        t_step_sbm = t_step * (nnz_sbm_chip / 16.7e6)
        sbm_pred = []
        for n in ns:
            hops = mean_ring_hops(n)
            tc = h_sbm * S_SIGNALS * 2 * hops / W_LINK
            eff = t_step_sbm / (t_step_sbm
                                + max(0.0, tc - OVERLAP * t_step_sbm))
            sbm_pred.append({'n_chips': n, 'eff_bf16_ring': round(eff, 3)})
        out['sbm_1m_weak'] = {
            'halo_rows_per_chip_measured': int(h_sbm),
            'note': 'per-chip slice of the measured 8-shard SBM-1M '
                    'partition, halo held constant per chip (block-local '
                    'communities: added chips add communities)',
            'predictions': sbm_pred}

    out['conclusion'] = (
        'With the bf16 halo payload, the BA bench config is predicted to '
        'hold >=80% weak-scaling efficiency through 8 chips on a 1-D ring '
        'and through 16 chips on a 2-D torus at the assumed v5p-class '
        'link bandwidth; f32 payload is marginal at 8 (ring). The binding '
        'constraint is hop-amplified ICI volume on expander graphs — '
        'partitioning cannot reduce pair counts (PARTITION_r3.json '
        'decomposition), so payload bytes and topology are the levers. '
        'Beyond the 1-D crossover the 2-D edge partition '
        '(parallel/twod.py) takes over: its per-chip traffic is '
        'graph-independent at (pr+pc-2)*N_local rows over bandwidth-'
        'optimal ring collectives, so on BA it overtakes the 1-D halo '
        'between 16 and 64 chips (bf16 torus at 64: 1-D 0.44 vs 2-D '
        '0.66) and degrades like 1/sqrt(n) where the 1-D path collapses '
        'linearly.')

    with open(os.path.join(REPO, 'SCALING_r3.json'), 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out['predictions'], indent=1))
    print(out['conclusion'])


if __name__ == '__main__':
    main()
