"""Round-4 analytic weak-scaling model — refreshed inputs + the sweeps
VERDICT r3 asked for (#6: deployed-mode rows, overlap sensitivity; #3:
measured 2-D per-chip compute + structural ring-overlap credit).

Changes vs benchmarks/scaling_model.py (SCALING_r3.json):

* t_step now comes in THREE measured flavors, each labeled with the
  configuration it covers:
    - f32 sharded   77.0 ms/step — SHARDED_ONCHIP_r4.json sh_comb_g14 /K,
      the ACTUAL deployed multi-chip per-chip step (the r3 model used the
      plain single-chip 81.8 ms and called it conservative; the sharded
      layout now runs 0.94x of plain so the distinction has collapsed)
    - bf16 sharded  ~65 ms/step — single-chip bf16 fast mode
      (BF16_CARRY_r3.json) × the measured sharded/plain ratio; this is
      the configuration users actually run at scale (bf16 carry halves
      the halo payload AND the local gather bytes)
    - f32 plain     81.8 ms/step — BENCH_r02 series, kept for
      round-over-round comparability
* overlap (hideable fraction of 1-D halo comm) sweeps 0.25/0.45/0.65
  (±0.2 around the measured OVERLAP_r2 value, per VERDICT #6).
* 2-D rows use the MEASURED ring-path per-chip compute (TWOD_ONCHIP_r4:
  0.984x plain, i.e. no layout tax) and take a structural overlap credit
  for the row all-gather: the ring body issues shift k+1 before fold k
  (parallel/twod.py _cheby_op_2d_ring), so up to (pr-1)/pr of the step's
  fold time can hide the row shifts; the credit is swept at 0.5/0.75/1.0
  of that ideal because it is an implementation property, not yet a
  multi-chip measurement. The psum_scatter stays fully exposed.

Emits SCALING_r4.json. Run:
  PALLAS_AXON_POOL_IPS="" JAX_PLATFORMS=cpu python benchmarks/scaling_model_r4.py
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
OVERLAPS = (0.25, 0.45, 0.65)   # measured 0.45 (OVERLAP_r2) ± 0.2


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


def load_json_lines(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main():
    sh = {r['mode']: r for r in load_json_lines(
        os.path.join(REPO, 'SHARDED_ONCHIP_r4.json')) if 'mode' in r}
    td = {r['mode']: r for r in load_json_lines(
        os.path.join(REPO, 'TWOD_ONCHIP_r4.json')) if 'mode' in r}
    bf = {r['mode']: r for r in load_json_lines(
        os.path.join(REPO, 'BF16_CARRY_r3.json')) if 'mode' in r}
    with open(os.path.join(REPO, 'BENCH_r02.json')) as f:
        bench2 = json.load(f)['parsed']
    with open(os.path.join(REPO, 'PARTITION_r3.json')) as f:
        part = json.load(f)

    t_sh_f32 = sh['sh_comb_g14']['per_bank_ms'] / 1e3 / K
    sharded_ratio = (sh['sh_comb_g14']['per_bank_ms']
                     / sh['plain_auto']['per_bank_ms'])
    t_bf16_plain = bf['bf16/bf16']['per_bank_ms'] / 1e3 / K
    t_plain_f32_r2 = bench2['per_bank_ms'] / 1e3 / K
    t_2d = td['twod_ring_1x1']['per_bank_ms'] / 1e3 / K
    # direct measurements of the deployed bf16 fast mode through BOTH
    # multi-chip engines at 1 device (SHARDED_BF16_r4.json): bf16-vals
    # layouts, single-pass MXU fold — 91.4/91.6% of the f32 roofline,
    # matching the single-chip bf16 rate exactly
    try:
        sb = {r['mode']: r for r in load_json_lines(
            os.path.join(REPO, 'SHARDED_BF16_r4.json')) if 'mode' in r}
        t_sh_bf16 = sb['sh1_bf16_g14']['per_bank_ms'] / 1e3 / K
        t_2d_bf16 = sb['ring1_bf16']['per_bank_ms'] / 1e3 / K
    except (FileNotFoundError, KeyError):
        t_sh_bf16 = t_bf16_plain * sharded_ratio
        t_2d_bf16 = t_2d * t_bf16_plain / (
            sh['plain_auto']['per_bank_ms'] / 1e3 / K)

    # halo volume: calibrated degree-formula (see scaling_model.py)
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
        return float((n - 1) * np.mean(1.0 - (1.0 - 1.0 / n) ** deg)
                     * N_local)

    ba_rows = [r for r in part if r.get('graph') == 'ba_1048576'
               and r.get('reorder') == 'none' and r.get('balance') == 'nnz']
    alpha = ba_rows[0]['halo_total'] / pairs_total(8)
    cluster_rows = [r for r in part if r.get('graph') == 'ba_1048576'
                    and r.get('reorder') == 'cluster']
    cluster_factor = (cluster_rows[0]['halo_total']
                      / ba_rows[0]['halo_total'] if cluster_rows else 1.0)

    def h_per_chip(n):
        return alpha * cluster_factor * (n - 1) * N_local * float(
            np.mean(1.0 - (1.0 - 1.0 / n) ** deg))

    # Weak-scale LAYOUT inflation (WEAKPAD_r4.json): the one-device
    # engine measurements pack at the single-chip 1.165 slot padding;
    # real per-chip blocks fragment — 1-D halo layout ~2.5x more slots
    # per edge, 2-D blocks ~1.3x. Efficiency below is WORK-NORMALIZED:
    # eff = t_ideal / (t_ideal*inflation + exposed_comm), with hiding
    # budgets scaling with the inflated (actual) compute time.
    try:
        with open(os.path.join(REPO, 'WEAKPAD_r4.json')) as f:
            wp = {(r['layout'], r['n_chips']): r
                  for r in json.load(f)['rows']}
        INFL_1D = wp[('1d_split', 8)]['inflation_vs_single_chip']
        INFL_2D = wp[('2d_ring', 4)]['inflation_vs_single_chip']
        INFL_2DINT = wp[('2d_interleaved', 4)]['inflation_vs_single_chip']
    except (FileNotFoundError, KeyError):
        INFL_1D, INFL_2D, INFL_2DINT = 2.505, 1.307, 1.343

    def eff_1d(n, t_step, bytes_per_val, hops, overlap, w_link=W_LINK):
        t_comm = h_per_chip(n) * S_SIGNALS * bytes_per_val * hops / w_link
        t_infl = t_step * (INFL_1D if n > 1 else 1.0)
        return (t_step / (t_infl + max(0.0, t_comm - overlap * t_infl)),
                t_comm)

    def mesh_2d(n):
        pr = 1 << int(np.ceil(np.log2(n) / 2))
        return pr, n // pr

    def eff_2d_int(n, t_step, bytes_per_val, ring_eff, w_link=W_LINK,
                   scatter_bytes=4):
        """Fully interleaved schedule (twod_local_windowed split_cols):
        the row shifts hide under the s=0 sub-folds (budget t_step/pc),
        the pc-1 col hops hide under the s=1..pc-1 position folds
        (budget (pc-1)/pc * t_step). Hop payloads: source rows at
        ``bytes_per_val`` on the row ring, partial products at
        ``scatter_bytes`` on the col ring."""
        pr, pc = mesh_2d(n)
        t_infl = t_step * (INFL_2DINT if n > 1 else 1.0)
        t_row = (pr - 1) * N_local * S_SIGNALS * bytes_per_val / w_link
        t_col = (pc - 1) * N_local * S_SIGNALS * scatter_bytes / w_link
        exp_row = max(0.0, t_row - ring_eff * t_infl / pc)
        exp_col = max(0.0, t_col - ring_eff * (pc - 1) / max(pc, 1)
                      * t_infl)
        return t_step / (t_infl + exp_row + exp_col), t_row + t_col

    def eff_2d(n, t_step, bytes_per_val, ring_eff, w_link=W_LINK,
               scatter_bytes=4):
        """Ring body: (pr-1) row shifts each issued before the fold that
        can hide it — hideable row-comm budget = ring_eff*(pr-1)/pr of
        the step's compute; the (pc-1)/pc psum_scatter is exposed
        (``scatter_bytes=2`` models the opt-in bf16 scatter payload,
        ``cheby_op_2d(scatter_dtype=bf16)``)."""
        pr, pc = mesh_2d(n)
        t_infl = t_step * (INFL_2D if n > 1 else 1.0)
        t_row = (pr - 1) * N_local * S_SIGNALS * bytes_per_val / w_link
        t_col = (pc - 1) * N_local * S_SIGNALS * scatter_bytes / w_link
        hide = ring_eff * (pr - 1) / max(pr, 1) * t_infl
        exposed = max(0.0, t_row - hide) + t_col
        return t_step / (t_infl + exposed), t_row + t_col

    ns = [2, 4, 8, 16, 64]
    modes = {
        'f32_sharded': (t_sh_f32, 4,
                        'SHARDED_ONCHIP_r4 sh_comb_g14 (measured sharded '
                        'per-chip step, 0.94x of plain)'),
        'bf16_sharded': (t_sh_bf16, 2,
                         'BF16_CARRY_r3 bf16/bf16 x measured sharded '
                         'ratio — the deployed fast mode users run'),
        'f32_plain_r2': (t_plain_f32_r2, 4,
                         'BENCH_r02 series (round-over-round '
                         'comparability)'),
    }
    out = {
        'metric': 'predicted_weak_scaling_efficiency',
        'model': 'eff(n) = t_step / (t_step + max(0, t_comm(n) - '
                 'ov*t_step)); t_comm = h(n)*S*bytes*hops/W_link; 2-D: '
                 'row all-gather hidden up to ring_eff*(pr-1)/pr*t_step '
                 '(measured ring body, TWOD_ONCHIP_r4), psum_scatter '
                 'exposed',
        'inputs': {
            't_step_s': {k: v[0] for k, (v0, v1, v2) in modes.items()
                         for v in [(v0, v1, v2)]},
            't_step_sources': {k: v[2] for k, v in modes.items()},
            't_2d_step_s': t_2d,
            't_2d_source': 'TWOD_ONCHIP_r4 twod_ring_1x1 (0.984x plain '
                           '— layout tax eliminated this round)',
            'sharded_over_plain_ratio': round(sharded_ratio, 3),
            'halo_calibration_alpha': alpha,
            'halo_cluster_factor': cluster_factor,
            'halo_source': 'PARTITION_r3.json ba_1048576 + degree formula',
            'overlap_sweep': OVERLAPS,
            'overlap_source': 'OVERLAP_r2 measured 0.45; ±0.2 sweep per '
                              'VERDICT r3 #6',
            'ring_eff_sweep': [0.5, 0.75, 1.0],
            'ring_eff_note': 'structural credit: _cheby_op_2d_ring '
                             'issues shift k+1 before fold k; swept '
                             'because it is not yet a multi-chip '
                             'measurement',
            'layout_inflation': {
                '1d': INFL_1D, '2d_ring': INFL_2D,
                '2d_interleaved': INFL_2DINT,
                'source': 'WEAKPAD_r4.json — weak-scale slot padding '
                          'vs the single-chip 1.165 (the engines were '
                          'measured at 1 device where blocks do not '
                          'fragment); efficiencies are work-normalized '
                          'against the ideal single-chip rate',
                'limitation': '2-D inflation measured at a pr=2 weak '
                              'instance; per-step-matrix density falls '
                              'like deg/pr, so expect it to grow '
                              'toward ~1.5-1.7 at pr=8 — the large-n '
                              '2-D rows are optimistic by that margin '
                              '(same direction as the named round-5 '
                              'format lever)'},
            'W_link_bytes_per_s': W_LINK,
            'W_link_note': 'ASSUMPTION: v5p-class ICI link/direction; '
                           'sensitivity at 0.5x/2x',
            'S_signals': S_SIGNALS, 'K': K,
            'per_chip_shard': 'bench config: N=2^20 BA m=8, nnz=16.7M',
        },
        'predictions': [],
    }

    for n in ns:
        hops_ring = mean_ring_hops(n)
        hops_t2 = mean_torus2d_hops(n)
        row = {'n_chips': n, 'halo_rows_per_chip': int(h_per_chip(n)),
               'hops_ring': hops_ring, 'hops_torus2d': hops_t2,
               'mesh_2d': 'x'.join(map(str, mesh_2d(n)))}
        for label, (t_step, b, _) in modes.items():
            for ov in OVERLAPS:
                eff, tc = eff_1d(n, t_step, b, hops_ring, ov)
                row[f'eff_{label}_ring_ov{ov}'] = round(eff, 3)
            if hops_t2:
                row[f'eff_{label}_torus2d_ov0.45'] = round(
                    eff_1d(n, t_step, b, hops_t2, 0.45)[0], 3)
        # link-BW sensitivity on the deployed mode
        row['eff_bf16_sharded_ring_ov0.45_Wx0.5'] = round(
            eff_1d(n, t_sh_bf16, 2, hops_ring, 0.45, W_LINK * 0.5)[0], 3)
        row['eff_bf16_sharded_ring_ov0.45_Wx2'] = round(
            eff_1d(n, t_sh_bf16, 2, hops_ring, 0.45, W_LINK * 2)[0], 3)
        # 2-D ring path (measured per-chip steps, structural overlap)
        for label, b, tstep2 in (('f32', 4, t_2d),
                                 ('bf16', 2, t_2d_bf16)):
            for re_ in (0.5, 0.75, 1.0):
                eff, _ = eff_2d(n, tstep2, b, re_)
                row[f'eff_2d_{label}_re{re_}'] = round(eff, 3)
            if label == 'bf16':
                row['eff_2d_bf16_re0.75_sc16'] = round(
                    eff_2d(n, tstep2, b, 0.75, scatter_bytes=2)[0], 3)
                for re_ in (0.5, 0.75):
                    row[f'eff_2dint_bf16_re{re_}'] = round(
                        eff_2d_int(n, tstep2, b, re_)[0], 3)
                    row[f'eff_2dint_bf16_re{re_}_sc16'] = round(
                        eff_2d_int(n, tstep2, b, re_,
                                   scatter_bytes=2)[0], 3)
        out['predictions'].append(row)

    # headline claims, each tied to its configuration (data-driven)
    p = {r['n_chips']: r for r in out['predictions']}
    out['conclusion'] = {
        'honesty_update': (
            'This revision folds in the WEAK-SCALE LAYOUT INFLATION '
            '(WEAKPAD_r4.json) that earlier revisions missed: the '
            'engines were measured at 1 device where the local block '
            'packs at the single-chip 1.165 padding, but real per-chip '
            'blocks fragment — 1-D halo layout 2.5x more slots/edge '
            '(scattered remote columns), 2-D blocks 1.31-1.34x. '
            'Efficiencies are now work-normalized against the ideal '
            'single-chip rate, so they are lower and honest.'),
        'deployed_mode_claim': (
            f"bf16 deployed fast mode, work-normalized: 1-D ring at 8 "
            f"chips {p[8]['eff_bf16_sharded_ring_ov0.45']} (the 2.5x "
            f"layout inflation dominates, not the wire); 2-D "
            f"interleaved {p[8]['eff_2dint_bf16_re0.75']} at 8, "
            f"{p[16]['eff_2dint_bf16_re0.75']} at 16, "
            f"{p[64]['eff_2dint_bf16_re0.75']} at 64 chips "
            f"(sc16 hops: {p[64]['eff_2dint_bf16_re0.75_sc16']}). "
            f"The 2-D layout is the deployment choice at EVERY n >= 2: "
            f"both its wire volume (graph-independent) and its layout "
            f"inflation (1.34x vs 2.5x) beat the 1-D halo on "
            f"expanders."),
        'f32_claim': (
            f"exact-f32: 1-D ring at 8 = "
            f"{p[8]['eff_f32_sharded_ring_ov0.45']}; 2-D interleaved "
            f"carries the same 1.34x inflation — eff(16, 2-D ring "
            f"f32) = {p[16]['eff_2d_f32_re0.75']}"),
        'binding_constraint': (
            'With both collectives ring-hidden (the interleaved '
            'schedule), the binding term at every scale is the '
            'LAYOUT inflation of fragmented blocks, not communication. '
            'Round-5 lever: a compact sparse-block format (tier-only / '
            'row-ELL hybrid for low-reuse columns) to close the 2-D '
            '1.34x toward 1.0 — each point recovered is a point of '
            'weak-scaling efficiency at every n.'),
    }

    with open(os.path.join(REPO, 'SCALING_r4.json'), 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out['predictions'], indent=1))
    print(json.dumps(out['conclusion'], indent=1))


if __name__ == '__main__':
    main()
