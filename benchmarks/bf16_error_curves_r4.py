"""Round-4 extension of the reduced-precision error curves: the FULL
fast mode (bf16 carry + bf16 slab VALUES, ``vals_dtype`` — the
configuration that actually reaches 91.4% of the f32 roofline,
``SHARDED_BF16_r4.json``) measured per-order against the f64 host
recurrence on the BASELINE configs.

Value rounding is EXACT on unit-weight graphs (Logo, Minnesota, SBM) and
adds ~one bf16 rounding per edge weight on weighted ones (Sensor's
Gaussian kernel weights) — this measures how much that adds on top of
the carry budget (BF16_ERRORS_r3.json).

Writes one JSON line per config to stdout; redirect to
``BF16_ERRORS_r4.json``.

Run: PALLAS_AXON_POOL_IPS="" JAX_PLATFORMS=cpu \
     python benchmarks/bf16_error_curves_r4.py > /root/repo/BF16_ERRORS_r4.json
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])
sys.path.insert(0, __file__.rsplit('/', 1)[0])

from bf16_error_curves import (M, S, bank_error, build_windowed,
                               term_errors, log)


def main():
    import jax.numpy as jnp
    import pygsp_tpu as gsp
    from pygsp_tpu.ops import chebyshev as cheby

    rng = np.random.default_rng(0)
    configs = [
        ('logo_heat', lambda: gsp.graphs.Logo(),
         lambda G: gsp.filters.Heat(G, scale=50), 'unit'),
        ('minnesota_mexicanhat', lambda: gsp.graphs.Minnesota(),
         lambda G: gsp.filters.MexicanHat(G, Nf=6), 'unit'),
        ('sensor10k_itersine', lambda: gsp.graphs.Sensor(10_000, seed=42),
         lambda G: gsp.filters.Itersine(G, Nf=6), 'weighted'),
    ]

    for name, mk_graph, mk_bank, wclass in configs:
        t0 = time.time()
        G = mk_graph()
        G.estimate_lmax()
        lmax = float(G.lmax)
        bank = mk_bank(G)
        c = np.asarray(cheby.cheby_coeff(bank.evaluate, lmax, m=M))
        # FULL fast mode: bf16 slab values + bf16 carry; f64 reference
        # keeps the ORIGINAL weights, so the measured error includes the
        # weight rounding
        L16, W, dw = build_windowed(G.W, val_dtype=jnp.bfloat16)
        x32 = rng.standard_normal((G.N, S)).astype(np.float32)
        log(f'{name}: N={G.N} nnz={W.nnz} ({wclass}) built in '
            f'{time.time()-t0:.0f}s')

        errs = term_errors(L16, W, dw, lmax, x32, jnp.bfloat16)
        berr = bank_error(L16, W, dw, lmax, c, x32, jnp.bfloat16)
        rec = {
            'config': name, 'path': 'bf16_full (carry+vals)',
            'weights': wclass, 'order': M,
            'per_order_rel_err': [float(f'{e:.3e}') for e in errs],
            'max_term_rel_err': max(errs),
            'bank_rel_err': berr,
            'apriori_estimate': cheby.carry_error_estimate(c,
                                                           jnp.bfloat16),
        }
        print(json.dumps(rec), flush=True)
        log(f'  bf16_full: max term err {max(errs):.2e}, '
            f'bank {berr:.2e}')


if __name__ == '__main__':
    main()
