"""Per-order error curves of the bf16 recurrence carry (VERDICT r2 #2).

Measures, for BASELINE configs 1-4 (Logo+Heat, Minnesota+MexicanHat,
Sensor(10k)+Itersine, SBM-1M+Heat) on the windowed-compact operator:

- per-order max relative error of the carried terms T̃_k x, k = 0..30,
  with (a) the plain f32 path and (b) carry_dtype=bfloat16, each against
  an f64 SciPy host recurrence;
- final bank-output relative error for both paths;
- the a-priori gate estimate ``carry_error_estimate`` for comparison.

Accumulation stays f32 in BOTH paths by construction (the fold's
``preferred_element_type`` — the mode being sized; advisor r2 note: an
all-bf16 fold would overstate the error). bf16×bf16 products are exact
in f32, so these CPU curves transfer to the TPU MXU bit-for-bit modulo
accumulation order.

Writes one JSON line per (config, path) to stdout; redirect to
``BF16_ERRORS_r3.json``.

Run: PALLAS_AXON_POOL_IPS="" JAX_PLATFORMS=cpu \
     python benchmarks/bf16_error_curves.py > /root/repo/BF16_ERRORS_r3.json
"""

import json
import sys
import time

import numpy as np
import scipy.sparse as sps

sys.path.insert(0, __file__.rsplit('/', 2)[0])

S = 4          # signal columns (error is column-max'd; width is not the point)
M = 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_windowed(W, dtype=np.float32, val_dtype=None):
    import jax.numpy as jnp
    from pygsp_tpu.core import windowed as cw
    from pygsp_tpu.core.operators import LaplacianOp
    W = sps.csr_matrix(W)
    dw = np.ravel(W.sum(axis=1)).astype(dtype)
    Wneg = W.copy().astype(dtype)
    Wneg.data = -Wneg.data
    H = cw.windowed_from_scipy(Wneg, dtype=val_dtype or dtype)
    return LaplacianOp(offdiag=H, diag=jnp.asarray(dw),
                       lap_type='combinatorial'), W, dw


def term_errors(L, W, dw, lmax, x32, carry_dtype):
    """Per-order max rel err of T̃_k(x) vs an f64 host recurrence."""
    import jax.numpy as jnp
    from pygsp_tpu.core import chunked as ck
    from pygsp_tpu.ops.chebyshev import _chunked_recurrence

    off = L.offdiag

    def pull(t):
        return np.asarray(
            ck.permute_out(off, ck.unchunk_signal(t)), np.float64)

    t_old, t_cur, recur = _chunked_recurrence(
        L, lmax, jnp.asarray(x32), carry_dtype=carry_dtype)
    dev_terms = [pull(t_old), pull(t_cur)]
    for _ in range(2, M + 1):
        t_old, t_cur = t_cur, recur(t_old, t_cur)
        dev_terms.append(pull(t_cur))

    # f64 host reference recurrence (reference arithmetic,
    # approximations.py:98-113)
    Lh = (sps.diags(dw.astype(np.float64)) - W.astype(np.float64)).tocsr()
    a1 = a2 = lmax / 2
    xs = x32.astype(np.float64)
    h_old, h_cur = xs, (Lh @ xs - a2 * xs) / a1
    errs = []
    scale0 = np.abs(xs).max() + 1e-300
    errs.append(float(np.abs(dev_terms[0] - h_old).max() / scale0))
    errs.append(float(np.abs(dev_terms[1] - h_cur).max()
                      / (np.abs(h_cur).max() + 1e-300)))
    for k in range(2, M + 1):
        h_new = 2 / a1 * (Lh @ h_cur - a2 * h_cur) - h_old
        errs.append(float(np.abs(dev_terms[k] - h_new).max()
                          / (np.abs(h_new).max() + 1e-300)))
        h_old, h_cur = h_cur, h_new
    return errs


def bank_error(L, W, dw, lmax, c, x32, carry_dtype):
    import jax.numpy as jnp
    from pygsp_tpu.ops import chebyshev as cheby
    out = np.asarray(cheby.cheby_op(
        L, lmax, jnp.asarray(c, jnp.float32), jnp.asarray(x32),
        carry_dtype=carry_dtype, carry_tol=10.0), np.float64)
    # f64 reference bank
    Lh = (sps.diags(dw.astype(np.float64)) - W.astype(np.float64)).tocsr()
    cn = np.asarray(c, np.float64)
    a1 = a2 = lmax / 2
    xs = x32.astype(np.float64)
    t_old, t_cur = xs, (Lh @ xs - a2 * xs) / a1
    r = [0.5 * cn[i, 0] * t_old + cn[i, 1] * t_cur
         for i in range(cn.shape[0])]
    for k in range(2, cn.shape[1]):
        t_new = 2 / a1 * (Lh @ t_cur - a2 * t_cur) - t_old
        for i in range(cn.shape[0]):
            r[i] += cn[i, k] * t_new
        t_old, t_cur = t_cur, t_new
    ref = np.stack(r)
    return float(np.abs(out - ref).max() / (np.abs(ref).max() + 1e-300))


def main():
    import pygsp_tpu as gsp
    from pygsp_tpu.ops import chebyshev as cheby

    rng = np.random.default_rng(0)

    def sbm_graph():
        from pygsp_tpu.graphs.stochasticblockmodel import sbm_edges
        n = 1_000_000
        z = np.sort(rng.integers(0, 5, n))
        Mp = np.full((5, 5), 5e-6)
        np.fill_diagonal(Mp, 8e-5)
        r, c = sbm_edges(z, Mp, rng=np.random.default_rng(1))
        W = sps.csr_matrix((np.ones(2 * len(r), np.float32),
                            (np.concatenate([r, c]),
                             np.concatenate([c, r]))), shape=(n, n))
        W.sum_duplicates()
        G = gsp.graphs.Graph(W)
        return G

    configs = [
        ('logo_heat', lambda: gsp.graphs.Logo(),
         lambda G: gsp.filters.Heat(G, scale=50)),
        ('minnesota_mexicanhat', lambda: gsp.graphs.Minnesota(),
         lambda G: gsp.filters.MexicanHat(G, Nf=6)),
        ('sensor10k_itersine', lambda: gsp.graphs.Sensor(10_000, seed=42),
         lambda G: gsp.filters.Itersine(G, Nf=6)),
        ('sbm1m_heat', sbm_graph,
         lambda G: gsp.filters.Heat(G, scale=[5, 10, 25, 50])),
    ]

    for name, mk_graph, mk_bank in configs:
        t0 = time.time()
        G = mk_graph()
        G.estimate_lmax()
        lmax = float(G.lmax)
        bank = mk_bank(G)
        c = np.asarray(cheby.cheby_coeff(bank.evaluate, lmax, m=M))
        L, W, dw = build_windowed(G.W)
        x32 = rng.standard_normal((G.N, S)).astype(np.float32)
        log(f'{name}: N={G.N} nnz={W.nnz} built in {time.time()-t0:.0f}s')

        import jax.numpy as jnp
        for label, cdt in (('f32', None), ('bf16_carry', jnp.bfloat16)):
            t0 = time.time()
            errs = term_errors(L, W, dw, lmax, x32, cdt)
            berr = bank_error(L, W, dw, lmax, c, x32, cdt)
            rec = {
                'config': name, 'path': label, 'order': M,
                'per_order_rel_err': [float(f'{e:.3e}') for e in errs],
                'max_term_rel_err': max(errs),
                'bank_rel_err': berr,
            }
            if cdt is not None:
                rec['apriori_estimate'] = cheby.carry_error_estimate(c, cdt)
            print(json.dumps(rec), flush=True)
            log(f'  {label}: max term err {max(errs):.2e}, bank '
                f'{berr:.2e} ({time.time()-t0:.0f}s)')


if __name__ == '__main__':
    main()
