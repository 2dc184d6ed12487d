"""BASELINE.json correctness configs, validated against the reference.

Config 4 (SBM 1M, sharded) runs in benchmarks/baseline_sbm1m.py (validated
rel err 3e-7); config 5 (100M edges, multi-host) needs real multi-chip
hardware — its machinery is covered by tests/test_parallel.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pygsp_tpu as gsp
from pygsp_tpu.ops import chebyshev as cheby


def _pin_lmax(G, Gr):
    Gr.estimate_lmax()
    G._lmax = Gr.lmax
    G._lmax_method = 'pinned'


def test_config1_logo_heat(pygsp_ref, rng):
    """Config 1: Logo (N=1130) + Heat(scale=50), K=30 — README example."""
    G, Gr = gsp.graphs.Logo(), pygsp_ref.graphs.Logo()
    _pin_lmax(G, Gr)
    s = np.zeros(G.N)
    s[20] = 1
    out = np.asarray(gsp.filters.Heat(G, scale=50).filter(s, order=30))
    ref = pygsp_ref.filters.Heat(Gr, scale=50).filter(s, order=30)
    assert np.allclose(out, ref, atol=1e-12)


def test_config2_minnesota_mexicanhat(pygsp_ref, rng):
    """Config 2: Minnesota + Mexican-hat bank (Nf=6), analysis + synthesis."""
    G, Gr = gsp.graphs.Minnesota(), pygsp_ref.graphs.Minnesota()
    _pin_lmax(G, Gr)
    g = gsp.filters.MexicanHat(G, Nf=6)
    gr = pygsp_ref.filters.MexicanHat(Gr, Nf=6)
    s = rng.normal(size=G.N)
    coeffs = g.analyze(s, order=30)
    coeffs_ref = gr.analyze(s, order=30)
    assert np.allclose(np.asarray(coeffs), coeffs_ref, atol=1e-10)
    rec = g.synthesize(coeffs, order=30)
    rec_ref = gr.synthesize(coeffs_ref, order=30)
    assert np.allclose(np.asarray(rec), rec_ref, atol=1e-10)


def test_config3_sensor10k_itersine(pygsp_ref, rng):
    """Config 3: Sensor(10k) + Itersine tight frame, lmax estimation +
    per-order allclose."""
    G = gsp.graphs.Sensor(10000, seed=42)
    Gr = pygsp_ref.graphs.Sensor(10000, seed=42)
    assert (abs(G.W - Gr.W) > 1e-8).nnz == 0   # same graph

    # lmax estimators agree within the reference's own tolerance regime
    G.estimate_lmax(method='lanczos')
    Gr.estimate_lmax()
    assert abs(G.lmax - Gr.lmax) / Gr.lmax < 2e-2

    # per-order parity with pinned lmax
    G._lmax = Gr.lmax
    g = gsp.filters.Itersine(G, Nf=6)
    c = np.asarray(cheby.cheby_coeff(g.evaluate, G.lmax, m=30))
    s = rng.normal(size=G.N)
    _, terms = cheby.cheby_op_intermediates(G.L, G.lmax, jnp.asarray(c),
                                            jnp.asarray(s))
    terms = np.asarray(terms)
    a1 = a2 = Gr.lmax / 2
    t_old, t_cur = s, (Gr.L.dot(s) - a2 * s) / a1
    assert np.allclose(terms[0], t_old, atol=1e-10)
    assert np.allclose(terms[1], t_cur, atol=1e-10)
    for k in range(2, 31):
        t_new = 2 / a1 * (Gr.L.dot(t_cur) - a2 * t_cur) - t_old
        assert np.allclose(terms[k], t_new, atol=1e-7), f'order {k}'
        t_old, t_cur = t_cur, t_new

    out = np.asarray(g.filter(s, order=30))
    ref = pygsp_ref.filters.Itersine(Gr, Nf=6).filter(s, order=30)
    assert np.allclose(out, ref, atol=1e-9)
