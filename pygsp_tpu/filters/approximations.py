"""pygsp-compatible free-function façade over the TPU Chebyshev/Lanczos ops.

Mirrors the calling conventions of ``pygsp/filters/approximations.py`` so
reference-habit code ports unchanged; everything dispatches to the jit-able
engines in :mod:`pygsp_tpu.ops`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pygsp_tpu.ops import chebyshev as _cheby
from pygsp_tpu.ops import lanczos as _lanczos


def compute_cheby_coeff(f, m: int = 30, N: int | None = None, i: int | None = None):
    """Chebyshev coefficients of a Filter (bank).

    Returns (m+1,) for a single filter / explicit ``i``, else a list of
    per-kernel vectors like the reference's ``@filterbank_handler``
    (``approximations.py:10-55``).
    """
    c = _cheby.cheby_coeff(f.evaluate, f.G.lmax, m=m, grid_n=N)
    if i is not None:
        return c[i]
    if f.n_filters == 1:
        return c[0]
    return [c[k] for k in range(f.n_filters)]


def cheby_op(G, c, signal, **kwargs):
    """Apply Chebyshev coefficients to a signal
    (reference ``approximations.py:58-114``).

    Returns the reference's stacked layout: (N·Nscales,) or (N·Nscales, Nv).
    """
    c = jnp.atleast_2d(jnp.asarray(c))
    signal = jnp.asarray(signal)
    if c.shape[1] < 2:
        raise TypeError('The coefficients have an invalid shape')
    r = _cheby.cheby_op(G.L, G.lmax, c, signal)       # (Nscales, N, ...)
    return r.reshape((-1,) + signal.shape[1:])


def cheby_rect(G, bounds, signal, **kwargs):
    order = kwargs.pop('order', 30)
    return _cheby.cheby_rect(G.L, G.lmax, bounds, jnp.asarray(signal),
                             order=order)


def compute_jackson_cheby_coeff(filter_bounds, delta_lambda, m):
    ch, jch = _cheby.jackson_cheby_coeff(filter_bounds, delta_lambda, m)
    return np.asarray(ch), np.asarray(jch)


def lanczos(A, order, x):
    """Lanczos basis of a LaplacianOp (or anything matvec-able).

    Returns (V, H) per signal column — the working counterpart of the
    reference's ``lanczos`` (``approximations.py:281-341``).
    """
    return _lanczos.lanczos_basis(A, jnp.asarray(x), order)


def lanczos_op(f, s, order: int = 30):
    """Lanczos filtering of ``s`` by filter bank ``f``; stacked layout like
    ``cheby_op`` (the reference's version is dead code — fixed here)."""
    r = _lanczos.lanczos_op(f.G.L, f.evaluate, jnp.asarray(s), order=order)
    s = jnp.asarray(s)
    return r.reshape((-1,) + s.shape[1:])
