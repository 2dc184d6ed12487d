"""Batched Lanczos filtering.

TPU-native counterpart of the reference's ``lanczos`` / ``lanczos_op``
(``pygsp/filters/approximations.py:228-341``): instead of a Python loop over
signal columns calling dense NumPy, ONE blocked Krylov recursion advances
every column at once — each step is a single (N, S)-wide SpMM (the same
op the Chebyshev hot loop runs) plus per-column reductions, followed by a
small batched ``eigh`` of the tridiagonal H matrices on device.

On chunked/windowed operators the whole recursion runs in the operator's
internal (relabeled) order: dot products and norms are permutation
invariant, so the entry/exit permutes hoist outside the loop and no
scaled copy of the slot arrays is ever materialized (the ``scale_vals``
trap — see ``ops/chebyshev._cheby_op_chunked``).

Note the reference's ``lanczos_op`` is dead code (it reads the stale ``f.g``
attribute and ``Filter.filter`` never dispatches to it —
``approximations.py:247``, ``filter.py:324-325``); here Lanczos filtering is
a first-class, working method.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pygsp_tpu.core.operators import LaplacianOp, matvec


def _hoisted_matvec(L: LaplacianOp):
    """``(mv, pin, pout)``: a matvec on (N, S) arrays plus entry/exit
    permutes. For chunked/windowed off-diagonals the matvec runs in the
    matrix's internal order (signal chunked per call — two streaming
    copies) so the relabeling permutes apply ONCE per Lanczos solve
    instead of once per Krylov step."""
    from pygsp_tpu.core.chunked import ChunkedELLMatrix
    from pygsp_tpu.core.windowed import WindowedELLMatrix
    off = L.offdiag
    if isinstance(off, (ChunkedELLMatrix, WindowedELLMatrix)):
        from pygsp_tpu.core import chunked as ck
        R = off.chunk_rows
        diag_p = ck.permute_in(off, L.diag)

        def mv(x):
            d = diag_p.reshape((-1,) + (1,) * (x.ndim - 1))
            xc = ck.chunk_signal(x, R)
            return d * x + ck.unchunk_signal(off.spmm_chunks(xc))

        return (mv,
                lambda x: ck.permute_in(off, x),
                lambda y, axis=0: ck.permute_out(off, y, axis=axis))
    return (lambda x: matvec(L, x),
            lambda x: x,
            lambda y, axis=0: y)


def _lanczos_block(mv, x: jax.Array, order: int):
    """Blocked Lanczos bases for every column of ``x`` (N, S) at once.

    Returns ``V``: (order, N, S) and ``H``: (S, order, order). Full
    reorthogonalization each step (as the reference does,
    ``approximations.py:335``). Breakdown (zero residual) is handled by
    zeroing subsequent basis vectors instead of early exit, keeping
    shapes static for jit.
    """
    n, s = x.shape
    dtype = x.dtype
    tiny = jnp.finfo(dtype).tiny

    norm_x = jnp.linalg.norm(x, axis=0)                      # (S,)
    q = x / jnp.maximum(norm_x, tiny)

    V = jnp.zeros((order, n, s), dtype).at[0].set(q)
    r = mv(q)
    alpha0 = jnp.sum(q * r, axis=0)                          # (S,)
    r = r - alpha0 * q

    alphas = jnp.zeros((order, s), dtype).at[0].set(alpha0)
    betas = jnp.zeros((order, s), dtype)   # betas[k] couples k-1 <-> k

    def body(k, carry):
        V, q, r, alphas, betas = carry
        beta = jnp.linalg.norm(r, axis=0)
        alive = beta > 10 * jnp.finfo(dtype).eps
        q_new = jnp.where(alive, r / jnp.maximum(beta, tiny), 0.0)
        V = V.at[k].set(q_new)
        r = mv(q_new) - beta * q
        alpha = jnp.sum(q_new * r, axis=0)
        r = r - alpha * q_new
        # full reorthogonalization (per column)
        r = r - jnp.einsum('kns,ks->ns', V, jnp.einsum('kns,ns->ks', V, r))
        alphas = alphas.at[k].set(alpha)
        betas = betas.at[k].set(jnp.where(alive, beta, 0.0))
        return (V, q_new, r, alphas, betas)

    V, _, _, alphas, betas = jax.lax.fori_loop(
        1, order, body, (V, q, r, alphas, betas))

    # H per column: batched tridiagonal from (order, S) alphas/betas
    ii = jnp.arange(order)
    main = jnp.eye(order, dtype=dtype)
    H = jnp.zeros((s, order, order), dtype)
    H = H.at[:, ii[:-1], ii[1:]].set(betas.T[:, 1:])
    H = H.at[:, ii[1:], ii[:-1]].set(betas.T[:, 1:])
    H = H + alphas.T[:, :, None] * main[None]
    return V, H


def _lanczos_single(L: LaplacianOp, x: jax.Array, order: int):
    """Lanczos basis for one vector: returns V (N, order), H (order, order)."""
    mv, pin, pout = _hoisted_matvec(L)
    V, H = _lanczos_block(mv, pin(x)[:, None], order)
    return pout(jnp.moveaxis(V[:, :, 0], 0, 1)), H[0]


def lanczos_basis(L: LaplacianOp, x: jax.Array, order: int):
    """Per-column Lanczos bases. x: (N,) or (N, S) →
    V: (S, N, order), H: (S, order, order) (S=1 squeezed off for 1-D x)."""
    if x.ndim == 1:
        return _lanczos_single(L, x, order)
    mv, pin, pout = _hoisted_matvec(L)
    V, H = _lanczos_block(mv, pin(x), order)
    return pout(jnp.transpose(V, (2, 1, 0)), axis=1), H


def lanczos_op(L: LaplacianOp, evaluate, x: jax.Array,
               order: int = 30) -> jax.Array:
    """Filter ``x`` through a bank via the Lanczos approximation.

    ``evaluate``: λ-array → (Nf, len(λ)) kernel responses.
    x: (N,) or (N, S). Returns (Nf, N) or (Nf, N, S) — same layout as
    :func:`pygsp_tpu.ops.chebyshev.cheby_op`.
    """
    squeeze = x.ndim == 1
    xs = x[:, None] if squeeze else x
    n, s = xs.shape

    mv, pin, pout = _hoisted_matvec(L)
    xp = pin(xs)
    V, H = _lanczos_block(mv, xp, order)                 # (o, N, S), (S, o, o)
    eh, uh = jnp.linalg.eigh(H)                          # (S, o), (S, o, o)
    eh = jnp.maximum(eh, 0.0)
    fe = jnp.atleast_2d(evaluate(eh.ravel()))            # (Nf, S*o)
    nf = fe.shape[0]
    fe = fe.reshape(nf, s, order)
    VU = jnp.einsum('ons,soj->jns', V, uh)               # (o, N, S)
    proj = jnp.einsum('ons,ns->so', VU, xp)              # (S, o)
    out = jnp.einsum('ons,fso->fns', VU, fe * proj[None, :, :])  # (Nf, N, S)
    out = pout(out, axis=1)
    return out[..., 0] if squeeze else out


def lanczos_synthesis_op(L: LaplacianOp, evaluate, s: jax.Array,
                         order: int = 30) -> jax.Array:
    """Adjoint-style synthesis ``Σ_i g_i(L) s[..., i]`` in ONE blocked
    pass: the Krylov recursions for all (signal, filter) columns advance
    together, each step one (N, S·Nf)-wide SpMM.

    ``evaluate``: λ-array → (Nf, len(λ)) bank responses.
    s: (N, S, Nf). Returns (N, S).
    """
    n, n_s, nf = s.shape
    cols = s.reshape(n, n_s * nf)                   # filter-major flatten
    fidx = jnp.tile(jnp.arange(nf), n_s)            # kernel id per column

    mv, pin, pout = _hoisted_matvec(L)
    xp = pin(cols)
    V, H = _lanczos_block(mv, xp, order)
    eh, uh = jnp.linalg.eigh(H)
    eh = jnp.maximum(eh, 0.0)
    fe_all = jnp.atleast_2d(evaluate(eh.ravel()))        # (Nf, C*o)
    fe_all = fe_all.reshape(nf, n_s * nf, order)
    fe = jnp.take_along_axis(fe_all, fidx[None, :, None], axis=0)[0]  # (C, o)
    VU = jnp.einsum('ons,soj->jns', V, uh)
    proj = jnp.einsum('ons,ns->so', VU, xp)
    out = jnp.einsum('ons,so->ns', VU, fe * proj)        # (N, C)
    out = pout(out)
    return out.reshape(n, n_s, nf).sum(axis=2)
