"""Batched Lanczos filtering.

TPU-native counterpart of the reference's ``lanczos`` / ``lanczos_op``
(``pygsp/filters/approximations.py:228-341``): instead of a Python loop over
signal columns calling dense NumPy, the per-column Krylov recursion is a
``lax.scan`` of SpMVs ``vmap``-ed over columns, followed by a small dense
``eigh`` of the tridiagonal H on device.

Note the reference's ``lanczos_op`` is dead code (it reads the stale ``f.g``
attribute and ``Filter.filter`` never dispatches to it —
``approximations.py:247``, ``filter.py:324-325``); here Lanczos filtering is
a first-class, working method.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pygsp_tpu.core.operators import LaplacianOp, matvec


def _lanczos_single(L: LaplacianOp, x: jax.Array, order: int):
    """Lanczos basis for one vector: returns V (N, order), H (order, order).

    Full reorthogonalization each step (as the reference does,
    ``approximations.py:335``). Breakdown (zero residual) is handled by
    zeroing subsequent basis vectors instead of early exit, keeping shapes
    static for jit.
    """
    n = x.shape[0]
    dtype = x.dtype
    eps = jnp.finfo(dtype).tiny

    norm_x = jnp.linalg.norm(x)
    q = x / jnp.maximum(norm_x, eps)

    V = jnp.zeros((n, order), dtype).at[:, 0].set(q)
    r = matvec(L, q)
    alpha0 = q @ r
    r = r - alpha0 * q

    alphas = jnp.zeros((order,), dtype).at[0].set(alpha0)
    betas = jnp.zeros((order,), dtype)  # betas[k] couples step k-1 <-> k

    def body(k, carry):
        V, q, r, alphas, betas = carry
        beta = jnp.linalg.norm(r)
        alive = beta > 10 * jnp.finfo(dtype).eps
        q_new = jnp.where(alive, r / jnp.maximum(beta, eps), 0.0)
        V = V.at[:, k].set(q_new)
        r = matvec(L, q_new) - beta * q
        alpha = q_new @ r
        r = r - alpha * q_new
        # full reorthogonalization
        r = r - V @ (V.T @ r)
        alphas = alphas.at[k].set(alpha)
        betas = betas.at[k].set(jnp.where(alive, beta, 0.0))
        return (V, q_new, r, alphas, betas)

    V, _, _, alphas, betas = jax.lax.fori_loop(
        1, order, body, (V, q, r, alphas, betas))

    H = (jnp.diag(alphas)
         + jnp.diag(betas[1:], 1)
         + jnp.diag(betas[1:], -1))
    return V, H


def lanczos_basis(L: LaplacianOp, x: jax.Array, order: int):
    """Per-column Lanczos bases. x: (N,) or (N, S) →
    V: (S, N, order), H: (S, order, order) (S=1 squeezed off for 1-D x)."""
    if x.ndim == 1:
        return _lanczos_single(L, x, order)
    V, H = jax.vmap(lambda col: _lanczos_single(L, col, order),
                    in_axes=1)(x)
    return V, H


def lanczos_op(L: LaplacianOp, evaluate, x: jax.Array,
               order: int = 30) -> jax.Array:
    """Filter ``x`` through a bank via the Lanczos approximation.

    ``evaluate``: λ-array → (Nf, len(λ)) kernel responses.
    x: (N,) or (N, S). Returns (Nf, N) or (Nf, N, S) — same layout as
    :func:`pygsp_tpu.ops.chebyshev.cheby_op`.
    """
    squeeze = x.ndim == 1
    xs = x[:, None] if squeeze else x

    def one_col(col):
        V, H = _lanczos_single(L, col, order)
        eh, uh = jnp.linalg.eigh(H)
        eh = jnp.maximum(eh, 0.0)
        fe = jnp.atleast_2d(evaluate(eh))           # (Nf, order)
        VU = V @ uh                                 # (N, order)
        proj = VU.T @ col                           # (order,)
        return jnp.einsum('no,fo->fn', VU, fe * proj[None, :])

    out = jax.vmap(one_col, in_axes=1, out_axes=2)(xs)  # (Nf, N, S)
    return out[..., 0] if squeeze else out


def lanczos_synthesis_op(L: LaplacianOp, evaluate, s: jax.Array,
                         order: int = 30) -> jax.Array:
    """Adjoint-style synthesis ``Σ_i g_i(L) s[..., i]`` in ONE batched
    pass: the Krylov recursions for all (signal, filter) columns run
    under a single ``vmap`` instead of a per-filter Python loop.

    ``evaluate``: λ-array → (Nf, len(λ)) bank responses.
    s: (N, S, Nf). Returns (N, S).
    """
    n, n_s, nf = s.shape
    cols = s.reshape(n, n_s * nf)                   # filter-major flatten
    fidx = jnp.tile(jnp.arange(nf), n_s)            # kernel id per column

    def one_col(col, i):
        V, H = _lanczos_single(L, col, order)
        eh, uh = jnp.linalg.eigh(H)
        eh = jnp.maximum(eh, 0.0)
        fe = jnp.atleast_2d(evaluate(eh))[i]        # (order,)
        VU = V @ uh
        proj = VU.T @ col
        return VU @ (fe * proj)                     # (N,)

    out = jax.vmap(one_col, in_axes=(1, 0), out_axes=1)(cols, fidx)
    return out.reshape(n, n_s, nf).sum(axis=2)
