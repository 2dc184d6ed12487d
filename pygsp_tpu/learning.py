"""Semi-supervised learning on graphs (role of ``pygsp/learning.py``).

TPU-native solvers: Tikhonov regression runs ``jax.scipy.sparse.linalg.cg``
batched over all signal columns at once (the reference loops SciPy CG per
column, ``learning.py:334-337``); the simplex-constrained classifier is a
self-contained jit-able forward–backward splitting loop (the reference
depends on pyunlocbox, ``learning.py:23-33`` — dropped here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pygsp_tpu.core.operators import matvec


def _to_logits(x, n_classes=None):
    x = np.asarray(x).astype(int)
    k = (np.max(x) + 1) if n_classes is None else n_classes
    logits = np.zeros([len(x), k])
    logits[range(len(x)), x] = 1
    return logits


def regression_tikhonov(G, y, M, tau=0):
    """Solve ``argmin_x ||Mx − y||² + τ xᵀLx`` (τ>0, CG) or the
    hard-constraint interpolation ``L_uu x_u = W_ul y_l`` (τ=0).

    Semantics of ``learning.py:256-367``. For τ=0 the unknown block is
    solved with CG on the (SPD on the non-constant complement) ``L_uu``
    system using the masked full-graph operator, so no sparse submatrix
    extraction is needed — everything stays in the one SpMM kernel.

    Examples
    --------
    >>> import numpy as np
    >>> from pygsp_tpu import graphs, learning
    >>> G = graphs.Sensor(64, seed=42)
    >>> mask = np.zeros(64, bool); mask[:32] = True
    >>> y = np.where(mask, 1.0, 0.0)      # constant signal, half observed
    >>> out = learning.regression_tikhonov(G, y, mask, tau=0)
    >>> bool(np.abs(np.asarray(out) - 1.0).max() < 1e-3)
    True

    """
    y = jnp.asarray(y, dtype=G.L.dtype)
    M_mask = jnp.asarray(M, dtype=bool)
    mf = M_mask.astype(y.dtype)
    L = G.L

    bshape = (-1,) + (1,) * (y.ndim - 1)
    mfb = mf.reshape(bshape)

    if tau > 0:
        y = jnp.where(M_mask.reshape(bshape), y, 0)

        def op(x):
            return mfb * x + tau * matvec(L, x)

        sol, _ = jax.scipy.sparse.linalg.cg(op, y)
        return sol
    else:
        if int(np.prod(np.shape(M))) != G.n_vertices:
            raise ValueError('M should be of size [G.n_vertices,]')
        yl = jnp.where(M_mask.reshape(bshape), y, 0)
        # rhs_u = W_ul y_l = -(L y_masked) on unknown rows
        rhs = -matvec(L, yl)
        ub = (~M_mask).astype(y.dtype).reshape(bshape)
        rhs = ub * rhs

        def op(x):
            # L_uu x_u: zero the labeled entries in and out
            return ub * matvec(L, ub * x) + mfb * x  # identity on labeled

        sol_u, _ = jax.scipy.sparse.linalg.cg(op, rhs, maxiter=1000)
        return jnp.where(M_mask.reshape(bshape), y, sol_u)


def classification_tikhonov(G, y, M, tau=0):
    """One-hot → logits → Tikhonov regression (``learning.py:183-253``).

    Examples
    --------
    >>> import numpy as np
    >>> from pygsp_tpu import graphs, learning
    >>> G = graphs.Sensor(64, seed=42)
    >>> mask = np.zeros(64, bool); mask[::2] = True
    >>> labels = (np.arange(64) >= 32).astype(float)
    >>> out = learning.classification_tikhonov(G, np.where(mask, labels, 0),
    ...                                        mask, tau=0.1)
    >>> np.asarray(out).shape             # one score column per class
    (64, 2)

    """
    y = np.asarray(y).copy()
    y[np.asarray(M) == False] = 0  # noqa: E712
    Y = _to_logits(y)
    return regression_tikhonov(G, jnp.asarray(Y), M, tau)


def classification_tikhonov_simplex(G, y, M, tau=0.1, maxit=500, tol=1e-8,
                                    verbosity=None):
    """Simplex-constrained Tikhonov classification by projected
    forward–backward splitting (``learning.py:42-180``), implemented as a
    self-contained ``lax``-style iteration (no pyunlocbox)."""
    if tau <= 0:
        raise ValueError('Tau should be greater than 0.')

    y = np.asarray(y).copy()
    M_np = np.asarray(M)
    y[M_np == False] = 0  # noqa: E712
    Y = jnp.asarray(_to_logits(y))
    Y = Y * jnp.asarray(M_np, dtype=Y.dtype)[:, None]

    mf = jnp.asarray(M_np, dtype=Y.dtype)
    L = G.L
    step = 0.5 / (1.0 + tau * G.lmax)

    def grad(x):
        return 2 * (mf[:, None] * (mf[:, None] * x - Y) + tau * matvec(L, x))

    def proj_simplex(v):
        """Euclidean projection of each row onto the probability simplex."""
        d = v.shape[1]
        u = jnp.sort(v, axis=1)[:, ::-1]
        css = jnp.cumsum(u, axis=1) - 1.0
        ind = jnp.arange(1, d + 1)
        cond = u - css / ind > 0
        rho = jnp.sum(cond, axis=1)
        lam = css[jnp.arange(v.shape[0]), rho - 1] / rho
        return jnp.maximum(v - lam[:, None], 0.0)

    # whole FBS iteration runs device-side: a host convergence read per
    # step costs a tunnel round trip each on a remote TPU
    def cond(carry):
        _, it, diff = carry
        return jnp.logical_and(it < maxit, diff > tol)

    def body(carry):
        x, it, _ = carry
        x_new = proj_simplex(x - step * grad(x))
        return x_new, it + 1, jnp.max(jnp.abs(x_new - x))

    x, _, _ = jax.lax.while_loop(
        cond, body, (Y, jnp.asarray(0), jnp.asarray(jnp.inf, Y.dtype)))
    return x
