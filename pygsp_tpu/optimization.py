"""Convex optimization on graphs (role of ``pygsp/optimization.py``).

``prox_tv`` is a working, dependency-free implementation: the reference's
version references undefined names (``G.Diff``, ``D``, ``verbose`` —
``optimization.py:85-102``) and needs pyunlocbox; here the TV proximal
operator is solved by dual projected gradient (Chambolle-style) on the
graph gradient/divergence kernels.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from pygsp_tpu import utils

logger = utils.build_logger(__name__)


def prox_tv(x, gamma, G, A=None, At=None, nu=1, tol=1e-4, maxit=200,
            use_matrix=None):
    r"""Total-variation proximal operator:
    ``argmin_z ½‖x − z‖² + γ ‖∇_G z‖₁``.

    Solved in the dual: ``z = x − div(p)`` with ``p`` the dual variable
    constrained to ‖p‖∞ ≤ γ, updated by projected gradient ascent with step
    1/(2·lmax·ν) (the gradient operator's norm bound the reference also
    uses, ``optimization.py:84``).

    Examples
    --------
    >>> import numpy as np
    >>> from pygsp_tpu import graphs, optimization
    >>> G = graphs.Sensor(64, seed=42)
    >>> G.compute_differential_operator()
    >>> x = np.random.default_rng(0).normal(size=64)
    >>> y = np.asarray(optimization.prox_tv(x, gamma=3.0, G=G))
    >>> bool(np.var(y) < np.var(x))       # TV prox smooths along edges
    True

    """
    if A is None:
        A = lambda z: z
    if At is None:
        At = lambda z: z

    x = jnp.asarray(x)
    if G._D is None:
        G.compute_differential_operator()
    D = G.D

    step = 1.0 / (2.0 * G.lmax * nu)

    p0 = jnp.zeros((G.n_edges,) + x.shape[1:], dtype=x.dtype)

    # whole dual ascent runs device-side (lax.while_loop): a host-synced
    # convergence read per iteration costs a tunnel round trip each on a
    # remote TPU, dwarfing the iteration itself
    def cond(carry):
        _, _, rel, it = carry
        return jnp.logical_and(it < maxit, rel >= tol)

    def body(carry):
        p, obj_prev, _, it = carry
        z = x - At(D.div(p))
        grad_z = D.grad(A(z))
        # project onto the ∞-ball of radius gamma (elementwise clamp)
        p = jnp.clip(p + step * grad_z, -gamma, gamma)
        obj = 0.5 * jnp.sum((x - z) ** 2) + gamma * jnp.sum(jnp.abs(grad_z))
        rel = jnp.abs(obj - obj_prev) / jnp.maximum(jnp.abs(obj), 1e-30)
        return p, obj, rel, it + 1

    p, _, _, _ = lax.while_loop(
        cond, body, (p0, jnp.asarray(jnp.inf, x.dtype),
                     jnp.asarray(jnp.inf, x.dtype), jnp.asarray(0)))

    return x - At(D.div(p))
