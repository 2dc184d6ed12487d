"""Feature extraction (role of ``pygsp/features.py``).

The spectrogram computes all M shifted-kernel TIG norms in ONE filtering
pass: the M Gaussian shifts form a single (M)-filter bank applied to the
identity through the shared Chebyshev recurrence, instead of the
reference's M separate ``compute_frame`` calls (``features.py:86-92``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pygsp_tpu import filters as _filters
from pygsp_tpu import utils


def compute_avg_adj_deg(G):
    """Average degree of a vertex and its neighbors
    (``features.py:11-23``). NOTE the reference computes a BOOLEAN
    adjacency product (2-step reachability counts, not 2-path counts);
    matched here.

    Examples
    --------
    >>> import numpy as np
    >>> from pygsp_tpu import graphs, features
    >>> G = graphs.Ring(8)
    >>> print(np.round(np.asarray(features.compute_avg_adj_deg(G)), 1))
    [1. 1. 1. 1. 1. 1. 1. 1.]

    """
    A = G.W > 0
    reach2 = ((A @ A) > 0)
    return np.asarray(reach2.sum(axis=1)).ravel().astype(float) / \
        (np.asarray(A.sum(axis=1)).ravel() + 1.0)


@utils.filterbank_handler
def compute_tig(g, i=0, **kwargs):
    """Frame of one kernel: ``T_i g(n) = g(L)_{i,n}`` (``features.py:27-41``).

    Examples
    --------
    >>> import numpy as np
    >>> from pygsp_tpu import graphs, filters, features
    >>> G = graphs.Sensor(64, seed=42)
    >>> G.estimate_lmax()
    >>> g = filters.Heat(G, scale=[5, 20])
    >>> np.asarray(features.compute_tig(g)).shape   # (Nf, N, N) atoms
    (2, 64, 64)

    """
    return _filters.Filter(g.G, g._kernels[i]).compute_frame(**kwargs)


@utils.filterbank_handler
def compute_norm_tig(g, i=0, **kwargs):
    """ℓ2 norm of the TIG rows (``features.py:45-59``)."""
    tig = compute_tig(g, i=i, **kwargs)
    return jnp.linalg.norm(tig.reshape(g.G.N, -1), axis=1)


def compute_spectrogram(G, atom=None, M=100, **kwargs):
    """Graph spectrogram: vertex-wise energy of M spectrum-shifted kernels
    (``features.py:62-94``), evaluated as one M-filter bank."""
    if atom is None:
        def atom(x):
            return jnp.exp(-M * (x / G.lmax) ** 2)

    scale = np.linspace(0, G.lmax, M)
    kernels = [lambda x, s=s: atom(x - s) for s in scale]
    bank = _filters.Filter(G, kernels)

    # filter all N deltas through all M kernels in one shot:
    # out[:, n, m] = (g_m(L) δ_n)  → norm over first axis
    s = jnp.identity(G.N)
    out = bank.filter(s, **kwargs)            # (N, N, M)
    spectr = jnp.linalg.norm(out, axis=0) ** 2  # (N, M)
    G.spectr = np.asarray(spectr)
    return G.spectr
