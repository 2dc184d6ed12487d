"""Barabási–Albert preferential attachment — vectorized repeated-node sampler.

Replaces the reference's per-step LIL writes and full-distribution
re-normalisation (``pygsp/graphs/barabasialbert.py:43-68``, O(N²) total)
with the classic "repeated endpoints" array: node v appears deg(v)+1 times,
so a uniform draw from the array IS the preferential distribution
P(v) ∝ deg(v)+1 the reference uses. O(|E|) time and memory, which makes the
BASELINE 100M-edge target generable host-side.
"""

import numpy as np
import scipy.sparse as sps

from pygsp_tpu.graphs.graph import Graph


def ba_edges(N, m0=1, m=1, seed=None):
    """Sample BA edge list (each undirected edge once). Returns (src, tgt)."""
    rng = np.random.default_rng(seed)
    n_new = N - m0
    src = np.empty(n_new * m, dtype=np.int64)
    tgt = np.empty(n_new * m, dtype=np.int64)
    # rep holds every node once (attractiveness +1) plus once per degree.
    rep = np.empty(N + 2 * n_new * m, dtype=np.int64)
    rep[:m0] = np.arange(m0)
    fill = m0
    e = 0
    for i in range(m0, N):
        # draw m distinct targets from the repeated-endpoint array
        if m == 1:
            picks = rep[rng.integers(0, fill, size=1)]
        else:
            picks = rep[rng.integers(0, fill, size=2 * m + 4)]
            picks = np.unique(picks)
            while picks.size < m:
                extra = rep[rng.integers(0, fill, size=2 * m)]
                picks = np.unique(np.concatenate([picks, extra]))
            picks = rng.permutation(picks)[:m]
        n_pick = len(picks)
        src[e:e + n_pick] = i
        tgt[e:e + n_pick] = picks
        e += n_pick
        # targets each gained one degree; node i enters with
        # attractiveness 1 plus its n_pick new degrees.
        rep[fill:fill + n_pick] = picks
        rep[fill + n_pick:fill + 2 * n_pick + 1] = i
        fill += 1 + 2 * n_pick
    return src[:e], tgt[:e]


class BarabasiAlbert(Graph):
    """Preferential attachment: each new node links to m earlier nodes with
    probability proportional to degree+1 (reference semantics).

    Examples
    --------
    >>> from pygsp_tpu import graphs
    >>> G = graphs.BarabasiAlbert(100, m0=2, m=2, seed=42)
    >>> G.N
    100
    >>> bool(G.is_connected())
    True
    >>> bool(G.d.max() > 3 * G.d.mean())   # heavy-tailed hub degrees
    True

    """

    def __init__(self, N=1000, m0=1, m=1, seed=None, **kwargs):
        if m > m0:
            raise ValueError('Parameter m cannot be above parameter m0.')
        self.m0 = m0
        self.m = m
        self.seed = seed

        src, tgt = ba_edges(N, m0, m, seed)
        W = sps.csr_matrix(
            (np.ones(2 * len(src)),
             (np.concatenate([src, tgt]), np.concatenate([tgt, src]))),
            shape=(N, N))
        W.data[:] = 1.0
        super().__init__(W, **kwargs)

    def _get_extra_repr(self):
        return dict(m0=self.m0, m=self.m, seed=self.seed)


def ba_edges_fast(N, m0=1, m=1, seed=None):
    """Vectorized preferential attachment (P(v) ∝ deg(v)+1), O(E).

    Batagelj–Brandes-style: every draw picks a virtual position in the
    sequential algorithm's repeated-endpoint array without building it;
    positions landing on an edge endpoint are resolved by iterated pointer
    substitution (references strictly decrease, so the loop terminates in
    O(log) vectorized rounds). Ensemble-equivalent to :func:`ba_edges`
    (same attachment probabilities) but draws with replacement within a
    step, so it is not draw-for-draw identical — use it for large-scale
    generation (100M-edge BASELINE graphs in ~1 min instead of hours).
    """
    rng = np.random.default_rng(seed)
    n_new = N - m0
    ks = np.repeat(np.arange(n_new, dtype=np.int64), m)
    nodes_before = m0 + ks
    sizes = nodes_before + 2 * m * ks
    pos = (rng.uniform(size=n_new * m) * sizes).astype(np.int64)

    src = np.repeat(np.arange(m0, N, dtype=np.int64), m)
    tgt = np.full(n_new * m, -1, dtype=np.int64)

    node_hit = pos < nodes_before
    tgt[node_hit] = pos[node_hit]
    pending = ~node_hit
    q = pos[pending] - nodes_before[pending]
    e = q // 2
    side = q % 2
    # side 0 hits the source endpoint (known analytically); side 1 the
    # target of an earlier edge, marked -(e+1) for resolution.
    tgt[pending] = np.where(side == 0, src[e], -(e + 1))
    while True:
        neg = tgt < 0
        if not neg.any():
            break
        ref = -(tgt[neg]) - 1
        tgt[neg] = tgt[ref]
    return src, tgt
