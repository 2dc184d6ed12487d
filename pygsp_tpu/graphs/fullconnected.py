"""Fully connected graph (reference: ``pygsp/graphs/fullconnected.py:27-31``)."""

import numpy as np

from pygsp_tpu.graphs.graph import Graph


class FullConnected(Graph):
    """All-ones adjacency minus the diagonal.

    Examples
    --------
    >>> from pygsp_tpu import graphs
    >>> G = graphs.FullConnected(8)
    >>> G.N, G.Ne
    (8, 28)
    >>> bool((G.d == 7).all())
    True

    """

    def __init__(self, N=10, **kwargs):
        W = np.ones((N, N)) - np.identity(N)
        plotting = {'limits': np.array([-1, 1, -1, 1])}
        super().__init__(W, plotting=plotting, **kwargs)
