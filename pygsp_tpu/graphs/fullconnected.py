"""Fully connected graph (reference: ``pygsp/graphs/fullconnected.py:27-31``)."""

import numpy as np

from pygsp_tpu.graphs.graph import Graph


class FullConnected(Graph):
    """All-ones adjacency minus the diagonal."""

    def __init__(self, N=10, **kwargs):
        W = np.ones((N, N)) - np.identity(N)
        plotting = {'limits': np.array([-1, 1, -1, 1])}
        super().__init__(W, plotting=plotting, **kwargs)
