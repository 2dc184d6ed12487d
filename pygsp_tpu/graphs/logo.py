"""GSP logo graph (reference: ``pygsp/graphs/logo.py:21-33``)."""

import numpy as np

from pygsp_tpu import utils
from pygsp_tpu.graphs.graph import Graph


class Logo(Graph):
    """GSP logo graph, N=1130, from the bundled ``logogsp`` asset.

    Examples
    --------
    >>> from pygsp_tpu import graphs
    >>> G = graphs.Logo()
    >>> G.N, G.Ne
    (1130, 3131)
    >>> sorted(G.info)               # the three sub-glyph index sets
    ['idx_g', 'idx_p', 'idx_s']

    """

    def __init__(self, **kwargs):
        data = utils.loadmat('logogsp')
        self.info = {
            'idx_g': data['idx_g'] - 1,
            'idx_s': data['idx_s'] - 1,
            'idx_p': data['idx_p'] - 1,
        }
        plotting = {'limits': np.array([0, 640, -400, 0])}
        super().__init__(data['W'], coords=data['coords'],
                         plotting=plotting, **kwargs)
