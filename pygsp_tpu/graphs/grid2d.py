"""2-D grid graph (reference: ``pygsp/graphs/grid2d.py:40-89``)."""

import numpy as np
import scipy.sparse as sps

from pygsp_tpu.graphs.graph import Graph


class Grid2d(Graph):
    """N1×N2 4-neighbor grid, optional weighted diagonal links.

    Examples
    --------
    >>> from pygsp_tpu import graphs
    >>> G = graphs.Grid2d(4, 3)
    >>> G.N, G.Ne                    # 4*2 + 3*3 grid edges
    (12, 17)
    >>> G.coords.shape
    (12, 2)

    """

    def __init__(self, N1=16, N2=None, diagonal=0.0, **kwargs):
        if N2 is None:
            N2 = N1
        self.N1, self.N2 = N1, N2
        n = N1 * N2

        # horizontal links (stride 1, broken at row ends) + vertical (stride N2)
        diag1 = np.ones(n - 1)
        diag1[N2 - 1::N2] = 0
        diag2 = np.ones(n - N2)
        W = sps.diags([diag1, diag2], offsets=[-1, -N2], shape=(n, n),
                      format='csr', dtype=float)

        if min(N1, N2) > 1 and diagonal != 0.0:
            diag3 = np.full(n - N2 - 1, diagonal)
            diag3[N2 - 1::N2] = 0
            diag4 = np.full(n - N2 + 1, diagonal)
            diag4[0::N2] = 0
            W = W + sps.diags([diag3, diag4], offsets=[-N2 - 1, -N2 + 1],
                              shape=(n, n), format='csr', dtype=float)

        W = W + W.T  # strictly lower triangular by construction

        xs = np.tile(np.arange(N2) / N2, N1)
        ys = np.repeat(np.arange(N1)[::-1] / N1, N2)
        coords = np.stack([xs, ys], axis=1)

        plotting = {'limits': np.array([-1. / N2, 1 + 1. / N2,
                                        1. / N1, 1 + 1. / N1])}
        super().__init__(W, coords=coords, plotting=plotting, **kwargs)

    def _get_extra_repr(self):
        return dict(N1=self.N1, N2=self.N2)
