"""Grid + image-patch aggregate graph
(reference: ``pygsp/graphs/nngraphs/grid2dimgpatches.py:37-47``)."""

from pygsp_tpu.graphs.graph import Graph
from pygsp_tpu.graphs.grid2d import Grid2d
from pygsp_tpu.graphs.nngraphs.imgpatches import ImgPatches


class Grid2dImgPatches(Graph):
    """Aggregation (default: sum) of a pixel-grid graph and a patch graph.

    Examples
    --------
    >>> import numpy as np
    >>> from pygsp_tpu import graphs
    >>> img = np.random.default_rng(0).random((8, 8))
    >>> G = graphs.Grid2dImgPatches(img)
    >>> G.N
    64
    >>> G.coords.shape               # grid layout for plotting
    (64, 2)

    """

    def __init__(self, img, aggregate=lambda Wp, Wg: Wp + Wg, **kwargs):
        self.Gg = Grid2d(img.shape[0], img.shape[1])
        self.Gp = ImgPatches(img, **kwargs)
        W = aggregate(self.Gp.W, self.Gg.W)
        super().__init__(W, coords=self.Gg.coords, plotting=self.Gg.plotting)

    def _get_extra_repr(self):
        attrs = self.Gg._get_extra_repr()
        attrs.update(self.Gp._get_extra_repr())
        return attrs
