"""Stanford bunny (reference: ``pygsp/graphs/nngraphs/bunny.py:25-43``)."""

from pygsp_tpu import utils
from pygsp_tpu.graphs.nngraphs.nngraph import NNGraph


class Bunny(NNGraph):
    """Stanford bunny point cloud (2503 points), radius-NN graph.

    Examples
    --------
    >>> from pygsp_tpu import graphs
    >>> G = graphs.Bunny()
    >>> G.N, G.Ne
    (2503, 78292)
    >>> G.coords.shape
    (2503, 3)

    """

    def __init__(self, **kwargs):
        data = utils.loadmat('bunny')
        plotting = {'vertex_size': 10, 'elevation': -90, 'azimuth': 90,
                    'distance': 8}
        super().__init__(Xin=data['bunny'], epsilon=0.02, NNtype='radius',
                         center=False, rescale=False, plotting=plotting,
                         **kwargs)
