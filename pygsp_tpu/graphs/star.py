"""Star graph (reference: ``pygsp/graphs/star.py:31-37``)."""

from pygsp_tpu.graphs.comet import Comet


class Star(Comet):
    """Star = comet with all N-1 vertices as rays."""

    def __init__(self, N=10, **kwargs):
        plotting = dict(limits=[-1.1, 1.1, -1.1, 1.1])
        plotting.update(kwargs.pop('plotting', {}))
        super().__init__(N, N - 1, plotting=plotting, **kwargs)

    def _get_extra_repr(self):
        return dict()
