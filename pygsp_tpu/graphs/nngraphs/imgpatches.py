"""Image-patch graph (reference: ``pygsp/graphs/nngraphs/imgpatches.py:51-105``).

Patch extraction uses ``numpy.lib.stride_tricks.sliding_window_view``
instead of the reference's scikit-image dependency.
"""

import numpy as np

from pygsp_tpu.graphs.nngraphs.nngraph import NNGraph


class ImgPatches(NNGraph):
    """kNN graph over local image patches (one vertex per pixel).

    Examples
    --------
    >>> import numpy as np
    >>> from pygsp_tpu import graphs
    >>> img = np.random.default_rng(0).random((8, 8))
    >>> G = graphs.ImgPatches(img, patch_shape=(3, 3))
    >>> G.N                          # one vertex per pixel
    64
    >>> G.coords.shape               # features: the 3x3 patch per pixel
    (64, 9)

    """

    def __init__(self, img, patch_shape=(3, 3), **kwargs):
        self.img = img
        self.patch_shape = patch_shape

        img = np.asarray(img)
        if img.ndim == 2:
            h, w = img.shape
            d = 0
        elif img.ndim == 3:
            h, w, d = img.shape
        else:
            raise ValueError('Image should be a 2D or 3D array.')

        try:
            r, c = patch_shape
        except (TypeError, ValueError):
            r = c = patch_shape[0] if np.iterable(patch_shape) else patch_shape

        pad_width = [(int((r - 0.5) / 2.0), int((r + 0.5) / 2.0)),
                     (int((c - 0.5) / 2.0), int((c + 0.5) / 2.0))]
        if d == 0:
            window_shape = (r, c)
            d = 1
        else:
            pad_width.append((0, 0))
            window_shape = (r, c, d)

        img = np.pad(img, pad_width=pad_width, mode='symmetric')
        patches = np.lib.stride_tricks.sliding_window_view(img, window_shape)
        patches = patches.reshape((h * w, r * c * d))

        super().__init__(patches, **kwargs)

    def _get_extra_repr(self):
        attrs = dict(patch_shape=self.patch_shape)
        attrs.update(super()._get_extra_repr())
        return attrs
