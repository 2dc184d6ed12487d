"""Host-side utilities: logging, symmetrization, distances, scales, assets.

Behavior-compatible with the reference's ``pygsp/utils.py`` (cited per
function); these run on host NumPy/SciPy because they are graph-construction
and preprocessing helpers, not compute-path code.
"""

from __future__ import annotations

import functools
import logging
import os

import numpy as np
import scipy.sparse as sps

_DATA_DIR = os.path.join(os.path.dirname(__file__), 'data')


def build_logger(name: str) -> logging.Logger:
    """Per-module logger (role of ``utils.build_logger``, ``utils.py:16-31``)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(
            '%(asctime)s:[%(levelname)s](%(name)s.%(funcName)s): %(message)s'))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


def symmetrize(W, method: str = 'average'):
    """Symmetrize a square (sparse or dense) matrix.

    Methods match ``utils.symmetrize`` (``utils.py:184-277``):
    'average', 'maximum', 'fill' (fill zeros from transpose, average
    ambiguous), 'tril'/'triu' (keep one triangle, mirror it).

    Examples
    --------
    >>> import numpy as np
    >>> W = np.array([[0., 3.], [1., 0.]])
    >>> symmetrize(W, 'average')
    array([[0., 2.],
           [2., 0.]])
    >>> symmetrize(W, 'maximum')
    array([[0., 3.],
           [3., 0.]])
    """
    if W.shape[0] != W.shape[1]:
        raise ValueError('Matrix must be square.')
    issp = sps.issparse(W)
    if method == 'average':
        return (W + W.T) / 2
    if method == 'maximum':
        if issp:
            bigger = W.T > W
            return W - W.multiply(bigger) + W.T.multiply(bigger)
        return np.maximum(W, W.T)
    if method == 'fill':
        A = W > 0
        if issp:
            mask = (A + A.T) - A
            W = W + mask.multiply(W.T)
        else:
            mask = np.logical_xor(np.logical_or(A, A.T), A)
            W = W + mask * W.T
        return symmetrize(W, method='average')
    if method in ('tril', 'triu'):
        tri = getattr(sps if issp else np, method)
        return symmetrize(tri(W), method='maximum')
    raise ValueError(f'Unknown symmetrization method {method!r}')


def distanz(x, y=None):
    """Pairwise Euclidean distances between columns of x and y.

    x, y: (d, Nx), (d, Ny) (1-D inputs are promoted to one row);
    returns (Nx, Ny). Role of ``utils.distanz`` (``utils.py:84-137``).

    Examples
    --------
    >>> import numpy as np
    >>> distanz(np.arange(3))
    array([[0., 1., 2.],
           [1., 0., 1.],
           [2., 1., 0.]])
    """
    x = np.asarray(x, dtype=float)
    x = x.reshape(1, -1) if x.ndim == 1 else x
    y = x if y is None else np.asarray(y, dtype=float)
    y = y.reshape(1, -1) if y.ndim == 1 else y
    if x.shape[0] != y.shape[0]:
        raise ValueError('The sizes of x and y do not fit')
    xx = np.sum(x * x, axis=0)
    yy = np.sum(y * y, axis=0)
    d2 = np.abs(xx[:, None] + yy[None, :] - 2.0 * (x.T @ y))
    return np.sqrt(d2)


def resistance_distance(G):
    """Resistance-distance matrix from a combinatorial Laplacian.

    Accepts a Graph or a sparse Laplacian. Role of
    ``utils.resistance_distance`` (``utils.py:140-181``): uses the
    (pseudo-)inverse of L — only sensible for small graphs; large-scale
    sparsification uses sketched estimates instead.
    """
    if sps.issparse(G):
        L = G.tocsc()
    else:
        if G.lap_type != 'combinatorial':
            raise ValueError('Need a combinatorial Laplacian.')
        L = sps.csc_matrix(G.L.to_scipy())
    pseudo = np.linalg.pinv(L.toarray())
    d = np.diagonal(pseudo)
    rd = d[:, None] + d[None, :] - pseudo - pseudo.T
    return sps.csc_matrix(rd)


def rescale_center(x):
    """Rescale and center point-cloud coordinates into [-1, 1].

    x: (d, N). Role of ``utils.rescale_center`` (``utils.py:280-309``).
    """
    x = np.asarray(x, dtype=float)
    n = x.shape[1]
    y = x - np.kron(np.ones((1, n)), np.mean(x, axis=1)[:, None])
    c = np.amax(np.abs(y))
    return y / c


def compute_log_scales(lmin: float, lmax: float, n_scales: int,
                       t1: float = 1.0, t2: float = 2.0):
    """Log-spaced wavelet scales between heuristic bounds.

    Role of ``utils.compute_log_scales`` (``utils.py:312-339``):
    scales span [t1/lmax, t2/lmin] geometrically, largest first.
    """
    scale_min = t1 / lmax
    scale_max = t2 / lmin
    return np.exp(np.linspace(np.log(scale_max), np.log(scale_min), n_scales))


def loadmat(name: str) -> dict:
    """Load a bundled point-cloud/graph asset.

    Assets are the reference's ``pygsp/data/pointclouds/*.mat`` converted to
    ``.npz`` (role of ``utils.loadmat``, ``utils.py:56-81``); same keys.
    """
    if name.startswith('pointclouds/'):
        name = name[len('pointclouds/'):]
    path = os.path.join(_DATA_DIR, 'pointclouds', name + '.npz')
    with np.load(path, allow_pickle=False) as data:
        raw = {k: data[k] for k in data.files}
    out = {}
    for key, value in raw.items():
        if '__sparse_' in key:
            base, part = key.split('__sparse_')
            if base in out or part != 'row':
                continue
            out[base] = sps.csc_matrix(
                (raw[f'{base}__sparse_data'],
                 (raw[f'{base}__sparse_row'], raw[f'{base}__sparse_col'])),
                shape=tuple(raw[f'{base}__sparse_shape']))
        else:
            out[key] = value
    return out


def filterbank_handler(func):
    """Map a per-kernel function over a whole filter bank.

    Role of ``utils.filterbank_handler`` (``utils.py:37-53``): calls
    ``func(f, ..., i=k)`` for each of the bank's kernels and stacks results.
    Retained for API familiarity; the native path evaluates banks vectorized.
    """
    @functools.wraps(func)
    def wrapper(f, *args, **kwargs):
        if 'i' in kwargs:
            return func(f, *args, **kwargs)
        n = f.n_filters if hasattr(f, 'n_filters') else len(f.g)
        if n <= 1:
            return func(f, *args, i=0, **kwargs)
        return [func(f, *args, i=i, **kwargs) for i in range(n)]
    return wrapper
