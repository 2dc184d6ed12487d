"""Plotting (role of ``pygsp/plotting.py``, matplotlib backend).

The reference has matplotlib + pyqtgraph backends (``plotting.py:31``);
here the interactive pyqtgraph path is out of scope and matplotlib is the
single backend. Device arrays are pulled to host automatically.
"""

from __future__ import annotations

import numpy as np

from pygsp_tpu import utils

_logger = utils.build_logger(__name__)

BACKEND = 'matplotlib'
_plt_figures = []


def _import_plt():
    try:
        import matplotlib.pyplot as plt
    except ImportError as e:
        raise ImportError(f'Cannot import matplotlib. Original exception: {e}')
    return plt


def close_all():
    """Close all opened figures (reference ``plotting.py:125``)."""
    plt = _import_plt()
    plt.close('all')


def show(*args, **kwargs):
    _import_plt().show(*args, **kwargs)


def close(*args, **kwargs):
    _import_plt().close(*args, **kwargs)


def _coerce(x):
    return np.asarray(x)


def plot_graph(G, vertex_color=None, vertex_size=None, highlight=[],
               edges=None, edge_color=None, edge_width=None, indices=False,
               colorbar=True, limits=None, ax=None, title=None, backend=None):
    """Scatter the vertices (optionally signal-colored) and draw edges
    (reference ``_plot_graph``, ``plotting.py:326-640``)."""
    if G.coords is None:
        raise AttributeError('Graph has no coordinate set. '
                             'Please run G.set_coordinates() first.')
    coords = _coerce(G.coords)
    if coords.ndim == 1:
        coords = np.stack([coords, np.zeros_like(coords)], axis=1)
    dim = coords.shape[1]
    if dim not in (2, 3):
        raise AttributeError('Coordinates should be in 2D or 3D space.')

    plt = _import_plt()
    if ax is None:
        fig = plt.figure()
        ax = fig.add_subplot(111, projection='3d' if dim == 3 else None)
        _plt_figures.append(fig)

    if edges is None:
        edges = G.Ne < 10e3  # edge-drawing guardrail (reference :501)
    if edge_color is None:
        edge_color = G.plotting.get('edge_color', (0.5, 0.5, 0.5, 0.5))
    if edge_width is None:
        edge_width = G.plotting.get('edge_width', 1)
    if vertex_size is None:
        vertex_size = G.plotting.get('vertex_size', 100)

    if edges:
        sources, targets, _ = G.get_edge_list()
        segments = np.stack([coords[sources], coords[targets]], axis=1)
        if dim == 2:
            from matplotlib.collections import LineCollection
            lc = LineCollection(segments, color=edge_color,
                                linewidth=edge_width, zorder=1)
            ax.add_collection(lc)
        else:
            from mpl_toolkits.mplot3d.art3d import Line3DCollection
            lc = Line3DCollection(segments, color=edge_color,
                                  linewidth=edge_width)
            ax.add_collection3d(lc)

    c = None
    if vertex_color is not None:
        c = _coerce(vertex_color).squeeze()
        if c.ndim > 1:
            c = c[:, 0]
    sc = ax.scatter(*coords.T, s=vertex_size, c=c, zorder=2)
    if c is not None and colorbar and dim == 2:
        plt.colorbar(sc, ax=ax)

    for i in highlight if np.iterable(highlight) else [highlight]:
        ax.scatter(*coords[i].T, s=2 * vertex_size,
                   color=G.plotting.get('highlight_color', 'C1'), zorder=3)

    if indices:
        for i in range(G.N):
            ax.annotate(str(i), (coords[i, 0], coords[i, 1]), zorder=4)

    if limits is None:
        limits = G.plotting.get('limits')
    if limits is not None and dim == 2 and len(limits) >= 4:
        ax.set_xlim(limits[0], limits[1])
        ax.set_ylim(limits[2], limits[3])
    ax.set_title(title if title is not None else G.__repr__(limit=4))
    if dim == 2:
        ax.set_aspect('equal', adjustable='datalim')
    return ax


def plot_filter(g, n=500, eigenvalues=None, sum=None, labels=None, title=None,
                ax=None, **kwargs):
    """Plot kernel response curves and their squared sum
    (reference ``_plot_filter``, ``plotting.py:199-323``)."""
    G = g.G
    if eigenvalues is None:
        eigenvalues = G._e is not None
    if sum is None:
        sum = g.n_filters > 1
    if labels is None:
        labels = g.n_filters > 1

    plt = _import_plt()
    if ax is None:
        fig = plt.figure()
        ax = fig.add_subplot(111)
        _plt_figures.append(fig)

    x = np.linspace(0, G.lmax, n)
    y = _coerce(g.evaluate(x)).T.squeeze()
    lines = ax.plot(x, y, **kwargs)

    if eigenvalues:
        for e in _coerce(G.e):
            ax.axvline(x=e, color=[0.9] * 3, linewidth=1, zorder=0)
    if sum:
        ax.plot(x, np.sum(_coerce(g.evaluate(x)) ** 2, axis=0), 'k',
                linewidth=1)
    if labels and y.ndim > 1:
        for i, line in enumerate(lines):
            line.set_label(f'g{i}')
        ax.legend()

    ax.set_xlabel(r"laplacian's eigenvalues / graph frequencies")
    ax.set_ylabel(r'filter response')
    ax.set_title(title if title is not None else repr(g))
    return ax


def plot_spectrogram(G, node_idx=None, ax=None, **kwargs):
    """Heatmap of the graph spectrogram
    (reference ``_plot_spectrogram``, ``plotting.py:722-787`` —
    pyqtgraph there, matplotlib here)."""
    from pygsp_tpu import features

    if not hasattr(G, 'spectr') or G.spectr is None:
        features.compute_spectrogram(G, **kwargs)

    M = G.spectr.shape[1]
    spectr = G.spectr[node_idx] if node_idx is not None else G.spectr
    spectr = np.ravel(spectr).reshape(-1, M)
    spectr = spectr / spectr.max()

    plt = _import_plt()
    if ax is None:
        fig = plt.figure()
        ax = fig.add_subplot(111)
        _plt_figures.append(fig)
    ax.imshow(spectr.T, origin='lower', aspect='auto')
    ax.set_xlabel('nodes')
    ax.set_ylabel('frequencies')
    ax.set_title(f'spectrogram of {type(G).__name__}')
    return ax


# pygsp-compatible aliases
_plot_graph = plot_graph
_plot_filter = plot_filter
_plot_spectrogram = plot_spectrogram
