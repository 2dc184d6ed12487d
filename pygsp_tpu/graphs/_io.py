"""Graph import/export (role of ``pygsp/graphs/_io.py:30-560``).

NetworkX interop + GML/GraphML/GEXF file formats. graph-tool export is
supported when the optional dependency is installed (it is not bundled).
"""

from __future__ import annotations

import os

import numpy as np


def _import_networkx():
    try:
        import networkx as nx
    except ImportError as e:
        raise ImportError('Cannot import networkx. Use graph-tool or try to '
                          'install it with pip (or conda) install networkx. '
                          f'Original exception: {e}')
    return nx


def _break_signals(signals):
    """Split N-d signals into 1-d ones named ``name_i``
    (reference ``_io.py:30-36``)."""
    out = {}
    for name, sig in signals.items():
        if sig.ndim == 2:
            for i, col in enumerate(sig.T):
                out[f'{name}_{i}'] = col
        else:
            out[name] = sig
    return out


def _join_signals(signals):
    """Rejoin ``name_i`` 1-d signals into N-d ones
    (reference ``_io.py:38-52``)."""
    groups = {}
    for name in signals:
        base = name.rsplit('_', 1)[0]
        groups.setdefault(base, []).append(name)
    for base, names in groups.items():
        if len(names) > 1:
            names = sorted(names)
            signals[base] = np.stack([signals[n] for n in names], axis=1)
            for n in names:
                del signals[n]
    return signals


def to_networkx(G):
    """Export to a (Di)Graph with edge 'weight' and per-signal node
    attributes (reference ``_io.py:54-142``).

    Examples
    --------
    >>> from pygsp_tpu import graphs
    >>> from pygsp_tpu.graphs import _io
    >>> nx_graph = _io.to_networkx(graphs.Ring(8))
    >>> nx_graph.number_of_nodes(), nx_graph.number_of_edges()
    (8, 8)

    """
    nx = _import_networkx()

    def convert(x):
        if issubclass(np.asarray(x).dtype.type, (np.integer, np.bool_)):
            return int(x)
        return float(x)

    signals = _break_signals(G.signals)
    graph = nx.DiGraph() if G.is_directed() else nx.Graph()
    graph.name = type(G).__name__
    for vertex in range(G.n_vertices):
        attrs = {name: convert(sig[vertex]) for name, sig in signals.items()}
        graph.add_node(vertex, **attrs)
    for source, target, weight in zip(*G.get_edge_list()):
        graph.add_edge(int(source), int(target), weight=convert(weight))
    return graph


def from_networkx(graph, weight='weight'):
    """Import from NetworkX; node attributes become signals (NaN where
    unset); multiedges aggregate by summation (reference ``_io.py:220-299``).

    Examples
    --------
    >>> from pygsp_tpu import graphs
    >>> from pygsp_tpu.graphs import _io
    >>> G = _io.from_networkx(_io.to_networkx(graphs.Ring(8)))
    >>> G.N, G.Ne                        # lossless roundtrip
    (8, 8)

    """
    nx = _import_networkx()
    from pygsp_tpu.graphs.graph import Graph

    adjacency = nx.to_scipy_sparse_array(graph, weight=weight)
    G = Graph(adjacency)

    signals = {}
    for i, node in enumerate(graph.nodes()):
        for name, value in graph.nodes[node].items():
            if name not in signals:
                signals[name] = np.full(G.n_vertices, np.nan)
            signals[name][i] = value
    G.signals.update(_join_signals(signals))
    return G


def to_graphtool(G):
    """Export to graph-tool (optional dependency;
    reference ``_io.py:144-218``)."""
    try:
        import graph_tool as gt
    except ImportError as e:
        raise ImportError('Cannot import graph-tool. Use networkx or try to '
                          f'install it. Original exception: {e}')
    graph = gt.Graph(directed=G.is_directed())
    graph.add_vertex(G.n_vertices)
    sources, targets, weights = G.get_edge_list()
    graph.add_edge_list(np.stack([sources, targets], axis=1))
    prop = graph.new_edge_property('double')
    prop.a = weights
    graph.edge_properties['weight'] = prop
    for name, signal in _break_signals(G.signals).items():
        vprop = graph.new_vertex_property('double')
        vprop.a = signal
        graph.vertex_properties[name] = vprop
    return graph


def from_graphtool(graph, weight='weight'):
    """Import from graph-tool (optional dependency;
    reference ``_io.py:301-373``)."""
    import scipy.sparse as sps
    from pygsp_tpu.graphs.graph import Graph

    edges = graph.get_edges()
    n = graph.num_vertices()
    prop = graph.edge_properties.get(weight, None)
    w = prop.a if prop is not None else np.ones(len(edges))
    W = sps.csr_matrix((w, (edges[:, 0], edges[:, 1])), shape=(n, n))
    if not graph.is_directed():
        W = W + sps.triu(W, 1).T
    G = Graph(W)
    signals = {name: np.asarray(vprop.a)
               for name, vprop in graph.vertex_properties.items()}
    G.signals.update(_join_signals(signals))
    return G


_NX_FORMATS = {
    'graphml': ('read_graphml', 'write_graphml'),
    'gml': ('read_gml', 'write_gml'),
    'gexf': ('read_gexf', 'write_gexf'),
}


def save(G, path, fmt=None, backend=None):
    """Save to GraphML/GML/GEXF (reference ``_io.py:458-556``).

    ``backend``: 'networkx', 'graph-tool', or None (try networkx, fall
    back to graph-tool) — the reference's routing, including the
    ImportError when an explicitly requested backend is missing.

    Examples
    --------
    >>> import os, tempfile
    >>> from pygsp_tpu import graphs
    >>> from pygsp_tpu.graphs import _io
    >>> G = graphs.Ring(8)
    >>> with tempfile.TemporaryDirectory() as d:
    ...     path = os.path.join(d, 'ring.graphml')
    ...     _io.save(G, path)
    ...     H = _io.load(path)
    >>> H.N, H.Ne
    (8, 8)

    """
    if fmt is None:
        fmt = os.path.splitext(path)[1][1:]
    if fmt not in _NX_FORMATS:
        raise ValueError(f'Unsupported format {fmt}. '
                         f'Supported: {sorted(_NX_FORMATS)}.')

    def save_networkx():
        nx = _import_networkx()
        getattr(nx, _NX_FORMATS[fmt][1])(to_networkx(G), path)

    def save_graphtool():
        to_graphtool(G).save(path, fmt=fmt)

    if backend == 'networkx':
        save_networkx()
    elif backend == 'graph-tool':
        save_graphtool()
    elif backend is None:
        try:
            save_networkx()
        except ImportError:
            try:
                save_graphtool()
            except ImportError:
                raise ImportError('Cannot import networkx nor graph-tool.')
    else:
        raise ValueError(f'Unknown backend {backend}.')


def load(path, fmt=None, backend=None):
    """Load from GraphML/GML/GEXF (reference ``_io.py:375-456``).

    Same backend routing as :func:`save`. A lossless round-trip is only
    guaranteed when saving and loading with the same backend.
    """
    if fmt is None:
        fmt = os.path.splitext(path)[1][1:]
    if fmt not in _NX_FORMATS:
        raise ValueError(f'Unsupported format {fmt}. '
                         f'Supported: {sorted(_NX_FORMATS)}.')

    def load_networkx():
        nx = _import_networkx()
        return from_networkx(getattr(nx, _NX_FORMATS[fmt][0])(path))

    def load_graphtool():
        import graph_tool as gt
        return from_graphtool(gt.load_graph(path, fmt=fmt))

    if backend == 'networkx':
        return load_networkx()
    if backend == 'graph-tool':
        return load_graphtool()
    if backend is None:
        try:
            return load_networkx()
        except ImportError:
            try:
                return load_graphtool()
            except ImportError:
                raise ImportError('Cannot import networkx nor graph-tool.')
    raise ValueError(f'Unknown backend {backend}.')
