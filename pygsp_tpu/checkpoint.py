"""Checkpoint / resume of graphs and precomputed spectral state
(SURVEY §5: the reference's nearest analogue is ``Graph.save/load`` via
NetworkX writers — this is the native fast path: one ``.npz`` with the
edge arrays, cached ``lmax``, Fourier basis, and signals, so long jobs
restart without re-estimating spectra).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sps


def save_graph(path: str, G, include_fourier: bool = True) -> None:
    """Persist adjacency + coords + signals + cached spectral state.

    Examples
    --------
    >>> import os, tempfile
    >>> from pygsp_tpu import graphs, checkpoint
    >>> G = graphs.Ring(8)
    >>> G.estimate_lmax()
    >>> with tempfile.TemporaryDirectory() as d:
    ...     path = os.path.join(d, 'g.npz')
    ...     checkpoint.save_graph(path, G)
    ...     H = checkpoint.load_graph(path)
    >>> H.N, bool(abs(H.lmax - G.lmax) < 1e-12)   # lmax survives
    (8, True)

    """
    coo = G.W.tocoo()
    data = {
        'rows': coo.row, 'cols': coo.col, 'vals': coo.data,
        'n_vertices': np.array(G.n_vertices),
        'lap_type': np.array(G.lap_type),
    }
    if G.coords is not None:
        data['coords'] = np.asarray(G.coords)
    if G._lmax is not None:
        data['lmax'] = np.array(G._lmax)
        data['lmax_method'] = np.array(G._lmax_method or 'unknown')
    if include_fourier and G._U is not None:
        data['U'] = np.asarray(G._U)
        data['e'] = np.asarray(G._e)
    for name, sig in G.signals.items():
        data[f'signal__{name}'] = np.asarray(sig)
    np.savez_compressed(path, **data)


def load_graph(path: str):
    """Rebuild a Graph (with cached lmax / Fourier basis) from save_graph."""
    import jax.numpy as jnp
    from pygsp_tpu.graphs import Graph

    with np.load(path, allow_pickle=False) as d:
        n = int(d['n_vertices'])
        W = sps.csr_matrix((d['vals'], (d['rows'], d['cols'])), shape=(n, n))
        lap_type = str(d['lap_type'])
        coords = d['coords'] if 'coords' in d else None
        G = Graph(W, lap_type=lap_type, coords=coords)
        if 'lmax' in d:
            G._lmax = float(d['lmax'])
            G._lmax_method = str(d['lmax_method'])
        if 'U' in d:
            G._U = jnp.asarray(d['U'])
            G._e = jnp.asarray(d['e'])
            G._coherence = float(np.max(np.abs(d['U'])))
        for key in d.files:
            if key.startswith('signal__'):
                G.signals[key[len('signal__'):]] = d[key]
    return G


def save_sharded(path_prefix: str, sg) -> None:
    """Persist a ShardedGraph partition (per-shard files + metadata)."""
    np.savez_compressed(
        f'{path_prefix}.meta.npz',
        n_shards=np.array(sg.n_shards), n_local=np.array(sg.n_local),
        halo_dists=np.asarray(sg.halo_dists, dtype=np.int64),
        halo_sizes=np.asarray(sg.halo_sizes, dtype=np.int64),
        n_vertices=np.array(sg.n_vertices),
        lap_type=np.array(sg.lap_type), perm=np.asarray(sg.perm))
    for s in range(sg.n_shards):
        send = {f'send_idx{k}': np.asarray(a[s])
                for k, a in enumerate(sg.send_idx)}
        np.savez_compressed(
            f'{path_prefix}.shard{s}.npz',
            rows=np.asarray(sg.rows[s]), cols=np.asarray(sg.cols[s]),
            vals=np.asarray(sg.vals[s]), diag=np.asarray(sg.diag[s]),
            **send)


def load_sharded(path_prefix: str):
    """Rebuild a ShardedGraph from save_sharded files."""
    import jax.numpy as jnp
    from pygsp_tpu.parallel.partition import ShardedGraph

    with np.load(f'{path_prefix}.meta.npz') as m:
        n_shards = int(m['n_shards'])
        halo_dists = tuple(int(d) for d in m['halo_dists'])
        meta = dict(n_shards=n_shards, n_local=int(m['n_local']),
                    halo_dists=halo_dists,
                    halo_sizes=tuple(int(h) for h in m['halo_sizes']),
                    n_vertices=int(m['n_vertices']),
                    lap_type=str(m['lap_type']))
        perm = jnp.asarray(m['perm'])
    keys = ['rows', 'cols', 'vals', 'diag'] + [
        f'send_idx{k}' for k in range(len(halo_dists))]
    parts = {k: [] for k in keys}
    for s in range(n_shards):
        with np.load(f'{path_prefix}.shard{s}.npz') as d:
            for k in parts:
                parts[k].append(d[k])
    return ShardedGraph(
        rows=jnp.asarray(np.stack(parts['rows'])),
        cols=jnp.asarray(np.stack(parts['cols'])),
        vals=jnp.asarray(np.stack(parts['vals'])),
        diag=jnp.asarray(np.stack(parts['diag'])),
        send_idx=tuple(
            jnp.asarray(np.stack(parts[f'send_idx{k}']))
            for k in range(len(halo_dists))),
        perm=perm, **meta)
