"""Multi-host launch helpers (SURVEY §2.6: new component, no reference
analogue — the reference is single-process).

A multi-host run is: every host calls :func:`initialize` (which wires
``jax.distributed``), loads its own shard of the edge list (or lets
:func:`load_edge_shard` slice a shared file), and then calls the same
jit-ed sharded program — XLA routes the halo ``ppermute``s over ICI
within a slice and DCN across hosts.
"""

from __future__ import annotations

import numpy as np

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Wire up ``jax.distributed`` (no-op for single-process runs).

    On TPU pods the three arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU clusters.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def global_mesh(n_graph: int | None = None, n_batch: int = 1):
    """Mesh over ALL processes' devices, graph axis major.

    Device order follows ``jax.devices()`` (globally consistent), so the
    contiguous vertex ranges of the partitioner land on hosts in order and
    halo traffic between adjacent ranges stays intra-host where possible.
    """
    from jax.sharding import Mesh
    devices = np.asarray(jax.devices())
    total = devices.size
    if n_graph is None:
        n_graph = total // n_batch
    if n_graph * n_batch > total:
        raise ValueError(f'{n_graph} x {n_batch} > {total} devices')
    return Mesh(devices[:n_graph * n_batch].reshape(n_graph, n_batch),
                ('graph', 'batch'))


def process_shard_range(n_items: int) -> tuple[int, int]:
    """[lo, hi) slice of a globally shared work list owned by this process."""
    p = jax.process_index()
    n = jax.process_count()
    per = -(-n_items // n)
    return p * per, min((p + 1) * per, n_items)


def put_sharded_graph(sg, mesh):
    """Place a host-built :class:`~pygsp_tpu.parallel.partition.ShardedGraph`
    onto a (possibly multi-process) global mesh.

    In a multi-controller run every array fed to a jitted program must be
    a GLOBAL ``jax.Array``; the partitioner's leaves are process-local.
    Each process calls this with the identical host-built partition (the
    partitioner is deterministic) and ``jax.device_put`` keeps only the
    addressable shards. The per-shard arrays shard over the mesh's
    'graph' axis; ``perm`` is replicated.
    """
    import dataclasses
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(a, spec):
        return jax.device_put(np.asarray(a), NamedSharding(mesh, spec))

    g = P('graph')
    return dataclasses.replace(
        sg,
        rows=put(sg.rows, g), cols=put(sg.cols, g), vals=put(sg.vals, g),
        diag=put(sg.diag, g),
        send_idx=tuple(put(s, g) for s in sg.send_idx),
        perm=put(sg.perm, P()))


def load_edge_shard(path: str, n_vertices: int):
    """Load this process's contiguous row-range slice of an edge-list file.

    The file is an ``.npz`` with ``src``/``tgt`` (and optional ``weight``)
    arrays; each host materialises only rows in its range plus the halo
    columns discovered by the partitioner.
    """
    lo, hi = process_shard_range(n_vertices)
    with np.load(path) as d:
        src, tgt = d['src'], d['tgt']
        w = d['weight'] if 'weight' in d else np.ones(len(src))
    mask = (src >= lo) & (src < hi)
    return src[mask], tgt[mask], w[mask], (lo, hi)
