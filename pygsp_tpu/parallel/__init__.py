"""Multi-chip execution: graph partitioning + sharded spectral ops.

The reference is single-process (SURVEY §2.6); this package is the
new-first-class scale-out layer: a 1-D vertex/edge partition of the graph
over a ``jax.sharding.Mesh`` axis, per-Chebyshev-step halo exchange of
boundary vertex values compiled to distance-bucketed ``ppermute``s over
ICI, and the signal/feature axis optionally sharded as data parallelism.

Layout choice (measured, round 4):

- **Mesh/community-local graphs** (RCM-banded, sorted SBM): the 1-D
  partition (:func:`partition_graph` + :func:`shard_local_windowed`,
  ``split_boundary=True``) — tiny halos, full single-chip rate per chip
  (``SHARDED_ONCHIP_r4.json``: 0.94x of the single-chip fast path).
- **Expander / power-law graphs at any n ≥ 2**: the 2-D edge partition
  with the fully interleaved ring schedule
  (:func:`partition_graph_2d` +
  ``twod_local_windowed(ring=True, split_cols=True)`` +
  :func:`cheby_op_2d`) — per-chip wire is graph-independent
  ``(pr+pc−2)·N/p`` rows, both collectives ride under the folds, and
  the block layout fragments ~2x less than the 1-D halo layout
  (``WEAKPAD_r4.json`` / ``SCALING_r4.json``).
- Fast mode on either: ``carry_dtype=jnp.bfloat16`` + bf16 layout
  values (``.astype``) — and ``scatter_dtype`` on the 2-D path
  (``SHARDED_BF16_r4.json``: 91.4-91.6% of the f32 read roofline at one
  device).
"""

from pygsp_tpu.parallel.partition import (ShardedGraph, ShardedELL,
                                           cluster_shards, partition_graph,
                                           shard_local_ell)
from pygsp_tpu.parallel.sharded import (
    sharded_matvec, sharded_cheby_op, sharded_cheby_op_fixed_graph,
    sharded_cheby_synthesis, make_mesh)
from pygsp_tpu.parallel.windowed_shards import (ShardedWindowed,
                                                shard_local_windowed)
from pygsp_tpu.parallel.launch import (global_mesh, initialize,
                                       load_edge_shard, process_shard_range,
                                       put_sharded_graph)
from pygsp_tpu.parallel.twod import (TwoDGraph, cheby_op_2d,
                                     cheby_op_2d_fixed_graph,
                                     cheby_synthesis_2d, make_mesh_2d,
                                     matvec_2d, partition_graph_2d,
                                     twod_local_windowed)

__all__ = ['ShardedGraph', 'ShardedELL', 'ShardedWindowed',
           'cluster_shards',
           'partition_graph', 'shard_local_ell', 'shard_local_windowed',
           'sharded_matvec', 'sharded_cheby_op',
           'sharded_cheby_op_fixed_graph', 'sharded_cheby_synthesis',
           'make_mesh', 'initialize', 'global_mesh', 'process_shard_range',
           'load_edge_shard', 'put_sharded_graph',
           'TwoDGraph', 'partition_graph_2d', 'make_mesh_2d', 'matvec_2d',
           'cheby_op_2d', 'cheby_op_2d_fixed_graph',
           'cheby_synthesis_2d', 'twod_local_windowed']
