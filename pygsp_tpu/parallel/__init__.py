"""Multi-chip execution: graph partitioning + sharded spectral ops.

The reference is single-process (SURVEY §2.6); this package is the
new-first-class scale-out layer: a 1-D vertex/edge partition of the graph
over a ``jax.sharding.Mesh`` axis, per-Chebyshev-step halo exchange of
boundary vertex values compiled to distance-bucketed ``ppermute``s over ICI, and the
signal/feature axis optionally sharded as data parallelism.
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
from pygsp_tpu.parallel.twod import (TwoDGraph, cheby_op_2d, make_mesh_2d,
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
           'cheby_op_2d', 'twod_local_windowed']
