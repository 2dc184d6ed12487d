r"""Multi-chip graph filtering (TPU-native; no reference analogue)
=============================================================

Partition a million-edge graph over a device mesh and run the Chebyshev
filter bank with per-step halo exchange. On a CPU host this runs on
virtual devices (set ``XLA_FLAGS=--xla_force_host_platform_device_count=8``);
on a TPU slice the same code rides ICI.
"""

import numpy as np

import jax
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
import pygsp_tpu as pg
from pygsp_tpu.ops import chebyshev as cheby
from pygsp_tpu.parallel import make_mesh, partition_graph, sharded_cheby_op

n_dev = len(jax.devices())
n_graph = max(d for d in (1, 2, 4, 8) if d <= n_dev and n_dev % d == 0)

G = pg.graphs.StochasticBlockModel(N=2000, k=4, seed=0, connected=True)
G.estimate_lmax()

sg = partition_graph(G.W, n_graph, reorder='none')  # communities are blocks
mesh = make_mesh(n_graph, 1)

g = pg.filters.Heat(G, scale=[5, 20])
c = cheby.cheby_coeff(g.evaluate, G.lmax, m=30)

x = np.random.default_rng(0).normal(size=(G.N, 8))
out = sharded_cheby_op(sg, G.lmax, c, sg.pad_signal(x), mesh)

if __name__ == '__main__':
    ref = np.asarray(cheby.cheby_op(G.L, G.lmax, c, np.asarray(x)))
    got = np.asarray(sg.unpad_signal(out[0]))
    print(f'devices: {n_dev}, graph shards: {n_graph}')
    print('sharded == single-device:',
          bool(np.allclose(got, ref[0], atol=1e-4)))
