r"""Eigenvalue concentration
========================

The Laplacian spectrum of a ring concentrates as edges are added until
the graph is complete.
"""

import numpy as np
from matplotlib import pyplot as plt

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
import pygsp_tpu as pg

n = 10
fig, axes = plt.subplots(1, 3, figsize=(12, 3.5))
for k, ax in zip([1, 2, 5], axes):
    graph = pg.graphs.Ring(n, k=k)
    graph.compute_fourier_basis()
    ax.hist(np.asarray(graph.e), bins=20, range=(0, n))
    ax.set_title(f'Ring(k={k}) spectrum')
fig.tight_layout()

if __name__ == '__main__':
    fig.savefig('/tmp/example_eigenvalue_concentration.png', dpi=60)
    G = pg.graphs.FullConnected(n)
    G.compute_fourier_basis()
    print('complete-graph eigenvalues are {0, n}:',
          sorted(set(np.round(np.asarray(G.e), 6))))
