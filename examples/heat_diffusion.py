r"""Heat diffusion
==============

Solve the heat equation on a grid graph by filtering point sources with
heat kernels of increasing scale — the framework's hot path (shared
Chebyshev recurrence) end to end.
"""

import numpy as np
from matplotlib import pyplot as plt

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
import pygsp_tpu as pg

n_side = 13
G = pg.graphs.Grid2d(n_side)
G.compute_fourier_basis()

sources = [(n_side // 4) * n_side + n_side // 4,
           (3 * n_side // 4) * n_side + 3 * n_side // 4]
x = np.zeros(G.n_vertices)
x[sources] = 5

times = [0, 5, 10, 20]
fig, axes = plt.subplots(2, len(times), figsize=(12, 5))
for i, t in enumerate(times):
    g = pg.filters.Heat(G, scale=t)
    g.plot(ax=axes[0, i], title=f'g(λ) at t={t}')
    y = np.asarray(g.filter(x))
    G.plot(y, edges=False, highlight=sources, ax=axes[1, i],
           title=f'f({t})')
    axes[1, i].set_axis_off()
fig.tight_layout()

if __name__ == '__main__':
    fig.savefig('/tmp/example_heat_diffusion.png', dpi=60)
    print('total heat preserved:', float(y.sum()), '== initial', float(x.sum()))
