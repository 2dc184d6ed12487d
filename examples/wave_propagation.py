r"""Wave propagation
================

Propagate a wave from point sources with the Wave filter bank.
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
    g = pg.filters.Wave(G, time=t, speed=1)
    g.plot(ax=axes[0, i], title=f'g(λ) at t={t}')
    y = np.asarray(g.filter(x))
    G.plot(y, edges=False, highlight=sources, ax=axes[1, i],
           title=f'f({t})')
    axes[1, i].set_axis_off()
fig.tight_layout()

if __name__ == '__main__':
    fig.savefig('/tmp/example_wave_propagation.png', dpi=60)
    print('wave amplitude range:', float(y.min()), float(y.max()))
