r"""Kernel localization
===================

Localize a smooth spectral kernel at different vertices: the footprint
adapts to the local graph structure.
"""

import numpy as np
from matplotlib import pyplot as plt

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
import pygsp_tpu as pg

G = pg.graphs.Sensor(200, seed=7)
G.estimate_lmax()
g = pg.filters.Heat(G, scale=20)

vertices = [10, 100, 190]
fig, axes = plt.subplots(1, 3, figsize=(12, 3.5))
for ax, v in zip(axes, vertices):
    s = np.asarray(g.localize(v, order=30))
    G.plot(s, ax=ax, highlight=v, title=f'T_{v} g', colorbar=False)
    ax.set_axis_off()
fig.tight_layout()

if __name__ == '__main__':
    fig.savefig('/tmp/example_kernel_localization.png', dpi=60)
    print('localized energy concentrates at the center:',
          bool(np.argmax(np.abs(s)) == vertices[-1]))
