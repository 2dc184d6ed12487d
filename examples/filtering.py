r"""Filtering a noisy signal
========================

Denoise a piecewise-smooth signal on a sensor graph by low-pass filtering,
comparing the exact Fourier path with the Chebyshev approximation.
"""

import numpy as np
from matplotlib import pyplot as plt

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
import pygsp_tpu as pg

G = pg.graphs.Sensor(256, seed=42)
G.compute_fourier_basis()

rng = np.random.default_rng(1)
signal = np.cos(4 * np.pi * G.coords[:, 0]) + np.sin(3 * np.pi * G.coords[:, 1])
noisy = signal + 0.3 * rng.normal(size=G.N)

g = pg.filters.Filter(G, lambda x: 1.0 / (1.0 + 3.0 * x))
exact = np.asarray(g.filter(noisy, method='exact'))
cheby = np.asarray(g.filter(noisy, method='chebyshev', order=30))

fig, axes = plt.subplots(1, 3, figsize=(12, 3.5))
for ax, (s, title) in zip(axes, [(noisy, 'noisy'), (exact, 'exact'),
                                 (cheby, 'chebyshev K=30')]):
    G.plot(s, ax=ax, title=title, colorbar=False)
    ax.set_axis_off()
fig.tight_layout()

if __name__ == '__main__':
    fig.savefig('/tmp/example_filtering.png', dpi=60)
    print('exact vs cheby max diff:', float(np.abs(exact - cheby).max()))
    print('denoising error: %.3f -> %.3f' % (
        np.linalg.norm(noisy - signal), np.linalg.norm(cheby - signal)))
