r"""Eigenvector localization
========================

On irregular graphs, high-frequency Laplacian eigenvectors can localize on
small regions — visualized through their inverse participation ratio.
"""

import numpy as np
from matplotlib import pyplot as plt

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
import pygsp_tpu as pg

G = pg.graphs.Comet(60, 20)
G.set_coordinates('spring', seed=42)
G.compute_fourier_basis()

U = np.asarray(G.U)
ipr = np.sum(U ** 4, axis=0) / np.sum(U ** 2, axis=0) ** 2

fig, axes = plt.subplots(1, 3, figsize=(12, 3.5))
axes[0].plot(np.asarray(G.e), ipr, '.')
axes[0].set_xlabel('λ')
axes[0].set_title('inverse participation ratio')
for ax, m in zip(axes[1:], [1, int(np.argmax(ipr))]):
    G.plot(U[:, m], ax=ax, title=f'mode {m} (IPR {ipr[m]:.2f})',
           colorbar=False)
    ax.set_axis_off()
fig.tight_layout()

if __name__ == '__main__':
    fig.savefig('/tmp/example_eigenvector_localization.png', dpi=60)
    print('max IPR mode:', int(np.argmax(ipr)), 'IPR:', float(ipr.max()))
