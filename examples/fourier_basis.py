r"""Fourier basis
=============

The graph Laplacian's eigenvectors generalize sinusoids: low-frequency
modes vary smoothly, high-frequency modes oscillate.
"""

import numpy as np
from matplotlib import pyplot as plt

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
import pygsp_tpu as pg

G = pg.graphs.Grid2d(12)
G.compute_fourier_basis()

modes = [1, 2, 3, 10, 40, 143]
fig, axes = plt.subplots(2, 3, figsize=(10, 6))
for ax, m in zip(axes.flat, modes):
    G.plot(np.asarray(G.U[:, m]), ax=ax, colorbar=False,
           title=f'λ_{m} = {float(G.e[m]):.2f}')
    ax.set_axis_off()
fig.tight_layout()

if __name__ == '__main__':
    fig.savefig('/tmp/example_fourier_basis.png', dpi=60)
    # eigenvector smoothness == its eigenvalue (Dirichlet form)
    for m in (1, 40):
        energy = float(G.dirichlet_energy(np.asarray(G.U[:, m])))
        print(f'mode {m}: xᵀLx = {energy:.3f}, λ = {float(G.e[m]):.3f}')
