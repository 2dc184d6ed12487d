r"""Random walks
============

Evolution of a random walker's occupation probability, via the
row-stochastic transition operator P = D⁻¹W.
"""

import numpy as np
import scipy.sparse as sps
from matplotlib import pyplot as plt

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
import pygsp_tpu as pg

N = 7
graph = pg.graphs.Grid2d(N)
delta = np.zeros(graph.N)
delta[N // 2 * N + N // 2] = 1

P = sps.diags(1.0 / graph.dw) @ graph.W

steps = [0, 1, 2, 3]
fig, axes = plt.subplots(1, len(steps), figsize=(12, 3))
state = delta
for step, ax in zip(steps, axes):
    graph.plot(state, ax=ax, title=f'step {step}', colorbar=False)
    ax.set_axis_off()
    state = state @ P

# stationary distribution ∝ degree
stationary = graph.dw / graph.dw.sum()
long_run = delta @ np.linalg.matrix_power(P.toarray(), 200)
fig.tight_layout()

if __name__ == '__main__':
    fig.savefig('/tmp/example_random_walk.png', dpi=60)
    print('mass conserved:', float(state.sum()))
    print('distance to stationary after 200 steps:',
          float(np.abs(long_run - stationary).max()))
