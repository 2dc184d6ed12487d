r"""Graph Fourier transform
=======================

Decompose a signal into graph frequencies and reconstruct it.
"""

import numpy as np
from matplotlib import pyplot as plt

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
import pygsp_tpu as pg

G = pg.graphs.Logo()
G.compute_fourier_basis()

rng = np.random.default_rng(0)
s = np.zeros(G.N)
s[rng.integers(0, G.N, 10)] = rng.normal(size=10)

s_hat = np.asarray(G.gft(s))
rec = np.asarray(G.igft(s_hat))

fig, axes = plt.subplots(1, 2, figsize=(11, 4))
G.plot(s, ax=axes[0], title='vertex domain')
axes[1].stem(np.asarray(G.e)[:80], np.abs(s_hat)[:80], markerfmt=' ')
axes[1].set_xlabel('graph frequency λ')
axes[1].set_title('spectral domain (first 80 coefficients)')
fig.tight_layout()

if __name__ == '__main__':
    fig.savefig('/tmp/example_fourier_transform.png', dpi=60)
    print('GFT roundtrip error:', float(np.abs(rec - s).max()))
    print('Parseval check:', float(abs(np.sum(s**2) - np.sum(s_hat**2))))
