r"""Filter learning
===============

Fit a spectral filter bank to data by gradient descent — the training
use-case the TPU backend is built for. A "teacher" heat bank produces
targets; a randomly-initialised "student" bank recovers the diffusion
scales and mixing weights by minimising an MSE loss through the
Chebyshev recurrence.

The gradient runs through :func:`pygsp_tpu.ops.cheby_op_fixed_graph`,
whose custom VJP is CONSTANT-MEMORY: the filter bank is linear in the
coefficients and the signal, so the backward pass is two fresh
recurrences instead of K stored activation buffers — at production
scale (10^6+ vertices, wide signal batches) that is the difference
between training fitting on a chip and not.
"""

import numpy as np
from matplotlib import pyplot as plt

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))
import jax
import jax.numpy as jnp

import pygsp_tpu as pg
from pygsp_tpu.ops import cheby_coeff, cheby_op_fixed_graph

G = pg.graphs.Sensor(300, seed=42)
G.estimate_lmax()
L, lmax = G.L, float(G.lmax)
K = 20

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(G.N, 16)).astype(L.diag.dtype))

# teacher: two heat scales mixed 70/30
true_scales = jnp.asarray([3.0, 25.0], L.diag.dtype)
true_mix = jnp.asarray([0.7, 0.3], L.diag.dtype)


def bank(params, x):
    scales = jax.nn.softplus(params['raw_scales'])        # keep > 0
    c = cheby_coeff(
        lambda lam: jnp.exp(-scales[:, None] * lam[None, :] / lmax),
        lmax, m=K, dtype=x.dtype)
    out = cheby_op_fixed_graph(L, lmax, c, x)             # (Nf, N, S)
    return jnp.einsum('f,fns->ns', params['mix'], out)


def inv_softplus(y):
    return float(np.log(np.expm1(y)))


teacher = {'raw_scales': jnp.asarray([inv_softplus(3.0), inv_softplus(25.0)],
                                     x.dtype),
           'mix': true_mix}
y = bank(teacher, x)

params = {'raw_scales': jnp.asarray([inv_softplus(1.0), inv_softplus(10.0)],
                                    x.dtype),
          'mix': jnp.asarray([0.5, 0.5], x.dtype)}


import optax

opt = optax.adam(optax.exponential_decay(0.2, 200, 0.5))
opt_state = opt.init(params)


@jax.jit
def step(params, opt_state, x, y):
    def loss_fn(p):
        return jnp.mean((bank(p, x) - y) ** 2)
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = opt.update(grads, opt_state)
    return optax.apply_updates(params, updates), opt_state, loss


losses = []
for i in range(1000):
    params, opt_state, loss = step(params, opt_state, x, y)
    losses.append(float(loss))

learned_scales = np.asarray(jax.nn.softplus(params['raw_scales']))
learned_mix = np.asarray(params['mix'])

fig, axes = plt.subplots(1, 2, figsize=(9, 3.5))
axes[0].semilogy(losses)
axes[0].set_title('training loss')
axes[0].set_xlabel('step')
lam = np.linspace(0, lmax, 200)
for s, m, ls in [(np.asarray(true_scales), np.asarray(true_mix), '-'),
                 (learned_scales, learned_mix, '--')]:
    resp = (m[:, None] * np.exp(-s[:, None] * lam[None, :] / lmax)).sum(0)
    axes[1].plot(lam, resp, ls)
axes[1].set_title('teacher (solid) vs learned (dashed) response')
axes[1].set_xlabel(r'$\lambda$')
fig.tight_layout()

# the large-scale direction of the loss surface is nearly flat (a heat
# kernel at scale 13 vs 25 differs by <1% of signal energy), so assert
# a strong loss reduction rather than exact parameter recovery
assert losses[-1] < 5e-3 * losses[0], 'filter learning failed to converge'

if __name__ == '__main__':
    fig.savefig('/tmp/example_filter_learning.png', dpi=60)
    print('learned scales:', learned_scales, 'mix:', learned_mix)
    print('final loss:', losses[-1])
