"""Secondary benchmark: banded MXU path on a mesh graph (manual run).

The primary bench (bench.py) covers the BA/power-law gather path; this one
measures the block-banded dense format on a long grid, which runs at the
chip's streaming roofline.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit('/', 2)[0])


def main():
    import jax
    import jax.numpy as jnp
    import pygsp_tpu as gsp
    from pygsp_tpu.core.operators import LaplacianOp
    from pygsp_tpu.ops import chebyshev as cheby

    G = gsp.graphs.Grid2d(2048, 128)
    G.estimate_lmax(method='bounds')
    nnz = 2 * G.Ne
    L = LaplacianOp(G.L.offdiag.astype(jnp.float32),
                    G.L.diag.astype(jnp.float32), G.L.lap_type).to_banded()
    assert L is not None

    S = 128
    c = jnp.asarray(np.random.default_rng(2).normal(size=(4, 31)), jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(G.N, S)), jnp.float32)
    run = jax.jit(lambda L, c, x: cheby.cheby_op(L, float(G.lmax), c, x))
    out = run(L, c, x)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(5):
        out = run(L, c, x)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 5
    print(json.dumps({
        'metric': 'banded_cheby_K30_grid_edge_ops_per_s',
        'value': 30 * nnz * S / dt,
        'unit': 'edge-ops/s/chip',
        'ms_per_filterbank': dt * 1e3,
    }))


if __name__ == '__main__':
    main()
