"""Pallas-on-axon smoke test: does Mosaic compile/run on this backend?

Tiny kernels only: (1) elementwise double, (2) a one-window one-hot fold
(iota-compare + pl.dot) matching the windowed fold's inner math.

Run ON the TPU:  nohup python benchmarks/pallas_smoke.py > /tmp/pallas_smoke.log 2>&1 &
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    print('device:', jax.devices()[0], flush=True)

    # 1. elementwise
    def dbl_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    t0 = time.time()
    y = pl.pallas_call(
        dbl_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    ok1 = bool(jnp.allclose(y, x * 2.0))
    print(json.dumps({'test': 'double', 'ok': ok1,
                      's': round(time.time() - t0, 1)}), flush=True)

    # 2. one-hot fold: p (Lt, S) bf16 products + rowid (Lt,) -> out (KP, S) f32
    Lt, KP, S = 512, 256, 128

    def fold_kernel(rid_ref, p_ref, o_ref):
        iota = jax.lax.broadcasted_iota(jnp.int32, (Lt, KP), 1)
        oh = (rid_ref[:] == iota).astype(jnp.bfloat16)
        o_ref[:] = jax.lax.dot_general(
            oh, p_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    rng = np.random.default_rng(0)
    rid = rng.integers(0, KP, size=(Lt, 1)).astype(np.int32)
    p = rng.normal(size=(Lt, S)).astype(jnp.bfloat16)
    t0 = time.time()
    out = pl.pallas_call(
        fold_kernel,
        out_shape=jax.ShapeDtypeStruct((KP, S), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(rid), p)
    ref = np.zeros((KP, S), np.float32)
    np.add.at(ref, rid[:, 0], np.asarray(p, np.float32))
    err = float(np.abs(np.asarray(out) - ref).max() / np.abs(ref).max())
    print(json.dumps({'test': 'fold', 'ok': err < 1e-2,
                      'rel_err': err,
                      's': round(time.time() - t0, 1)}), flush=True)
    print('SMOKE_DONE', flush=True)


if __name__ == '__main__':
    main()
