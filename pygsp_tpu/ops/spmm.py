"""SpMM dispatch: segment-sum reference path and Pallas TPU kernel.

``spmm(mat, x)`` is THE primitive the whole framework reduces to — the role
``scipy.sparse.csr_matrix.dot`` plays in the reference
(``pygsp/filters/approximations.py:99,105-107``). Two implementations:

- ``segment``: gather + multiply + sorted segment-sum, compiled by XLA.
  Portable (CPU tests, TPU), always correct — the golden reference.
- ``pallas``: row-blocked CSR kernel for TPU (see ``pallas_spmm.py``),
  used on the hot path when shapes allow.
"""

from __future__ import annotations

import jax

from pygsp_tpu.core import sparse as sp
from pygsp_tpu.core.sparse import CSRMatrix

# Flipped to a Pallas implementation when profitable; see pallas_spmm.py.
_BACKEND = 'segment'


def set_backend(name: str) -> None:
    global _BACKEND
    if name not in ('segment', 'pallas'):
        raise ValueError(f'unknown spmm backend {name!r}')
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def spmm(mat: CSRMatrix, x: jax.Array) -> jax.Array:
    """``A @ x`` with x of shape (n_cols,) or (n_cols, ...)."""
    if _BACKEND == 'pallas':
        from pygsp_tpu.ops.pallas_spmm import spmm_pallas
        return spmm_pallas(mat, x)
    return sp.spmm(mat, x)
