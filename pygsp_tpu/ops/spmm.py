"""SpMM dispatch — THE primitive the whole framework reduces to (the role
``scipy.sparse.csr_matrix.dot`` plays in the reference,
``pygsp/filters/approximations.py:99,105-107``).

Three storage formats, dispatched by operand type (see
:mod:`pygsp_tpu.core.sparse` for the measured trade-offs):

- :class:`~pygsp_tpu.core.sparse.CSRMatrix` — gather + sorted segment-sum;
  portable correctness reference.
- :class:`~pygsp_tpu.core.sparse.ELLMatrix` — scatter-free multi-level ELL;
  TPU fast path for irregular/power-law graphs.
- :class:`~pygsp_tpu.core.sparse.BandedMatrix` — block-banded dense MXU
  path for RCM-banded mesh graphs (streams at memory roofline).
"""

from __future__ import annotations

import jax

from pygsp_tpu.core import sparse as sp


def spmm(mat, x: jax.Array) -> jax.Array:
    """``A @ x`` with x of shape (n_cols,) or (n_cols, ...)."""
    return sp.spmm(mat, x)
