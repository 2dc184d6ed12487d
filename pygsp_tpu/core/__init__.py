"""Core data structures: immutable sparse-graph pytrees and linear operators."""

from pygsp_tpu.core.sparse import CSRMatrix, from_coo, from_scipy, to_scipy
from pygsp_tpu.core.operators import LaplacianOp, laplacian_op

__all__ = [
    'CSRMatrix',
    'from_coo',
    'from_scipy',
    'to_scipy',
    'LaplacianOp',
    'laplacian_op',
]
