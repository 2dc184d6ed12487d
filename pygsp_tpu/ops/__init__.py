"""Compute kernels: SpMM, Chebyshev recurrence, Lanczos, eigensolvers."""

from pygsp_tpu.ops.spmm import spmm
from pygsp_tpu.ops.chebyshev import (
    carry_error_estimate, cheby_coeff, cheby_op, cheby_op_fixed_graph,
    cheby_rect, jackson_cheby_coeff)
from pygsp_tpu.ops.eigen import estimate_lmax_lanczos, estimate_lmax_bounds
from pygsp_tpu.ops.lanczos import lanczos_basis, lanczos_op

__all__ = [
    'spmm',
    'carry_error_estimate',
    'cheby_coeff', 'cheby_op', 'cheby_op_fixed_graph', 'cheby_rect',
    'jackson_cheby_coeff',
    'estimate_lmax_lanczos', 'estimate_lmax_bounds',
    'lanczos_basis', 'lanczos_op',
]
