"""Graph linear operators as pytrees: Laplacian, shifted Chebyshev operator.

TPU-first representation: instead of materialising ``L = D - W`` as a second
sparse matrix (reference: ``pygsp/graphs/graph.py:618-628``), the Laplacian
is kept as *diag vector + off-diagonal edge matrix*:

    L @ x = diag * x + offdiag @ x

where ``offdiag`` holds **negated** (possibly degree-normalized) weights.
The elementwise diag term fuses into the surrounding XLA computation for
free, the SpMM kernel stays Laplacian-agnostic, and the Chebyshev recurrence
``(2/a1)(L - a2 I)`` becomes one fused scale of the same two terms.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pygsp_tpu.core import sparse as sp
from pygsp_tpu.core.sparse import CSRMatrix


@partial(jax.tree_util.register_dataclass,
         data_fields=['offdiag', 'diag'],
         meta_fields=['lap_type'])
@dataclasses.dataclass(frozen=True)
class LaplacianOp:
    """Sparse symmetric Laplacian ``L = diag(diag) + offdiag``.

    ``offdiag.vals`` are negative (they store ``-w`` or ``-w/sqrt(dw_i dw_j)``),
    so a plain SpMM plus the diagonal term applies L exactly.
    """

    offdiag: CSRMatrix
    diag: jax.Array
    lap_type: str

    @property
    def n_vertices(self) -> int:
        return self.offdiag.n_rows

    @property
    def dtype(self):
        return self.offdiag.dtype

    def __matmul__(self, x: jax.Array) -> jax.Array:
        return matvec(self, x)

    def dot(self, x: jax.Array) -> jax.Array:
        """scipy-style alias so reference-habit code keeps working."""
        return matvec(self, jnp.asarray(x))

    def shifted(self, scale: jax.Array, shift: jax.Array) -> 'LaplacianOp':
        """Operator ``scale * (L - shift*I)`` with the shift fused into diag."""
        return LaplacianOp(
            offdiag=self.offdiag.scale_vals(scale),
            diag=(self.diag - shift) * scale,
            lap_type=self.lap_type,
        )

    def to_hybrid(self, width: int | None = None) -> 'LaplacianOp':
        """Convert the off-diagonal block to the scatter-free multi-level
        ELL format — the TPU fast path for irregular/power-law graphs
        (see ``sparse.ELLMatrix``)."""
        if isinstance(self.offdiag, sp.ELLMatrix):
            return self
        return LaplacianOp(offdiag=sp.to_ell(self.offdiag, width=width),
                           diag=self.diag, lap_type=self.lap_type)

    def to_chunked(self, chunk_rows: int | None = None,
                   permute: str | None = None) -> 'LaplacianOp':
        """Convert the off-diagonal block to the chunked multi-level ELL
        format — the fast path for power-law graphs past the VMEM gather
        cliff (see ``core.chunked``). The Chebyshev scan then carries the
        signal as a tuple of per-chunk buffers."""
        from pygsp_tpu.core import chunked
        if isinstance(self.offdiag, chunked.ChunkedELLMatrix):
            return self
        rows = np.asarray(self.offdiag.rows)[:self.offdiag.nnz]
        cols = np.asarray(self.offdiag.cols)[:self.offdiag.nnz]
        vals = np.asarray(self.offdiag.vals)[:self.offdiag.nnz]
        kw = {} if chunk_rows is None else {'chunk_rows': chunk_rows}
        return LaplacianOp(
            offdiag=chunked.chunked_from_host_coo(
                rows, cols, vals, self.offdiag.n_rows,
                self.offdiag.n_cols, permute=permute, **kw),
            diag=self.diag, lap_type=self.lap_type)

    def to_windowed(self, chunk_rows: int | None = None,
                    window_rows: int | None = None,
                    slab_width: int | None = None) -> 'LaplacianOp':
        """Convert the off-diagonal block to the windowed-compact ELL
        format — the fastest power-law path (see ``core.windowed``):
        exact-packed slots folded to rows by a one-hot MXU contraction,
        ~1.1x slot padding vs ~2.1x for the per-row-aligned chunked
        format at the same sub-cliff gather speed."""
        from pygsp_tpu.core import windowed
        if isinstance(self.offdiag, windowed.WindowedELLMatrix):
            return self
        rows = np.asarray(self.offdiag.rows)[:self.offdiag.nnz]
        cols = np.asarray(self.offdiag.cols)[:self.offdiag.nnz]
        vals = np.asarray(self.offdiag.vals)[:self.offdiag.nnz]
        kw = {}
        if chunk_rows is not None:
            kw['chunk_rows'] = chunk_rows
        if window_rows is not None:
            kw['window_rows'] = window_rows
        return LaplacianOp(
            offdiag=windowed.windowed_from_host_coo(
                rows, cols, vals, self.offdiag.n_rows,
                self.offdiag.n_cols, slab_width=slab_width, **kw),
            diag=self.diag, lap_type=self.lap_type)

    def to_banded(self, max_half_bw: int = 16) -> 'LaplacianOp | None':
        """Convert to the block-banded dense MXU format (mesh-like graphs
        whose RCM bandwidth fits ``max_half_bw`` 128-tiles); None if the
        band is too wide. Note: the CALLER must already hold vertices in
        a banded order (e.g. via parallel.partition's RCM reorder or
        scipy reverse_cuthill_mckee)."""
        banded = sp.banded_from_scipy(
            sp.to_scipy(self.offdiag), dtype=self.offdiag.dtype,
            max_half_bw=max_half_bw)
        if banded is None:
            return None
        return LaplacianOp(offdiag=banded, diag=self.diag,
                           lap_type=self.lap_type)

    def to_dense(self) -> jax.Array:
        dense = sp.to_dense(self.offdiag)
        return dense + jnp.diag(self.diag)

    def to_scipy(self):
        import scipy.sparse as sps
        return sp.to_scipy(self.offdiag) + sps.diags(np.asarray(self.diag))


def matvec(op: LaplacianOp, x: jax.Array) -> jax.Array:
    """``L @ x`` — one SpMM plus a fused elementwise diagonal term."""
    diag = op.diag.reshape((-1,) + (1,) * (x.ndim - 1)) if x.ndim > 1 else op.diag
    return diag * x + sp.spmm(op.offdiag, x)


def degrees_from_adjacency(W: CSRMatrix):
    """(unweighted degree d, weighted degree dw) via segment sums.

    Mirrors ``Graph.d``/``Graph.dw`` for the undirected case
    (``graphs/graph.py:729-838``); directed averaging is handled by the
    Graph wrapper host-side.
    """
    ones = jnp.ones_like(W.vals)
    real = (W.rows < W.n_rows).astype(W.vals.dtype)
    d = jax.ops.segment_sum(ones * real, W.rows, num_segments=W.n_rows,
                            indices_are_sorted=True)
    dw = jax.ops.segment_sum(W.vals, W.rows, num_segments=W.n_rows,
                             indices_are_sorted=True)
    return d, dw


def laplacian_op(W: CSRMatrix, lap_type: str = 'combinatorial') -> LaplacianOp:
    """Build the Laplacian operator from a symmetric adjacency ``W``.

    Semantics match the reference (``graphs/graph.py:612-628``):
    - combinatorial: ``L = D - W`` → diag = dw, offdiag = -W.
    - normalized: ``L = I - D^-1/2 W D^-1/2`` with rows/cols of isolated
      vertices zeroed (their diagonal is 0, not 1).
    Directed graphs must be symmetrized (average) before calling this.
    """
    _, dw = degrees_from_adjacency(W)
    if lap_type == 'combinatorial':
        return LaplacianOp(offdiag=W.with_vals(-W.vals), diag=dw,
                           lap_type=lap_type)
    elif lap_type == 'normalized':
        connected = dw > 0
        dinv_sqrt = jnp.where(connected, dw, 1.0) ** -0.5
        dinv_sqrt = jnp.where(connected, dinv_sqrt, 0.0)
        # gather with clamp is safe on padding entries (val 0 anyway)
        scale = dinv_sqrt[jnp.minimum(W.rows, W.n_rows - 1)] * \
            dinv_sqrt[jnp.minimum(W.cols, W.n_cols - 1)]
        diag = jnp.where(connected, 1.0, 0.0).astype(W.vals.dtype)
        return LaplacianOp(offdiag=W.with_vals(-W.vals * scale), diag=diag,
                           lap_type=lap_type)
    else:
        raise ValueError(f'Unknown Laplacian type {lap_type!r}')
