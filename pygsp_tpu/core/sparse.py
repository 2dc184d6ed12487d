"""Immutable padded sparse-matrix pytrees.

The design departs from the reference's ``scipy.sparse.csr_matrix`` storage
(reference: ``pygsp/graphs/graph.py:107-109``): sparse structure here is a
*static-shape* pytree so every consumer (`jax.jit`, `lax.scan`, `shard_map`,
Pallas) traces once per graph shape. Edges are stored as row-sorted COO
triplets padded to a block multiple, alongside a CSR row-pointer for
row-blocked kernels.

Padding convention: padding entries carry ``rows == n_rows``,
``cols == n_cols`` (one past the end) and ``val == 0``. Out-of-range segment
ids are dropped by ``segment_sum`` and out-of-range gather reads clamp under
jit, so the padded tail is inert in all segment-based math, keeps the arrays
row-sorted, and stays identifiable (``rows >= n_rows``) even after a
transpose re-sort.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Edge arrays are padded to a multiple of this (8 sublanes x 128 lanes).
EDGE_BLOCK = 1024
# Row blocking granularity for row-tiled kernels.
ROW_BLOCK = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.tree_util.register_dataclass,
         data_fields=['rows', 'cols', 'vals', 'rowptr'],
         meta_fields=['n_rows', 'n_cols', 'nnz'])
@dataclasses.dataclass(frozen=True)
class CSRMatrix:
    """Row-sorted padded COO + CSR row pointers; shape metadata is static.

    Attributes
    ----------
    rows, cols : int32 arrays of shape (E_pad,), row-major sorted; padding
        entries sit at the end with ``rows == n_rows``/``cols == n_cols``.
    vals : float array of shape (E_pad,); zero on padding entries.
    rowptr : int32 array of shape (n_rows + 1,); ``rowptr[-1] == nnz``.
    n_rows, n_cols, nnz : static Python ints (hashable jit metadata).
    """

    rows: jax.Array
    cols: jax.Array
    vals: jax.Array
    rowptr: jax.Array
    n_rows: int
    n_cols: int
    nnz: int

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def n_edges_padded(self) -> int:
        return int(self.rows.shape[0])

    @property
    def dtype(self):
        return self.vals.dtype

    def astype(self, dtype) -> 'CSRMatrix':
        return dataclasses.replace(self, vals=self.vals.astype(dtype))

    def with_vals(self, vals: jax.Array) -> 'CSRMatrix':
        """Same sparsity pattern, new values (shape (E_pad,))."""
        return dataclasses.replace(self, vals=vals)

    def scale_vals(self, scale) -> 'CSRMatrix':
        return dataclasses.replace(self, vals=self.vals * scale)

    # ---- linear algebra -------------------------------------------------

    def __matmul__(self, x):
        return spmm(self, x)

    @property
    def T(self) -> 'CSRMatrix':
        """Transpose, staying on device (stable re-sort by column)."""
        # Padding entries (cols == n_cols) sort to the end because n_cols is
        # strictly larger than every real column id.
        order = jnp.argsort(self.cols, stable=True)
        rows = self.cols[order]
        cols = self.rows[order]
        vals = self.vals[order]
        real = self.rows < self.n_rows
        counts = jnp.zeros(self.n_cols, jnp.int32).at[
            jnp.where(real, self.cols, self.n_cols)].add(
                1, mode='drop', indices_are_sorted=False)
        rowptr = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(counts).astype(jnp.int32),
        ])
        return CSRMatrix(rows=rows, cols=cols, vals=vals, rowptr=rowptr,
                         n_rows=self.n_cols, n_cols=self.n_rows, nnz=self.nnz)


# ---------------------------------------------------------------------------
# Builders (host-side; NumPy in, device pytree out)
# ---------------------------------------------------------------------------

def from_coo(rows, cols, vals, n_rows: int, n_cols: int | None = None,
             *, dtype=None, sum_duplicates: bool = True,
             edge_block: int = EDGE_BLOCK) -> CSRMatrix:
    """Build a padded CSRMatrix from host COO triplets.

    Sorting, dedup and padding happen host-side once per graph; the result is
    an immutable device pytree. Mirrors the canonicalisation the reference
    does in ``Graph.__init__`` (``graphs/graph.py:98-140``) minus validation,
    which lives in :mod:`pygsp_tpu.graphs`.
    """
    if n_cols is None:
        n_cols = n_rows
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals)
    if dtype is not None:
        vals = vals.astype(dtype)
    if not np.issubdtype(vals.dtype, np.floating):
        vals = vals.astype(np.float64)
    if rows.shape != cols.shape or rows.shape != vals.shape:
        raise ValueError('rows/cols/vals must have identical shapes')

    # drop explicit zeros (reference: eliminate_zeros, graph.py:~128)
    keep = vals != 0
    rows, cols, vals = rows[keep], cols[keep], vals[keep]

    if sum_duplicates and rows.size:
        key = rows * n_cols + cols
        order = np.argsort(key, kind='stable')
        key, rows, cols, vals = key[order], rows[order], cols[order], vals[order]
        uniq, inv = np.unique(key, return_inverse=True)
        if uniq.size != key.size:
            summed = np.zeros(uniq.size, dtype=vals.dtype)
            np.add.at(summed, inv, vals)
            rows = (uniq // n_cols)
            cols = (uniq % n_cols)
            vals = summed
    elif rows.size:
        order = np.lexsort((cols, rows))
        rows, cols, vals = rows[order], cols[order], vals[order]

    return _pad_and_build(rows, cols, vals, n_rows, n_cols, edge_block)


def _pad_and_build(rows, cols, vals, n_rows, n_cols, edge_block) -> CSRMatrix:
    nnz = int(rows.size)
    e_pad = max(_round_up(nnz, edge_block), edge_block)
    pad = e_pad - nnz
    rows_p = np.concatenate([rows, np.full(pad, n_rows, dtype=np.int64)])
    cols_p = np.concatenate([cols, np.full(pad, n_cols, dtype=np.int64)])
    vals_p = np.concatenate([vals, np.zeros(pad, dtype=vals.dtype)])

    counts = np.bincount(rows, minlength=n_rows) if nnz else np.zeros(n_rows, np.int64)
    rowptr = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(counts, out=rowptr[1:])

    return CSRMatrix(
        rows=jnp.asarray(rows_p, dtype=jnp.int32),
        cols=jnp.asarray(cols_p, dtype=jnp.int32),
        vals=jnp.asarray(vals_p),
        rowptr=jnp.asarray(rowptr, dtype=jnp.int32),
        n_rows=int(n_rows), n_cols=int(n_cols), nnz=nnz,
    )


def from_scipy(mat, *, dtype=None, edge_block: int = EDGE_BLOCK) -> CSRMatrix:
    """Build from any scipy.sparse matrix (host-side interop path)."""
    coo = mat.tocoo()
    return from_coo(coo.row, coo.col, coo.data, coo.shape[0], coo.shape[1],
                    dtype=dtype, sum_duplicates=True, edge_block=edge_block)


def from_dense(arr, *, dtype=None, edge_block: int = EDGE_BLOCK) -> CSRMatrix:
    arr = np.asarray(arr)
    rows, cols = np.nonzero(arr)
    return from_coo(rows, cols, arr[rows, cols], arr.shape[0], arr.shape[1],
                    dtype=dtype, edge_block=edge_block)


def to_scipy(mat):
    """Export any storage format back to scipy CSR.

    Padding slots are dropped by their sentinel masks (row ``==
    n_rows`` / col ``== n_cols`` for COO/ELL; local col ``>= src chunk
    size`` for the chunked/windowed slabs), and the degree-sort /
    shuffle relabelings of the chunked formats are inverted, so the
    result equals the matrix the builder consumed. Mirrors the
    reference's ``G.W``/``G.L`` always being scipy (graph.py:117)."""
    import scipy.sparse as sps
    if isinstance(mat, ELLMatrix):
        return _ell_to_scipy(mat)
    if isinstance(mat, BandedMatrix):
        return _banded_to_scipy(mat)
    if type(mat).__name__ == 'ChunkedELLMatrix':
        from pygsp_tpu.core import chunked  # local: chunked imports sparse
        return chunked.chunked_to_scipy(mat)
    if type(mat).__name__ == 'WindowedELLMatrix':
        from pygsp_tpu.core import windowed
        return windowed.windowed_to_scipy(mat)
    rows = np.asarray(mat.rows)
    keep = rows < mat.n_rows
    rows = rows[keep]
    cols = np.asarray(mat.cols)[keep]
    vals = np.asarray(mat.vals)[keep]
    return sps.csr_matrix((vals, (rows, cols)), shape=mat.shape)


def _ell_to_scipy(mat: 'ELLMatrix'):
    import scipy.sparse as sps
    parts = []
    co = np.asarray(mat.ell_cols)
    rows0 = np.repeat(np.arange(co.shape[0]), co.shape[1])
    parts.append((rows0, co.ravel(), np.asarray(mat.ell_vals).ravel()))
    for lev in mat.levels:
        lc = np.asarray(lev.cols)
        parts.append((np.repeat(np.asarray(lev.rows), lc.shape[1]),
                      lc.ravel(), np.asarray(lev.vals).ravel()))
    rows = np.concatenate([p[0] for p in parts])
    cols = np.concatenate([p[1] for p in parts])
    vals = np.concatenate([p[2] for p in parts])
    keep = (rows < mat.n_rows) & (cols < mat.n_cols)
    return sps.csr_matrix((vals[keep], (rows[keep], cols[keep])),
                          shape=mat.shape)


def _banded_to_scipy(mat: 'BandedMatrix'):
    import scipy.sparse as sps
    tiles = np.asarray(mat.tiles)          # (nb, 2*half_bw+1, 128, 128)
    nb, ndiag, tr, tc = tiles.shape
    dense = np.zeros((nb * tr, nb * tc), tiles.dtype)
    for i in range(nb):
        for d in range(ndiag):
            j = i + d - mat.half_bw
            if 0 <= j < nb:
                dense[i * tr:(i + 1) * tr, j * tc:(j + 1) * tc] = tiles[i, d]
    return sps.csr_matrix(dense[:mat.n_rows, :mat.n_cols])


def to_dense(mat) -> jax.Array:
    """Densify on device (small matrices only: exact spectral path)."""
    if not isinstance(mat, CSRMatrix):
        return jnp.asarray(to_scipy(mat).toarray())
    out = jnp.zeros(mat.shape, mat.vals.dtype)
    return out.at[mat.rows, mat.cols].add(mat.vals, mode='drop')


# ---------------------------------------------------------------------------
# SpMM (reference implementation; the Pallas kernel lives in ops/)
# ---------------------------------------------------------------------------

def spmm(mat, x: jax.Array) -> jax.Array:
    """``y = A @ x`` for x of shape (n_cols,) or (n_cols, ...).

    Gather-multiply-segment-sum form: the TPU-native replacement for the
    reference's ``G.L.dot(signal)`` (``filters/approximations.py:99``).
    Padding edges carry zero values and out-of-range row ids, so they are
    dropped by the segment reduction. ELLMatrix operands dispatch to the
    scatter-free hybrid path.
    """
    if isinstance(mat, ELLMatrix):
        return ell_spmm(mat, x)
    if isinstance(mat, BandedMatrix):
        return banded_spmm(mat, x)
    if type(mat).__name__ == 'ChunkedELLMatrix':
        from pygsp_tpu.core import chunked  # local: chunked imports sparse
        return chunked.chunked_spmm(mat, x)
    if type(mat).__name__ == 'WindowedELLMatrix':
        from pygsp_tpu.core import windowed
        return windowed.windowed_spmm(mat, x)
    x = jnp.asarray(x)      # numpy would raise on the sentinel indices
    gathered = x[mat.cols]  # out-of-range padding cols clamp (jnp semantics)
    if x.ndim == 1:
        contrib = mat.vals * gathered
    else:
        contrib = mat.vals.reshape((-1,) + (1,) * (x.ndim - 1)) * gathered
    return jax.ops.segment_sum(contrib, mat.rows, num_segments=mat.n_rows,
                               indices_are_sorted=True)


# ---------------------------------------------------------------------------
# Multi-level ELL format (TPU fast path)
# ---------------------------------------------------------------------------

@partial(jax.tree_util.register_dataclass,
         data_fields=['rows', 'cols', 'vals'], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class ELLLevel:
    """One overflow level: ``rows`` (R,) unique row ids; ``cols``/``vals``
    (R, w) slot blocks holding those rows' next w edges."""

    rows: jax.Array
    cols: jax.Array
    vals: jax.Array


@partial(jax.tree_util.register_dataclass,
         data_fields=['ell_cols', 'ell_vals', 'levels', 'rowptr'],
         meta_fields=['n_rows', 'n_cols', 'nnz', 'ell_width'])
@dataclasses.dataclass(frozen=True)
class ELLMatrix:
    """Multi-level ELL: scatter-free level 0 + unique-row overflow levels.

    Why: on TPU, XLA lowers segment-sum to scatter-add which SERIALIZES
    duplicate indices — a power-law hub row with thousands of edges
    becomes a thousands-long sequential chain (measured ~200ns/edge on a
    BA graph vs ~7ns for gathers). This format never feeds the scatter a
    duplicate index:

    - level 0: every row owns ``ell_width`` slots; SpMM is gather +
      per-row dense reduction (no scatter at all);
    - level ℓ ≥ 1: the rows still overflowing get geometrically wider slot
      blocks; each level's partial sums land with ``y.at[rows].add`` where
      ``rows`` are UNIQUE — a fully parallel scatter.

    Slot padding: ``col == n_cols`` (clamped gather), ``val == 0``.
    """

    ell_cols: jax.Array       # (n_rows_pad, ell_width) int32
    ell_vals: jax.Array       # (n_rows_pad, ell_width)
    levels: tuple             # tuple[ELLLevel, ...]
    rowptr: jax.Array         # (n_rows+1,) int32 true degrees
    n_rows: int
    n_cols: int
    nnz: int
    ell_width: int

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.ell_vals.dtype

    def astype(self, dtype) -> 'ELLMatrix':
        return dataclasses.replace(
            self, ell_vals=self.ell_vals.astype(dtype),
            levels=tuple(dataclasses.replace(l, vals=l.vals.astype(dtype))
                         for l in self.levels))

    def scale_vals(self, scale) -> 'ELLMatrix':
        return dataclasses.replace(
            self, ell_vals=self.ell_vals * scale,
            levels=tuple(dataclasses.replace(l, vals=l.vals * scale)
                         for l in self.levels))

    def __matmul__(self, x):
        return ell_spmm(self, x)


def _slot_block_sum(cols, vals, x, chunk: int = 8, out_dtype=None):
    """Σ_d vals[:, d] * x[cols[:, d]] as a buffer-reusing scan over width
    chunks (peak memory O(chunk · R · S); bulk 3-D gathers or fully
    unrolled slot loops blow HBM at BASELINE scale).

    ``out_dtype`` (default: the vals·x promotion dtype) upcasts each
    product before accumulation — the bf16-carry mode reads half-width
    signals but keeps the row sums in f32."""
    odt = jnp.dtype(out_dtype) if out_dtype is not None else None
    bshape = (-1,) + (1,) * (x.ndim - 1)
    width = cols.shape[1]
    chunk = min(chunk, width)
    n_chunks = width // chunk
    rem = width - n_chunks * chunk

    def chunk_sum(cols_c, vals_c):
        term = None
        for j in range(cols_c.shape[1]):
            t = vals_c[:, j].reshape(bshape) * x[cols_c[:, j]]
            if odt is not None:
                t = t.astype(odt)
            term = t if term is None else term + t
        return term

    out_shape = (cols.shape[0],) + x.shape[1:]
    if n_chunks >= 1:
        # seed the scan carry with the first chunk (not jnp.zeros): a
        # data-independent carry breaks reverse-mode varying-axis
        # inference when this runs inside shard_map.
        y = chunk_sum(cols[:, :chunk], vals[:, :chunk])
        if n_chunks > 1:
            cols_s = cols[:, chunk:n_chunks * chunk].reshape(
                -1, n_chunks - 1, chunk).transpose(1, 0, 2)
            vals_s = vals[:, chunk:n_chunks * chunk].reshape(
                -1, n_chunks - 1, chunk).transpose(1, 0, 2)

            def body(acc, cv):
                return acc + chunk_sum(*cv), None

            y, _ = jax.lax.scan(body, y, (cols_s, vals_s))
    else:
        y = jnp.zeros(out_shape, odt if odt is not None else x.dtype)
    if rem:
        y = y + chunk_sum(cols[:, n_chunks * chunk:],
                          vals[:, n_chunks * chunk:])
    return y


def ell_spmm(mat: ELLMatrix, x: jax.Array) -> jax.Array:
    """``y = A @ x`` for the multi-level ELL format (see class docstring)."""
    x = jnp.asarray(x)      # numpy would raise on the sentinel indices
    with jax.named_scope('spmm_ell'):
        y = _slot_block_sum(mat.ell_cols, mat.ell_vals, x)[:mat.n_rows]
        for level in mat.levels:
            partial_sum = _slot_block_sum(level.cols, level.vals, x)
            y = y.at[level.rows].add(partial_sum, mode='drop',
                                     unique_indices=True)
    return y


def to_ell(mat: CSRMatrix, width: int | None = None,
           row_block: int = ROW_BLOCK, level_factor: int = 2) -> ELLMatrix:
    """Device CSR → multi-level ELL (delegates to the host packer)."""
    rows = np.asarray(mat.rows)[:mat.nnz]
    cols = np.asarray(mat.cols)[:mat.nnz]
    vals = np.asarray(mat.vals)[:mat.nnz]
    return ell_from_host_coo(rows, cols, vals, mat.n_rows, mat.n_cols,
                             width=width, level_factor=level_factor,
                             row_block=row_block)


def ell_from_host_coo(rows, cols, vals, n_rows: int, n_cols: int,
                      *, width: int | None = None, level_factor: int = 2,
                      row_block: int = ROW_BLOCK) -> ELLMatrix:
    """Build a multi-level ELL directly from host COO (row-sorted, deduped).

    One device push of the final slot arrays only — avoids materialising a
    device CSR first (on a remote-tunnel TPU the extra ~2x transfers of
    padded COO dominate graph-build time).
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals)
    n = n_rows
    counts = np.bincount(rows, minlength=n) if rows.size else np.zeros(n, np.int64)
    rowptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=rowptr[1:])
    deg = counts

    if width is None:
        if rows.size == 0 or n == 0:
            width = 8
        else:
            mean = max(1, int(np.ceil(rows.size / n)))
            width = max(_round_up(mean, 8), 8)

    n_pad = max(_round_up(n, row_block), row_block)

    def pack(row_subset, base, w):
        """Slot block [base, base+w) of each row — O(R*w) CSR-range
        gathers (no edge-wide masks; this is what makes 100M-edge packs
        take seconds instead of a minute)."""
        starts = rowptr[row_subset] + base
        ends = rowptr[row_subset + 1] if len(row_subset) < n else rowptr[1:]
        idx = starts[:, None] + np.arange(w)[None, :]
        valid = idx < ends[:, None]
        idx = np.minimum(idx, max(rows.size - 1, 0))
        pc = np.where(valid, cols[idx], n_cols).astype(np.int32)
        pv = np.where(valid, vals[idx], 0).astype(vals.dtype)
        return pc, pv

    all_rows = np.arange(n, dtype=np.int64)
    if rows.size:
        c0, v0 = pack(all_rows, 0, width)
    else:
        c0 = np.full((n, width), n_cols, np.int32)
        v0 = np.zeros((n, width), vals.dtype)
    ell_cols = np.full((n_pad, width), n_cols, dtype=np.int32)
    ell_vals = np.zeros((n_pad, width), dtype=vals.dtype)
    ell_cols[:n] = c0
    ell_vals[:n] = v0

    levels = []
    base = width
    w = max(_round_up(width, 8), 8)
    maxdeg = int(deg.max()) if n else 0
    while base < maxdeg:
        lrows = np.flatnonzero(deg > base)
        remaining_max = int((deg[lrows] - base).max())
        w = min(w, max(_round_up(remaining_max, 8), 8))
        lc, lv = pack(lrows, base, w)
        levels.append(ELLLevel(rows=jnp.asarray(lrows, jnp.int32),
                               cols=jnp.asarray(lc), vals=jnp.asarray(lv)))
        base += w
        w = max(_round_up(w * level_factor, 8), 8)

    return ELLMatrix(
        ell_cols=jnp.asarray(ell_cols), ell_vals=jnp.asarray(ell_vals),
        levels=tuple(levels), rowptr=jnp.asarray(rowptr, jnp.int32),
        n_rows=n, n_cols=n_cols, nnz=int(rows.size), ell_width=width)


def ell_from_scipy(mat, *, dtype=None, width: int | None = None,
                   level_factor: int = 2) -> ELLMatrix:
    """scipy sparse → multi-level ELL with a single host→device push."""
    csr = mat.tocsr()
    csr.sum_duplicates()
    coo = csr.tocoo()
    vals = coo.data if dtype is None else coo.data.astype(dtype)
    return ell_from_host_coo(coo.row, coo.col, vals,
                             coo.shape[0], coo.shape[1], width=width,
                             level_factor=level_factor)


# ---------------------------------------------------------------------------
# Block-banded dense format (MXU fast path for mesh-like graphs)
# ---------------------------------------------------------------------------

BAND_TILE = 128  # MXU systolic array dimension


@partial(jax.tree_util.register_dataclass,
         data_fields=['tiles'],
         meta_fields=['n_rows', 'n_cols', 'nnz', 'half_bw'])
@dataclasses.dataclass(frozen=True)
class BandedMatrix:
    """Block-banded dense storage: 128-row tiles × (2·half_bw+1) col tiles.

    For graphs whose reverse-Cuthill–McKee ordering confines every edge to
    a band of ``half_bw`` 128-wide tiles (meshes, grids, road networks:
    bandwidth ~O(√N)), SpMM becomes a batch of dense 128×128 matmuls —
    pure MXU work streaming at HBM bandwidth, with none of the per-row
    gather overhead of the sparse paths (measured ~50x on grid graphs).

    tiles: (nb, 2·half_bw+1, 128, 128); tiles[i, d] multiplies x block
    ``i + d - half_bw`` (out-of-range blocks are zero).
    """

    tiles: jax.Array
    n_rows: int
    n_cols: int
    nnz: int
    half_bw: int

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.tiles.dtype

    def astype(self, dtype) -> 'BandedMatrix':
        return dataclasses.replace(self, tiles=self.tiles.astype(dtype))

    def scale_vals(self, scale) -> 'BandedMatrix':
        return dataclasses.replace(self, tiles=self.tiles * scale)

    def __matmul__(self, x):
        return banded_spmm(self, x)


def banded_spmm(mat: BandedMatrix, x: jax.Array) -> jax.Array:
    """``y = A @ x`` as a banded batch of MXU matmuls."""
    x = jnp.asarray(x)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    lead = x.shape[1:]
    nb = mat.tiles.shape[0]
    b = mat.half_bw
    n_pad = nb * BAND_TILE
    xf = x.reshape(x.shape[0], -1)
    if xf.shape[0] < n_pad:
        xf = jnp.pad(xf, ((0, n_pad - xf.shape[0]), (0, 0)))
    xb = xf.reshape(nb, BAND_TILE, -1)
    zeros = jnp.zeros((b, BAND_TILE, xb.shape[-1]), xb.dtype)
    xp = jnp.concatenate([zeros, xb, zeros], axis=0)        # (nb+2b, 128, S)
    # windows: xw[i, d] = x block (i + d - b)
    xw = jnp.stack([xp[d:d + nb] for d in range(2 * b + 1)], axis=1)
    yb = jnp.einsum('ndab,ndbs->nas', mat.tiles, xw,
                    preferred_element_type=xb.dtype)
    y = yb.reshape(n_pad, -1)[:mat.n_rows]
    y = y.reshape((mat.n_rows,) + lead)
    return y[:, 0] if squeeze else y


def banded_from_scipy(mat, *, dtype=None, max_half_bw: int = 16):
    """scipy sparse (already ordered; use RCM first) → BandedMatrix.

    Returns None if the matrix's block bandwidth exceeds ``max_half_bw``
    tiles (the dense band would waste too much memory/FLOPs).
    ``dtype=jnp.bfloat16`` halves tile memory/bandwidth (accumulation
    stays fp32 via ``preferred_element_type``) at ~3 decimal digits of
    edge-weight precision — fine for diffusion-style workloads, not for
    reference-parity tests.
    """
    coo = mat.tocoo()
    n = coo.shape[0]
    if dtype is None:
        dtype = np.float64 if jax.config.jax_enable_x64 else np.float32
    if coo.nnz == 0:
        bw = 0
    else:
        bw = int(np.max(np.abs(coo.row.astype(np.int64) - coo.col)))
    b = -(-bw // BAND_TILE)  # ceil
    if b > max_half_bw:
        return None
    nb = max(-(-n // BAND_TILE), 1)
    tiles = np.zeros((nb, 2 * b + 1, BAND_TILE, BAND_TILE), dtype=dtype)
    ti = coo.row // BAND_TILE
    ri = coo.row % BAND_TILE
    tj = coo.col // BAND_TILE
    d = tj - ti + b
    cj = coo.col % BAND_TILE
    ok = (d >= 0) & (d < 2 * b + 1)
    assert ok.all(), 'edge outside declared band'
    np.add.at(tiles, (ti, d, ri, cj), coo.data.astype(dtype))
    return BandedMatrix(tiles=jnp.asarray(tiles), n_rows=n, n_cols=n,
                        nnz=int(coo.nnz), half_bw=b)
