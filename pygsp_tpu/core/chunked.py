"""Chunked multi-level ELL — the TPU fast path for large power-law graphs.

Why this format exists: on this TPU generation, XLA row-gathers run at
~2.7-4.4 ns/row when the gather operand is a buffer of <= 2^16 rows and
~11 ns/row on larger operands — a measured cliff
(``benchmarks/gather_probe*.py``, ``benchmarks/chunked_diag*.py``). The
cliff follows the OPERAND BUFFER, not the index range: gathers with
chunk-local indices into a full-size operand stay slow
(``chunked_diag9.py``), while gathers into materialised slices or
tuple-carried chunk buffers are fast (``chunked_diag8.py``). A power-law
graph at BASELINE scale (N ~ 10^6) always exceeds the window, so the
plain :class:`ELLMatrix` pays ~4x on every slot gather. This format
splits the SOURCE vertex axis into chunks of ``chunk_rows`` and the
signal into a TUPLE of per-chunk buffers; every gather then indexes a
within-window operand.

Measured constraints that shape the design:

- per-(out,src)-block slot widths beat per-src-chunk widths: the block
  width cost model yields slot padding ~1.66 vs ~2.24 (traffic is the
  limiter — gathers run at memory speed below the cliff);
- the unrolled 256-block main path compiles in ~12 s; per-block
  overflow levels were the compile hog (≈700 tiny gather+scatter ops,
  +80-150 s compile, ``chunked_diag10.py`` D3) — so overflow levels are
  MERGED across out-chunk blocks per (src chunk, tier) and folded with
  ONE global scatter-add (``level_rows``);
- unique-index scatters cost ~16-30 ns/row everywhere — the bulk of
  every block is a scatter-free dense slot array and only per-row
  overflow (hub rows) goes through the scatter;
- bf16 gather operands are NOT faster (row-rate-bound below the cliff,
  ``chunked_diag10.py`` D1) — values stay f32.

Layout: for each (output chunk ``i``, source chunk ``c``) block with any
edges, a dense main slot block ``(R_i, w)``: every output row of chunk
``i`` owns ``w`` slots holding its first ``w`` neighbours inside source
chunk ``c`` (gather + multiply + per-row sum — no scatter). ``w`` is
chosen per block by minimising ``R_i*w*g + spill_edges(w)*g +
spill_rows(w)*s`` with measured gather/scatter costs. Rows still
spilling get geometrically wider slot tiers per (source chunk, tier)
(:class:`ChunkLevel`), accumulated into the concatenated output with a
single ``y.at[level_rows].add``.

The math is exactly ``y = A @ x`` — the reference's ``G.L.dot(signal)``
(``pygsp/filters/approximations.py:99``) — only the storage is blocked.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pygsp_tpu.core.sparse import _slot_block_sum

# Default source/output chunk size. 2^17 rows x 128 f32 sits exactly at
# the 64 MiB staging boundary and measures ~10 ns/slot on the real
# matrix; 2^16 measures ~3-4 ns/slot (benchmarks/chunked_diag6.py
# P5/P6) at a ~20% slot-padding premium — net ~2.4x faster.
CHUNK_ROWS = 1 << 16


@partial(jax.tree_util.register_dataclass,
         data_fields=['cols', 'vals'], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class ChunkBlock:
    """One (out-chunk, src-chunk) main slot block.

    ``cols``/``vals``: (R_i, w) slot arrays; column ids are LOCAL to the
    source chunk with sentinel ``== src_chunk_size`` (clamped gather,
    zero value). ``w`` may be 0 (hub-only block): then all of the
    block's edges live in the chunk levels.
    """

    cols: jax.Array
    vals: jax.Array


@partial(jax.tree_util.register_dataclass,
         data_fields=['cols', 'vals'], meta_fields=['src_chunk'])
@dataclasses.dataclass(frozen=True)
class ChunkLevel:
    """Overflow slot tier for one source chunk, merged across out chunks.

    ``cols``/``vals``: (m, lw) slot arrays for the m spilling rows, in
    the global order of :attr:`ChunkedELLMatrix.level_rows`; ``cols``
    local to ``src_chunk`` with the same sentinel convention.
    """

    cols: jax.Array
    vals: jax.Array
    src_chunk: int


@partial(jax.tree_util.register_dataclass,
         data_fields=['blocks', 'levels', 'level_rows', 'rowptr',
                      'perm', 'iperm'],
         meta_fields=['block_keys', 'n_rows', 'n_cols', 'nnz', 'chunk_rows'])
@dataclasses.dataclass(frozen=True)
class ChunkedELLMatrix:
    """Chunked multi-level ELL sparse matrix (see module docstring).

    ``blocks[k]`` is the :class:`ChunkBlock` for ``block_keys[k] =
    (out_chunk, src_chunk)``; empty blocks are omitted. ``levels`` are
    the merged overflow tiers; ``level_rows`` holds the GLOBAL output
    row of every level slot-row, concatenated in level order (one
    scatter-add folds all overflow). ``rowptr`` holds true global row
    degrees (CSR pointer, ORIGINAL row order) for degree queries.

    ``perm``/``iperm`` (optional): degree-sort relabeling. The stored
    blocks hold ``A' = A[perm][:, perm]`` (descending-degree order), so
    row degrees are homogeneous WITHIN each chunk — slot padding stays
    near 1 on power-law graphs and hub overflow concentrates in the
    first chunk's levels. ``perm[i]`` is the original id of sorted row
    ``i``; ``iperm`` is its inverse. The ``A @ x`` contract is in
    ORIGINAL order: :func:`chunked_spmm` permutes on entry/exit, and
    iterative drivers (Chebyshev) hoist both permutes outside the loop.
    """

    blocks: tuple
    levels: tuple
    level_rows: jax.Array
    rowptr: jax.Array
    block_keys: tuple
    n_rows: int
    n_cols: int
    nnz: int
    chunk_rows: int
    perm: jax.Array | None = None
    iperm: jax.Array | None = None

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.blocks[0].vals.dtype if self.blocks else jnp.float32

    @property
    def n_out_chunks(self) -> int:
        return max(-(-self.n_rows // self.chunk_rows), 1)

    @property
    def n_src_chunks(self) -> int:
        return max(-(-self.n_cols // self.chunk_rows), 1)

    def out_chunk_size(self, i: int) -> int:
        return min(self.chunk_rows, self.n_rows - i * self.chunk_rows)

    def src_chunk_size(self, c: int) -> int:
        return min(self.chunk_rows, self.n_cols - c * self.chunk_rows)

    def astype(self, dtype) -> 'ChunkedELLMatrix':
        return dataclasses.replace(
            self,
            blocks=tuple(dataclasses.replace(b, vals=b.vals.astype(dtype))
                         for b in self.blocks),
            levels=tuple(dataclasses.replace(l, vals=l.vals.astype(dtype))
                         for l in self.levels))

    def scale_vals(self, scale) -> 'ChunkedELLMatrix':
        return dataclasses.replace(
            self,
            blocks=tuple(dataclasses.replace(b, vals=b.vals * scale)
                         for b in self.blocks),
            levels=tuple(dataclasses.replace(l, vals=l.vals * scale)
                         for l in self.levels))

    def abs_vals(self) -> 'ChunkedELLMatrix':
        return dataclasses.replace(
            self,
            blocks=tuple(dataclasses.replace(b, vals=jnp.abs(b.vals))
                         for b in self.blocks),
            levels=tuple(dataclasses.replace(l, vals=jnp.abs(l.vals))
                         for l in self.levels))

    def spmm_chunks(self, x_chunks, out_dtype=None) -> tuple:
        return chunked_spmm_chunks(self, x_chunks, out_dtype=out_dtype)

    def __matmul__(self, x):
        return chunked_spmm(self, x)


# ---------------------------------------------------------------------------
# Signal chunking helpers
# ---------------------------------------------------------------------------

def chunk_signal(x: jax.Array, chunk_rows: int) -> tuple:
    """Split the leading axis into static slices of ``chunk_rows``."""
    n = x.shape[0]
    return tuple(x[s:min(s + chunk_rows, n)]
                 for s in range(0, n, chunk_rows))


def unchunk_signal(chunks, axis: int = 0) -> jax.Array:
    return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis)


# ---------------------------------------------------------------------------
# SpMM
# ---------------------------------------------------------------------------

def chunked_spmm_chunks(mat: ChunkedELLMatrix, x_chunks,
                        out_dtype=None) -> tuple:
    """``y_chunks = A @ x_chunks`` with tuple-of-chunk input and output.

    This is the form the Chebyshev scan carries: every gather operand is
    one chunk buffer, staying below the gather cliff. All overflow
    levels fold with ONE scatter-add on the concatenated output
    (re-chunking afterwards is two streaming copies — cheap; hundreds of
    per-block scatter ops were the compile + runtime hog, see module
    docstring).

    ``out_dtype``: accumulation/output dtype when the carried chunks are
    narrower (bf16-carry mode) — see :func:`windowed.windowed_spmm_chunks`.
    """
    n_out = mat.n_out_chunks
    y = [None] * n_out
    with jax.named_scope('spmm_chunked'):
        for (i, c), blk in zip(mat.block_keys, mat.blocks):
            if blk.cols.shape[1] > 0:
                t = _slot_block_sum(blk.cols, blk.vals,
                                    jnp.asarray(x_chunks[c]),
                                    out_dtype=out_dtype)
                y[i] = t if y[i] is None else y[i] + t
        x0 = jnp.asarray(x_chunks[0])
        ydt = (jnp.dtype(out_dtype) if out_dtype is not None
               else jnp.promote_types(x0.dtype, mat.dtype))
        for i in range(n_out):
            if y[i] is None:
                y[i] = jnp.zeros((mat.out_chunk_size(i),) + x0.shape[1:],
                                 ydt)
        if mat.levels:
            ps = jnp.concatenate(
                [_slot_block_sum(lev.cols, lev.vals,
                                 jnp.asarray(x_chunks[lev.src_chunk]),
                                 out_dtype=out_dtype)
                 for lev in mat.levels])
            yf = y[0] if n_out == 1 else jnp.concatenate(y)
            # level_rows repeat across chunks/tiers: not unique_indices
            yf = yf.at[mat.level_rows].add(ps, mode='drop')
            if n_out == 1:
                return (yf,)
            R = mat.chunk_rows
            return tuple(yf[i * R:i * R + mat.out_chunk_size(i)]
                         for i in range(n_out))
    return tuple(y)


def permute_in(mat: ChunkedELLMatrix, x: jax.Array, axis: int = 0):
    """Original-order signal → the matrix's internal (sorted) order."""
    if mat.perm is None:
        return x
    return jnp.take(x, mat.perm, axis=axis)


def permute_out(mat: ChunkedELLMatrix, y: jax.Array, axis: int = 0):
    """Internal (sorted) order → original vertex order."""
    if mat.perm is None:
        return y
    return jnp.take(y, mat.iperm, axis=axis)


def chunked_spmm(mat: ChunkedELLMatrix, x: jax.Array) -> jax.Array:
    """``y = A @ x`` with full-array input/output (generic fallback path).

    Entry gathers read from slices of ``x`` (which XLA materialises as
    chunk buffers); hot loops use :func:`chunked_spmm_chunks` with a
    carried tuple and hoist the degree-sort permutes outside the loop.
    """
    x = permute_in(mat, jnp.asarray(x))
    xc = chunk_signal(x, mat.chunk_rows)
    return permute_out(mat, unchunk_signal(chunked_spmm_chunks(mat, xc)))


# ---------------------------------------------------------------------------
# Builder (host-side)
# ---------------------------------------------------------------------------

# Measured per-op costs (ns) driving the per-block width choice; see
# benchmarks/gather_probe2.py / chunked_diag*.py on this chip.
_GATHER_NS = 3.5       # one slot gather+mul+add below the cliff
_SCATTER_NS = 25.0     # one scatter row into the concatenated output
_LEVEL_PAD = 1.3       # average level slot padding factor


def _choose_width(counts: np.ndarray, r_rows: int, w_cap: int = 64) -> int:
    """Pick the main slot width minimising the measured-cost model.

    ``counts``: per-row edge counts within the block (only rows that have
    edges). Cost(w) = r_rows*w*g + spill_edges(w)*g*pad + spill_rows(w)*s.
    """
    if counts.size == 0:
        return 0
    maxd = int(counts.max())
    hist = np.bincount(counts, minlength=maxd + 1).astype(np.float64)
    d = np.arange(maxd + 1, dtype=np.float64)
    # suffix sums: rows with count > w, and their excess edges
    rows_gt = np.cumsum(hist[::-1])[::-1]          # rows with count >= d
    edges_ge = np.cumsum((hist * d)[::-1])[::-1]   # edges in rows count >= d
    ws = np.arange(0, min(maxd, w_cap) + 1, dtype=np.int64)
    spill_rows = np.where(ws + 1 <= maxd, rows_gt[np.minimum(ws + 1, maxd)], 0.0)
    spill_edges = np.where(
        ws + 1 <= maxd,
        edges_ge[np.minimum(ws + 1, maxd)] - ws * spill_rows, 0.0)
    cost = (r_rows * ws * _GATHER_NS
            + spill_edges * _GATHER_NS * _LEVEL_PAD
            + spill_rows * _SCATTER_NS)
    return int(ws[int(np.argmin(cost))])


def chunked_from_host_coo(rows, cols, vals, n_rows: int, n_cols: int, *,
                          chunk_rows: int = CHUNK_ROWS,
                          level_factor: int = 4,
                          min_level_width: int = 2,
                          max_tiers: int = 4,
                          permute: str | None = None,
                          dtype=None) -> ChunkedELLMatrix:
    """Build a :class:`ChunkedELLMatrix` from host COO (deduped edges).

    All packing is vectorised NumPy (CSR-range gathers, no edge-wide
    masks); device upload is ONE pytree transfer at the end (per-leaf
    pushes pay a host->device round trip each over the axon tunnel).

    ``permute='degree'`` relabels vertices in descending-degree order
    before packing (square matrices only); the ``A @ x`` contract keeps
    ORIGINAL vertex order (see :class:`ChunkedELLMatrix`). Off by
    default: on the bench BA graph it does NOT reduce slot padding —
    per-(row, src-chunk) counts are ~Poisson(avg_deg/n_chunks), and
    reordering rows cannot reduce that variance (measured pad 2.19
    sorted vs 2.07 unsorted, with the hub chunk deepening overflow
    tiers and the entry/exit permutes costing ~11 ms each at N=1M —
    ``benchmarks/degree_sort_probe.py``). Kept for degree distributions
    where per-chunk counts DO track total degree.
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals)
    if dtype is not None:
        vals = vals.astype(dtype)
    if not np.issubdtype(vals.dtype, np.floating):
        vals = vals.astype(np.float64)
    R = int(chunk_rows)
    n_src = max(-(-n_cols // R), 1)

    deg = np.bincount(rows, minlength=n_rows) if rows.size else np.zeros(
        n_rows, np.int64)
    rowptr = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(deg, out=rowptr[1:])

    perm = iperm = None
    if permute == 'degree' and n_rows == n_cols and n_rows > 0:
        # stable sort keeps original order inside equal-degree runs, so
        # deterministic builds stay byte-reproducible
        perm = np.argsort(-deg, kind='stable')
        iperm = np.empty_like(perm)
        iperm[perm] = np.arange(n_rows, dtype=perm.dtype)
        rows = iperm[rows]
        cols = iperm[cols]
    elif permute not in (None, 'degree'):
        raise ValueError(f'Unknown permute mode {permute!r}')

    # the packer needs row-grouped edges (block-local CSR ranges); the
    # degree relabel above — or an arbitrary caller — breaks that
    o = np.lexsort((cols, rows))
    rows, cols, vals = rows[o], cols[o], vals[o]

    # sort edges by (src_chunk, out_chunk), stable to preserve row order;
    # src-major so each source chunk's levels merge over adjacent blocks
    bid = (cols // R) * max(-(-n_rows // R), 1) + (rows // R)
    order = np.argsort(bid, kind='stable')
    rows_s, cols_s, vals_s, bid_s = (rows[order], cols[order], vals[order],
                                     bid[order])
    n_out = max(-(-n_rows // R), 1)
    blk_ids, blk_starts = np.unique(bid_s, return_index=True)
    blk_ends = np.append(blk_starts[1:], rows_s.size)

    blocks = []
    block_keys = []
    # per src chunk: spilling rows across out blocks, for merged tiers
    spill = {}   # c -> list of (urows_global, ucounts, base_w, pack_fn)
    for b, s0, s1 in zip(blk_ids, blk_starts, blk_ends):
        c, i = int(b) // n_out, int(b) % n_out
        r_i = min(R, n_rows - i * R)
        s_c = min(R, n_cols - c * R)
        lr = (rows_s[s0:s1] - i * R).astype(np.int64)   # local out rows
        lc = (cols_s[s0:s1] - c * R).astype(np.int32)   # local src cols
        lv = vals_s[s0:s1]
        # per-row counts and block-local CSR (rows are sorted within block)
        urows, ucounts = np.unique(lr, return_counts=True)
        ustarts = np.zeros(urows.size, np.int64)
        np.cumsum(ucounts[:-1], out=ustarts[1:])

        w = _choose_width(ucounts, r_i)

        def pack_rows(sub, base, width, *, _ustarts=ustarts,
                      _ucounts=ucounts, _lr=lr, _lc=lc, _lv=lv, _s_c=s_c):
            """Slots [base, base+width) of each row in ``sub`` (indices
            into urows) — O(rows*width) CSR-range gathers."""
            st = _ustarts[sub] + base
            en = _ustarts[sub] + _ucounts[sub]
            idx = st[:, None] + np.arange(width)[None, :]
            valid = idx < en[:, None]
            idx = np.minimum(idx, max(_lr.size - 1, 0))
            pc = np.where(valid, _lc[idx], _s_c).astype(np.int32)
            pv = np.where(valid, _lv[idx], 0).astype(vals.dtype)
            return pc, pv

        if w > 0:
            pc, pv = pack_rows(np.arange(urows.size), 0, w)
            main_c = np.full((r_i, w), s_c, np.int32)
            main_v = np.zeros((r_i, w), vals.dtype)
            main_c[urows] = pc
            main_v[urows] = pv
        else:
            main_c = np.zeros((r_i, 0), np.int32)
            main_v = np.zeros((r_i, 0), vals.dtype)
        blocks.append(ChunkBlock(cols=main_c, vals=main_v))
        block_keys.append((i, c))

        if ucounts.size and int(ucounts.max()) > w:
            sub = np.flatnonzero(ucounts > w)
            spill.setdefault(c, []).append(
                (urows[sub] + i * R, ucounts[sub] - w, w, sub, pack_rows))

    levels = []
    level_rows_parts = []
    for c in sorted(spill):
        parts = spill[c]
        maxrem = max(int(p[1].max()) for p in parts)
        base_off = 0
        lw = min_level_width
        tier = 0
        while base_off < maxrem:
            tier += 1
            if tier >= max_tiers:
                lw = maxrem - base_off   # final tier swallows the rest:
                # tier count is a compile-time cost (each tier is a
                # distinct gather group); the deepest rows are a handful
                # of hubs, so the extra slot padding is negligible
            lw = min(lw, maxrem - base_off)
            tier_c, tier_v, tier_rows = [], [], []
            for grows, grem, base_w, sub, pack_fn in parts:
                live = grem > base_off
                if not live.any():
                    continue
                pc, pv = pack_fn(sub[live], base_w + base_off, lw)
                tier_c.append(pc)
                tier_v.append(pv)
                tier_rows.append(grows[live])
            levels.append(ChunkLevel(cols=np.concatenate(tier_c),
                                     vals=np.concatenate(tier_v),
                                     src_chunk=c))
            level_rows_parts.append(np.concatenate(tier_rows))
            base_off += lw
            lw = max(lw * level_factor, min_level_width)

    level_rows = (np.concatenate(level_rows_parts).astype(np.int32)
                  if level_rows_parts else np.zeros(0, np.int32))
    host = ChunkedELLMatrix(
        blocks=tuple(blocks), levels=tuple(levels), level_rows=level_rows,
        rowptr=rowptr.astype(np.int32), block_keys=tuple(block_keys),
        n_rows=int(n_rows), n_cols=int(n_cols), nnz=int(rows.size),
        chunk_rows=R,
        perm=None if perm is None else perm.astype(np.int32),
        iperm=None if iperm is None else iperm.astype(np.int32))
    return jax.device_put(host)


def chunked_from_scipy(mat, *, dtype=None, permute: str | None = None,
                       chunk_rows: int = CHUNK_ROWS) -> ChunkedELLMatrix:
    """scipy sparse → chunked multi-level ELL."""
    csr = mat.tocsr()
    csr.sum_duplicates()
    coo = csr.tocoo()
    return chunked_from_host_coo(coo.row, coo.col, coo.data,
                                 coo.shape[0], coo.shape[1],
                                 chunk_rows=chunk_rows, permute=permute,
                                 dtype=dtype)


def chunked_to_scipy(mat: ChunkedELLMatrix):
    """Export back to scipy CSR: unpack the block slabs and level tiers
    (dropping local-col sentinel padding) and invert the degree-sort
    relabeling (``A' = A[perm][:, perm]`` → original ids ``perm[r]``)."""
    import scipy.sparse as sps
    R = mat.chunk_rows
    rows_l, cols_l, vals_l = [], [], []

    def emit(grows, lcols, vals, src_chunk):
        lcols = lcols.ravel()
        vals = vals.ravel()
        keep = lcols < mat.src_chunk_size(src_chunk)
        rows_l.append(grows[keep])
        cols_l.append(lcols[keep].astype(np.int64) + src_chunk * R)
        vals_l.append(vals[keep])

    for (i, c), blk in zip(mat.block_keys, mat.blocks):
        co = np.asarray(blk.cols)
        if co.size == 0:
            continue
        grows = np.repeat(np.arange(co.shape[0], dtype=np.int64) + i * R,
                          co.shape[1])
        emit(grows, co, np.asarray(blk.vals), c)

    lr = np.asarray(mat.level_rows, dtype=np.int64)
    off = 0
    for lev in mat.levels:
        co = np.asarray(lev.cols)
        grows = np.repeat(lr[off:off + co.shape[0]], co.shape[1])
        off += co.shape[0]
        emit(grows, co, np.asarray(lev.vals), lev.src_chunk)

    rows = np.concatenate(rows_l) if rows_l else np.zeros(0, np.int64)
    cols = np.concatenate(cols_l) if cols_l else np.zeros(0, np.int64)
    vals = (np.concatenate(vals_l) if vals_l
            else np.zeros(0, np.asarray(mat.dtype).dtype))
    if mat.perm is not None:
        p = np.asarray(mat.perm, dtype=np.int64)
        rows, cols = p[rows], p[cols]
    return sps.csr_matrix((vals, (rows, cols)), shape=mat.shape)
