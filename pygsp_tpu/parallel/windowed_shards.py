"""Windowed-compact local SpMM for the sharded (multi-chip) path.

The single-chip hot path stores power-law graphs in the windowed-compact
ELL format (:mod:`pygsp_tpu.core.windowed`: exact-packed slots per
64-row output window, one-hot MXU fold — ~1.16x slot padding vs ~2x for
row-aligned ELL and sub-cliff gathers). This module gives each SHARD of
a :class:`~pygsp_tpu.parallel.partition.ShardedGraph` the same format
for its local (extended-column) edges, so the per-chip SpMM inside
``shard_map`` runs at the single-chip speed instead of the round-1
row-aligned :class:`~pygsp_tpu.parallel.partition.ShardedELL` layout.

``shard_map`` requires identical array shapes on every shard, so all
data-dependent sizes are unified at build time:

- ONE slab width ``L`` chosen from the pooled per-window slot demands of
  every shard (same cost model as the single-chip builder);
- residue level tiers get per-(src chunk, tier) row counts equal to the
  max over shards; shards with fewer residue rows pad with sentinel rows
  (``level_rows == n_out*NW*P``, dropped by the ``mode='drop'`` scatter)
  and sentinel slots (clamped gather x 0 value).

Column ids live in the extended-local space ``[0, n_local + halo_total)``
— same receive-slot layout as the COO/ELL paths, so the halo exchange is
unchanged. Replaces the role scipy CSR plays in the reference's
``cheby_op`` (``pygsp/filters/approximations.py:99``) at multi-chip scale.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pygsp_tpu.core.chunked import ChunkLevel
from pygsp_tpu.core.windowed import (WINDOW_ROWS, WindowedELLMatrix,
                                     _WIDE_TIER, _auto_span,
                                     _choose_slab_width, _pack_slabs,
                                     _window_counts, windowed_spmm)
from pygsp_tpu.parallel.partition import ShardedGraph


@partial(jax.tree_util.register_dataclass,
         data_fields=['cols', 'vals', 'rowid', 'lvl_cols', 'lvl_vals',
                      'level_rows'],
         meta_fields=['lvl_src', 'n_local', 'n_ext', 'nnz', 'chunk_rows',
                      'window_rows', 'borrow_span'])
@dataclasses.dataclass(frozen=True)
class ShardedWindowed:
    """Stacked per-shard windowed-compact matrices (leading axis = shard).

    ``cols``/``vals``/``rowid``: ``(S, n_out, NW, n_src, L)`` slot slabs
    in the single-chip layout. ``lvl_cols[k]``/``lvl_vals[k]``:
    ``(S, m_k, w_k)`` residue tier ``k`` (source chunk ``lvl_src[k]``);
    ``level_rows``: ``(S, M)`` global local-row ids of every tier entry
    concatenated in tier order (sentinel ``n_out*NW*P`` = padding).
    """

    cols: jax.Array
    vals: jax.Array
    rowid: jax.Array
    lvl_cols: tuple
    lvl_vals: tuple
    level_rows: jax.Array
    lvl_src: tuple
    n_local: int
    n_ext: int
    nnz: int
    chunk_rows: int
    window_rows: int
    borrow_span: int = 2

    @property
    def dtype(self):
        return self.vals.dtype

    def astype(self, dtype) -> 'ShardedWindowed':
        """Cast the stored VALUES (slabs + residue tiers). With bf16 the
        per-(window) one-hot fold runs a single native MXU pass instead
        of the f32 HIGHEST emulation — exact for unit/power-of-two
        weights, an approximation otherwise (pair with ``carry_dtype``
        under the same measured error budget)."""
        return dataclasses.replace(
            self, vals=self.vals.astype(dtype),
            lvl_vals=tuple(v.astype(dtype) for v in self.lvl_vals))

    def local_matrix(self) -> WindowedELLMatrix:
        """THIS shard's slice as a single-chip matrix (inside shard_map,
        where every leaf arrives with a leading block axis of 1)."""
        return WindowedELLMatrix(
            cols=self.cols[0], vals=self.vals[0], rowid=self.rowid[0],
            levels=tuple(
                ChunkLevel(cols=lc[0], vals=lv[0], src_chunk=c)
                for lc, lv, c in zip(self.lvl_cols, self.lvl_vals,
                                     self.lvl_src)),
            level_rows=self.level_rows[0],
            rowptr=jnp.zeros(0, jnp.int32),
            n_rows=self.n_local, n_cols=self.n_ext, nnz=self.nnz,
            chunk_rows=self.chunk_rows, window_rows=self.window_rows,
            borrow_span=self.borrow_span)

    def local_spmm(self, x: jax.Array) -> jax.Array:
        """``y = A_shard @ x`` with full-array input/output."""
        return windowed_spmm(self.local_matrix(), x)

    def local_spmm_chunks(self, x_chunks, out_dtype=None) -> tuple:
        """``y_chunks = A_shard @ x_chunks`` — tuple-of-chunk form for the
        chunk-carried sharded recurrence (no per-step chunk/unchunk
        copies; see :func:`pygsp_tpu.parallel.sharded.sharded_cheby_op`)."""
        from pygsp_tpu.core.windowed import windowed_spmm_chunks
        return windowed_spmm_chunks(self.local_matrix(), x_chunks,
                                    out_dtype=out_dtype)


def _fixed_residue_tiers(per_shard_residue, R, n_src, vdtype, n_out_rows):
    """Pack every shard's residue COO into SHARED-shape level tiers.

    ``per_shard_residue``: list over shards of ``(rows, cols, vals)``
    (cols in extended-local space). Returns ``(lvl_cols, lvl_vals,
    level_rows, lvl_src)`` with stacked ``(S, m, w)`` tiers, row counts
    maxed over shards, sentinel-padded (rows -> ``n_out_rows``, slots ->
    clamped col ``R`` with 0 value).
    """
    S = len(per_shard_residue)
    W = _WIDE_TIER

    # pass 1: per (shard, chunk) grouping + tier row demands
    grouped = [dict() for _ in range(S)]   # c -> (rows_sorted, cols, vals)
    m1 = np.zeros(n_src, np.int64)
    mw = np.zeros(n_src, np.int64)
    for s, (rr, rc, rv) in enumerate(per_shard_residue):
        if rr.size == 0:
            continue
        rchunk = rc // R
        o = np.lexsort((rr, rchunk))
        rr, rc, rv, rchunk = rr[o], rc[o], rv[o], rchunk[o]
        for c in np.unique(rchunk):
            msk = rchunk == c
            crows, ccols, cvals = rr[msk], rc[msk] % R, rv[msk]
            urows, ucounts = np.unique(crows, return_counts=True)
            grouped[s][int(c)] = (crows, ccols, cvals, urows, ucounts)
            m1[c] = max(m1[c], urows.size)
            mw[c] = max(mw[c], int((-(-(ucounts - 1) // W)).sum()))

    lvl_cols, lvl_vals, lvl_src = [], [], []
    level_rows_parts = [[] for _ in range(S)]
    for c in range(n_src):
        for width, m in ((1, int(m1[c])), (W, int(mw[c]))):
            if m == 0:
                continue
            tc = np.full((S, m, width), R, np.int32)
            tv = np.zeros((S, m, width), vdtype)
            tr = np.full((S, m), n_out_rows, np.int32)
            for s in range(S):
                g = grouped[s].get(c)
                if g is None:
                    continue
                crows, ccols, cvals, urows, ucounts = g
                ustarts = np.zeros(urows.size, np.int64)
                np.cumsum(ucounts[:-1], out=ustarts[1:])
                if width == 1:
                    tc[s, :urows.size, 0] = ccols[ustarts]
                    tv[s, :urows.size, 0] = cvals[ustarts]
                    tr[s, :urows.size] = urows
                else:
                    rem = ucounts - 1
                    n_ent = -(-rem // W)
                    wide = np.flatnonzero(n_ent > 0)
                    if not wide.size:
                        continue
                    tot = int(n_ent[wide].sum())
                    ent_row = np.repeat(wide, n_ent[wide])
                    ent_start = np.zeros(wide.size + 1, np.int64)
                    np.cumsum(n_ent[wide], out=ent_start[1:])
                    k = np.arange(tot, dtype=np.int64) - np.repeat(
                        ent_start[:-1], n_ent[wide])
                    st = ustarts[ent_row] + 1 + k * W
                    en = ustarts[ent_row] + ucounts[ent_row]
                    idx = st[:, None] + np.arange(W)[None, :]
                    valid = idx < en[:, None]
                    idx = np.minimum(idx, crows.size - 1)
                    tc[s, :tot] = np.where(valid, ccols[idx], R)
                    tv[s, :tot] = np.where(valid, cvals[idx], 0)
                    tr[s, :tot] = urows[ent_row]
            lvl_cols.append(tc)
            lvl_vals.append(tv)
            lvl_src.append(c)
            for s in range(S):
                level_rows_parts[s].append(tr[s])

    if lvl_cols:
        level_rows = np.stack([np.concatenate(p)
                               for p in level_rows_parts]).astype(np.int32)
    else:
        level_rows = np.zeros((S, 0), np.int32)
    return lvl_cols, lvl_vals, level_rows, tuple(lvl_src)


def shard_local_windowed(sg: ShardedGraph, *,
                         window_rows: int = WINDOW_ROWS,
                         chunk_rows: int | None = None,
                         slab_width: int | None = None,
                         hub_degree: int | None = None,
                         split_boundary: bool = False,
                         borrow_span: int | None = None,
                         max_chunk_rows: int | None = None):
    """Convert a ShardedGraph's per-shard COO into stacked windowed form.

    With ``split_boundary=True``, returns ``(interior, boundary)``: the
    interior matrix references ONLY owned vertices (cols < n_local, applied
    to ``x_local``) and the boundary matrix only halo columns (applied to
    ``x_ext``) — the sharded matvec then has no data dependency between
    the halo exchange and the interior fold, so XLA overlaps them (same
    contract as ``shard_local_ell(split_boundary=True)``).
    """
    n_local = sg.n_local
    n_ext = n_local + sg.halo_total
    rows = np.asarray(sg.rows)
    cols = np.asarray(sg.cols)
    vals = np.asarray(sg.vals)

    if split_boundary:
        def filtered(col_mask_fn, col_base, ncols):
            parts = []
            for s in range(sg.n_shards):
                real = rows[s] < n_local
                keep = real & col_mask_fn(cols[s])
                parts.append((rows[s][keep], cols[s][keep] - col_base,
                              vals[s][keep]))
            return parts, ncols
        if chunk_rows is None:
            # ONE chunk size for interior and boundary: the chunk-carried
            # sharded recurrence (sharded.py) adds the two folds'
            # per-chunk outputs and carries the interior source chunks
            # across scan steps, so the output chunkings must agree and
            # the interior source chunking must equal the carry chunking.
            # Same auto choice as the combined layout (extended density).
            from pygsp_tpu.core.windowed import auto_chunk_rows
            nnz_est = sum(int((rows[s] < n_local).sum())
                          for s in range(sg.n_shards))
            chunk_rows = auto_chunk_rows(
                nnz_est // max(sg.n_shards, 1), n_local,
                max(n_ext, n_local), window_rows,
                max_rows=max_chunk_rows)
        interior = _build(sg.n_local, np.asarray(sg.vals).dtype,
                          *filtered(lambda c: c < n_local, 0, n_local),
                          window_rows, chunk_rows, slab_width, hub_degree,
                          borrow_span=borrow_span)
        # boundary columns REBASED to the halo receive block [0,
        # halo_total): its SpMM applies to ``recv`` directly, so the
        # slabs span only halo chunks instead of wasting gathers on
        # n_local's worth of dead interior chunks
        boundary = _build(sg.n_local, np.asarray(sg.vals).dtype,
                          *filtered(lambda c: c >= n_local, n_local,
                                    max(sg.halo_total, 1)),
                          window_rows, chunk_rows, slab_width, hub_degree,
                          borrow_span=borrow_span)
        return interior, boundary

    parts = []
    for s in range(sg.n_shards):
        real = rows[s] < n_local
        parts.append((rows[s][real], cols[s][real], vals[s][real]))
    return _build(sg.n_local, np.asarray(sg.vals).dtype, parts, n_ext,
                  window_rows, chunk_rows, slab_width, hub_degree,
                  borrow_span=borrow_span, max_chunk_rows=max_chunk_rows)


def _build(n_local, vdtype_in, parts, n_ext, window_rows, chunk_rows,
           slab_width, hub_degree, borrow_span=None, max_chunk_rows=None):
    """Stack per-device (rows, cols, vals) blocks — rows in
    ``[0, n_local)``, cols in ``[0, n_ext)``, RECTANGULAR allowed — into
    one uniform-shape :class:`ShardedWindowed` (also used by the 2-D edge
    partition, where each block is ``L[R_i, C_j]``)."""
    S = len(parts)
    P = int(window_rows)
    if chunk_rows is None:
        from pygsp_tpu.core.windowed import auto_chunk_rows
        nnz_est = sum(int(p[0].size) for p in parts)
        R = auto_chunk_rows(max(nnz_est // max(S, 1), 1), n_local,
                            max(n_ext, n_local), P,
                            max_rows=max_chunk_rows)
    else:
        R = int(chunk_rows)
    if R % P:
        raise ValueError(f'chunk_rows ({R}) must be a multiple of '
                         f'window_rows ({P})')
    n_out = max(-(-n_local // R), 1)
    n_src = max(-(-n_ext // R), 1)
    NW = R // P
    vdtype = vdtype_in

    nnz_total = sum(int(p[0].size) for p in parts)
    if hub_degree is None:
        lam_w = P * (nnz_total / max(S * n_local, 1)) / n_src
        hub_degree = max(2 * P,
                         int(4.0 * np.sqrt(max(lam_w, 1.0)) * n_src))

    # shared slab width from the pooled window demands of every shard
    shard_data = []
    all_counts = []
    for r, c, v in parts:
        r = r.astype(np.int64)
        c = c.astype(np.int64)
        deg = (np.bincount(r, minlength=n_local) if r.size
               else np.zeros(n_local, np.int64))
        is_hub = deg[r] >= hub_degree
        counts = _window_counts(r, c, is_hub, n_local, n_ext, R, P)
        shard_data.append((r, c, v, is_hub, counts))
        all_counts.append(counts.reshape(-1, R // P).astype(np.float64))
    pooled = np.concatenate(all_counts, axis=0)
    if borrow_span is None:
        borrow_span = _auto_span(float(pooled.mean()) if pooled.size
                                 else 0.0, P)
    K = int(borrow_span)
    if K < 2 or K * P > 65536:
        raise ValueError(f'borrow_span must be in [2, {65536 // P}] for '
                         f'window_rows={P} (uint16 row ids)')
    if slab_width is None:
        L = _choose_slab_width(pooled, P, span=K)
    else:
        L = int(slab_width)

    cols4, vals4, rowid4, residue = [], [], [], []
    for r, c, v, is_hub, counts in shard_data:
        c4, v4, r4, rr, rc, rv = _pack_slabs(r, c, v, is_hub, n_local,
                                             n_ext, R, P, L, counts=counts,
                                             span=K)
        cols4.append(c4)
        vals4.append(v4)
        rowid4.append(r4)
        residue.append((rr, rc, rv))

    lvl_cols, lvl_vals, level_rows, lvl_src = _fixed_residue_tiers(
        residue, R, n_src, vdtype, n_out * NW * P)

    host = ShardedWindowed(
        cols=np.stack(cols4), vals=np.stack(vals4),
        rowid=np.stack(rowid4),
        lvl_cols=tuple(lvl_cols), lvl_vals=tuple(lvl_vals),
        level_rows=level_rows, lvl_src=lvl_src,
        n_local=int(n_local), n_ext=int(n_ext), nnz=nnz_total,
        chunk_rows=R, window_rows=P, borrow_span=K)
    return jax.device_put(host)
