"""2-D edge-partitioned spectral ops: structure-independent comm bounds.

The 1-D vertex partition (:mod:`pygsp_tpu.parallel.partition`) ships each
shard the remote rows its edges reference — on expander-like graphs
(Barabási–Albert and friends) that halo saturates near the full vertex set
per shard, so total traffic grows like ``p · N`` rows per Chebyshev step
(``PARTITION_r3.json``: no vertex partition can localize it — ~2/3 of the
halo pairs are low-degree columns).

This module is the classical answer: partition the EDGES over a 2-D
``(row, col)`` device mesh. Vertices are split into ``p = pr·pc`` slices;
device ``(i, j)`` owns the Laplacian block ``L[R_i, C_j]`` where the row
group ``R_i`` is the union of slices ``{(i, j') : j'}`` and the column
group ``C_j`` is ``{(i', j) : i'}``. One matvec is then

1. ``all_gather`` of the local ``x`` slice along the mesh **row** axis —
   every device in mesh column ``j`` assembles ``x[C_j]``,
2. a local SpMM ``L[R_i, C_j] @ x[C_j]`` (no structure-dependent
   indexing across devices at all),
3. ``psum_scatter`` of the partial products along the mesh **col** axis —
   the sum over ``j`` lands scattered back onto the owning slices.

Per-device traffic per step is ``(pr - 1 + pc - 1) · N/p`` rows —
**independent of the graph**, ≈ ``2N/√p`` at a square mesh — versus the
1-D halo's ~``0.6·N`` per shard on BA at any p ≥ 8. Both collectives are
bandwidth-optimal ring primitives on an ICI torus. Crossover on expanders
is at ~p = 8–16; beyond it 2-D wins like ``√p`` (see ``SCALING_r3.json``).

The reference is single-process (SURVEY §2.6) — this, like the 1-D path,
is a new-first-class component with no reference analogue; the math
contract is ``cheby_op`` (``pygsp/filters/approximations.py:58-114``).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps
from jax.sharding import Mesh, PartitionSpec as P


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@partial(jax.tree_util.register_dataclass,
         data_fields=['rows', 'cols', 'vals', 'diag', 'perm'],
         meta_fields=['pr', 'pc', 'n_local', 'n_vertices', 'lap_type'])
@dataclasses.dataclass(frozen=True)
class TwoDGraph:
    """Stacked per-device edge blocks (leading axis = device, row-major
    over the ``(row, col)`` mesh: device ``(i, j)`` is index ``i·pc + j``).

    rows: (P, E) int32 — row of each edge within its device's row group
        ``R_i``, laid out as ``[slice (i,0) ‖ slice (i,1) ‖ ...]`` so the
        ``psum_scatter`` along 'col' drops each chunk on its owner
        (``pc·n_local`` ⇒ padding, dropped by the segment-sum).
    cols: (P, E) int32 — column within the column group ``C_j``, laid out
        in mesh-row order (the ``all_gather('row')`` concatenation order).
    vals: (P, E) — Laplacian off-diagonal values.
    diag: (P, n_local) — Laplacian diagonal, on the x distribution.
    perm: (N,) int32 — original vertex id → padded position.
    """

    rows: jax.Array
    cols: jax.Array
    vals: jax.Array
    diag: jax.Array
    perm: jax.Array
    pr: int
    pc: int
    n_local: int
    n_vertices: int
    lap_type: str

    @property
    def n_devices(self) -> int:
        return self.pr * self.pc

    @property
    def n_padded(self) -> int:
        return self.n_devices * self.n_local

    @property
    def comm_rows_per_step(self) -> int:
        """Rows moved per device per matvec (all_gather + psum_scatter) —
        graph-independent, the point of the 2-D layout."""
        return (self.pr - 1 + self.pc - 1) * self.n_local

    @property
    def dtype(self):
        return self.vals.dtype

    def pad_signal(self, x):
        """Host helper: reorder + zero-pad (N, ...) → (P·n_local, ...)."""
        x = np.asarray(x)
        out = np.zeros((self.n_padded,) + x.shape[1:], dtype=x.dtype)
        out[np.asarray(self.perm)] = x
        return jnp.asarray(out)

    def unpad_signal(self, y):
        return jnp.asarray(y)[jnp.asarray(self.perm)]


def make_mesh_2d(pr: int, pc: int, devices=None) -> Mesh:
    """('row', 'col') mesh over the first pr·pc devices."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[:pr * pc]).reshape(pr, pc)
    return Mesh(devices, ('row', 'col'))


def partition_graph_2d(W, pr: int, pc: int,
                       lap_type: str = 'combinatorial',
                       reorder: str = 'shuffle',
                       dtype=None) -> TwoDGraph:
    """Partition a symmetric scipy adjacency into 2-D edge blocks.

    Vertices are split into ``pr·pc`` nnz-balanced contiguous slices of the
    (optionally reordered) vertex sequence; edge ``(u, v)`` lands on device
    ``(i_u, j_v)`` — the block row of ``u``'s slice × the block column of
    ``v``'s slice. ``reorder`` as in :func:`partition_graph` ('none',
    'rcm', 'cluster') plus ``'shuffle'`` (the default): for the 2-D
    layout the ordering never affects communication volume (fixed at
    ``(pr+pc-2)·n_local`` rows/device/step by construction), so locality
    is worthless here — but it controls BOTH edge balance and the padded
    slice length ``n_local = max slice``. Generator orders correlate
    vertex id with degree (a Barabási–Albert graph numbers its hubs
    first), making nnz-balanced slices wildly unequal in vertex count —
    measured ``n_local`` 1.68x of ``N/p`` on the weak-scale BA instance,
    which dilutes the windowed block layouts' per-window density and
    inflates the padded row space (``WEAKPAD_r4.json`` →
    ``WEAKPAD_r5.json``). A seeded global shuffle makes every slice an
    iid degree sample: edge balance ≤1.01 AND ``n_local ≈ N/p``.
    """
    from pygsp_tpu.parallel.partition import cluster_shards

    W = sps.csr_matrix(W)
    N = W.shape[0]
    p = pr * pc
    if dtype is None:
        dtype = np.float64 if jax.config.jax_enable_x64 else np.float32

    if reorder == 'rcm':
        order = sps.csgraph.reverse_cuthill_mckee(W, symmetric_mode=True)
    elif reorder == 'none':
        order = np.arange(N)
    elif reorder == 'shuffle':
        order = np.random.default_rng(0x5EED).permutation(N)
    elif reorder == 'cluster':
        labels = cluster_shards(W, p)
        order = np.argsort(labels, kind='stable')
    else:
        raise ValueError(f'Unknown reorder {reorder!r}')
    Wp = W[order][:, order].tocsr()

    # nnz-balanced contiguous slices (same rule as the 1-D partitioner)
    deg_rank = np.diff(Wp.indptr)
    cum = np.cumsum(deg_rank + 1)
    targets = cum[-1] / p * np.arange(1, p)
    bounds = np.concatenate(
        [[0], np.searchsorted(cum, targets, side='left'), [N]]
    ).astype(np.int64)
    bounds = np.maximum.accumulate(bounds)
    range_len = np.diff(bounds)
    # chunk-friendly alignment: the mono ring layout needs a chunk size
    # that divides n_local in multiples of window_rows — align n_local
    # so such divisors exist nearby (<=1.6% padding at the graduated
    # thresholds; tiny graphs keep the old 8-alignment)
    rl = int(range_len.max())
    align = 1024 if rl >= 65536 else (128 if rl >= 8192 else 8)
    n_local = max(_round_up(rl, align), align)

    # within-slice shuffle: same hub-dispersion contract as the 1-D
    # partitioner (see partition.py) — keeps the windowed block layout's
    # pooled slab width tight on degree-correlated vertex ids; rides the
    # global perm at zero runtime cost. The seed MUST differ from the
    # global 'shuffle' reorder's: at p=1 both permutations have size N
    # and a shared seed makes them the IDENTICAL draw, which cancels to
    # the identity relabeling (measured: ring-1x1 slot pad 1.16 -> 1.38
    # and the engine 91.6% -> 49.7% before this fix).
    slice_of_rank = np.searchsorted(bounds, np.arange(N), side='right') - 1
    sh_rng = np.random.default_rng(0x5EED ^ 0x9E3779B9)
    local_pos = np.empty(N, dtype=np.int64)
    for s_ in range(p):
        local_pos[bounds[s_]:bounds[s_ + 1]] = sh_rng.permutation(
            n_local)[:bounds[s_ + 1] - bounds[s_]]
    pos_of_rank = slice_of_rank * n_local + local_pos
    perm = np.empty(N, dtype=np.int64)
    perm[order] = pos_of_rank

    dw = np.ravel(Wp.sum(axis=1))
    coo = Wp.tocoo()
    if lap_type == 'combinatorial':
        vals_all = -coo.data.astype(dtype)
        diag_all = dw.astype(dtype)
    elif lap_type == 'normalized':
        d = np.where(dw > 0, dw, 1.0) ** -0.5
        d = np.where(dw > 0, d, 0.0)
        vals_all = (-coo.data * d[coo.row] * d[coo.col]).astype(dtype)
        diag_all = np.where(dw > 0, 1.0, 0.0).astype(dtype)
    else:
        raise ValueError(f'Unknown lap_type {lap_type!r}')

    q_row = pos_of_rank[coo.row]
    q_col = pos_of_rank[coo.col]
    s_row, r_row = q_row // n_local, q_row % n_local
    s_col, r_col = q_col // n_local, q_col % n_local
    dev = (s_row // pc) * pc + (s_col % pc)        # (i_u, j_v), row-major
    row_local = (s_row % pc) * n_local + r_row      # position within R_i
    col_local = (s_col // pc) * n_local + r_col     # position within C_j

    counts = np.bincount(dev, minlength=p)
    E = max(_round_up(int(counts.max()), 1024), 1024)
    n_row_ext = pc * n_local                        # segment-sum range
    rows_arr = np.full((p, E), n_row_ext, dtype=np.int32)   # pad ⇒ dropped
    cols_arr = np.zeros((p, E), dtype=np.int32)
    vals_arr = np.zeros((p, E), dtype=dtype)
    dev_order = np.lexsort((row_local, dev))
    dev_s = dev[dev_order]
    starts = np.searchsorted(dev_s, np.arange(p))
    ends = np.searchsorted(dev_s, np.arange(p), side='right')
    for d_ in range(p):
        sl = dev_order[starts[d_]:ends[d_]]
        ne = len(sl)
        rows_arr[d_, :ne] = row_local[sl]
        cols_arr[d_, :ne] = col_local[sl]
        vals_arr[d_, :ne] = vals_all[sl]

    flat = np.zeros(p * n_local, dtype=dtype)
    flat[pos_of_rank] = diag_all
    diag_arr = flat.reshape(p, n_local)

    return TwoDGraph(
        rows=jnp.asarray(rows_arr), cols=jnp.asarray(cols_arr),
        vals=jnp.asarray(vals_arr), diag=jnp.asarray(diag_arr),
        perm=jnp.asarray(perm, jnp.int32),
        pr=pr, pc=pc, n_local=n_local, n_vertices=N, lap_type=lap_type)


def twod_local_windowed(tg: TwoDGraph, *, window_rows=None,
                        chunk_rows=None, slab_width=None, hub_degree=None,
                        ring: bool = False, split_cols: bool = False,
                        borrow_span=None, max_chunk_rows=None,
                        mono: bool = False):
    """Windowed-compact layout of every device's edge block (the
    single-chip hot-path format, :mod:`pygsp_tpu.core.windowed`) for the
    local SpMM inside :func:`cheby_op_2d` — scatter-free slab gathers +
    one-hot MXU fold instead of the COO segment-sum (which XLA serializes
    on power-law hub rows). Shapes are unified across devices by the same
    pooled-width/sentinel-tier machinery as the 1-D path.

    ``ring=True`` (the deployed 2-D layout): returns a TUPLE of ``pr``
    matrices, one per ring step of the double-buffered all-gather. Device
    ``(i, j)``'s step-``k`` matrix holds the block column of source slice
    ``((i − k) mod pr, j)`` with columns rebased to ``[0, n_local)`` — at
    ring step ``k`` the in-flight buffer holds exactly that slice, so the
    fold uses a STATIC sub-matrix while the NEXT shift's ``ppermute`` is
    already issued (comm overlaps compute; see :func:`cheby_op_2d`). All
    ``pr`` matrices share one ``chunk_rows`` so the chunk-carried
    recurrence's buffers feed every step directly.

    ``ring=True, split_cols=True`` (fully interleaved): a nested tuple
    ``mats[k][s]`` — step-``k`` matrix further split by OUTPUT block in
    each device's COL-RING SCHEDULE order: position ``s``'s block is the
    one destined for device ``(i, (j − 1 − s) mod pc)``, rows rebased to
    ``[0, n_local)``. :func:`cheby_op_2d` then replaces the terminal
    ``psum_scatter`` with a ring reduce-scatter whose hop ``s`` runs
    UNDER the fold of schedule position ``s+1`` — no exposed
    communication left on either mesh axis (the 2-D scaling model's last
    lever). Per-device static schedules make every fold a static
    sub-matrix despite the device-dependent destination order.
    """
    from pygsp_tpu.core.windowed import WINDOW_ROWS
    from pygsp_tpu.parallel.windowed_shards import _build
    rows = np.asarray(tg.rows)
    cols = np.asarray(tg.cols)
    vals = np.asarray(tg.vals)
    n_row_ext = tg.pc * tg.n_local
    if not ring:
        parts = []
        for d_ in range(tg.n_devices):
            real = rows[d_] < n_row_ext
            parts.append((rows[d_][real], cols[d_][real], vals[d_][real]))
        return _build(n_row_ext, vals.dtype, parts, tg.pr * tg.n_local,
                      window_rows or WINDOW_ROWS, chunk_rows, slab_width,
                      hub_degree, borrow_span=borrow_span,
                      max_chunk_rows=max_chunk_rows)

    P_ = window_rows or WINDOW_ROWS
    if mono:
        # ONE matrix per device over the ring-ordered column space
        # [0, pr·n_local): source slice (i−k) mod pr lands at offset
        # k·n_local, exactly the order the engine's ring collection
        # produces — so the collected buffers' chunk tuples concatenate
        # (zero-copy) into this matrix's source chunks. One fold per
        # matvec at dense-like λ_w: measured 4.3 ns/edge at the 4-chip
        # weak share vs 8.1 for per-step folds (FRAGDIAG9 vs 6).
        if chunk_rows is None:
            from pygsp_tpu.core.windowed import auto_chunk_rows
            nnz_est = int(sum((rows[d_] < n_row_ext).sum()
                              for d_ in range(tg.n_devices)))
            r_auto = auto_chunk_rows(
                nnz_est // max(tg.n_devices, 1), n_row_ext,
                tg.pr * tg.n_local, P_, max_rows=max_chunk_rows)
            ns_loc = max(1, -(-tg.n_local // r_auto))
            while (tg.n_local % ns_loc
                   or (tg.n_local // ns_loc) % P_):
                ns_loc += 1
                if ns_loc > tg.n_local:
                    raise ValueError(
                        f'mono layout needs chunk_rows dividing n_local '
                        f'({tg.n_local}) in multiples of window_rows '
                        f'({P_}) — pass chunk_rows explicitly')
            chunk_rows = tg.n_local // ns_loc
        elif tg.n_local % int(chunk_rows):
            raise ValueError(f'mono layout: chunk_rows ({chunk_rows}) '
                             f'must divide n_local ({tg.n_local})')
        mono_parts = []
        for d_ in range(tg.n_devices):
            i = d_ // tg.pc
            real = rows[d_] < n_row_ext
            r, c_, v = rows[d_][real], cols[d_][real], vals[d_][real]
            k = (i - c_ // tg.n_local) % tg.pr
            mono_parts.append((r, k * tg.n_local + c_ % tg.n_local, v))
        if not split_cols:
            return (_build(n_row_ext, vals.dtype, mono_parts,
                           tg.pr * tg.n_local, P_, chunk_rows,
                           slab_width, hub_degree,
                           borrow_span=borrow_span),)
        row_s, span = [], borrow_span
        for s in range(tg.pc):
            parts = []
            for d_, (r, cm, v) in enumerate(mono_parts):
                j = d_ % tg.pc
                dest = (j - 1 - s) % tg.pc
                seld = r // tg.n_local == dest
                parts.append((r[seld] - dest * tg.n_local, cm[seld],
                              v[seld]))
            row_s.append(_build(tg.n_local, vals.dtype, parts,
                                tg.pr * tg.n_local, P_, chunk_rows,
                                slab_width, hub_degree,
                                borrow_span=span))
            if span is None:
                span = row_s[0].borrow_span
        return (tuple(row_s),)

    if chunk_rows is None:
        from pygsp_tpu.core.windowed import auto_chunk_rows
        nnz_est = int(sum((rows[d_] < n_row_ext).sum()
                          for d_ in range(tg.n_devices)))
        chunk_rows = auto_chunk_rows(
            nnz_est // max(tg.n_devices * tg.pr, 1), n_row_ext,
            tg.n_local, P_, max_rows=max_chunk_rows)
    if not split_cols:
        mats = []
        for k in range(tg.pr):
            parts = []
            for d_ in range(tg.n_devices):
                i = d_ // tg.pc
                real = rows[d_] < n_row_ext
                r, c_, v = rows[d_][real], cols[d_][real], vals[d_][real]
                sel = (i - c_ // tg.n_local) % tg.pr == k
                parts.append((r[sel], c_[sel] % tg.n_local, v[sel]))
            mats.append(_build(n_row_ext, vals.dtype, parts, tg.n_local,
                               P_, chunk_rows, slab_width, hub_degree,
                               borrow_span=borrow_span))
            # the fused multi-matrix fold needs ONE borrow span across
            # all ring steps — pin the auto choice of step 0
            if borrow_span is None:
                borrow_span = mats[0].borrow_span
        return tuple(mats)

    mats = []
    for k in range(tg.pr):
        row_k = []
        for s in range(tg.pc):
            parts = []
            for d_ in range(tg.n_devices):
                i, j = d_ // tg.pc, d_ % tg.pc
                dest = (j - 1 - s) % tg.pc
                real = rows[d_] < n_row_ext
                r, c_, v = rows[d_][real], cols[d_][real], vals[d_][real]
                sel = (((i - c_ // tg.n_local) % tg.pr == k)
                       & (r // tg.n_local == dest))
                parts.append((r[sel] - dest * tg.n_local,
                              c_[sel] % tg.n_local, v[sel]))
            row_k.append(_build(tg.n_local, vals.dtype, parts,
                                tg.n_local, P_, chunk_rows, slab_width,
                                hub_degree, borrow_span=borrow_span))
            if borrow_span is None:
                borrow_span = row_k[0].borrow_span
        mats.append(tuple(row_k))
    return tuple(mats)


def _matvec_2d(rows, cols, vals, diag, x_local, *, pc, n_local,
               ell=None, scale=None, shift=None):
    """One Laplacian matvec inside the ('row', 'col') shard_map.

    Computes ``scale · (L − shift·I) @ x`` on the x distribution.
    ``x_local``: (n_local, ...) — this device's slice (possibly a
    reduced-precision carry); row sums and the diagonal term accumulate in
    the diag dtype (f32/f64), matching the single-chip carry contract.
    With ``ell`` (this device's :func:`twod_local_windowed` slice) the
    local block SpMM runs the windowed-compact fast path.
    """
    with jax.named_scope('allgather_colgroup'):
        xg = jax.lax.all_gather(x_local, 'row', axis=0, tiled=True)
    if ell is not None:
        y_part = ell.local_spmm(xg).astype(diag.dtype)
    else:
        gathered = xg[cols]                         # (E, ...)
        v = vals.reshape((-1,) + (1,) * (x_local.ndim - 1))
        contrib = (v * gathered).astype(diag.dtype)
        y_part = jax.ops.segment_sum(contrib, rows,
                                     num_segments=pc * n_local,
                                     indices_are_sorted=True)
    with jax.named_scope('psum_scatter_rowgroup'):
        off = jax.lax.psum_scatter(y_part, 'col', scatter_dimension=0,
                                   tiled=True)     # (n_local, ...)
    d = diag if shift is None else diag - shift
    db = d.reshape((-1,) + (1,) * (x_local.ndim - 1))
    y = db * x_local.astype(diag.dtype) + off
    if scale is not None:
        y = scale * y
    return y


def matvec_2d(tg: TwoDGraph, x, mesh: Mesh, ell=None):
    """``L @ x`` with x of shape (P·n_local, ...) sharded over both axes.

    Pass ``ell = twod_local_windowed(tg)`` to run the local block SpMMs
    in the windowed-compact fast-path format.
    """

    def body(rows, cols, vals, diag, ell, x_local):
        return _matvec_2d(rows[0], cols[0], vals[0], diag[0], x_local,
                          pc=tg.pc, n_local=tg.n_local, ell=ell)

    gspec = P(('row', 'col'))
    ell_spec = jax.tree.map(lambda _: gspec, ell)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(gspec, gspec, gspec, gspec, ell_spec, gspec),
        out_specs=gspec)
    return f(tg.rows, tg.cols, tg.vals, tg.diag, ell, x)


def cheby_op_2d(tg: TwoDGraph, lmax, c, x, mesh: Mesh, ell=None,
                carry_dtype=None, carry_tol=None, scatter_dtype=None):
    """Chebyshev filter bank on the 2-D edge partition.

    Same math as :func:`pygsp_tpu.ops.chebyshev.cheby_op` (reference
    contract ``approximations.py:58-114``); ``c``: (Nf, m+1), ``x``:
    (P·n_local, ...) sharded over both mesh axes on the vertex dim.
    Returns (Nf, P·n_local, ...).

    ``carry_dtype`` (opt-in, e.g. ``jnp.bfloat16``): the recurrence terms
    — and therefore the per-step ``all_gather`` payload and local gather —
    move at half bytes; partial-product accumulation, ``psum_scatter`` and
    the filter accumulators stay in the signal dtype. Gated by the same
    a-priori bound as the single-chip path.

    ``scatter_dtype`` (opt-in, ring layout only): dtype of the
    ``psum_scatter`` partial-product payload along 'col' — the ring
    path's ONLY exposed communication (``SCALING_r4.json``: the row
    shifts hide under the folds). ``jnp.bfloat16`` halves those wire
    bytes at the cost of ONE extra rounding of each partial product per
    matvec (the cross-device sum then runs in the reduced dtype); local
    row-sum accumulation stays f32. Requires an explicit opt-in because
    it adds to the carry budget; the combined error is measured by
    ``test_2d_scatter_dtype``.
    """
    c = jnp.atleast_2d(c)
    nf, m1 = c.shape
    lmax = jnp.asarray(lmax, dtype=tg.dtype)
    cdt = jnp.dtype(carry_dtype) if carry_dtype is not None else None
    if cdt is not None and not isinstance(c, jax.core.Tracer):
        from pygsp_tpu.ops.chebyshev import _check_carry_budget
        _check_carry_budget(c, cdt, carry_tol)
    if cdt is None and jnp.dtype(x.dtype) != jnp.promote_types(x.dtype,
                                                               tg.dtype):
        x = x.astype(jnp.promote_types(x.dtype, tg.dtype))  # one-dtype carry

    if isinstance(ell, tuple):
        sdt = (jnp.dtype(scatter_dtype) if scatter_dtype is not None
               else None)
        return _cheby_op_2d_ring(tg, lmax, c, x, mesh, ell, cdt, sdt)
    if scatter_dtype is not None:
        raise ValueError('scatter_dtype requires the ring layout '
                         '(twod_local_windowed(ring=True))')

    def body(rows, cols, vals, diag, ell, c, lmax, x_local):
        rows, cols, vals, diag = rows[0], cols[0], vals[0], diag[0]
        a1 = lmax / 2
        a2 = lmax / 2
        mv = partial(_matvec_2d, rows, cols, vals, diag,
                     pc=tg.pc, n_local=tg.n_local, ell=ell)

        def cast(t):
            return t if cdt is None else t.astype(cdt)

        bshape = (nf,) + (1,) * x_local.ndim
        t_old = cast(x_local)
        t_cur_f = (mv(t_old) - a2 * x_local) / a1
        acc = (0.5 * c[:, 0].reshape(bshape) * x_local[None]
               + c[:, 1].reshape(bshape) * t_cur_f[None])
        t_cur = cast(t_cur_f)

        if m1 > 2:
            def step(carry, ck):
                t_old, t_cur, acc = carry
                t_new_f = (mv(t_cur, scale=2.0 / a1, shift=a2)
                           - t_old.astype(acc.dtype))
                acc = acc + ck.reshape(bshape) * t_new_f[None]
                return (t_cur, cast(t_new_f), acc), None

            (_, _, acc), _ = jax.lax.scan(step, (t_old, t_cur, acc),
                                          c[:, 2:].T)
        return acc

    gspec = P(('row', 'col'))
    xspec = P(('row', 'col'), *(None,) * (np.ndim(x) - 1))
    ospec = P(None, ('row', 'col'), *(None,) * (np.ndim(x) - 1))
    ell_spec = jax.tree.map(lambda _: gspec, ell)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(gspec, gspec, gspec, gspec, ell_spec, P(), P(), xspec),
        out_specs=ospec)
    return f(tg.rows, tg.cols, tg.vals, tg.diag, ell, c, lmax, x)


def _cheby_op_2d_ring(tg, lmax, c, x, mesh, ell, cdt, sdt=None,
                      synthesis=False):
    """Ring-overlapped, chunk-carried 2-D Chebyshev (the deployed layout).

    ``ell`` is :func:`twod_local_windowed(..., ring=True)`'s tuple of
    ``pr`` step matrices. Each matvec replaces the monolithic
    ``all_gather`` with ``pr − 1`` single-shift ``ppermute`` steps along
    'row': at step ``k`` the NEXT shift is issued BEFORE the fold of the
    in-flight buffer, so the interconnect transfer runs underneath the
    step's local fold (double-buffered all-gather-matmul — the fold has
    no data dependency on the shift it hides). The recurrence state is
    carried as per-chunk tuples like the 1-D path
    (:func:`pygsp_tpu.parallel.sharded._sharded_cheby_op_chunkcarried`),
    eliminating the per-step chunk/unchunk copies of the round-3 body
    (``TWOD_ONCHIP_r3.json``: 1.42x layout overhead at 1×1).
    """
    from pygsp_tpu.parallel.sharded import (_chunkcarried_scan,
                                            _sharded_acc_group)
    nf, m1 = c.shape
    pr, pc, n_local = tg.pr, tg.pc, tg.n_local
    interleave = isinstance(ell[0], tuple)
    R = (ell[0][0] if interleave else ell[0]).chunk_rows
    g_acc = _sharded_acc_group(x, nf, ell, cdt, tg.n_devices)

    def body(diag, ell_sl, c, lmax, x_local):
        (xc, diag_c, fdiag_c, offdiag_apply, cast, odt, a1, a2,
         sc) = _ring_body_setup(tg, ell_sl, interleave, R, diag[0], lmax,
                                x_local, cdt, sdt)
        bshape = (nf,) + (1,) * x_local.ndim
        return _chunkcarried_scan(xc, diag_c, fdiag_c, offdiag_apply, c,
                                  a1, a2, sc, cast, odt, bshape,
                                  acc_group=g_acc, synthesis=synthesis)

    gspec = P(('row', 'col'))
    if synthesis:
        xspec = P(('row', 'col'), *(None,) * (np.ndim(x) - 1))
        ospec = P(('row', 'col'), *(None,) * (np.ndim(x) - 2))
    else:
        xspec = P(('row', 'col'), *(None,) * (np.ndim(x) - 1))
        ospec = P(None, ('row', 'col'), *(None,) * (np.ndim(x) - 1))
    ell_spec = jax.tree.map(lambda _: gspec, ell)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(gspec, ell_spec, P(), P(), xspec),
        out_specs=ospec)
    return f(tg.diag, ell, c, lmax, x)


def _ring_body_setup(tg, ell_sl, interleave, R, diag, lmax, x_local, cdt,
                     sdt):
    """Shared per-device setup of the ring bodies (inside shard_map):
    chunked signal/diag tuples, the carry cast, and ``offdiag_apply``
    (double-buffered row all-gather + either the terminal
    ``psum_scatter`` or the interleaved col ring). Used by the
    forward/synthesis scan and the fixed-graph backward's
    coefficient-gradient body.

    Round 5: the ``pr`` ring-step folds run as ONE fused multi-matrix
    SpMM (:func:`pygsp_tpu.core.windowed.windowed_spmm_chunks_multi`)
    that sums the window tensors before building the output strip —
    each separate fold used to materialize its own full
    ``pc·n_local``-row partial strip, which dominated the fragmented
    weak-scale step time (``FRAGDIAG5_r5.json``/``FRAGDIAG6_r5.json``).
    Step 0 still folds under the ring shifts (the shifts are a chain on
    the ICI DMA engine and hide under it)."""
    from pygsp_tpu.core.chunked import chunk_signal
    from pygsp_tpu.core.windowed import (windowed_spmm_chunks,
                                         windowed_spmm_chunks_multi)
    pr, pc = tg.pr, tg.pc
    odt = x_local.dtype
    a1 = lmax / 2
    a2 = lmax / 2
    sc = 2.0 / a1
    mono = len(ell_sl) == 1 and pr > 1
    if mono and interleave:
        mats = tuple(e.local_matrix() for e in ell_sl[0])  # per dest s
    elif mono:
        mats = (ell_sl[0].local_matrix(),)
    elif interleave:
        mats = tuple(tuple(e.local_matrix() for e in row)
                     for row in ell_sl)
    else:
        mats = tuple(e.local_matrix() for e in ell_sl)
    dsh = (-1,) + (1,) * (x_local.ndim - 1)
    diag_c = chunk_signal(diag.reshape(dsh), R)
    fdiag_c = chunk_signal(((diag - a2) * sc).reshape(dsh), R)
    xc = chunk_signal(x_local, R)

    if cdt is None:
        def cast(t):
            return t
        spmm_kw = {}
    else:
        def cast(t):
            return tuple(tk.astype(cdt) for tk in t)
        # carry-width fold output (f32 MXU accumulation inside the fold
        # — core/windowed.py acc_dt; BF16OUT_r5.json): the dominant
        # weak-scale lever — fragmented blocks pay 205 B/slot of f32
        # window-tensor traffic at λ_w = 16 vs 114 at single-chip
        # density. Ring partials and the 'col' reduction then move at
        # carry width (the running interleaved sum still accumulates in
        # odt by promotion).
        spmm_kw = {'out_dtype': cdt}

    rperm = [(r, (r + 1) % pr) for r in range(pr)]
    cperm = [(q, (q + 1) % pc) for q in range(pc)]

    def collect_sources(t_chunks):
        """(pr-1) single-shift ppermutes along 'row' → every source
        slice's chunk tuple. The shifts form a chain on the ICI DMA
        engine; they overlap whatever compute is issued after them."""
        buf = t_chunks
        srcs = []
        for k in range(pr):
            srcs.append(buf)
            if k < pr - 1:
                with jax.named_scope('ring_shift'):
                    buf = tuple(jax.lax.ppermute(b, 'row', rperm)
                                for b in buf)
        return srcs

    def fused_fold(mlist, srcs, first_separate):
        """Σ_k mats fold. ``first_separate``: fold step 0 as its own
        call issued right after shift 0 (hides the remaining shift
        chain underneath it), then the rest as ONE fused strip."""
        if len(mlist) == 1:
            return windowed_spmm_chunks(mlist[0], srcs[0], **spmm_kw)
        if first_separate:
            with jax.named_scope('ring_fold0'):
                y0 = windowed_spmm_chunks(mlist[0], srcs[0], **spmm_kw)
            with jax.named_scope('ring_fold_fused'):
                yk = windowed_spmm_chunks_multi(mlist[1:], srcs[1:],
                                                **spmm_kw)
            return tuple(a + b for a, b in zip(y0, yk))
        with jax.named_scope('ring_fold_fused'):
            return windowed_spmm_chunks_multi(mlist, srcs, **spmm_kw)

    def offdiag_interleaved(t_chunks):
        """Row all-gather AND col reduce-scatter both ring-overlapped.

        Phase A: collect the pr source blocks over the row ring, then
        schedule position s=0 (the first partial to send) as step-0
        fold + one fused strip over steps 1..pr-1. Phase B: ring
        reduce-scatter along 'col' — hop s carries the partial for
        destination ``(j − 1 − s) mod pc`` while the FUSED fold of
        position s+1 runs beneath it; each device's mats[k][s] was
        built in ITS schedule order, so every fold is a static
        sub-matrix. After pc−1 hops the running partial holds the
        complete sum for the device's own block. No exposed comm
        remains on either axis.
        """
        srcs = collect_sources(t_chunks)
        r = fused_fold([mats[k][0] for k in range(pr)], srcs, True)
        for s in range(1, pc):
            with jax.named_scope('col_ring_hop'):
                send = (r if sdt is None
                        else tuple(a.astype(sdt) for a in r))
                recv = tuple(jax.lax.ppermute(a, 'col', cperm)
                             for a in send)
            with jax.named_scope(f'ring_fold_s{s}'):
                r = fused_fold([mats[k][s] for k in range(pr)], srcs,
                               False)
            r = tuple(a + b.astype(odt) for a, b in zip(r, recv))
        return r

    def offdiag_mono(t_chunks):
        """Ring collection + ONE monolithic fold over the concatenated
        (zero-copy) ring buffers — the dense-shaped per-chip SpMM
        (FRAGDIAG9: 4.3 ns/edge at the 4-chip weak share vs 8.1 for
        per-step folds). With mono-interleaved layouts the col ring
        hops still hide under the per-destination folds."""
        srcs = collect_sources(t_chunks)
        xcat = tuple(c for s_ in srcs for c in s_)
        if interleave:
            with jax.named_scope('mono_fold_s0'):
                r = windowed_spmm_chunks(mats[0], xcat, **spmm_kw)
            for s in range(1, pc):
                with jax.named_scope('col_ring_hop'):
                    send = (r if sdt is None
                            else tuple(a.astype(sdt) for a in r))
                    recv = tuple(jax.lax.ppermute(a, 'col', cperm)
                                 for a in send)
                with jax.named_scope(f'mono_fold_s{s}'):
                    r = windowed_spmm_chunks(mats[s], xcat, **spmm_kw)
                r = tuple(a + b.astype(odt) for a, b in zip(r, recv))
            return r
        with jax.named_scope('mono_fold'):
            y = windowed_spmm_chunks(mats[0], xcat, **spmm_kw)
        if pc > 1:
            yf = y[0] if len(y) == 1 else jnp.concatenate(y)
            with jax.named_scope('psum_scatter_rowgroup'):
                if sdt is not None:
                    yf = jax.lax.psum_scatter(
                        yf.astype(sdt), 'col', scatter_dimension=0,
                        tiled=True).astype(odt)
                else:
                    yf = jax.lax.psum_scatter(yf, 'col',
                                              scatter_dimension=0,
                                              tiled=True)
            return chunk_signal(yf, R)
        return y

    def offdiag_apply(t_chunks):
        if mono:
            return offdiag_mono(t_chunks)
        if interleave:
            return offdiag_interleaved(t_chunks)
        srcs = collect_sources(t_chunks)
        y = fused_fold(list(mats), srcs, True)
        if pc > 1:
            yf = y[0] if len(y) == 1 else jnp.concatenate(y)
            with jax.named_scope('psum_scatter_rowgroup'):
                if sdt is not None:
                    # halve the exposed 'col' wire bytes: one extra
                    # rounding of each partial product per matvec
                    yf = jax.lax.psum_scatter(
                        yf.astype(sdt), 'col', scatter_dimension=0,
                        tiled=True).astype(odt)
                else:
                    yf = jax.lax.psum_scatter(yf, 'col',
                                              scatter_dimension=0,
                                              tiled=True)
            return chunk_signal(yf, R)
        return y

    return xc, diag_c, fdiag_c, offdiag_apply, cast, odt, a1, a2, sc


def cheby_synthesis_2d(tg: TwoDGraph, lmax, c, y, mesh: Mesh, ell=None,
                       carry_dtype=None, carry_tol=None,
                       scatter_dtype=None):
    """Synthesis on the 2-D edge partition: per-filter signals, summed.

    ``c``: (Nf, m+1); ``y``: (P·n_local, ..., Nf) — feature axis LAST,
    vertex axis sharded over both mesh axes. Returns (P·n_local, ...).
    Same math as :func:`pygsp_tpu.ops.chebyshev.cheby_synthesis` (the
    shifted operator is symmetric, so this is also the adjoint of
    :func:`cheby_op_2d` — the fixed-graph backward uses it). Requires a
    ring layout (``twod_local_windowed(ring=True[, split_cols=True])``).
    """
    c = jnp.atleast_2d(c)
    nf, m1 = c.shape
    if y.shape[-1] != nf:
        raise ValueError(f'last axis of y ({y.shape[-1]}) must equal the '
                         f'number of filters ({nf})')
    if not isinstance(ell, tuple):
        raise ValueError('cheby_synthesis_2d requires a ring layout '
                         '(twod_local_windowed(ring=True))')
    lmax = jnp.asarray(lmax, dtype=tg.dtype)
    cdt = jnp.dtype(carry_dtype) if carry_dtype is not None else None
    if cdt is not None and not isinstance(c, jax.core.Tracer):
        from pygsp_tpu.ops.chebyshev import _check_carry_budget
        _check_carry_budget(c, cdt, carry_tol)
    if cdt is None and jnp.dtype(y.dtype) != jnp.promote_types(y.dtype,
                                                               tg.dtype):
        y = y.astype(jnp.promote_types(y.dtype, tg.dtype))  # one-dtype carry
    sdt = jnp.dtype(scatter_dtype) if scatter_dtype is not None else None
    return _cheby_op_2d_ring(tg, lmax, c, y, mesh, ell, cdt, sdt,
                             synthesis=True)


def cheby_op_2d_fixed_graph(tg: TwoDGraph, lmax, c, x, mesh: Mesh,
                            ell=None):
    """:func:`cheby_op_2d` with a CONSTANT-MEMORY custom VJP.

    2-D counterpart of
    :func:`pygsp_tpu.parallel.sharded.sharded_cheby_op_fixed_graph`: the
    bank is linear in ``(c, x)``, so the backward pass is two fresh ring
    recurrences — an adjoint synthesis for ``x̄`` and a term-contraction
    pass for ``c̄`` (global ``psum`` over both mesh axes) — instead of
    storing the 3K per-step scan carries. Gradients flow to ``c`` and
    ``x`` only. Requires a ring layout.
    """
    if not isinstance(ell, tuple):
        raise ValueError('cheby_op_2d_fixed_graph requires a ring layout '
                         '(twod_local_windowed(ring=True))')
    return _cheby_2d_fg(mesh, tg, ell, lmax, c, x)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _cheby_2d_fg(mesh, tg, ell, lmax, c, x):
    return cheby_op_2d(tg, lmax, c, x, mesh, ell=ell)


def _cheby_2d_fg_fwd(mesh, tg, ell, lmax, c, x):
    return (cheby_op_2d(tg, lmax, c, x, mesh, ell=ell),
            (tg, ell, lmax, c, x))


def _cheby_2d_fg_bwd(mesh, res, g):
    from pygsp_tpu.ops.chebyshev import _zero_cotangent
    tg, ell, lmax, c, x = res
    c_shape = jnp.shape(c)
    c = jnp.atleast_2d(c)
    nf, m1 = c.shape
    x_dt = x.dtype                   # cotangent dtype must match primal
    x = x.astype(jnp.promote_types(x.dtype, tg.dtype))
    lmax_a = jnp.asarray(lmax, dtype=tg.dtype)

    x_bar = cheby_synthesis_2d(tg, lmax_a, c, jnp.moveaxis(g, 0, -1),
                               mesh, ell=ell).astype(x_dt)

    # c̄[f,k] = <T̃_k x, ḡ_f>: one ring recurrence on x, each term
    # contracted against every cotangent bank member + psum over BOTH
    # mesh axes (the vertex axis is sharded over ('row', 'col'))
    interleave = isinstance(ell[0], tuple)
    R = (ell[0][0] if interleave else ell[0]).chunk_rows

    def body(diag, ell_sl, g, lmax, x_local):
        (xc, diag_c, fdiag_c, offdiag_apply, cast, odt, a1, a2,
         sc) = _ring_body_setup(tg, ell_sl, interleave, R, diag[0], lmax,
                                x_local, None, None)
        del cast
        gc, off = [], 0
        for xk in xc:
            gc.append(g[:, off:off + xk.shape[0]])
            off += xk.shape[0]

        def dot_all(t_chunks):
            s_ = 0
            for gk, tk in zip(gc, t_chunks):
                axes = tuple(range(tk.ndim))
                s_ = s_ + jnp.tensordot(
                    gk, tk, axes=(tuple(a + 1 for a in axes), axes))
            return jax.lax.psum(jax.lax.psum(s_, 'row'), 'col')

        t_old = xc
        y0 = offdiag_apply(t_old)
        t_cur = tuple((d * xk + yk - a2 * xk) / a1
                      for d, xk, yk in zip(diag_c, xc, y0))
        s0 = dot_all(t_old)
        s1 = dot_all(t_cur)
        if m1 > 2:
            def step(carry, _):
                t_old, t_cur = carry
                yc = offdiag_apply(t_cur)
                t_new = tuple(fd * tk + sc * yk - to
                              for fd, tk, yk, to in
                              zip(fdiag_c, t_cur, yc, t_old))
                return (t_cur, t_new), dot_all(t_new)

            _, ss = jax.lax.scan(step, (t_old, t_cur), None,
                                 length=m1 - 2)
            return jnp.concatenate([(0.5 * s0)[None], s1[None], ss]).T
        return jnp.stack([0.5 * s0, s1]).T

    gspec = P(('row', 'col'))
    xspec = P(('row', 'col'), *(None,) * (np.ndim(x) - 1))
    gbspec = P(None, ('row', 'col'), *(None,) * (np.ndim(x) - 1))
    ell_spec = jax.tree.map(lambda _: gspec, ell)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(gspec, ell_spec, gbspec, P(), xspec),
        out_specs=P())
    c_bar = f(tg.diag, ell, g, lmax_a, x)

    return (jax.tree_util.tree_map(_zero_cotangent, tg),
            jax.tree_util.tree_map(_zero_cotangent, ell),
            _zero_cotangent(lmax),
            c_bar.astype(c.dtype).reshape(c_shape), x_bar)


_cheby_2d_fg.defvjp(_cheby_2d_fg_fwd, _cheby_2d_fg_bwd)
