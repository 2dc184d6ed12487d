"""Host-side graph partitioner for multi-chip execution.

Builds a :class:`ShardedGraph`: a 1-D contiguous vertex partition (optionally
after a bandwidth-reducing reverse-Cuthill–McKee reordering to shrink the
boundary) with, per shard,

- the local Laplacian slice in padded COO (local rows, *extended* column
  indexing: ``[0, n_local)`` = owned vertices, ``[n_local, ...)`` =
  received halo slots),
- distance-bucketed halo send maps: for each ring distance ``d`` with any
  traffic, ``send_idx[k]`` of shape ``(S, H_d)`` holds the local vertex ids
  shard ``s`` ships to shard ``(s + d) % S`` each SpMM step. Each bucket is
  sized to ITS OWN worst sender (``H_d``), not a global max — on
  RCM-ordered graphs almost all volume sits at d=1, so the padded exchange
  volume collapses toward the true boundary size, and each bucket is one
  single-shift ``ppermute`` (one ICI hop for d=1 on a real torus ring)
  instead of a slice of a max-padded ``all_to_all``.

All shapes are static and identical across shards (a ``shard_map``
requirement): per-distance sizes vary, per-shard sizes do not.

Replaces the role scipy CSR storage plays in the reference's
``cheby_op`` (``pygsp/filters/approximations.py:99``) at multi-chip scale.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@partial(jax.tree_util.register_dataclass,
         data_fields=['rows', 'cols', 'vals', 'diag', 'send_idx', 'perm'],
         meta_fields=['n_shards', 'n_local', 'halo_dists', 'halo_sizes',
                      'n_vertices', 'lap_type'])
@dataclasses.dataclass(frozen=True)
class ShardedGraph:
    """Stacked per-shard arrays (leading axis = shard = mesh 'graph' axis).

    rows: (S, E) int32 — local row of each edge (n_local ⇒ padding).
    cols: (S, E) int32 — extended-local column index of each edge.
    vals: (S, E) — Laplacian off-diagonal values (−w, possibly normalized).
    diag: (S, n_local) — Laplacian diagonal of owned vertices.
    send_idx: tuple of (S, H_d) int32, one per ring distance in
        ``halo_dists`` — send_idx[k][s] = local ids shard s ships to shard
        ``(s + halo_dists[k]) % S`` (n_local ⇒ padding slot, unreferenced).
    perm: (N,) int32 — vertex reordering applied (original → position).
    halo_dists / halo_sizes: ring distances with traffic and their bucket
        widths H_d; receive slot layout is ``[owned ‖ bucket_0 ‖ bucket_1
        ‖ ...]`` in ``halo_dists`` order.
    """

    rows: jax.Array
    cols: jax.Array
    vals: jax.Array
    diag: jax.Array
    send_idx: tuple
    perm: jax.Array
    n_shards: int
    n_local: int
    halo_dists: tuple
    halo_sizes: tuple
    n_vertices: int
    lap_type: str

    @property
    def n_padded(self) -> int:
        return self.n_shards * self.n_local

    @property
    def halo_total(self) -> int:
        """Halo slots received per shard per step (sum of bucket widths)."""
        return int(sum(self.halo_sizes))

    @property
    def dtype(self):
        return self.vals.dtype

    def pad_signal(self, x):
        """Host helper: reorder + zero-pad a (N, ...) signal to (S*n_local, ...)."""
        x = np.asarray(x)
        out = np.zeros((self.n_padded,) + x.shape[1:], dtype=x.dtype)
        out[np.asarray(self.perm)] = x
        return jnp.asarray(out)

    def unpad_signal(self, y):
        """Inverse of :meth:`pad_signal` (device array in, device array out)."""
        return jnp.asarray(y)[jnp.asarray(self.perm)]


def _lpa_communities(indptr, indices, n_shards, rounds=20):
    """Community detection by plain label propagation (labels start as
    vertex ids; each round every vertex adopts its most frequent neighbor
    label, ties to the smallest). Vectorized as a run-length count over
    ``(row, label)``-sorted edge labels — O(E log E) per round.

    Collapse guard: stop (returning the PREVIOUS labeling) as soon as the
    heaviest community outgrows one shard's capacity — a community that
    cannot fit a shard is useless for packing, and unguarded LPA on
    graphs with weak structure merges everything into a handful of giant
    labels.
    """
    N = len(indptr) - 1
    deg = np.diff(indptr).astype(np.int64)
    w = (deg + 1).astype(np.float64)
    cap = w.sum() / n_shards
    rows = np.repeat(np.arange(N, dtype=np.int64), deg)
    labels = np.arange(N, dtype=np.int64)
    for _ in range(rounds):
        lab_e = labels[indices]
        order = np.lexsort((lab_e, rows))
        r_s, l_s = rows[order], lab_e[order]
        new_run = np.concatenate(
            [[True], (r_s[1:] != r_s[:-1]) | (l_s[1:] != l_s[:-1])])
        run_id = np.cumsum(new_run) - 1
        run_counts = np.bincount(run_id)
        run_row = r_s[new_run]
        run_lab = l_s[new_run]
        o2 = np.lexsort((run_lab, -run_counts, run_row))
        rr = run_row[o2]
        first = np.concatenate([[True], rr[1:] != rr[:-1]])
        newlab = labels.copy()
        newlab[rr[first]] = run_lab[o2][first]
        lw = np.bincount(np.unique(newlab, return_inverse=True)[1],
                         weights=w)
        if lw.max() > cap:
            return labels
        changed = int((newlab != labels).sum())
        labels = newlab
        if changed < max(N // 1000, 1):
            break
    return labels


def _pack_communities(labels, deg, n_shards, cap_slack=1.05):
    """Bin-pack communities into shards: heaviest community first into
    the least-loaded shard (LPT greedy), splitting any community that
    does not fit the remaining capacity by cumulative degree."""
    N = len(labels)
    w = deg + 1
    cap = w.sum() / n_shards * cap_slack
    uniq, inv = np.unique(labels, return_inverse=True)
    cw = np.bincount(inv, weights=w.astype(np.float64))
    order = np.argsort(inv, kind='stable')
    shard = np.empty(N, np.int32)
    loads = np.zeros(n_shards)
    starts = np.zeros(len(uniq) + 1, np.int64)
    np.cumsum(np.bincount(inv), out=starts[1:])
    for ci in np.argsort(-cw):
        verts = order[starts[ci]:starts[ci + 1]]
        cum = np.cumsum(w[verts].astype(np.float64))
        lo = 0
        while lo < len(verts):
            s = int(np.argmin(loads))
            room = cap - loads[s]
            base = cum[lo - 1] if lo else 0.0
            hi = int(np.searchsorted(
                cum, base + max(room, w[verts[lo]]), side='right'))
            hi = max(hi, lo + 1)
            shard[verts[lo:hi]] = s
            loads[s] += cum[hi - 1] - base
            lo = hi
    return shard


def _refine_labels(indptr, indices, labels, n_shards, rounds=15,
                   slack=1.05):
    """Capacity-constrained k-way refinement: each round every vertex
    scores shards by neighbor count and the highest-gain movers are
    accepted per target shard until its capacity (nnz·slack/S) fills."""
    N = len(indptr) - 1
    S = n_shards
    deg = np.diff(indptr).astype(np.int64)
    rows = np.repeat(np.arange(N, dtype=np.int64), deg)
    w = deg + 1
    cap = w.sum() / S * slack
    ar = np.arange(N)
    labels = labels.astype(np.int32).copy()
    for _ in range(rounds):
        counts = np.bincount(rows * S + labels[indices],
                             minlength=N * S).reshape(N, S)
        load = np.bincount(labels, weights=w.astype(np.float64),
                           minlength=S)
        best = np.argmax(counts.astype(np.float64)
                         - 1e-9 * load[None, :], axis=1).astype(np.int32)
        gain = counts[ar, best] - counts[ar, labels]
        movers = np.flatnonzero((gain > 0) & (best != labels))
        if not len(movers):
            break
        order = movers[np.lexsort((-gain[movers], best[movers]))]
        tgt = best[order]
        grp = np.searchsorted(tgt, np.arange(S))
        cumw = np.cumsum(w[order].astype(np.float64))
        prev = np.concatenate([[0.0], cumw])[grp]
        accept = cumw - prev[tgt] + load[tgt] <= cap
        moved = order[accept]
        if not len(moved):
            break
        labels[moved] = best[moved]
    return labels


def _halo_pairs(indptr, indices, labels):
    """The partition objective: unique (receiving shard, remote column)
    pairs — exactly the rows shipped per SpMM step."""
    N = len(indptr) - 1
    deg = np.diff(indptr).astype(np.int64)
    rows = np.repeat(np.arange(N, dtype=np.int64), deg)
    sr = labels[rows].astype(np.int64)
    mask = sr != labels[indices]
    return int(np.unique(sr[mask] * N + indices[mask]).size)


def cluster_shards(W, n_shards: int, slack: float = 1.05,
                   lpa_rounds: int = 20,
                   refine_rounds: int = 15) -> np.ndarray:
    """Shard labels by community clustering (SURVEY §7 stage 6's
    "boundary-minimizing METIS-lite"): guarded label-propagation
    community detection → LPT bin-packing into ``n_shards`` →
    capacity-constrained k-way refinement. All passes are vectorized
    NumPy, O(E log E) per round — ~20 s at 16.7M edges.

    Returns the best of three candidates by the true objective (unique
    halo pairs): the contiguous nnz-balanced split, its refinement, and
    the refined LPA packing — LPA can lose to contiguity when the vertex
    order is already block-local (sorted SBM), and win big when it is
    not (shuffled SBM: halo within ~6% of the true-membership oracle,
    28% below the contiguous split). On expander-like graphs (BA) every
    candidate is within ~10% of random — ``PARTITION_r3.json`` records
    the measured decomposition showing BA halo volume is dominated by
    low-degree columns no vertex partition can localize.
    """
    W = sps.csr_matrix(W)
    N = W.shape[0]
    deg = np.diff(W.indptr).astype(np.int64)

    # candidate 0: contiguous nnz-balanced ranges (the non-cluster default)
    cum = np.cumsum(deg + 1)
    targets = cum[-1] / n_shards * np.arange(1, n_shards)
    bounds = np.concatenate([[0], np.searchsorted(cum, targets), [N]])
    contig = np.zeros(N, np.int32)
    for s in range(n_shards):
        contig[bounds[s]:bounds[s + 1]] = s

    comm = _lpa_communities(W.indptr, W.indices, n_shards,
                            rounds=lpa_rounds)
    packed = _pack_communities(comm, deg, n_shards, cap_slack=slack)
    candidates = [
        contig,
        _refine_labels(W.indptr, W.indices, contig, n_shards,
                       rounds=refine_rounds, slack=slack),
        _refine_labels(W.indptr, W.indices, packed, n_shards,
                       rounds=refine_rounds, slack=slack),
    ]
    return min(candidates,
               key=lambda l: _halo_pairs(W.indptr, W.indices, l))


def partition_graph(W, n_shards: int, lap_type: str = 'combinatorial',
                    reorder: str = 'rcm', balance: str = 'nnz',
                    dtype=None) -> ShardedGraph:
    """Partition a symmetric scipy adjacency into a :class:`ShardedGraph`.

    reorder: 'rcm' (reverse Cuthill–McKee, minimizes boundary volume for
    mesh-like graphs), 'none' (keep order — SBM graphs sorted by community
    are already block-local), 'cluster' (community clustering via
    :func:`cluster_shards` — recovers block-local partitions from
    arbitrary vertex order; shard boundaries then FOLLOW the clusters
    and ``balance`` is ignored, with nnz imbalance ≤ ~1.05 enforced by
    the packer's capacity).

    balance: 'nnz' splits the (reordered) vertex sequence at degree-
    weighted boundaries so every shard owns ~nnz/S edges — on power-law
    graphs this stops one shard inheriting all the hub rows and shrinks
    the static per-shard edge width E (= max over shards) toward the
    mean. 'vertex' is the plain equal-vertex-count split. Shards own
    contiguous (possibly different-length) vertex ranges, each padded to
    a common ``n_local`` so shapes stay uniform for ``shard_map``.

    Examples
    --------
    >>> from pygsp_tpu import graphs
    >>> from pygsp_tpu.parallel import partition_graph
    >>> G = graphs.Sensor(64, seed=42)
    >>> sg = partition_graph(G.W, 4)
    >>> sg.n_shards, sg.n_local * 4 >= G.N
    (4, True)
    >>> sg.halo_total > 0                # remote rows each shard receives
    True

    """
    W = sps.csr_matrix(W)
    N = W.shape[0]
    if dtype is None:
        dtype = np.float64 if jax.config.jax_enable_x64 else np.float32

    cluster_bounds = None
    if reorder == 'rcm':
        order = sps.csgraph.reverse_cuthill_mckee(W, symmetric_mode=True)
    elif reorder == 'none':
        order = np.arange(N)
    elif reorder == 'cluster':
        labels = cluster_shards(W, n_shards)
        order = np.argsort(labels, kind='stable')
        cluster_bounds = np.concatenate(
            [[0], np.cumsum(np.bincount(labels, minlength=n_shards))]
        ).astype(np.int64)
    else:
        raise ValueError(f'Unknown reorder {reorder!r}')
    Wp = W[order][:, order].tocsr()

    # --- shard boundaries over the reordered vertex sequence -------------
    deg_rank = np.diff(Wp.indptr)             # degree of each rank
    if cluster_bounds is not None:
        bounds = cluster_bounds
    elif balance == 'nnz' and deg_rank.sum() > 0:
        # split cumulative degree evenly; +1 per vertex regularizes
        # zero-degree stretches so vertex counts can't run away
        cum = np.cumsum(deg_rank + 1)
        targets = cum[-1] / n_shards * np.arange(1, n_shards)
        bounds = np.searchsorted(cum, targets, side='left')
        bounds = np.concatenate([[0], bounds, [N]]).astype(np.int64)
        # monotonicity guard for degenerate distributions
        bounds = np.maximum.accumulate(bounds)
    elif balance in ('vertex', 'nnz'):
        even = int(np.ceil(N / n_shards))
        bounds = np.minimum(np.arange(n_shards + 1) * even, N)
    else:
        raise ValueError(f'Unknown balance {balance!r}')
    range_len = np.diff(bounds)               # vertices owned by each shard
    n_local = max(_round_up(int(range_len.max()), 8), 8)
    n_pad = n_shards * n_local

    # rank (position in reordered sequence) -> padded slot position, with a
    # deterministic WITHIN-SHARD shuffle: BA-style vertex ids correlate
    # with degree, so without it hub rows cluster into the same output
    # windows of the per-shard windowed-compact layout and blow up its
    # pooled slab width (measured 1.61x on the bare local SpMM at the
    # bench config, benchmarks/sharded_spmm_probe.py — the same reason
    # the single-chip builder shuffle-relabels, windowed.py `permute=`).
    # The shuffle rides the global ``perm`` (pad_signal applies it), so
    # it costs nothing at runtime; shard MEMBERSHIP is untouched.
    shard_of_rank = np.searchsorted(bounds, np.arange(N), side='right') - 1
    sh_rng = np.random.default_rng(0x5EED)
    local_pos = np.empty(N, dtype=np.int64)
    for s in range(n_shards):
        local_pos[bounds[s]:bounds[s + 1]] = sh_rng.permutation(
            n_local)[:range_len[s]]
    pos_of_rank = shard_of_rank * n_local + local_pos
    perm = np.empty(N, dtype=np.int64)
    perm[order] = pos_of_rank               # original id -> padded position

    # Laplacian values on the reordered graph
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

    rows_all = pos_of_rank[coo.row]
    cols_all = pos_of_rank[coo.col]
    shard_of = rows_all // n_local

    # --- pass 1 (vectorized): per-shard halo vertex sets and H ----------
    per = []            # per shard: (rows_local, cols_global, vals, is_local)
    halo_ids = []       # per shard: sorted unique remote global ids
    for s in range(n_shards):
        msk = shard_of == s
        r = rows_all[msk] - s * n_local
        c = cols_all[msk]
        v = vals_all[msk]
        srt = np.argsort(r, kind='stable')   # rows arrive shuffle-scattered;
        r, c, v = r[srt], c[srt], v[srt]     # consumers require row-sorted
        is_local = (c >= s * n_local) & (c < (s + 1) * n_local)
        per.append((r, c, v, is_local))
        halo_ids.append(np.unique(c[~is_local]))

    # Per-distance bucket widths: H_d = worst (src -> src+d) send count.
    pair_counts = np.zeros((n_shards, n_shards), dtype=np.int64)
    for s in range(n_shards):
        if len(halo_ids[s]):
            pair_counts[:, s] = np.bincount(halo_ids[s] // n_local,
                                            minlength=n_shards)
    dist_max = np.zeros(n_shards, dtype=np.int64)      # index = distance
    for src in range(n_shards):
        for dst in range(n_shards):
            if pair_counts[src, dst]:
                dist_max[(dst - src) % n_shards] = max(
                    dist_max[(dst - src) % n_shards], pair_counts[src, dst])
    halo_dists = tuple(int(d) for d in np.flatnonzero(dist_max))
    halo_sizes = tuple(max(_round_up(int(dist_max[d]), 8), 8)
                       for d in halo_dists)
    k_of_dist = {d: k for k, d in enumerate(halo_dists)}
    offsets = np.concatenate([[0], np.cumsum(halo_sizes)]).astype(np.int64)

    # --- pass 2 (vectorized): slot assignment + send maps ---------------
    # recv layout on shard s: [owned ‖ bucket per distance]; within the
    # bucket for distance d = (s - src) % S, slot j = j-th entry shard src
    # sends to s; remote ids are sorted so per-src groups are contiguous
    # and j = rank within the group (sender and receiver both derive j
    # from the receiver's sorted remote set, so the maps agree).
    E = max((len(p_[0]) for p_ in per), default=0)
    E = max(_round_up(E, 1024), 1024)
    rows_arr = np.full((n_shards, E), n_local, dtype=np.int32)
    cols_arr = np.zeros((n_shards, E), dtype=np.int32)
    vals_arr = np.zeros((n_shards, E), dtype=dtype)
    send_arrs = [np.full((n_shards, h), n_local, dtype=np.int32)
                 for h in halo_sizes]

    for s in range(n_shards):
        r, c, v, is_local = per[s]
        remote = halo_ids[s]
        c_ext = np.where(is_local, c - s * n_local, 0)
        if len(remote):
            src = remote // n_local
            group_start = np.searchsorted(src, np.arange(n_shards))
            j = np.arange(len(remote)) - group_start[src]
            k = np.array([k_of_dist[(s - sr) % n_shards] for sr in src],
                         dtype=np.int64)
            slot = n_local + offsets[k] + j
            ridx = np.searchsorted(remote, c[~is_local])
            c_ext[~is_local] = slot[ridx]
            for kk in np.unique(k):
                m = k == kk
                send_arrs[kk][src[m], j[m]] = remote[m] - src[m] * n_local
        ne = len(r)
        rows_arr[s, :ne] = r
        cols_arr[s, :ne] = c_ext
        vals_arr[s, :ne] = v

    flat = np.zeros(n_pad, dtype=dtype)
    flat[pos_of_rank] = diag_all
    diag_arr = flat.reshape(n_shards, n_local)

    return ShardedGraph(
        rows=jnp.asarray(rows_arr), cols=jnp.asarray(cols_arr),
        vals=jnp.asarray(vals_arr), diag=jnp.asarray(diag_arr),
        send_idx=tuple(jnp.asarray(a) for a in send_arrs),
        perm=jnp.asarray(perm, jnp.int32),
        n_shards=n_shards, n_local=n_local, halo_dists=halo_dists,
        halo_sizes=halo_sizes, n_vertices=N, lap_type=lap_type)


@partial(jax.tree_util.register_dataclass,
         data_fields=['ell_cols', 'ell_vals', 'lvl_rows', 'lvl_cols',
                      'lvl_vals'],
         meta_fields=['ell_width'])
@dataclasses.dataclass(frozen=True)
class ShardedELL:
    """Per-shard multi-level ELL of the local (extended-column) edges.

    Same scatter-free layout as :class:`pygsp_tpu.core.sparse.ELLMatrix`
    but with a leading shard axis and a SHARED level structure across
    shards (a ``shard_map`` requirement): widths/level counts are global;
    shards with fewer overflow rows pad with sentinel rows (dropped by the
    unique-row scatter). Column ids live in the extended-local space
    ``[0, n_local + halo_total)``; sentinel slots point one past it.
    """

    ell_cols: jax.Array          # (S, n_local, w0)
    ell_vals: jax.Array          # (S, n_local, w0)
    lvl_rows: tuple              # per level: (S, R) int32, sentinel n_local
    lvl_cols: tuple              # per level: (S, R, w)
    lvl_vals: tuple
    ell_width: int


def shard_local_ell(sg: ShardedGraph, width: int | None = None,
                    level_factor: int = 2, split_boundary: bool = False):
    """Convert a ShardedGraph's per-shard COO into stacked multi-level ELL.

    With ``split_boundary=True``, returns ``(interior, boundary)``: the
    interior ELL references ONLY owned vertices (cols < n_local) and the
    boundary ELL only halo slots — the sharded matvec then computes the
    interior aggregation with no data dependency on the halo
    ``all_to_all``, letting XLA overlap the collective with local compute
    (SURVEY hard part #2). Otherwise returns one combined ELL.
    """
    if split_boundary:
        import dataclasses as _dc
        n_local = sg.n_local
        rows = np.asarray(sg.rows)
        cols = np.asarray(sg.cols)
        interior_mask = cols < n_local
        def filtered(mask):
            r = np.where(mask, rows, n_local)
            # keep row-sortedness per shard by stable re-sort
            out_rows = np.empty_like(rows)
            out_cols = np.empty_like(cols)
            out_vals = np.empty_like(np.asarray(sg.vals))
            for s_ in range(sg.n_shards):
                order = np.argsort(r[s_], kind='stable')
                out_rows[s_] = r[s_][order]
                out_cols[s_] = cols[s_][order]
                out_vals[s_] = np.asarray(sg.vals)[s_][order]
            return _dc.replace(sg, rows=jnp.asarray(out_rows),
                               cols=jnp.asarray(out_cols),
                               vals=jnp.asarray(out_vals))
        sg_int = filtered(interior_mask & (rows < n_local))
        sg_bnd = filtered(~interior_mask & (rows < n_local))
        return (shard_local_ell(sg_int, width, level_factor),
                shard_local_ell(sg_bnd, width, level_factor))

    S = sg.n_shards
    n_local = sg.n_local
    n_ext = n_local + sg.halo_total
    rows = np.asarray(sg.rows)
    cols = np.asarray(sg.cols)
    vals = np.asarray(sg.vals)

    # global degree stats (padding rows == n_local excluded)
    degs = np.stack([np.bincount(rows[s][rows[s] < n_local],
                                 minlength=n_local) for s in range(S)])
    nnz_total = int(degs.sum())
    if width is None:
        mean = max(1, int(np.ceil(nnz_total / max(S * n_local, 1))))
        width = max(_round_up(mean, 8), 8)
    maxdeg = int(degs.max()) if degs.size else 0

    # shared width schedule
    bases, widths = [], []
    base, w = width, max(_round_up(width, 8), 8)
    while base < maxdeg:
        w = min(w, max(_round_up(maxdeg - base, 8), 8))
        bases.append(base)
        widths.append(w)
        base += w
        w = max(_round_up(w * level_factor, 8), 8)

    lvl_row_counts = [max(int((degs > b).sum(axis=1).max()), 1)
                      for b in bases]

    ell_cols = np.full((S, n_local, width), n_ext, dtype=np.int32)
    ell_vals = np.zeros((S, n_local, width), dtype=vals.dtype)
    lvl_rows = [np.full((S, r), n_local, np.int32) for r in lvl_row_counts]
    lvl_cols = [np.full((S, r, w), n_ext, np.int32)
                for r, w in zip(lvl_row_counts, widths)]
    lvl_vals = [np.zeros((S, r, w), vals.dtype)
                for r, w in zip(lvl_row_counts, widths)]

    for s in range(S):
        real = rows[s] < n_local
        r, c, v = rows[s][real], cols[s][real], vals[s][real]
        order = np.argsort(r, kind='stable')
        r, c, v = r[order], c[order], v[order]
        rowptr = np.zeros(n_local + 1, np.int64)
        np.cumsum(np.bincount(r, minlength=n_local), out=rowptr[1:])
        deg = degs[s]

        def pack(row_subset, b, w):
            starts = rowptr[row_subset] + b
            ends = rowptr[row_subset + 1]
            idx = starts[:, None] + np.arange(w)[None, :]
            valid = idx < ends[:, None]
            idx = np.minimum(idx, max(len(r) - 1, 0))
            pc = np.where(valid, c[idx], n_ext).astype(np.int32)
            pv = np.where(valid, v[idx], 0).astype(vals.dtype)
            return pc, pv

        if len(r):
            pc, pv = pack(np.arange(n_local), 0, width)
            ell_cols[s], ell_vals[s] = pc, pv
        for li, (b, w) in enumerate(zip(bases, widths)):
            lr = np.flatnonzero(deg > b)
            if not len(lr):
                continue
            pc, pv = pack(lr, b, w)
            lvl_rows[li][s, :len(lr)] = lr
            lvl_cols[li][s, :len(lr)] = pc
            lvl_vals[li][s, :len(lr)] = pv

    return ShardedELL(
        ell_cols=jnp.asarray(ell_cols), ell_vals=jnp.asarray(ell_vals),
        lvl_rows=tuple(jnp.asarray(a) for a in lvl_rows),
        lvl_cols=tuple(jnp.asarray(a) for a in lvl_cols),
        lvl_vals=tuple(jnp.asarray(a) for a in lvl_vals),
        ell_width=width)
