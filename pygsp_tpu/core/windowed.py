"""Windowed-compact ELL — slot-exact SpMM storage folded on the MXU.

The successor to :mod:`pygsp_tpu.core.chunked` for power-law graphs. Both
formats exist because XLA row-gathers hit a cliff above ~2^16-row
operands, so the source axis is split into chunks and the signal carried
as a tuple of per-chunk buffers. What this format changes is the SLOT
LAYOUT: the block format aligns slots per output row (ELL), which on a
power-law graph wastes ~2x the slots — per-(row, src-chunk) edge counts
are ~Poisson(1), so aligned rows are half padding and reordering cannot
fix it (``benchmarks/degree_sort_probe.py``). Here slots are
EXACT-PACKED per (P-row output window, src chunk) and each slot carries
its own window-local row id; the fold from slots to rows is a one-hot
contraction over the window axis — a few hundred GFLOP on the MXU,
measured to FUSE with the slot gather and run at the gather's own speed
(``benchmarks/windowed_compact_probe.py``: 3.5-3.7 ns/slot at
``Precision.HIGHEST`` with 1.5e-7 error, vs 2.9 for a fold-free gather
of the same slot count; single-pass default precision is the same speed
but rounds through bf16 at ~2e-3 — hence HIGHEST, whose extra MXU
passes are free at these shapes).

Padding then moves from per-row variance (Poisson(1), ~2.07x) to
per-window variance (Poisson(P), ~1.1x) with two safety valves:

- **borrowed slack**: slot row ids live in [0, 2P): a window's overflow
  can occupy the free tail of the PREVIOUS window's slab, addressing
  forward into the next window's rows. The fold output ``(NW, 2P, S)``
  splits into the main part plus a P-row-shifted add — no scatter.
- **residue levels**: whatever still spills (hub rows, deep Poisson
  tail) reuses the chunked format's merged level tiers: per-row slot
  blocks per (src chunk, tier), folded with ONE global scatter-add.

Same contract as every sparse backend here: ``y = A @ x``, the
reference's ``G.L.dot(signal)`` (``pygsp/filters/approximations.py:99``).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from pygsp_tpu.core.chunked import (CHUNK_ROWS, ChunkLevel, chunk_signal,
                                    unchunk_signal)
from pygsp_tpu.core.sparse import _slot_block_sum

# Output rows per window. 2P = 128 keeps the fold's one-hot dim on full
# MXU lanes (measured as fast as the 32-wide variant) and row ids in
# uint8.
WINDOW_ROWS = 64

# MXU precision of the one-hot fold. HIGHEST emulates true f32 through
# ~6 bf16 passes, measured ~15 ms/SpMM over DEFAULT's single pass at the
# bench config (``benchmarks/windowed_diag7.py``); DEFAULT alone rounds
# through bf16 at ~5e-4. The float32 path therefore uses a manual
# TWO-pass split (``_FOLD_SPLIT2``): the one-hot operand is EXACT in
# bf16 (entries 0/1), so only the gathered products need hi/lo
# splitting — ``oh @ p_hi + oh @ p_lo`` at DEFAULT costs 2 passes for
# ~1e-6 error where HIGH/HIGHEST burn 6 splitting both operands.
# MEASURED OFF in the full Chebyshev bank: the bare SpMM wins ~15 ms
# (diag7) but in-bank both split operands materialize and the bank
# LOSES ~400 ms (/tmp/bench_r2_g1 vs bench_r2_v2) — left as a probe
# knob only.
FOLD_PRECISION = lax.Precision.HIGHEST
_FOLD_SPLIT2 = False


@partial(jax.tree_util.register_dataclass,
         data_fields=['cols', 'vals', 'rowid', 'levels', 'level_rows',
                      'rowptr', 'perm', 'iperm'],
         meta_fields=['n_rows', 'n_cols', 'nnz', 'chunk_rows',
                      'window_rows', 'borrow_span'])
@dataclasses.dataclass(frozen=True)
class WindowedELLMatrix:
    """Windowed-compact sparse matrix (see module docstring).

    ``cols``/``vals``/``rowid``: ``(n_out, NW, n_src, L)`` slot slabs —
    ``cols`` local to the source chunk (sentinel ``== chunk_rows``:
    clamped gather, zero value), ``rowid`` in ``[0, span·P)`` (uint8)
    giving the output row RELATIVE to the slab's window base (values in
    ``[d·P, (d+1)·P)`` address window ``w+d`` — borrowed slack, pooled
    over ``borrow_span`` consecutive windows). ``levels``/
    ``level_rows``: residue tiers exactly as in
    :class:`~pygsp_tpu.core.chunked.ChunkedELLMatrix`. ``rowptr``: true
    global CSR pointer for degree queries.

    ``borrow_span`` (meta, default 2 = the original one-window-deep
    borrow): how many consecutive windows pool their slack. Fragmented
    low-density blocks (weak-scale 2-D step matrices, ``WEAKPAD_r4``)
    have per-slab demand λ_w ≪ 64 whose relative variance ~1/√λ_w makes
    the 2-window pool pad ~1.4x; a 4-window pool cuts it to ~1.2x at
    λ_w = 16 (measured in ``benchmarks/weak_layout_pads_r5.py``). The
    fold's one-hot dim is ``span·P`` — FLOPs scale with span, so the
    builder only widens the span when the pad win pays for it.
    """

    cols: jax.Array
    vals: jax.Array
    rowid: jax.Array
    levels: tuple
    level_rows: jax.Array
    rowptr: jax.Array
    n_rows: int
    n_cols: int
    nnz: int
    chunk_rows: int
    window_rows: int
    borrow_span: int = 2
    # ``perm``/``iperm``: optional vertex relabeling (see the builder's
    # ``permute='shuffle'``). Contract stays ORIGINAL order — the SpMM
    # permutes on entry/exit and iterative drivers hoist both permutes
    # outside their recurrence (same protocol as the chunked format).
    perm: jax.Array | None = None
    iperm: jax.Array | None = None

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def n_slots(self) -> int:
        return int(np.prod(self.cols.shape))

    @property
    def n_out_chunks(self) -> int:
        return self.cols.shape[0]

    @property
    def n_src_chunks(self) -> int:
        return self.cols.shape[2]

    def out_chunk_size(self, i: int) -> int:
        return min(self.chunk_rows, self.n_rows - i * self.chunk_rows)

    def src_chunk_size(self, c: int) -> int:
        return min(self.chunk_rows, self.n_cols - c * self.chunk_rows)

    def astype(self, dtype) -> 'WindowedELLMatrix':
        return dataclasses.replace(
            self, vals=self.vals.astype(dtype),
            levels=tuple(dataclasses.replace(l, vals=l.vals.astype(dtype))
                         for l in self.levels))

    def scale_vals(self, scale) -> 'WindowedELLMatrix':
        return dataclasses.replace(
            self, vals=self.vals * scale,
            levels=tuple(dataclasses.replace(l, vals=l.vals * scale)
                         for l in self.levels))

    def abs_vals(self) -> 'WindowedELLMatrix':
        return dataclasses.replace(
            self, vals=jnp.abs(self.vals),
            levels=tuple(dataclasses.replace(l, vals=jnp.abs(l.vals))
                         for l in self.levels))

    def spmm_chunks(self, x_chunks, out_dtype=None) -> tuple:
        return windowed_spmm_chunks(self, x_chunks, out_dtype=out_dtype)

    def __matmul__(self, x):
        return windowed_spmm(self, x)


# ---------------------------------------------------------------------------
# SpMM
# ---------------------------------------------------------------------------

def windowed_spmm_chunks(mat: WindowedELLMatrix, x_chunks,
                         out_dtype=None) -> tuple:
    """``y_chunks = A @ x_chunks`` with tuple-of-chunk input and output.

    One ``lax.scan`` over output chunks; the body gathers every source
    chunk's slab, stacks the gathers along the slot axis, and folds ALL
    slots to window rows with ONE one-hot MXU contraction per out chunk
    (``benchmarks/windowed_diag3.py``: the per-src-chunk einsum variant
    writes its (NW, 2P, S) output once per src chunk — accumulation
    traffic that put a 95 ms floor under an 81 ms dot). The borrowed
    half overlap-adds via a concatenate-with-zeros + add, which fuses
    into the dot epilogue (``windowed_diag5.py``: same speed as no add;
    ``.at[].add`` and ``pad`` variants cost 2.5-7 ms). Levels fold with
    one global scatter afterwards (outside the scan).

    ``out_dtype`` decouples the accumulation/output dtype from the input
    chunks: the bf16-carry Chebyshev mode gathers half-width bf16 signal
    rows while the fold's MXU contraction accumulates in f32
    (``preferred_element_type``) — only the gather bytes drop precision,
    never the row sums. bf16 products run the fold at native single-pass
    MXU precision (exact: the one-hot operand is 0/1).
    """
    return windowed_spmm_chunks_multi([mat], [x_chunks],
                                      out_dtype=out_dtype)


def windowed_spmm_chunks_multi(mats, x_chunks_list, out_dtype=None):
    """``y_chunks = Σ_m A_m @ x_chunks_m`` — FUSED multi-matrix SpMM.

    All matrices must share ``chunk_rows``, ``window_rows``,
    ``borrow_span`` and the output row space; slab widths / source-chunk
    counts may differ. The scan body folds every matrix's slabs for the
    out chunk, SUMS the ``(nw, K·P, S)`` window tensors, and constructs
    the output strip ONCE — this is the round-5 fix for the weak-scale
    2-D engines, whose ``pr`` ring-step folds each materialized their
    own full ``pc·n_local``-row partial strip (measured to dominate the
    fragmented-block step time: ``FRAGDIAG5_r5.json`` p=16 folds spent
    ~4x the ideal output traffic; summing before the strip removes the
    ``pr−1`` extra strip rounds).
    """
    m0 = mats[0]
    R = m0.chunk_rows
    P = m0.window_rows
    K = int(getattr(m0, 'borrow_span', 2))     # windows pooled per slab
    n_out, NW = m0.cols.shape[:2]
    for m in mats[1:]:
        if (m.chunk_rows != R or m.window_rows != P
                or int(getattr(m, 'borrow_span', 2)) != K
                or m.cols.shape[:2] != (n_out, NW)):
            raise ValueError('fused SpMM requires matching chunk_rows/'
                             'window_rows/borrow_span/out chunking')
    x2s, pdts = [], []
    trailing = None
    for xc in x_chunks_list:
        xt = tuple(jnp.asarray(xk) for xk in xc)
        if trailing is None:
            trailing = xt[0].shape[1:]
        x2s.append(tuple(xk.reshape(xk.shape[0], -1) for xk in xt))
    S = x2s[0][0].shape[1]
    for m, x2 in zip(mats, x2s):
        pdts.append(jnp.promote_types(x2[0].dtype, m.vals.dtype))
    dt = (jnp.dtype(out_dtype) if out_dtype is not None
          else jnp.dtype(pdts[0]))
    for p_ in pdts[1:]:
        if out_dtype is None:
            dt = jnp.promote_types(dt, p_)
    # Row sums ALWAYS accumulate at >= f32 on the MXU; a narrow
    # ``out_dtype`` only narrows what leaves the dot (the convert fuses
    # into the dot epilogue). This is the weak-scale fold-traffic lever
    # (PALLAS_FOLD_r5.json): at fragmented per-slab demand the
    # (nw, K·P, S) window tensor + strip bytes dominate the SpMM —
    # 205 B/slot at λ_w = 16 vs 114 at single-chip density — and the
    # bf16-carry recurrence re-rounds the output anyway, so emitting
    # bf16 halves that traffic for one extra same-scale rounding.
    acc_dt = jnp.promote_types(dt, jnp.float32)
    iota = jnp.arange(K * P, dtype=jnp.int32)

    # Windows per scan step. The body's stacked gather ``p`` and the
    # one-hot fold materialize temps of ~4·nw·(n_src·L·(S̃+K·P) + 8·P·S̃)
    # bytes (S̃ = S lane-padded to 128) — at config-5 scale (32 src
    # chunks) that is gigabytes, so the scan sub-chunks the window axis,
    # carrying the (P, S) borrowed block across steps. Borrowing never
    # crosses an (out, src) block (window 0 borrows nothing and the last
    # slab of a block holds no forward rows), so the carry entering each
    # out chunk is exactly zero and the split is arithmetic-identical.
    nw_sub = NW
    env_step = os.environ.get('PYGSP_WINDOW_STEP')
    if env_step:
        nw_sub = max(1, min(NW, int(env_step)))
        while NW % nw_sub:
            nw_sub -= 1
    else:
        cap = float(os.environ.get('PYGSP_WINDOWED_BODY_MB', 2048)) * 2**20
        spad = -(-S // 128) * 128
        # dtype-aware: the stacked products/one-hot live in the PRODUCT
        # dtype (bf16 carry halves them), the fold output buffers in the
        # accumulation dtype. Sub-chunking below ~256 windows is
        # expensive at large n_src — each per-src-chunk gather shrinks
        # to ~1 MB and goes latency-bound (measured at config-5 scale:
        # nw_sub 64 -> 36% of roofline, 256 -> 70%, 512 -> 87%), so the
        # estimate must not over-shrink when the carry is narrow.
        ob = jnp.dtype(dt).itemsize

        def est(nws):
            tot = 4.0 * K * P * spad * ob
            for m, p_ in zip(mats, pdts):
                n_src, L = m.cols.shape[2:]
                tot += (n_src * L * (spad + K * P)
                        * jnp.dtype(p_).itemsize)
            return float(nws) * tot

        while nw_sub > 1 and nw_sub % 2 == 0 and est(nw_sub) > cap:
            nw_sub //= 2
    if K > 2 and nw_sub < min(K, NW):
        # the sub-chunked carry strip holds (K-1)·P rows — each inner
        # group must cover at least that many windows
        nw_sub = next((g for g in range(K, NW) if NW % g == 0), NW)

    with jax.named_scope('spmm_windowed'):
        def fold_one(co, va, ri, nw, x2, pdt, n_src, L):
            """Gather one matrix's src-chunk slots + one-hot MXU fold ->
            (nw, K*P, S) window rows (part d = rows borrowed from
            window w+d)."""
            ps = [va[:, c][..., None] * x2[c][co[:, c]]      # (nw, L, S)
                  for c in range(n_src)]
            p = (jnp.stack(ps, axis=1).reshape(nw, n_src * L, S)
                 if n_src > 1 else ps[0])
            oh = (ri.reshape(nw, n_src * L).astype(jnp.int32)[..., None]
                  == iota).astype(pdt)              # (nw, n_src*L, K*P)
            if _FOLD_SPLIT2 and pdt == jnp.float32:
                p_hi = p.astype(jnp.bfloat16).astype(pdt)
                p_lo = p - p_hi
                return (jnp.einsum('wlp,wls->wps', oh, p_hi,
                                   preferred_element_type=acc_dt)
                        + jnp.einsum('wlp,wls->wps', oh, p_lo,
                                     preferred_element_type=acc_dt)
                        ).astype(dt)
            # bf16 products: native single-pass MXU, accumulated in
            # acc_dt (>= f32 — see above); HIGHEST's multi-pass split is
            # an f32-operand workaround and would waste passes on exact
            # inputs. The astype to a narrower out dtype fuses into the
            # dot epilogue (per-matrix so the multi-matrix sum also
            # moves at out width).
            prec = (lax.Precision.DEFAULT if pdt == jnp.bfloat16
                    else FOLD_PRECISION)
            return jnp.einsum('wlp,wls->wps', oh, p, precision=prec,
                              preferred_element_type=acc_dt).astype(dt)

        def fold(slabs, nw):
            """Σ over matrices of the per-matrix window folds."""
            t = None
            for (co, va, ri), m, x2, pdt in zip(slabs, mats, x2s, pdts):
                n_src, L = m.cols.shape[2:]
                tm = fold_one(co, va, ri, nw, x2, pdt, n_src, L)
                t = tm if t is None else t + tm
            return t

        if nw_sub == NW:
            # fast path: zero borrow prefix per out chunk (measured to
            # fuse into the dot epilogue — windowed_diag5.py); part d
            # overlap-adds shifted d windows forward
            def body(carry, slabs):
                t = fold(slabs, NW)
                y = t[:, :P, :].reshape(NW * P, S)
                for d in range(1, K):
                    if NW <= d:
                        break     # packing never borrows past the block
                    a = t[:, d * P:(d + 1) * P, :].reshape(NW * P, S)
                    y = y + jnp.concatenate(
                        [jnp.zeros((d * P, S), dt), a[:-d * P]])
                return carry, y
        elif K == 2:
            # sub-chunked: an INNER scan over window groups, reshaping
            # the out chunk's slab inside the body (splitting the leading
            # window axis only — reshaping the scan INPUTS instead makes
            # XLA relayout-copy the full GB-scale slab arrays). The
            # incoming borrow of each out chunk is zero, so the inner
            # carry starts at zeros every chunk.
            G = NW // nw_sub

            def body(carry, slabs):
                subs = tuple(
                    tuple(a.reshape((G, nw_sub) + a.shape[1:])
                          for a in slab) for slab in slabs)

                def inner(bcar, sub):
                    t = fold(sub, nw_sub)
                    a = t[:, :P, :].reshape(nw_sub * P, S)
                    b = t[:, P:, :].reshape(nw_sub * P, S)
                    y = a + (jnp.concatenate([bcar, b[:-P]])
                             if nw_sub > 1 else bcar)
                    return b[-P:], y

                _, ys2 = lax.scan(inner, jnp.zeros((P, S), dt), subs)
                return carry, ys2.reshape(NW * P, S)
        else:
            # sub-chunked, K > 2: the carry is the (K-1)·P-row strip of
            # forward contributions; nw_sub >= K guaranteed above
            G = NW // nw_sub

            def body(carry, slabs):
                subs = tuple(
                    tuple(a.reshape((G, nw_sub) + a.shape[1:])
                          for a in slab) for slab in slabs)

                def inner(bcar, sub):
                    t = fold(sub, nw_sub)
                    y = t[:, :P, :].reshape(nw_sub * P, S)
                    tails = []
                    for d in range(1, K):
                        a = t[:, d * P:(d + 1) * P, :].reshape(
                            nw_sub * P, S)
                        y = y + jnp.concatenate(
                            [jnp.zeros((d * P, S), dt), a[:-d * P]])
                        tails.append(jnp.concatenate(
                            [a[-d * P:],
                             jnp.zeros(((K - 1 - d) * P, S), dt)])
                            if d < K - 1 else a[-d * P:])
                    y = y + jnp.concatenate(
                        [bcar, jnp.zeros(((nw_sub - K + 1) * P, S), dt)])
                    return sum(tails), y

                _, ys2 = lax.scan(inner,
                                  jnp.zeros(((K - 1) * P, S), dt), subs)
                return carry, ys2.reshape(NW * P, S)

        _, ys = lax.scan(body, 0,
                         tuple((m.cols, m.vals, m.rowid) for m in mats))
        yf = ys.reshape(n_out * NW * P, S)

        for m, x2 in zip(mats, x2s):
            if m.levels:
                # NW*P == R exactly (validated at build), so global row
                # ids index the chunk-stacked output directly (only the
                # final chunk is padded, past every real row)
                ps = jnp.concatenate(
                    [_slot_block_sum(lev.cols, lev.vals,
                                     x2[lev.src_chunk], out_dtype=acc_dt)
                     for lev in m.levels]).astype(dt)
                yf = yf.at[m.level_rows].add(ps, mode='drop')

    return tuple(yf[i * R:i * R + m0.out_chunk_size(i)]
                 .reshape((m0.out_chunk_size(i),) + trailing)
                 for i in range(n_out))


def windowed_spmm(mat: WindowedELLMatrix, x: jax.Array) -> jax.Array:
    """``y = A @ x`` with full-array input/output (fallback path).

    Hot loops use :func:`windowed_spmm_chunks` with a carried chunk
    tuple and hoist the shuffle permutes outside the recurrence (the
    shared ``chunked.permute_in/out`` helpers read ``mat.perm``).
    """
    from pygsp_tpu.core.chunked import permute_in, permute_out
    x = permute_in(mat, jnp.asarray(x))
    xc = chunk_signal(x, mat.chunk_rows)
    return permute_out(mat, unchunk_signal(windowed_spmm_chunks(mat, xc)))


# ---------------------------------------------------------------------------
# Builder (host-side, vectorised)
# ---------------------------------------------------------------------------

# Measured per-op costs (ns) on this chip, for the slab-width choice
# (benchmarks/windowed_compact_probe.py, gather_probe2.py).
_GATHER_NS = 3.6
_SCATTER_NS = 25.0
_WIDE_TIER = 8             # residue tier widths are {1, _WIDE_TIER}


def _residue_cost(n_slabs, L, residue, window_rows):
    """Shared slot+residue cost model (ns): slab gathers + level-tier
    gathers + per-residue-row scatter. ``residue``: per-slab residue
    edge counts."""
    res_edges = float(residue.sum())
    # residue rows <= min(residue, window rows); most carry 1 edge
    res_rows = float(np.minimum(residue, window_rows).sum())
    lvl_slots = res_rows + max(res_edges - res_rows, 0.0) * 1.6
    return (n_slabs * L * _GATHER_NS
            + lvl_slots * _GATHER_NS
            + res_rows * 1.3 * _SCATTER_NS)


def _greedy_borrow(counts2, L, span):
    """Span-K borrow chain on ``(n_blocks, NW)`` int window demands:
    window ``w``'s overflow spills into the free tails of slabs
    ``w-span+1 .. w-1``, OLDEST usable slack first (it expires soonest —
    the exchange argument makes this optimal). Returns
    ``(B, residue)``: ``B[:, w, d]`` = slots window ``w`` places in slab
    ``w-d``; ``residue[:, w]`` = edges that spill to the level tiers."""
    nb, NW = counts2.shape
    used = np.minimum(counts2, L)
    avail = (L - used).astype(np.int64)
    over = (counts2 - used).astype(np.int64)
    B = np.zeros((nb, NW, span), np.int64)
    residue = np.zeros((nb, NW), np.int64)
    for w in range(NW):
        o = over[:, w].copy()
        for d in range(span - 1, 0, -1):
            s = w - d
            if s < 0:
                continue
            take = np.minimum(o, avail[:, s])
            B[:, w, d] = take
            avail[:, s] -= take
            o -= take
        residue[:, w] = o
    return B, residue


def _choose_slab_width(counts: np.ndarray, window_rows: int,
                       span: int = 2, L_cap: int = 512) -> int:
    """Pick L minimising slots*gather + residue level cost.

    ``counts``: per-(out,src,window) slot demands with the window axis
    LAST (so ``counts[..., :-1]`` is each window's predecessor within
    the same block). Residues route to {1, 8}-wide level tiers plus a
    per-row scatter, so a residue edge costs ~an order of magnitude
    more than a slab slot — the model must reflect that or it starves
    the slabs (first measured attempt picked L *below* the window mean
    and spent half the SpMM in levels).

    The grid is FINE below 32 (fragmented weak-scale blocks live at
    λ_w ≪ 64, where the old step-8 grid left ~0.2x pad on the table —
    ``WEAKPAD_r4.json``). ``span > 2`` scores the candidates with the
    greedy borrow chain on a sampled block subset.
    """
    lam = counts.mean() if counts.size else 0.0
    hi = min(L_cap, max(16, int(2 * lam + 96)))
    cand = [L for L in range(2, hi + 1)
            if L <= 32 or (L <= 96 and L % 4 == 0) or L % 8 == 0]

    def span2_cost(L):
        o = np.maximum(counts - L, 0)
        slack = np.maximum(L - counts, 0)
        b = np.minimum(o[..., 1:], slack[..., :-1])
        residue = o.astype(np.float64)
        residue[..., 1:] -= b
        return _residue_cost(counts.size, L, residue, window_rows)

    scored = sorted((span2_cost(L), L) for L in cand)
    if span <= 2:
        return scored[0][1]

    # deeper pooling shifts the optimum down — rescore a shortlist
    # (plus its downward neighbourhood) with the true greedy chain on a
    # block sample
    short = sorted({L for _, L in scored[:10]}
                   | {max(2, L - d) for _, L in scored[:4]
                      for d in (1, 2, 3, 4, 6)})
    c2 = counts.reshape(-1, counts.shape[-1])
    if c2.shape[0] > 4096:
        sel = np.random.default_rng(0).choice(c2.shape[0], 4096,
                                              replace=False)
        c2 = c2[sel]
    scale = counts.size / c2.size
    best_L, best_cost = short[0], np.inf
    for L in short:
        _, residue = _greedy_borrow(c2.astype(np.int64), L, span)
        cost = scale * _residue_cost(c2.size, L, residue, window_rows)
        if cost < best_cost:
            best_L, best_cost = L, cost
    return best_L


def _window_counts(rows, cols, is_hub, n_rows, n_cols, R, P):
    """Per-(out chunk, src chunk, window) non-hub slot demands, flat
    int64 of length ``n_out*n_src*NW``. Reshape to ``(n_out*n_src, NW)``
    for :func:`_choose_slab_width` (window axis last so the borrow
    relation sees each window's in-block predecessor); pass through to
    :func:`_pack_slabs` to avoid recounting. ``rows``/``cols`` must
    already be in PACKING order (post-relabel)."""
    NW = R // P
    n_out = max(-(-n_rows // R), 1)
    n_src = max(-(-n_cols // R), 1)
    slab = ((rows // R) * n_src + cols // R) * NW + (rows % R) // P
    return np.bincount(slab[~is_hub], minlength=n_out * n_src * NW)


def _pack_slabs(rows, cols, vals, is_hub, n_rows, n_cols, R, P, L,
                counts=None, span=2):
    """Exact-pack non-hub edges into ``(n_out, NW, n_src, L)`` slabs with
    borrowed slack (see module docstring); hub edges and window overflow
    come back as residue COO for the level tiers.

    ``span``: how many consecutive windows pool their slack — window
    ``w``'s overflow may occupy the free tails of slabs ``w-span+1 ..
    w-1`` of the SAME (out, src) block, carried with ``rowid ∈
    [d·P, (d+1)·P)`` for slab ``w-d``. ``span=2`` reproduces the
    original one-deep borrow.

    Returns ``(cols4, vals4, rowid4, res_rows, res_cols, res_vals)``.
    All inputs are host numpy in packing (post-relabel) order. ``counts``
    (optional) is :func:`_window_counts`'s output, forwarded to skip the
    recount on 100M-edge-scale builds.
    """
    NW = R // P
    n_out = max(-(-n_rows // R), 1)
    n_src = max(-(-n_cols // R), 1)
    K = int(span)

    i_e = rows // R
    c_e = cols // R
    w_e = (rows % R) // P
    slab_e = (i_e * n_src + c_e) * NW + w_e
    n_slabs = n_out * n_src * NW

    order = np.argsort(slab_e, kind='stable')
    rows_s, cols_s, vals_s = rows[order], cols[order], vals[order]
    slab_s = slab_e[order]
    hub_s = is_hub[order]

    if counts is None:
        counts = np.bincount(slab_s[~hub_s], minlength=n_slabs)

    nh = ~hub_s
    rows_w, cols_w, vals_w, slab_w = (rows_s[nh], cols_s[nh], vals_s[nh],
                                      slab_s[nh])
    run_start = np.zeros(n_slabs + 1, np.int64)
    np.cumsum(counts, out=run_start[1:])
    pos = np.arange(rows_w.size, dtype=np.int64) - run_start[slab_w]

    c2 = counts.reshape(n_out * n_src, NW).astype(np.int64)
    B, _ = _greedy_borrow(c2, L, K)

    # cumB_excl[:, w, d]: overflow ranks assigned to FARTHER slabs
    # (d' > d); window w's ranks [cumB_excl[d], cumB_excl[d] + B[d])
    # land in slab w-d
    cumB_excl = np.zeros_like(B)
    for d in range(K - 2, 0, -1):
        cumB_excl[:, :, d] = cumB_excl[:, :, d + 1] + B[:, :, d + 1]
    # consumed[:, w, d]: dest slab (w-d)'s tail already taken by EARLIER
    # borrowers (windows w-d+d', d' < d — processed first)
    consumed = np.zeros_like(B)
    for d in range(2, K):
        s_ = np.zeros_like(c2)
        for dp in range(1, d):
            sh = d - dp
            s_[:, sh:] += B[:, :-sh, dp]
        consumed[:, :, d] = s_

    borrow_tot = B[:, :, 1:].sum(axis=2).reshape(-1)
    q = pos - L
    in_main = pos < L
    in_residue = ~in_main & (q >= borrow_tot[slab_w])
    in_borrow = ~in_main & ~in_residue

    Bf = B.reshape(-1, K)
    Ef = cumB_excl.reshape(-1, K)
    Cf = consumed.reshape(-1, K)
    d_e = np.zeros(pos.size, np.int64)
    dest_slot = np.where(in_main, pos, 0)
    for d in range(1, K):
        lo = Ef[slab_w, d]
        m = in_borrow & (q >= lo) & (q < lo + Bf[slab_w, d])
        if not m.any():
            continue
        d_e[m] = d
        ds = slab_w[m] - d
        dest_slot[m] = (np.minimum(counts[ds], L)
                        + Cf[slab_w[m], d] + (q[m] - lo[m]))
    dest_slab = np.where(in_borrow, slab_w - d_e, slab_w)
    rel_row = (rows_w % P) + d_e * P

    keep = ~in_residue
    flat = dest_slab[keep] * L + dest_slot[keep]
    slab_cols = np.full(n_slabs * L, R, np.int32)
    slab_vals = np.zeros(n_slabs * L, vals.dtype)
    rid_dt = np.uint8 if K * P <= 256 else np.uint16
    slab_rowid = np.full(n_slabs * L, K * P - 1, rid_dt)
    slab_cols[flat] = (cols_w[keep] % R).astype(np.int32)
    slab_vals[flat] = vals_w[keep]
    slab_rowid[flat] = rel_row[keep].astype(rid_dt)

    # slab layout (n_out, NW, n_src, L): the SpMM stacks every src
    # chunk's slots along the contraction axis of ONE dot per out chunk
    def shape4(a):
        return np.ascontiguousarray(
            a.reshape(n_out, n_src, NW, L).transpose(0, 2, 1, 3))

    res_rows = np.concatenate([rows_w[in_residue], rows_s[hub_s]])
    res_cols = np.concatenate([cols_w[in_residue], cols_s[hub_s]])
    res_vals = np.concatenate([vals_w[in_residue], vals_s[hub_s]])
    return (shape4(slab_cols), shape4(slab_vals), shape4(slab_rowid),
            res_rows, res_cols, res_vals)


def auto_chunk_rows(nnz: int, n_rows: int, n_cols: int,
                    window_rows: int = WINDOW_ROWS,
                    max_rows: int | None = None) -> int:
    """Source-chunk size targeting window slot demand λ_w ≈ 64 (L ≈ 72).

    Probe-backed block-shape rule
    (``benchmarks/windowed_chunkrows_probe.py`` on this chip): the slab
    gathers run at full rate when the per-(window, src chunk) demand
    ``λ_w = P·deg/n_src`` sits near 64 — slab width then lands at ~72.
    Too few src chunks make the slabs WIDE and the SpMM 1.6–2.6x slower
    at the SAME slot count and padding (L=280 at N=2^18: 1.53e10
    edge-ops/s; L=144 at N=2^19: 1.05e10; L=72 via smaller chunks:
    2.5–2.7e10). Capped at the gather cliff, floored at 4·P.

    ``max_rows``: override the 2^16-row default cap. The cliff is a
    BYTES bound — ~64 MB of gather operand (``GATHER_CLIFF_r5.json``:
    f32 S=128 fast to 2^17 rows, bf16 S=128 fast to 2^18; both cliff at
    128 MB). Low-density weak-scale blocks should pass the largest cap
    their (signal width × carry dtype) allows — doubling R halves n_src
    and doubles λ_w, which is what keeps the slab padding at its
    single-chip level (``WEAKPAD_r5.json``). The default stays 2^16
    (safe through S=256 f32).
    """
    P = int(window_rows)
    deg = nnz / max(n_rows, 1)
    n_src_t = max(1, int(round(P * deg / 64.0)))
    # the cliff cap must itself be a multiple of P (e.g. P=48 does not
    # divide 2^16; returning a non-multiple fails builder validation).
    # 1.5% slack: the measured boundary (64 MB fast / 128 MB slow)
    # is not byte-exact, and honoring it exactly forces an extra
    # nearly-empty chunk whenever n_cols is a hair over a multiple of
    # the cap — which both pads slots and dilutes every window's demand
    # (the round-5 weak-pad p=4 rows regressed 1.04 → 1.62 from exactly
    # this before the slack).
    cap = int(max_rows or CHUNK_ROWS)
    cap_eff = cap + max(P, cap // 64)
    # divide n_cols as evenly as possible: smallest chunk count that
    # respects both the λ_w target and the (slackened) cap
    n_src = max(n_src_t, -(-n_cols // cap_eff))
    R = -(-(-(-n_cols // n_src)) // P) * P
    return int(max(4 * P, R))


# Auto borrow-span rule: below this pooled per-slab demand the 2-window
# borrow pad (~1+1/√λ_w) costs more than the extra one-hot width of a
# 4-window pool (fold FLOPs ~9% of gather bytes per factor of 2 —
# /tmp padsim sweeps + GATHER_CLIFF_r5).
_SPAN4_LAMBDA = 24.0


def _auto_span(counts_mean: float, window_rows: int) -> int:
    if counts_mean >= _SPAN4_LAMBDA:
        return 2
    return max(2, min(4, 256 // int(window_rows)))


def windowed_from_host_coo(rows, cols, vals, n_rows: int, n_cols: int, *,
                           chunk_rows: int | None = None,
                           window_rows: int = WINDOW_ROWS,
                           slab_width: int | None = None,
                           hub_degree: int | None = None,
                           permute: str | None = 'shuffle',
                           borrow_span: int | None = None,
                           dtype=None) -> WindowedELLMatrix:
    """Build a :class:`WindowedELLMatrix` from host COO (deduped edges).

    All packing is vectorised NumPy; device upload is ONE pytree
    transfer at the end.

    ``hub_degree``: rows at least this dense bypass the windows and go
    straight to the level tiers (their per-block counts would dominate
    whole windows, skewing the slab-width choice and overflowing
    whatever L is picked; as compact per-row tiers they pack near 1x).
    Default: ``4 * sqrt(window λ) * n_src`` — rows whose per-block
    count exceeds 4 sigma of the window distribution.

    ``permute='shuffle'`` (default, square matrices only) relabels
    vertices by a seeded random permutation before packing. Generator
    vertex ids usually correlate with degree (a Barabási–Albert graph
    numbers its hubs first), so windows of CONSECUTIVE ids inherit the
    degree distribution's skew — measured pad 1.9 on the bench graph
    even with the width chosen 1.4x above the mean. Mixing ids makes
    every window an iid degree sample, concentrating window sums at
    sigma ~= sqrt(P*Var(deg))/n_src. The ``A @ x`` contract keeps
    ORIGINAL vertex order (entry/exit permutes, hoisted by iterative
    drivers).
    """
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals)
    if dtype is not None:
        vals = vals.astype(dtype)
    if not np.issubdtype(vals.dtype, np.floating):
        vals = vals.astype(np.float64)
    P = int(window_rows)
    if chunk_rows is None:
        chunk_rows = auto_chunk_rows(rows.size, n_rows, n_cols, P)
    R = int(chunk_rows)
    if R % P:
        raise ValueError(f'chunk_rows ({R}) must be a multiple of '
                         f'window_rows ({P})')
    if 2 * P > 65536:
        raise ValueError('window_rows > 32768 overflows the uint16 row ids')
    NW = R // P
    n_out = max(-(-n_rows // R), 1)
    n_src = max(-(-n_cols // R), 1)

    deg = np.bincount(rows, minlength=n_rows) if rows.size else np.zeros(
        n_rows, np.int64)
    rowptr = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(deg, out=rowptr[1:])

    if hub_degree is None:
        lam_w = P * (rows.size / max(n_rows, 1)) / n_src
        hub_degree = max(2 * P, int(4.0 * np.sqrt(max(lam_w, 1.0)) * n_src))
    is_hub_edge = deg[rows] >= hub_degree

    perm = iperm = None
    if permute == 'shuffle' and n_rows == n_cols and n_rows > 0:
        perm = np.random.default_rng(0x5EED).permutation(n_rows)
        iperm = np.empty_like(perm)
        iperm[perm] = np.arange(n_rows, dtype=perm.dtype)
        rows = iperm[rows]
        cols = iperm[cols]
    elif permute not in (None, 'shuffle'):
        raise ValueError(f'Unknown permute mode {permute!r}')

    counts = _window_counts(rows, cols, is_hub_edge, n_rows, n_cols, R, P)
    if borrow_span is None:
        borrow_span = _auto_span(float(counts.mean()) if counts.size
                                 else 0.0, P)
    K = int(borrow_span)
    if K < 2 or K * P > 65536:
        raise ValueError(f'borrow_span must be in [2, {65536 // P}] for '
                         f'window_rows={P} (uint16 row ids)')
    if slab_width is None:
        L = _choose_slab_width(
            counts.reshape(-1, R // P).astype(np.float64), P, span=K)
    else:
        L = int(slab_width)

    (cols4, vals4, rowid4, res_rows, res_cols, res_vals) = _pack_slabs(
        rows, cols, vals, is_hub_edge, n_rows, n_cols, R, P, L,
        counts=counts, span=K)
    # residue (window spill + hub rows) -> {1, 8}-wide level tiers per
    # src chunk, wide rows split over repeated tier entries
    levels, level_rows = _pack_residue_levels(
        res_rows, res_cols, res_vals, res_cols // R, R, vals.dtype)

    host = WindowedELLMatrix(
        cols=cols4, vals=vals4,
        rowid=rowid4, levels=levels,
        level_rows=level_rows, rowptr=rowptr.astype(np.int32),
        n_rows=int(n_rows), n_cols=int(n_cols), nnz=int(rows.size),
        chunk_rows=R, window_rows=P, borrow_span=K,
        perm=None if perm is None else perm.astype(np.int32),
        iperm=None if iperm is None else iperm.astype(np.int32))
    return jax.device_put(host)


def _pack_residue_levels(rrows, rcols, rvals, rchunk, R, vdtype):
    """Residue edges -> TWO slot tiers per src chunk (widths 1 and
    ``_WIDE_TIER``), in the chunked format's level layout: one global
    scatter-add folds every tier. Rows wider than a tier entry repeat
    across entries (the scatter sums duplicates), so tier widths — and
    with them per-op compile cost — stay bounded no matter how dense a
    hub row is."""
    if rrows.size == 0:
        return (), np.zeros(0, np.int32)
    o = np.lexsort((rrows, rchunk))
    rrows, rcols, rvals, rchunk = (rrows[o], rcols[o], rvals[o], rchunk[o])
    W = _WIDE_TIER

    levels = []
    level_rows_parts = []
    for c in np.unique(rchunk):
        m = rchunk == c
        crows, ccols, cvals = rrows[m], rcols[m] % R, rvals[m]
        urows, ucounts = np.unique(crows, return_counts=True)
        ustarts = np.zeros(urows.size, np.int64)
        np.cumsum(ucounts[:-1], out=ustarts[1:])

        # width-1 tier: every residue row's first edge
        levels.append(ChunkLevel(
            cols=ccols[ustarts].astype(np.int32)[:, None],
            vals=cvals[ustarts].astype(vdtype)[:, None],
            src_chunk=int(c)))
        level_rows_parts.append(urows)

        # width-W tier: remaining edges, ceil((r-1)/W) entries per row
        rem = ucounts - 1
        n_ent = -(-rem // W)
        wide = np.flatnonzero(n_ent > 0)
        if wide.size:
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
            # sentinel == chunk_rows like the slabs (clamped gather x0)
            pc = np.where(valid, ccols[idx], R).astype(np.int32)
            pv = np.where(valid, cvals[idx], 0).astype(vdtype)
            levels.append(ChunkLevel(cols=pc, vals=pv, src_chunk=int(c)))
            level_rows_parts.append(urows[ent_row])

    level_rows = np.concatenate(level_rows_parts).astype(np.int32)
    return tuple(levels), level_rows


def windowed_from_scipy(mat, *, dtype=None,
                        chunk_rows: int | None = None,
                        window_rows: int = WINDOW_ROWS,
                        slab_width: int | None = None,
                        hub_degree: int | None = None,
                        permute: str | None = 'shuffle',
                        borrow_span: int | None = None
                        ) -> WindowedELLMatrix:
    """scipy sparse → windowed-compact ELL."""
    csr = mat.tocsr()
    csr.sum_duplicates()
    coo = csr.tocoo()
    return windowed_from_host_coo(coo.row, coo.col, coo.data,
                                  coo.shape[0], coo.shape[1],
                                  chunk_rows=chunk_rows,
                                  window_rows=window_rows,
                                  slab_width=slab_width,
                                  hub_degree=hub_degree,
                                  permute=permute,
                                  borrow_span=borrow_span, dtype=dtype)


def windowed_to_scipy(mat: WindowedELLMatrix):
    """Export back to scipy CSR: unpack the ``(n_out, NW, n_src, L)``
    slabs (global row ``i·R + w·P + rowid`` — borrowed slots carry
    ``rowid ∈ [P, 2P)`` addressing the next window, exactly as the fold
    shifts them) and the residue tiers, then invert the optional
    relabeling (same contract as :func:`chunked.chunked_to_scipy`)."""
    import scipy.sparse as sps
    R, P = mat.chunk_rows, mat.window_rows
    co = np.asarray(mat.cols)
    va = np.asarray(mat.vals)
    ri = np.asarray(mat.rowid).astype(np.int64)
    n_out, NW, n_src, L = co.shape

    grow = (np.arange(n_out, dtype=np.int64)[:, None, None, None] * R
            + np.arange(NW, dtype=np.int64)[None, :, None, None] * P + ri)
    gcol = (np.arange(n_src, dtype=np.int64)[None, None, :, None] * R
            + co.astype(np.int64))
    src_sizes = np.minimum(R, mat.n_cols - np.arange(n_src) * R)
    keep = co < src_sizes[None, None, :, None]
    rows_l = [grow[keep]]
    cols_l = [gcol[keep]]
    vals_l = [va[keep]]

    lr = np.asarray(mat.level_rows, dtype=np.int64)
    off = 0
    for lev in mat.levels:
        lc = np.asarray(lev.cols)
        grows = np.repeat(lr[off:off + lc.shape[0]], lc.shape[1])
        off += lc.shape[0]
        lcf = lc.ravel()
        lkeep = lcf < mat.src_chunk_size(lev.src_chunk)
        rows_l.append(grows[lkeep])
        cols_l.append(lcf[lkeep].astype(np.int64) + lev.src_chunk * R)
        vals_l.append(np.asarray(lev.vals).ravel()[lkeep])

    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    vals = np.concatenate(vals_l)
    if mat.perm is not None:
        p = np.asarray(mat.perm, dtype=np.int64)
        rows, cols = p[rows], p[cols]
    return sps.csr_matrix((vals, (rows, cols)), shape=mat.shape)
