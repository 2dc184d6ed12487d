"""Sharded spectral ops: shard_map SpMM with ragged halo exchange + Chebyshev.

Per SpMM step each shard (mesh axis ``'graph'``):
1. gathers the rows its neighbors need (``send_idx``) and exchanges them
   with one single-shift ``lax.ppermute`` per ring distance that carries
   traffic — each bucket sized to that distance's own worst sender, so no
   global max-padding, and the dominant d=1 bucket is one ICI hop on a
   real torus ring,
2. gathers ``x_ext = [x_local ‖ received]`` at its edges' extended-local
   column ids, multiplies by edge values, segment-sums into local rows,
3. adds the fused diagonal term.

The Chebyshev recurrence (role of ``cheby_op``,
``pygsp/filters/approximations.py:58-114``) runs entirely inside one
``shard_map`` as a ``lax.scan``, so XLA schedules the halo exchange of step
k+1 against the elementwise tail of step k. The signal/feature axis can be
sharded over a second mesh axis ``'batch'`` (pure data parallelism — no
communication on the compute path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from pygsp_tpu.parallel.partition import ShardedGraph


def make_mesh(n_graph: int, n_batch: int = 1, devices=None) -> Mesh:
    """('graph', 'batch') mesh over the first n_graph*n_batch devices."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[:n_graph * n_batch]).reshape(
        n_graph, n_batch)
    return Mesh(devices, ('graph', 'batch'))


def _halo_exchange(x_local, send_idx, dists, n_shards):
    """Gather send rows and exchange per ring distance.

    send_idx: tuple of (H_d, ...) local-id maps (this shard's slice);
    returns the (sum H_d, ...) received block in ``dists`` order. Padding
    slots hold clamped garbage but no edge references them. Each bucket is
    one ``ppermute`` shift — independent collectives XLA can schedule
    concurrently and overlap with interior compute.
    """
    if not dists:
        return jnp.zeros((0,) + x_local.shape[1:], x_local.dtype)
    with jax.named_scope('halo_exchange'):
        blocks = []
        for d, sidx in zip(dists, send_idx):
            send = x_local[sidx]                     # (H_d, ...)
            if n_shards > 1:
                perm = [(i, (i + d) % n_shards) for i in range(n_shards)]
                send = jax.lax.ppermute(send, 'graph', perm)
            blocks.append(send)
        return jnp.concatenate(blocks, axis=0) if len(blocks) > 1 \
            else blocks[0]


def _local_matvec(rows, cols, vals, diag, send_idx, x_local, *, n_shards,
                  n_local, dists, scale=None, shift=None, ell=None):
    """One Laplacian matvec on this shard's slice (inside shard_map).

    Computes ``scale * (L - shift I) @ x`` with scale/shift fused into the
    diagonal term. When ``ell`` (this shard's slice of a
    :class:`~pygsp_tpu.parallel.partition.ShardedELL`) is given, the local
    SpMM runs the scatter-free multi-level ELL path (the TPU fast path —
    XLA's segment-sum scatter serializes power-law hub rows); otherwise
    gather + sorted segment-sum over the COO arrays.
    """
    from pygsp_tpu.parallel.windowed_shards import ShardedWindowed
    recv = _halo_exchange(x_local, send_idx, dists, n_shards)
    if isinstance(ell, ShardedWindowed):
        x_ext = jnp.concatenate([x_local, recv], axis=0)
        off = ell.local_spmm(x_ext)
    elif isinstance(ell, tuple) and ell and isinstance(ell[0],
                                                       ShardedWindowed):
        # interior/boundary split, windowed layout: the interior fold
        # reads only x_local — no dependency on the halo collective —
        # and the boundary fold reads only the received halo block
        # (its columns are rebased to [0, halo_total) at build)
        interior, boundary = ell
        off = interior.local_spmm(x_local)
        if boundary.nnz:
            off = off + boundary.local_spmm(recv)
    elif isinstance(ell, tuple):
        # interior/boundary split: the interior aggregation has NO data
        # dependency on the collective, so XLA can overlap the halo
        # all_to_all with it (SURVEY hard part #2: comm/compute overlap).
        from pygsp_tpu.core.sparse import _slot_block_sum
        interior, boundary = ell

        def apply_ell(e, operand):
            o = _slot_block_sum(e.ell_cols[0], e.ell_vals[0], operand)
            for lr, lc, lv in zip(e.lvl_rows, e.lvl_cols, e.lvl_vals):
                part = _slot_block_sum(lc[0], lv[0], operand)
                o = o.at[lr[0]].add(part, mode='drop', unique_indices=True)
            return o

        off = apply_ell(interior, x_local)
        x_ext = jnp.concatenate([x_local, recv], axis=0)
        off = off + apply_ell(boundary, x_ext)
    elif ell is not None:
        from pygsp_tpu.core.sparse import _slot_block_sum
        x_ext = jnp.concatenate([x_local, recv], axis=0)
        off = _slot_block_sum(ell.ell_cols[0], ell.ell_vals[0], x_ext)
        for lr, lc, lv in zip(ell.lvl_rows, ell.lvl_cols, ell.lvl_vals):
            part = _slot_block_sum(lc[0], lv[0], x_ext)
            off = off.at[lr[0]].add(part, mode='drop', unique_indices=True)
    else:
        x_ext = jnp.concatenate([x_local, recv], axis=0)
        gathered = x_ext[cols]
        if x_local.ndim > 1:
            contrib = vals.reshape(
                (-1,) + (1,) * (x_local.ndim - 1)) * gathered
        else:
            contrib = vals * gathered
        off = jax.ops.segment_sum(contrib, rows, num_segments=n_local,
                                  indices_are_sorted=True)
    d = diag if shift is None else diag - shift
    db = d.reshape((-1,) + (1,) * (x_local.ndim - 1))
    y = db * x_local + off
    if scale is not None:
        y = scale * y
    return y


def sharded_matvec(sg: ShardedGraph, x, mesh: Mesh, ell=None):
    """``L @ x`` with x of shape (S*n_local, ...) sharded over 'graph'.

    Pass ``ell = shard_local_ell(sg)`` to run the local SpMMs scatter-free.
    """

    def body(rows, cols, vals, diag, send_idx, ell, x_local):
        return _local_matvec(
            rows[0], cols[0], vals[0], diag[0],
            tuple(s[0] for s in send_idx), x_local,
            n_shards=sg.n_shards, n_local=sg.n_local, dists=sg.halo_dists,
            ell=ell)

    xspec = P('graph', 'batch') if np.ndim(x) > 1 else P('graph')
    ell_spec = jax.tree.map(lambda _: P('graph'), ell)
    send_spec = tuple(P('graph') for _ in sg.send_idx)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P('graph'), P('graph'), P('graph'), P('graph'),
                  send_spec, ell_spec, xspec),
        out_specs=xspec)
    return f(sg.rows, sg.cols, sg.vals, sg.diag, sg.send_idx, ell, x)


def _gather_from_chunks(t_chunks, sidx, chunk_rows, out_dtype=None):
    """Gather rows ``sidx`` (ascending local ids; sentinel past the end)
    from a tuple of chunk buffers without concatenating them.

    The partitioner emits each distance's send ids SORTED (they are ranks
    of the receiver's sorted remote set), so per-chunk membership is a
    contiguous range — but the range BOUNDS differ per shard while
    ``shard_map`` requires static shapes, so each chunk gathers the full
    id vector (clamped) and a mask keeps its own rows. Costs
    ``len(t_chunks)`` gathers of ``H_d`` rows each; with one local chunk
    (``n_local ≤ 2^17``, the common multi-chip case) it is a plain
    gather. Sentinel ids fall past every chunk and produce zero rows
    (unreferenced by construction)."""
    if len(t_chunks) == 1:
        out = t_chunks[0][sidx]
        return out if out_dtype is None else out.astype(out_dtype)
    out = None
    for ci, tc in enumerate(t_chunks):
        lo = ci * chunk_rows
        part = tc[jnp.clip(sidx - lo, 0, tc.shape[0] - 1)]
        if out_dtype is not None:
            part = part.astype(out_dtype)
        msk = (sidx >= lo) & (sidx < lo + tc.shape[0])
        part = part * msk.reshape((-1,) + (1,) * (part.ndim - 1)).astype(
            part.dtype)
        out = part if out is None else out + part
    return out


def _chunkcarried_layout(sg, ell):
    """Return the shared chunk size R when ``ell`` supports the
    chunk-carried recurrence, else None.

    Supported: the windowed-shard layout — split ``(interior, boundary)``
    with one shared ``chunk_rows`` (the builder guarantees it), or the
    combined matrix when the local/halo source-chunk boundaries align
    (``n_local % R == 0``, or no halo at all)."""
    from pygsp_tpu.parallel.windowed_shards import ShardedWindowed
    if (isinstance(ell, tuple) and len(ell) == 2
            and all(isinstance(e, ShardedWindowed) for e in ell)):
        if ell[0].chunk_rows == ell[1].chunk_rows:
            return ell[0].chunk_rows
        return None
    if isinstance(ell, ShardedWindowed):
        R = ell.chunk_rows
        if sg.halo_total == 0 or sg.n_local % R == 0:
            return R
    return None


def _sharded_acc_group(x, nf, ell, cdt, n_shards):
    """Accumulator-group size for the sharded recurrence: the single-chip
    memory-aware rule (``ops.chebyshev._cheby_op_chunked``) on per-shard
    sizes — largest g whose g recurrence-term buffers fit the device
    budget after the layout slabs and the Nf accumulators. Measured at
    the bench config (``SHARDED_ONCHIP_r4.json``): g=14 2311 ms vs g=4
    2416 ms vs plain_auto 2454 ms. ``PYGSP_SHARDED_ACC_GROUP`` overrides.
    """
    import os
    g_env = os.environ.get('PYGSP_SHARDED_ACC_GROUP')
    if g_env:
        return max(1, int(g_env))
    per_shard = max(int(np.prod(jnp.shape(x))) // max(n_shards, 1), 1)
    odt_b = jnp.dtype(jnp.result_type(x)).itemsize
    term_bytes = per_shard * (jnp.dtype(cdt).itemsize if cdt is not None
                              else odt_b)
    acc_bytes = per_shard * odt_b
    slab_bytes = sum(l.size * l.dtype.itemsize
                     for l in jax.tree_util.tree_leaves(ell)) \
        // max(n_shards, 1)
    budget = float(os.environ.get('PYGSP_CHEBY_DEVICE_MB', 12288)) * 2**20
    avail = budget - slab_bytes - nf * acc_bytes - 4 * max(term_bytes,
                                                           acc_bytes)
    return max(1, min(14, int(avail // max(term_bytes, 1))))


def _chunkcarried_scan(xc, diag_c, fdiag_c, offdiag_apply, c, a1, a2, sc,
                       cast, odt, bshape, acc_group=4, synthesis=False):
    """The chunk-carried Chebyshev recurrence body (inside shard_map):
    mirror of the single-chip ``ops.chebyshev._cheby_op_chunked`` scan,
    parameterized on the distributed ``offdiag_apply`` (1-D halo exchange
    or 2-D ring all-gather). ``xc``/``diag_c``/``fdiag_c``: per-chunk
    tuples.

    ``synthesis=False`` (analysis): broadcast accumulation — returns the
    concatenated ``(Nf, n_local, ...)`` bank. ``synthesis=True``: signals
    carry a trailing filter axis that each step CONTRACTS
    (``Σ_f c[f,k]·T̃_k y_f``, single-chip ``_cheby_synthesis_chunked``) —
    returns ``(n_local, ...)``."""
    nf, m1 = c.shape
    if synthesis:
        def acc0(xk, tck):
            return jnp.sum(0.5 * c[:, 0] * xk + c[:, 1] * tck.astype(odt),
                           axis=-1)

        def acc1(a, ckk, tk):
            return a + jnp.sum(ckk * tk.astype(odt), axis=-1)

        def accg(a, ckg, terms_i):
            return a + sum(jnp.sum(ckg[j] * terms_i[j].astype(odt),
                                   axis=-1)
                           for j in range(len(terms_i)))
    else:
        def acc0(xk, tck):
            return (0.5 * c[:, 0].reshape(bshape) * xk[None]
                    + c[:, 1].reshape(bshape) * tck.astype(odt)[None])

        def acc1(a, ckk, tk):
            return a + ckk.reshape(bshape) * tk.astype(odt)[None]

        def accg(a, ckg, terms_i):
            # elementwise (VPU) coefficient fold — bit-identical to the
            # ungrouped body (an MXU tensordot at DEFAULT precision
            # would round f32 through bf16)
            return a + sum(ckg[j].reshape(bshape)
                           * terms_i[j].astype(odt)[None]
                           for j in range(len(terms_i)))

    t_old = cast(xc)
    y0 = offdiag_apply(t_old)
    t_cur = cast(tuple((d * xk + yk - a2 * xk) / a1
                       for d, xk, yk in zip(diag_c, xc, y0)))
    acc = tuple(acc0(xk, tc) for xk, tc in zip(xc, t_cur))

    if m1 > 2:
        def recur(t_old, t_cur):
            yc = offdiag_apply(t_cur)
            return cast(tuple(fd * tk + sc * yk - to
                              for fd, tk, yk, to in
                              zip(fdiag_c, t_cur, yc, t_old)))

        # accumulator grouping: fold g coefficient updates into one
        # pass over the accumulators (same lever as single-chip;
        # size chosen by _sharded_acc_group, env-overridable)
        g = acc_group
        n_tail = m1 - 2
        g = min(g, n_tail)
        rem = n_tail % g
        for k in range(2, 2 + rem):        # g-remainder head, unrolled
            t_new = recur(t_old, t_cur)
            acc = tuple(acc1(a, c[:, k], t) for a, t in zip(acc, t_new))
            t_old, t_cur = t_cur, t_new
        if n_tail - rem:
            cg = c[:, 2 + rem:].T.reshape(-1, g, nf)

            def gstep(carry, ckg):
                t_old, t_cur, acc = carry
                terms = []
                for _ in range(g):
                    t_new = recur(t_old, t_cur)
                    terms.append(t_new)
                    t_old, t_cur = t_cur, t_new
                acc = tuple(
                    accg(a, ckg, [terms[j][i] for j in range(g)])
                    for i, a in enumerate(acc))
                return (t_old, t_cur, acc), None

            (_, _, acc), _ = jax.lax.scan(gstep, (t_old, t_cur, acc), cg)
    if synthesis:
        return acc[0] if len(acc) == 1 else jnp.concatenate(acc, axis=0)
    return acc[0] if len(acc) == 1 else jnp.concatenate(acc, axis=1)


def _chunk_body_setup(sg, split, diag, send_idx, ell_sl, lmax, x_local,
                      cdt):
    """Shared per-shard setup of the chunk-carried recurrence (inside
    shard_map): chunked signal/diag tuples, the carry cast, and the
    ``offdiag_apply`` closure (halo exchange + windowed folds on chunk
    tuples). Used by the forward/synthesis body and the fixed-graph
    backward's coefficient-gradient body."""
    from pygsp_tpu.core.chunked import chunk_signal
    from pygsp_tpu.core.windowed import windowed_spmm_chunks
    n_shards = sg.n_shards
    odt = x_local.dtype
    a1 = lmax / 2
    a2 = lmax / 2
    sc = 2.0 / a1
    imat = (ell_sl[0] if split else ell_sl).local_matrix()
    bmat = ell_sl[1].local_matrix() if split else None
    R = imat.chunk_rows
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
        # — core/windowed.py acc_dt; BF16OUT_r5.json): halves window-
        # tensor/strip traffic; interior+boundary partials then add in
        # the carry dtype, one extra same-scale rounding per step.
        spmm_kw = {'out_dtype': cdt}

    def halo_recv(t_chunks):
        # send rows gathered from the carry tuple — the ppermute
        # payload is the CARRY dtype (bf16 mode halves wire bytes)
        with jax.named_scope('halo_exchange'):
            blocks = []
            for d, sidx in zip(sg.halo_dists, send_idx):
                send = _gather_from_chunks(t_chunks, sidx, R)
                if n_shards > 1:
                    perm = [(i, (i + d) % n_shards)
                            for i in range(n_shards)]
                    send = jax.lax.ppermute(send, 'graph', perm)
                blocks.append(send)
            return (jnp.concatenate(blocks, axis=0)
                    if len(blocks) > 1 else blocks[0])

    def offdiag_apply(t_chunks):
        if split:
            y = windowed_spmm_chunks(imat, t_chunks, **spmm_kw)
            if bmat.nnz:
                rc = chunk_signal(halo_recv(t_chunks), R)
                yb = windowed_spmm_chunks(bmat, rc, **spmm_kw)
                y = tuple(a + b for a, b in zip(y, yb))
            return y
        if sg.halo_total:
            t_chunks = t_chunks + chunk_signal(halo_recv(t_chunks), R)
        return windowed_spmm_chunks(imat, t_chunks, **spmm_kw)

    return xc, diag_c, fdiag_c, offdiag_apply, cast, odt, a1, a2, sc


def _sharded_cheby_op_chunkcarried(sg, lmax, c, x, mesh, ell, cdt,
                                   synthesis=False):
    """Chunk-carried sharded Chebyshev: the multi-chip unification of the
    single-chip chunked-carry fusion (``ops/chebyshev._cheby_op_chunked``).

    The round-3 sharded body carried full ``(n_local, ...)`` arrays and
    every ``local_spmm`` re-chunked them (``chunk_signal`` + ``unchunk``
    copies each step — measured ~1.13x of the 1.20x sharded overhead,
    ``SHARDED_ONCHIP_r3.json``). Here the scan carries TUPLES of
    per-chunk buffers, the halo send rows are gathered straight from the
    chunk tuple (:func:`_gather_from_chunks` — the partitioner's send ids
    are sorted so this is exact), and the windowed folds consume/produce
    chunk tuples directly (``windowed_spmm_chunks``). Per step the only
    signal-sized copies left are the ones the algorithm requires: the
    halo payload itself and the fresh recurrence terms.
    """
    c = jnp.atleast_2d(c)
    nf, m1 = c.shape
    lmax = jnp.asarray(lmax, dtype=sg.dtype)
    split = isinstance(ell, tuple)
    n_shards = sg.n_shards
    g_acc = _sharded_acc_group(x, nf, ell, cdt, n_shards)

    def body(rows, cols, vals, diag, send_idx, ell_sl, c, lmax, x_local):
        del rows, cols, vals
        (xc, diag_c, fdiag_c, offdiag_apply, cast, odt, a1, a2,
         sc) = _chunk_body_setup(sg, split, diag[0],
                                 tuple(s[0] for s in send_idx), ell_sl,
                                 lmax, x_local, cdt)
        bshape = (nf,) + (1,) * x_local.ndim
        return _chunkcarried_scan(xc, diag_c, fdiag_c, offdiag_apply, c,
                                  a1, a2, sc, cast, odt, bshape,
                                  acc_group=g_acc, synthesis=synthesis)

    if synthesis:
        # trailing filter axis on the signals, contracted away
        if np.ndim(x) > 2:
            xspec = P(*(('graph', 'batch') + (None,) * (np.ndim(x) - 2)))
            ospec = P(*(('graph', 'batch') + (None,) * (np.ndim(x) - 3)))
        else:
            xspec = P('graph', None)
            ospec = P('graph')
    elif np.ndim(x) > 1:
        xspec = P('graph', 'batch')
        ospec = P(None, 'graph', 'batch')
    else:
        xspec = P('graph')
        ospec = P(None, 'graph')
    ell_spec = jax.tree.map(lambda _: P('graph'), ell)
    send_spec = tuple(P('graph') for _ in sg.send_idx)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P('graph'), P('graph'), P('graph'), P('graph'),
                  send_spec, ell_spec, P(), P(), xspec),
        out_specs=ospec)
    return f(sg.rows, sg.cols, sg.vals, sg.diag, sg.send_idx, ell, c,
             lmax, x)


def sharded_cheby_op(sg: ShardedGraph, lmax, c, x, mesh: Mesh, ell=None,
                     carry_dtype=None, carry_tol=None):
    """Chebyshev filter bank on the sharded graph.

    c: (Nf, m+1); x: (S*n_local, ...) sharded over 'graph' (trailing axis
    over 'batch' if 2-D). Returns (Nf, S*n_local, ...) with the same math
    as :func:`pygsp_tpu.ops.chebyshev.cheby_op`.

    ``carry_dtype`` (opt-in, e.g. ``jnp.bfloat16``): dtype of the carried
    recurrence terms — and therefore of the HALO PAYLOAD, halving the
    per-step ``ppermute`` bytes on the wire along with the local gather
    bytes. Row sums, the diagonal term, and accumulators stay in the
    signal dtype; gated by the same a-priori error bound as
    :func:`pygsp_tpu.ops.chebyshev.cheby_op`.
    """
    c = jnp.atleast_2d(c)
    nf, m1 = c.shape
    lmax = jnp.asarray(lmax, dtype=sg.dtype)
    cdt = jnp.dtype(carry_dtype) if carry_dtype is not None else None
    if cdt is not None and not isinstance(c, jax.core.Tracer):
        from pygsp_tpu.ops.chebyshev import _check_carry_budget
        _check_carry_budget(c, cdt, carry_tol)
    if cdt is None and jnp.dtype(x.dtype) != jnp.promote_types(x.dtype,
                                                               sg.dtype):
        x = x.astype(jnp.promote_types(x.dtype, sg.dtype))  # one-dtype carry

    # windowed-shard layouts run the chunk-carried recurrence (no
    # per-step chunk/unchunk copies — the round-3 1.13x overhead)
    if _chunkcarried_layout(sg, ell) is not None:
        return _sharded_cheby_op_chunkcarried(sg, lmax, c, x, mesh, ell,
                                              cdt)

    def body(rows, cols, vals, diag, send_idx, ell, c, lmax, x_local):
        rows, cols, vals = rows[0], cols[0], vals[0]
        diag = diag[0]
        send_idx = tuple(s[0] for s in send_idx)
        a1 = lmax / 2
        a2 = lmax / 2
        mv = partial(_local_matvec, rows, cols, vals, diag, send_idx,
                     n_shards=sg.n_shards, n_local=sg.n_local,
                     dists=sg.halo_dists, ell=ell)

        def cast(t):
            return t if cdt is None else t.astype(cdt)

        bshape = (nf,) + (1,) * x_local.ndim
        t_old = cast(x_local)
        # the matvec input (→ halo payload + gathers) is the carried
        # dtype; its output and all elementwise math stay f32, and the
        # accumulators read the UNROUNDED f32 term — the carry rounds
        # once per step, exactly as in the single-chip mode
        t_cur_f = (mv(t_old) - a2 * x_local) / a1
        acc = (0.5 * c[:, 0].reshape(bshape) * x_local[None]
               + c[:, 1].reshape(bshape) * t_cur_f[None])
        t_cur = cast(t_cur_f)

        if m1 > 2:
            # Accumulator grouping (same lever as the single-chip path's
            # memory-aware grouping, measured 1.18x there): stack g
            # recurrence terms per scan step and contract them into the
            # (Nf, n_local, ...) accumulators with ONE tensordot, cutting
            # the accumulator read+write traffic by g at the cost of g
            # stacked term buffers. Default g=4 (~2 GB extra at the bench
            # config); override via PYGSP_SHARDED_ACC_GROUP.
            import os as _os
            g_env = _os.environ.get('PYGSP_SHARDED_ACC_GROUP')
            g = max(1, int(g_env)) if g_env else 4
            n_tail = m1 - 2
            g = min(g, n_tail)
            rem = n_tail % g

            def plain_step(carry, ck):
                t_old, t_cur, acc = carry
                t_new_f = (mv(t_cur, scale=2.0 / a1, shift=a2)
                           - t_old.astype(acc.dtype))
                acc = acc + ck.reshape(bshape) * t_new_f[None]
                return (t_cur, cast(t_new_f), acc), None

            carry = (t_old, t_cur, acc)
            for k in range(rem):              # g-remainder head, unrolled
                carry, _ = plain_step(carry, c[:, 2 + k])
            if n_tail - rem:
                cg = c[:, 2 + rem:].T.reshape(-1, g, nf)

                def gstep(carry, ckg):
                    t_old, t_cur, acc = carry
                    terms = []
                    for _ in range(g):
                        t_new_f = (mv(t_cur, scale=2.0 / a1, shift=a2)
                                   - t_old.astype(acc.dtype))
                        terms.append(t_new_f)
                        t_old, t_cur = t_cur, cast(t_new_f)
                    # elementwise (VPU) coefficient fold, ONE fused pass
                    # over acc — an MXU tensordot at DEFAULT precision
                    # rounds the f32 path through bf16 (measured rel err
                    # 3.9e-4 vs 1.0e-6); this keeps the arithmetic
                    # bit-identical to the ungrouped body, like the
                    # single-chip grouped fold (ops/chebyshev.py)
                    acc = acc + sum(ckg[j].reshape(bshape) * terms[j][None]
                                    for j in range(g))
                    return (t_old, t_cur, acc), None

                carry, _ = jax.lax.scan(gstep, carry, cg)
            acc = carry[2]
        return acc

    if np.ndim(x) > 1:
        xspec = P('graph', 'batch')
        ospec = P(None, 'graph', 'batch')
    else:
        xspec = P('graph')
        ospec = P(None, 'graph')
    ell_spec = jax.tree.map(lambda _: P('graph'), ell)
    send_spec = tuple(P('graph') for _ in sg.send_idx)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P('graph'), P('graph'), P('graph'), P('graph'),
                  send_spec, ell_spec, P(), P(), xspec),
        out_specs=ospec)
    return f(sg.rows, sg.cols, sg.vals, sg.diag, sg.send_idx, ell, c,
             lmax, x)


def sharded_cheby_synthesis(sg: ShardedGraph, lmax, c, y, mesh: Mesh,
                            ell=None, carry_dtype=None, carry_tol=None):
    """Synthesis on the sharded graph: per-filter signals, summed.

    ``c``: (Nf, m+1); ``y``: (S*n_local, ..., Nf) — feature axis LAST.
    Returns ``Σ_f Σ_k c[f,k] T̃_k(L) y[..., f]`` of shape (S*n_local, ...)
    — the same math as :func:`pygsp_tpu.ops.chebyshev.cheby_synthesis`,
    with the recurrence running Nf× wide through the halo exchange.
    ``carry_dtype``: reduced-precision carry/halo payload as in
    :func:`sharded_cheby_op`.
    """
    c = jnp.atleast_2d(c)
    nf, m1 = c.shape
    lmax = jnp.asarray(lmax, dtype=sg.dtype)
    if y.shape[-1] != nf:
        raise ValueError(f'last axis of y ({y.shape[-1]}) must equal the '
                         f'number of filters ({nf})')
    cdt = jnp.dtype(carry_dtype) if carry_dtype is not None else None
    if cdt is not None and not isinstance(c, jax.core.Tracer):
        from pygsp_tpu.ops.chebyshev import _check_carry_budget
        _check_carry_budget(c, cdt, carry_tol)
    if cdt is None and jnp.dtype(y.dtype) != jnp.promote_types(y.dtype,
                                                               sg.dtype):
        y = y.astype(jnp.promote_types(y.dtype, sg.dtype))  # one-dtype carry

    # windowed-shard layouts: chunk-carried recurrence (no per-step
    # chunk/unchunk copies), contracting the trailing filter axis
    if _chunkcarried_layout(sg, ell) is not None:
        return _sharded_cheby_op_chunkcarried(sg, lmax, c, y, mesh, ell,
                                              cdt, synthesis=True)

    def body(rows, cols, vals, diag, send_idx, ell, c, lmax, y_local):
        rows, cols, vals = rows[0], cols[0], vals[0]
        diag = diag[0]
        send_idx = tuple(s[0] for s in send_idx)
        a1 = lmax / 2
        a2 = lmax / 2
        mv = partial(_local_matvec, rows, cols, vals, diag, send_idx,
                     n_shards=sg.n_shards, n_local=sg.n_local,
                     dists=sg.halo_dists, ell=ell)

        t_old = y_local
        t_cur = (mv(y_local) - a2 * y_local) / a1
        acc = jnp.sum(0.5 * c[:, 0] * t_old + c[:, 1] * t_cur, axis=-1)
        if m1 > 2:
            def step(carry, ck):
                t_old, t_cur, acc = carry
                t_new = mv(t_cur, scale=2.0 / a1, shift=a2) - t_old
                acc = acc + jnp.sum(ck * t_new, axis=-1)
                return (t_cur, t_new, acc), None

            (_, _, acc), _ = jax.lax.scan(step, (t_old, t_cur, acc),
                                          c[:, 2:].T)
        return acc

    if np.ndim(y) > 2:
        yspec = P(*(('graph', 'batch') + (None,) * (np.ndim(y) - 2)))
        ospec = P(*(('graph', 'batch') + (None,) * (np.ndim(y) - 3)))
    else:
        yspec = P('graph', None)
        ospec = P('graph')
    ell_spec = jax.tree.map(lambda _: P('graph'), ell)
    send_spec = tuple(P('graph') for _ in sg.send_idx)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P('graph'), P('graph'), P('graph'), P('graph'),
                  send_spec, ell_spec, P(), P(), yspec),
        out_specs=ospec)
    return f(sg.rows, sg.cols, sg.vals, sg.diag, sg.send_idx, ell, c,
             lmax, y)


def sharded_cheby_op_fixed_graph(sg: ShardedGraph, lmax, c, x, mesh: Mesh,
                                 ell=None):
    """:func:`sharded_cheby_op` with a CONSTANT-MEMORY custom VJP.

    Multi-chip counterpart of
    :func:`pygsp_tpu.ops.chebyshev.cheby_op_fixed_graph`: the bank is
    linear in ``c`` and ``x``, so the backward pass is two fresh sharded
    recurrences (an adjoint synthesis for x̄ — the shifted operator is
    symmetric — and a term-contraction pass for c̄ with a global psum)
    instead of storing the 3K per-step scan carries. Gradients flow to
    ``c`` and ``x`` only; the partition arrays and ``lmax`` get zero
    cotangents.
    """
    return _sharded_cheby_fg(mesh, sg, ell, lmax, c, x)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _sharded_cheby_fg(mesh, sg, ell, lmax, c, x):
    return sharded_cheby_op(sg, lmax, c, x, mesh, ell=ell)


def _sharded_cheby_fg_fwd(mesh, sg, ell, lmax, c, x):
    return (sharded_cheby_op(sg, lmax, c, x, mesh, ell=ell),
            (sg, ell, lmax, c, x))


def _sharded_cheby_fg_bwd(mesh, res, g):
    from pygsp_tpu.ops.chebyshev import _zero_cotangent
    sg, ell, lmax, c, x = res
    c_shape = jnp.shape(c)
    c = jnp.atleast_2d(c)
    nf, m1 = c.shape
    x_dt = x.dtype                   # cotangent dtype must match primal
    x = x.astype(jnp.promote_types(x.dtype, sg.dtype))
    lmax_a = jnp.asarray(lmax, dtype=sg.dtype)

    x_bar = sharded_cheby_synthesis(sg, lmax_a, c, jnp.moveaxis(g, 0, -1),
                                    mesh, ell=ell).astype(x_dt)

    batch_sharded = np.ndim(x) > 1
    if _chunkcarried_layout(sg, ell) is not None:
        c_bar = _sharded_coeff_grads_chunkcarried(sg, lmax_a, m1, x, g,
                                                  mesh, ell, batch_sharded)
        return (jax.tree_util.tree_map(_zero_cotangent, sg),
                jax.tree_util.tree_map(_zero_cotangent, ell),
                _zero_cotangent(lmax),
                c_bar.astype(c.dtype).reshape(c_shape), x_bar)

    # c̄[f,k] = <T̃_k x, ḡ_f>: one sharded forward recurrence on x, each
    # term contracted against every cotangent bank member + global psum
    def body(rows, cols, vals, diag, send_idx, ell, g, lmax, x_local):
        rows, cols, vals = rows[0], cols[0], vals[0]
        diag = diag[0]
        send_idx = tuple(s[0] for s in send_idx)
        a1 = lmax / 2
        a2 = lmax / 2
        mv = partial(_local_matvec, rows, cols, vals, diag, send_idx,
                     n_shards=sg.n_shards, n_local=sg.n_local,
                     dists=sg.halo_dists, ell=ell)

        def dot_all(t):
            axes = tuple(range(t.ndim))
            s = jnp.tensordot(g, t, axes=(tuple(a + 1 for a in axes), axes))
            s = jax.lax.psum(s, 'graph')
            # 1-D signals are REPLICATED over 'batch' (spec has no batch
            # axis): summing the copies would scale c̄ by n_batch
            return jax.lax.psum(s, 'batch') if batch_sharded else s

        t_old = x_local
        t_cur = (mv(x_local) - a2 * x_local) / a1
        s0 = dot_all(t_old)
        s1 = dot_all(t_cur)
        if m1 > 2:
            def step(carry, _):
                t_old, t_cur = carry
                t_new = mv(t_cur, scale=2.0 / a1, shift=a2) - t_old
                return (t_cur, t_new), dot_all(t_new)

            _, ss = jax.lax.scan(step, (t_old, t_cur), None, length=m1 - 2)
            return jnp.concatenate([(0.5 * s0)[None], s1[None], ss]).T
        return jnp.stack([0.5 * s0, s1]).T

    batch_sharded = np.ndim(x) > 1
    if batch_sharded:
        xspec = P('graph', 'batch')
        gspec = P(None, 'graph', 'batch')
    else:
        xspec = P('graph')
        gspec = P(None, 'graph')
    ell_spec = jax.tree.map(lambda _: P('graph'), ell)
    send_spec = tuple(P('graph') for _ in sg.send_idx)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P('graph'), P('graph'), P('graph'), P('graph'),
                  send_spec, ell_spec, gspec, P(), xspec),
        out_specs=P())
    c_bar = f(sg.rows, sg.cols, sg.vals, sg.diag, sg.send_idx, ell, g,
              lmax_a, x)

    return (jax.tree_util.tree_map(_zero_cotangent, sg),
            jax.tree_util.tree_map(_zero_cotangent, ell),
            _zero_cotangent(lmax),
            c_bar.astype(c.dtype).reshape(c_shape), x_bar)


_sharded_cheby_fg.defvjp(_sharded_cheby_fg_fwd, _sharded_cheby_fg_bwd)


def _sharded_coeff_grads_chunkcarried(sg, lmax, m1, x, g, mesh, ell,
                                      batch_sharded):
    """``c̄[f,k] = ⟨T̃_k x, ḡ_f⟩`` on the windowed-shard layout with the
    chunk-carried recurrence (mirror of the single-chip
    ``_cheby_coeff_grads_chunked``): one exact-f32 forward recurrence on
    chunk tuples, each term contracted against the chunked cotangent
    bank, then a global ``psum``."""
    split = isinstance(ell, tuple)

    def body(diag, send_idx, ell_sl, g, lmax, x_local):
        (xc, diag_c, fdiag_c, offdiag_apply, cast, odt, a1, a2,
         sc) = _chunk_body_setup(sg, split, diag[0],
                                 tuple(s[0] for s in send_idx), ell_sl,
                                 lmax, x_local, None)
        del cast
        # chunk the cotangent bank along its vertex axis to match xc
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
            s_ = jax.lax.psum(s_, 'graph')
            # 1-D signals are REPLICATED over 'batch': summing the
            # copies would scale c̄ by n_batch
            return jax.lax.psum(s_, 'batch') if batch_sharded else s_

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

    if batch_sharded:
        xspec = P('graph', 'batch')
        gspec = P(None, 'graph', 'batch')
    else:
        xspec = P('graph')
        gspec = P(None, 'graph')
    ell_spec = jax.tree.map(lambda _: P('graph'), ell)
    send_spec = tuple(P('graph') for _ in sg.send_idx)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P('graph'), send_spec, ell_spec, gspec, P(), xspec),
        out_specs=P())
    return f(sg.diag, sg.send_idx, ell, g, lmax, x)
