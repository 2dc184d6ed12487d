"""Chebyshev polynomial filtering — the framework's hot path.

Replicates the math of the reference's ``compute_cheby_coeff`` / ``cheby_op``
(``pygsp/filters/approximations.py:10-114``) with a TPU-native evaluation
strategy: the three-term recurrence runs as a ``lax.scan`` whose carried
state is ``(T_{k-1} s, T_k s, accumulators for all Nf filters)``, so the
K SpMMs are shared across the whole filter bank and every elementwise
shift/scale fuses into the SpMM's gather/segment-sum under XLA.

Signal convention: ``x`` has shape ``(N, ...)`` (any trailing dims);
``cheby_op`` returns ``(Nf, N, ...)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pygsp_tpu.core.operators import LaplacianOp, matvec


def cheby_coeff(evaluate, lmax, m: int = 30, grid_n: int | None = None,
                dtype=None):
    """Chebyshev–Gauss quadrature coefficients of a filter bank.

    Parameters
    ----------
    evaluate : callable λ(1d array) -> (Nf, len(λ)) kernel responses.
    lmax : scalar — spectrum upper bound; quadrature samples [0, lmax].
    m : Chebyshev order (reference default 30, ``filters/filter.py:146``).
    grid_n : quadrature grid size, default m + 1
        (reference ``approximations.py:38``).

    Returns
    -------
    c : (Nf, m + 1) coefficient matrix.

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> c = cheby_coeff(lambda x: jnp.exp(-x)[None, :], lmax=2.0, m=4)
    >>> c.shape
    (1, 5)
    >>> import numpy as np
    >>> # series reconstructs the kernel at λ=0: 0.5·c0 + Σ c_k·T_k(-1)
    >>> recon = 0.5 * c[0, 0] - c[0, 1] + c[0, 2] - c[0, 3] + c[0, 4]
    >>> bool(abs(float(recon) - 1.0) < 1e-2)
    True
    """
    n = grid_n if grid_n else m + 1
    lmax = jnp.asarray(lmax, dtype=dtype)
    a1 = lmax / 2
    a2 = lmax / 2
    j = jnp.arange(n, dtype=lmax.dtype) + 0.5
    grid = jnp.cos(jnp.pi * j / n)                     # (n,)
    kvals = jnp.atleast_2d(evaluate(a1 * grid + a2))   # (Nf, n)
    orders = jnp.arange(m + 1, dtype=lmax.dtype)
    cosmat = jnp.cos(jnp.pi * orders[:, None] * j[None, :] / n)  # (m+1, n)
    return (2.0 / n) * kvals @ cosmat.T                # (Nf, m+1)


def carry_error_estimate(c, carry_dtype) -> float:
    """A-priori relative-error bound of the reduced-precision carry mode.

    Each recurrence step rounds the carried term to ``carry_dtype``
    (unit roundoff u); the three-term recurrence propagates a step-k
    perturbation with factor ≤ (k' − k + 1) into later terms, so the
    output error is bounded by ``u · Σ_k (k + 1)·|c_k|``, normalized by
    the series' own peak magnitude ``max_λ |Σ' c_k T_k|`` (evaluated on a
    dense Chebyshev grid). Measured curves on the BASELINE configs run
    ~5–20x BELOW this bound (``benchmarks/bf16_error_curves.py``); the
    default gate tolerance accounts for that headroom.
    """
    import numpy as np
    c = np.atleast_2d(np.asarray(c, dtype=np.float64))
    nf, m1 = c.shape
    u = float(jnp.finfo(carry_dtype).eps) / 2
    k = np.arange(m1)
    amp = np.sum((k[None, :] + 1) * np.abs(c), axis=1)        # per filter
    theta = np.linspace(0.0, np.pi, 512)
    T = np.cos(k[:, None] * theta[None, :])                   # (m+1, grid)
    g = c @ T - 0.5 * c[:, :1] * T[:1]                        # 0.5·c0 conv
    gmax = np.abs(g).max(axis=1)
    return float((u * amp / np.maximum(gmax, 1e-300)).max())


def _check_carry_budget(c, carry_dtype, carry_tol):
    import os
    if carry_tol is None:
        carry_tol = float(os.environ.get('PYGSP_CARRY_TOL', 0.05))
    est = carry_error_estimate(c, carry_dtype)
    if est > carry_tol:
        raise ValueError(
            f'carry_dtype={jnp.dtype(carry_dtype).name} refused: the '
            f'a-priori relative error bound {est:.2e} exceeds carry_tol='
            f'{carry_tol:.0e} — this filter bank\'s Chebyshev '
            f'coefficients decay too slowly to absorb the carry '
            f'rounding. Pass carry_tol={est * 1.1:.1e} to override, or '
            f'drop carry_dtype for the exact path.')


def _cast_vals(L, vals_dtype):
    """Opt-in reduced-precision slab VALUES (chunked/windowed formats).

    The one-hot fold's product dtype is ``promote(carry, vals)`` — with
    f32 values a bf16 carry still folds through the 6-pass f32 HIGHEST
    emulation and gains nothing (measured: 2384 vs 1899 ms/bank,
    ``SHARDED_BF16_r4.json``); bf16 values make it one native MXU pass.
    Costs one rounding of each edge weight: EXACT for unit/power-of-two
    weights (the common Laplacian case after normalization), otherwise
    bounded like one extra carry rounding. The diagonal stays f32.
    """
    if vals_dtype is None:
        return L
    from pygsp_tpu.core.chunked import ChunkedELLMatrix
    from pygsp_tpu.core.windowed import WindowedELLMatrix
    if not isinstance(L.offdiag, (ChunkedELLMatrix, WindowedELLMatrix)):
        raise ValueError('vals_dtype is only supported on chunked/'
                         'windowed operator formats (the hot path)')
    return LaplacianOp(offdiag=L.offdiag.astype(vals_dtype),
                       diag=L.diag, lap_type=L.lap_type)


def cheby_op(L: LaplacianOp, lmax, c, x: jax.Array,
             carry_dtype=None, carry_tol: float | None = None,
             vals_dtype=None) -> jax.Array:
    """Apply a Chebyshev-approximated filter bank: ``(Nf, m+1), (N, ...) -> (Nf, N, ...)``.

    Exact arithmetic of ``cheby_op`` (``approximations.py:58-114``): shifted
    recurrence on [0, lmax] with the 0.5·c0 convention, all Nf filters
    accumulated from the shared recurrence terms.

    ``carry_dtype`` (opt-in, chunked/windowed formats only): dtype of the
    CARRIED recurrence terms ``T̃_k x``. ``jnp.bfloat16`` halves both the
    gather bytes of every SpMM step (the hot path's bound) and the
    recurrence-state memory; every row sum, diagonal term, and
    accumulator stays f32 (``preferred_element_type`` on the fold), so
    only the per-step carry rounds. The a-priori error estimate
    :func:`carry_error_estimate` gates the mode: if it exceeds
    ``carry_tol`` (default 0.05, env ``PYGSP_CARRY_TOL``) a ValueError
    explains the refusal — pass a larger ``carry_tol`` to override.
    Measured per-order error curves: ``benchmarks/bf16_error_curves.py``.
    """
    c = jnp.atleast_2d(c)
    nf, m1 = c.shape
    if m1 < 2:
        raise ValueError('Chebyshev coefficients need order >= 1')
    from pygsp_tpu.core.chunked import ChunkedELLMatrix
    from pygsp_tpu.core.windowed import WindowedELLMatrix
    if carry_dtype is not None and jnp.dtype(carry_dtype) != x.dtype:
        if not isinstance(L.offdiag, (ChunkedELLMatrix, WindowedELLMatrix)):
            raise ValueError('carry_dtype is only supported on chunked/'
                             'windowed operator formats (the hot path)')
        if not isinstance(c, jax.core.Tracer):
            # under jit the coefficients are traced; callers gate at
            # program-build time instead (Filter._cheby_program does)
            _check_carry_budget(c, carry_dtype, carry_tol)
    # mixed operator/signal dtypes (e.g. f64 graph under x64, f32
    # signal): promote the signal ONCE so the scan carry holds one dtype
    # throughout — the first SpMM would otherwise widen t_cur but not
    # t_old, and whether that broke the carry contract depended on the
    # accumulator-group remainder (g-dependent TypeError)
    L = _cast_vals(L, vals_dtype)
    pdt = jnp.promote_types(x.dtype, L.offdiag.dtype)
    if carry_dtype is None and x.dtype != pdt:
        x = x.astype(pdt)
    if isinstance(L.offdiag, (ChunkedELLMatrix, WindowedELLMatrix)):
        return _cheby_op_chunked(L, lmax, c, x, carry_dtype=carry_dtype)
    lmax = jnp.asarray(lmax, dtype=x.dtype)
    a1 = lmax / 2
    a2 = lmax / 2

    bshape = (nf,) + (1,) * x.ndim  # broadcast shape for per-filter coeffs

    t_old = x
    t_cur = (matvec(L, x) - a2 * x) / a1
    acc = (0.5 * c[:, 0].reshape(bshape) * t_old[None]
           + c[:, 1].reshape(bshape) * t_cur[None])

    if m1 == 2:
        return acc

    # 2/a1 * (L - a2 I), shift/scale fused into the operator's diag + vals
    factor = L.shifted(2.0 / a1, a2)

    def step(carry, ck):
        t_old, t_cur, acc = carry
        t_new = matvec(factor, t_cur) - t_old
        acc = acc + ck.reshape(bshape) * t_new[None]
        return (t_cur, t_new, acc), None

    (_, _, acc), _ = jax.lax.scan(step, (t_old, t_cur, acc), c[:, 2:].T)
    return acc


def _cheby_op_chunked(L: LaplacianOp, lmax, c, x: jax.Array,
                      carry_dtype=None) -> jax.Array:
    """:func:`cheby_op` for a chunked off-diagonal (``core.chunked``).

    Same arithmetic; the recurrence state is carried as a TUPLE of
    per-chunk buffers so every slot gather's operand stays below the
    VMEM gather cliff (separate scan-carry buffers gather at ~2.1-2.7
    ns/row where slices of one (N, S) buffer pay ~11 — measured in
    benchmarks/gather_probe3.py).

    ``carry_dtype``: see :func:`cheby_op`. The carried ``T̃_k`` chunks
    (and only they) hold this dtype; the SpMM row sums, the diagonal
    term, and the accumulators compute in the signal dtype, so each step
    pays exactly one rounding of the carry.
    """
    from pygsp_tpu.core import chunked as ck

    nf, m1 = c.shape
    odt = x.dtype
    cdt = jnp.dtype(carry_dtype) if carry_dtype is not None else odt
    lmax = jnp.asarray(lmax, dtype=odt)
    a1 = lmax / 2
    a2 = lmax / 2
    bshape = (nf,) + (1,) * x.ndim
    R = L.offdiag.chunk_rows
    dshape = (-1,) + (1,) * (x.ndim - 1)

    if cdt == odt:
        def cast(t):
            return t
        spmm_kw = {}
    else:
        def cast(t):
            return tuple(tk.astype(cdt) for tk in t)
        # the SpMM emits the CARRY dtype (row sums still accumulate in
        # f32 on the MXU — core/windowed.py acc_dt): the carry re-rounds
        # the output anyway, and emitting it narrow halves the window-
        # tensor + strip traffic that dominates fragmented weak-scale
        # shapes (BF16OUT_r5.json; one extra same-scale rounding).
        # The elementwise recurrence math promotes back to odt.
        spmm_kw = {'out_dtype': cdt}

    # degree-sort permutes are hoisted: ONE gather in, ONE gather out,
    # with all K recurrence steps running in the matrix's sorted order
    diag_c = ck.chunk_signal(
        ck.permute_in(L.offdiag, L.diag).reshape(dshape), R)
    xc = ck.chunk_signal(ck.permute_in(L.offdiag, x), R)
    t_old = cast(xc)
    yc0 = L.offdiag.spmm_chunks(t_old, **spmm_kw)
    t_cur = cast(tuple((d * xk + yk - a2 * xk) / a1
                       for d, xk, yk in zip(diag_c, xc, yc0)))
    acc = tuple(0.5 * c[:, 0].reshape(bshape) * xk[None]
                + c[:, 1].reshape(bshape) * tc.astype(odt)[None]
                for xk, tc in zip(xc, t_cur))

    if m1 > 2:
        # 2/a1 * (L - a2 I) applied as: sc*(offdiag @ x) + fused-diag*x.
        # The scalar multiplies the SpMM OUTPUT (fuses into the add
        # epilogue) rather than the slab values — `scale_vals` on a
        # traced scalar materializes a scaled COPY of the whole slot
        # array in the program (~1 GB at config-5 scale, and an f32
        # upcast of bf16 slabs). Same arithmetic order as the
        # reference's recurrence (approximations.py:105-110).
        sc = 2.0 / a1
        fdiag_c = ck.chunk_signal(
            ck.permute_in(L.offdiag, (L.diag - a2) * sc).reshape(dshape), R)
        fmat = L.offdiag

        def recur(t_old, t_cur):
            yc = fmat.spmm_chunks(t_cur, **spmm_kw)
            return cast(tuple(fd * tk + sc * yk - to
                              for fd, tk, yk, to in zip(fdiag_c, t_cur, yc,
                                                        t_old)))

        def add_acc(acc, ckk, t_new):
            return tuple(a + ckk.reshape(bshape) * t[None]
                         for a, t in zip(acc, t_new))

        # ACC GROUPING: the per-step accumulator update reads+writes all
        # Nf (N, S) buffers — 4 GB/step at the bench config, ~20% of the
        # step on top of the gather-bound SpMM. Running g recurrence
        # steps per scan iteration folds g updates into one acc pass, at
        # the cost of materializing g recurrence-term buffers per scan
        # step. Measured on the bench graph (benchmarks/accgroup_sweep.py):
        # g=4 -> 2557 ms/bank, g=7 -> 2484, g=14 -> 2458 (70.8% of the
        # read roofline); g=28 exceeds device memory. Default: the
        # largest g fitting the device budget PYGSP_CHEBY_DEVICE_MB
        # (12 GB of the 16 GB chip, leaving headroom for fold temps)
        # after the slot slabs, the Nf accumulators and the recurrence
        # buffers — g=14 at the bench config (512 MB terms), shrinking
        # automatically as N*S grows (g=3 at N=2^21, 1 at config-5).
        rem = m1 - 2
        import os
        if os.environ.get('PYGSP_CHEBY_ACC_GROUP'):
            g = min(int(os.environ['PYGSP_CHEBY_ACC_GROUP']), max(rem, 1))
        else:
            # recurrence terms live in the carry dtype: a bf16 carry
            # halves term_bytes, roughly doubling the feasible g at
            # memory-starved sizes (config-5's g=1 → g≥3)
            term_bytes = max(x.size * cdt.itemsize, 1)
            acc_bytes = max(x.size * odt.itemsize, 1)
            slab_bytes = sum(l.size * l.dtype.itemsize
                             for l in jax.tree_util.tree_leaves(L.offdiag))
            budget = float(os.environ.get('PYGSP_CHEBY_DEVICE_MB',
                                          12288)) * 2**20
            avail = (budget - slab_bytes - nf * acc_bytes
                     - 4 * max(term_bytes, acc_bytes))
            g = max(1, min(rem, 14, int(avail // term_bytes)))
        for k in range(2, 2 + rem % g):      # unrolled head remainder
            t_new = recur(t_old, t_cur)
            acc = add_acc(acc, c[:, k], t_new)
            t_old, t_cur = t_cur, t_new
        cg = c[:, 2 + rem % g:].T.reshape(-1, g, nf)   # (n_groups, g, nf)

        # Group-body mode, A/B'd on-chip at the bench config with a cold
        # XLA cache (benchmarks/compile_time_probe.py -> COMPILE_r3.json):
        # the UNROLLED g-step body runs 2448 ms/bank and compiles in 59 s
        # at g=14 (38 s at g=7); the inner-scan body traces `recur` once
        # and compiles 3x faster (21 s) but pays 13% throughput
        # (2764 ms) — the stacked terms round-trip the scan carry instead
        # of fusing into the accumulator contraction. Default: unrolled
        # (throughput first; the persistent XLA cache makes repeat
        # compiles seconds). PYGSP_CHEBY_GROUP_UNROLL=0 opts into the
        # fast-compile scan body for iteration-heavy workflows.
        unroll_group = os.environ.get('PYGSP_CHEBY_GROUP_UNROLL',
                                      '1') != '0'

        def step(carry, ckg):
            t_old, t_cur, acc = carry
            if unroll_group or g == 1:
                terms = []
                for j in range(g):
                    t_new = recur(t_old, t_cur)
                    terms.append(t_new)
                    t_old, t_cur = t_cur, t_new
                acc = tuple(
                    a + sum(ckg[j].reshape(bshape) * terms[j][i][None]
                            for j in range(g))
                    for i, a in enumerate(acc))
            else:
                def inner(ic, _):
                    to, tc = ic
                    tn = recur(to, tc)
                    return (tc, tn), tn

                (t_old, t_cur), terms = jax.lax.scan(
                    inner, (t_old, t_cur), None, length=g)
                # terms: per-chunk (g, rows, ...) stacks; fold all g
                # coefficients into acc in one pass per chunk. Kept
                # elementwise (VPU): an MXU contraction at DEFAULT
                # precision would round the f32 path through bf16, and
                # the arithmetic here must stay bit-identical to the
                # unrolled body.
                acc = tuple(
                    a + sum(ckg[j].reshape(bshape) * t[j][None]
                            for j in range(g))
                    for a, t in zip(acc, terms))
            return (t_old, t_cur, acc), None

        if cg.shape[0]:
            (_, _, acc), _ = jax.lax.scan(step, (t_old, t_cur, acc), cg)
    out = acc[0] if len(acc) == 1 else jnp.concatenate(acc, axis=1)
    return ck.permute_out(L.offdiag, out, axis=1)


def cheby_op_fixed_graph(L: LaplacianOp, lmax, c, x: jax.Array) -> jax.Array:
    """:func:`cheby_op` with a CONSTANT-MEMORY custom VJP for training.

    Plain reverse-mode through the K-step recurrence stores every
    carried term — ``3K`` ``(N, S)`` buffers (~45 GB at the bench
    config), which caps trainable problem sizes far below what the
    forward pass supports. The filter bank is LINEAR in both ``x`` and
    ``c``, so its adjoint needs no stored activations:

    - ``x̄ = Σ_f Σ_k c'[f,k] T_k(L̃) ḡ_f`` — the SAME series applied to
      the cotangent bank (the shifted operator is symmetric); computed
      by :func:`cheby_synthesis`.
    - ``c̄[f,k] = ⟨T_k(L̃) x, ḡ_f⟩`` (with the 0.5 factor on k=0) — one
      fresh forward recurrence contracting each term against the
      cotangents.

    Backward cost = 2 recurrences (same as forward), backward memory =
    O(1) recurrence state. Gradients flow to ``c`` and ``x`` ONLY: the
    graph operator ``L`` and ``lmax`` get zero cotangents (use plain
    :func:`cheby_op` to differentiate through graph weights). Training
    flows that fit filter parameters (scales → coefficients) and/or
    signals — the common case, e.g. ``__graft_entry__``'s train step —
    keep exact gradients.
    """
    return _cheby_op_fg(L, lmax, c, x)


def _zero_cotangent(p):
    """Symbolic-zero cotangent with custom_vjp's dtype rules (float0 for
    integer/bool leaves)."""
    import numpy as _np
    if jnp.issubdtype(jnp.result_type(p), jnp.inexact):
        return jnp.zeros_like(p)
    return _np.zeros(jnp.shape(p), dtype=jax.dtypes.float0)


@jax.custom_vjp
def _cheby_op_fg(L, lmax, c, x):
    return cheby_op(L, lmax, c, x)


def _cheby_op_fg_fwd(L, lmax, c, x):
    return cheby_op(L, lmax, c, x), (L, lmax, c, x)


def _cheby_op_fg_bwd(res, g):
    L, lmax, c, x = res
    c_shape = jnp.shape(c)           # cotangent must match the primal rank
    c = jnp.atleast_2d(c)
    nf, m1 = c.shape
    x_dt = x.dtype                   # cotangent dtype must match primal
    x = x.astype(jnp.promote_types(x.dtype, L.offdiag.dtype))
    lmax = jnp.asarray(lmax, dtype=x.dtype)
    a1 = lmax / 2
    a2 = lmax / 2

    # x̄: adjoint series on the cotangent bank, feature axis moved last
    # (cheby_synthesis dispatches to the chunked hot path itself)
    x_bar = cheby_synthesis(L, lmax, c,
                            jnp.moveaxis(g, 0, -1)).astype(x_dt)

    # c̄: forward recurrence on x, each term contracted with every ḡ_f
    from pygsp_tpu.core.chunked import ChunkedELLMatrix
    from pygsp_tpu.core.windowed import WindowedELLMatrix
    if isinstance(L.offdiag, (ChunkedELLMatrix, WindowedELLMatrix)):
        c_bar = _cheby_coeff_grads_chunked(L, lmax, m1, x, g)
        return (jax.tree_util.tree_map(_zero_cotangent, L),
                _zero_cotangent(lmax),
                c_bar.astype(c.dtype).reshape(c_shape), x_bar)

    def dot_all(t):
        axes = tuple(range(t.ndim))
        return jnp.tensordot(g, t, axes=(tuple(a + 1 for a in axes), axes))

    t_old = x
    t_cur = (matvec(L, x) - a2 * x) / a1
    s0 = dot_all(t_old)
    s1 = dot_all(t_cur)
    if m1 > 2:
        factor = L.shifted(2.0 / a1, a2)

        def step(carry, _):
            t_old, t_cur = carry
            t_new = matvec(factor, t_cur) - t_old
            return (t_cur, t_new), dot_all(t_new)

        _, ss = jax.lax.scan(step, (t_old, t_cur), None, length=m1 - 2)
        c_bar = jnp.concatenate([(0.5 * s0)[None], s1[None], ss]).T
    else:
        c_bar = jnp.stack([0.5 * s0, s1]).T
    return (jax.tree_util.tree_map(_zero_cotangent, L),
            _zero_cotangent(lmax),
            c_bar.astype(c.dtype).reshape(c_shape), x_bar)


_cheby_op_fg.defvjp(_cheby_op_fg_fwd, _cheby_op_fg_bwd)


def cheby_op_intermediates(L: LaplacianOp, lmax, c, x: jax.Array):
    """Like :func:`cheby_op` but also returns every recurrence term
    ``T̃_k s`` for k = 0..m, for per-order parity validation against the
    reference (BASELINE correctness target)."""
    c = jnp.atleast_2d(c)
    nf, m1 = c.shape
    lmax = jnp.asarray(lmax, dtype=x.dtype)
    a1 = lmax / 2
    a2 = lmax / 2
    bshape = (nf,) + (1,) * x.ndim

    t_old = x
    t_cur = (matvec(L, x) - a2 * x) / a1
    acc = (0.5 * c[:, 0].reshape(bshape) * t_old[None]
           + c[:, 1].reshape(bshape) * t_cur[None])
    terms = [t_old, t_cur]
    factor = L.shifted(2.0 / a1, a2)
    for k in range(2, m1):
        t_new = matvec(factor, t_cur) - t_old
        acc = acc + c[:, k].reshape(bshape) * t_new[None]
        t_old, t_cur = t_cur, t_new
        terms.append(t_new)
    return acc, jnp.stack(terms)


def cheby_rect(L: LaplacianOp, lmax, bounds, x: jax.Array,
               order: int = 30) -> jax.Array:
    """Ideal band-pass filtering with closed-form Chebyshev coefficients.

    Math of ``cheby_rect`` (``approximations.py:117-163``): coefficients are
    the analytic Chebyshev series of the indicator of [b1, b2] ⊂ [0, lmax].
    """
    x = x.astype(jnp.promote_types(x.dtype, L.offdiag.dtype))
    lmax = jnp.asarray(lmax, dtype=x.dtype)
    bounds = jnp.asarray(bounds, dtype=x.dtype)
    m = order + 1
    b1, b2 = jnp.arccos(2.0 * bounds / lmax - 1.0)
    c0 = (b1 - b2) / jnp.pi
    c1 = 2.0 / jnp.pi * (jnp.sin(b1) - jnp.sin(b2))
    ks = jnp.arange(2, m, dtype=x.dtype)
    coeffs = 2.0 / (ks * jnp.pi) * (jnp.sin(ks * b1) - jnp.sin(ks * b2))

    from pygsp_tpu.core.chunked import ChunkedELLMatrix
    from pygsp_tpu.core.windowed import WindowedELLMatrix
    if isinstance(L.offdiag, (ChunkedELLMatrix, WindowedELLMatrix)):
        # chunked hot path: no `L.shifted` — a traced-scalar `scale_vals`
        # would materialize a scaled copy of the whole slot array
        # (~1 GB at config-5 scale); `_chunked_recurrence` applies the
        # recurrence scalar to the SpMM output instead.
        from pygsp_tpu.core import chunked as ck
        t_old, t_cur, recur = _chunked_recurrence(L, lmax, x)
        acc = tuple(c0 * to + c1 * tc for to, tc in zip(t_old, t_cur))

        def cstep(carry, ckk):
            t_old, t_cur, acc = carry
            t_new = recur(t_old, t_cur)
            acc = tuple(a + ckk * t for a, t in zip(acc, t_new))
            return (t_cur, t_new, acc), None

        (_, _, acc), _ = jax.lax.scan(cstep, (t_old, t_cur, acc), coeffs)
        out = acc[0] if len(acc) == 1 else jnp.concatenate(acc)
        return ck.permute_out(L.offdiag, out)

    a1 = lmax / 2
    a2 = lmax / 2
    sc = 2.0 / a1
    t_old = x
    t_cur = (matvec(L, x) - a2 * x) / a1
    acc = c0 * x + c1 * t_cur

    def step(carry, ck):
        t_old, t_cur, acc = carry
        # reference arithmetic order (approximations.py:151-158); the
        # scalar multiplies the matvec output, never the stored values
        t_new = sc * (matvec(L, t_cur) - a2 * t_cur) - t_old
        acc = acc + ck * t_new
        return (t_cur, t_new, acc), None

    (_, _, acc), _ = jax.lax.scan(step, (t_old, t_cur, acc), coeffs)
    return acc


def jackson_cheby_coeff(filter_bounds, delta_lambda, m: int):
    """Jackson-damped Chebyshev coefficients of an ideal band-pass.

    Math of ``compute_jackson_cheby_coeff``
    (``approximations.py:166-225``): ideal band-pass between the two
    ``filter_bounds`` within spectrum ``delta_lambda = [λmin, λmax]``,
    then Jackson damping. Returns ``(ch, jch)`` — raw and damped
    coefficient vectors of length m + 1.
    """
    a, b = (jnp.asarray(v, dtype=jnp.result_type(float)) for v in delta_lambda)
    fa, fb = (jnp.asarray(v, dtype=jnp.result_type(float)) for v in filter_bounds)
    # affine map of the band onto [-1, 1]
    fa = (2.0 * fa - a - b) / (b - a)
    fb = (2.0 * fb - a - b) / (b - a)

    ks = jnp.arange(1, m + 1, dtype=fa.dtype)
    ch0 = 2.0 * (jnp.arccos(fa) - jnp.arccos(fb)) / jnp.pi
    chk = (2.0 / (jnp.pi * ks)) * (jnp.sin(ks * jnp.arccos(fa))
                                   - jnp.sin(ks * jnp.arccos(fb)))
    ch = jnp.concatenate([ch0[None], chk])

    # Jackson damping factors (gamma_JACK in the reference)
    alpha = jnp.pi / (m + 2.0)
    kk = jnp.arange(0, m + 1, dtype=fa.dtype)
    gamma = ((1.0 - kk / (m + 2.0)) * jnp.sin(alpha) * jnp.cos(kk * alpha)
             + (1.0 / (m + 2.0)) * jnp.cos(alpha) * jnp.sin(kk * alpha)) / jnp.sin(alpha)
    return ch, ch * gamma


def cheby_synthesis(L: LaplacianOp, lmax, c, x: jax.Array,
                    carry_dtype=None,
                    carry_tol: float | None = None,
                    vals_dtype=None) -> jax.Array:
    """Synthesis: per-filter coefficients applied to per-filter signals, summed.

    ``c``: (Nf, m+1); ``x``: (N, ..., Nf) — feature axis last. Returns
    (N, ...). Matches the reference's synthesis loop
    (``filter.py:313-322``) but runs ONE recurrence over the whole
    (N, ... * Nf) block instead of Nf sequential recurrences, so the SpMMs
    are Nf× wider — same FLOPs, far better TPU utilisation.

    ``carry_dtype``/``carry_tol``: reduced-precision carry, as in
    :func:`cheby_op` (chunked/windowed formats only).
    """
    c = jnp.atleast_2d(c)
    nf, m1 = c.shape
    if x.shape[-1] != nf:
        raise ValueError(f'last axis of x ({x.shape[-1]}) must equal the '
                         f'number of filters ({nf})')
    from pygsp_tpu.core.chunked import ChunkedELLMatrix
    from pygsp_tpu.core.windowed import WindowedELLMatrix
    if carry_dtype is not None and jnp.dtype(carry_dtype) != x.dtype:
        if not isinstance(L.offdiag, (ChunkedELLMatrix, WindowedELLMatrix)):
            raise ValueError('carry_dtype is only supported on chunked/'
                             'windowed operator formats (the hot path)')
        if not isinstance(c, jax.core.Tracer):
            _check_carry_budget(c, carry_dtype, carry_tol)
    L = _cast_vals(L, vals_dtype)
    pdt = jnp.promote_types(x.dtype, L.offdiag.dtype)
    if carry_dtype is None and x.dtype != pdt:
        x = x.astype(pdt)     # one-dtype scan carry (see cheby_op)
    if isinstance(L.offdiag, (ChunkedELLMatrix, WindowedELLMatrix)):
        return _cheby_synthesis_chunked(L, lmax, c, x,
                                        carry_dtype=carry_dtype)
    lmax = jnp.asarray(lmax, dtype=x.dtype)
    a1 = lmax / 2
    a2 = lmax / 2

    t_old = x
    t_cur = (matvec(L, x) - a2 * x) / a1
    acc = jnp.sum(0.5 * c[:, 0] * t_old + c[:, 1] * t_cur, axis=-1)

    if m1 == 2:
        return acc

    factor = L.shifted(2.0 / a1, a2)

    def step(carry, ck):
        t_old, t_cur, acc = carry
        t_new = matvec(factor, t_cur) - t_old
        acc = acc + jnp.sum(ck * t_new, axis=-1)
        return (t_cur, t_new, acc), None

    (_, _, acc), _ = jax.lax.scan(step, (t_old, t_cur, acc), c[:, 2:].T)
    return acc


def _chunked_recurrence(L: LaplacianOp, lmax, x, dtype=None,
                        carry_dtype=None):
    """Shared setup for chunked-format recurrences: hoisted entry
    permute, chunked signal/diag tuples, and a ``recur`` closure that
    applies ``2/a1 (L − a2 I)·t − t_old`` with the scalar on the SpMM
    OUTPUT (``scale_vals`` on a traced scalar would materialize a scaled
    copy of the whole slot array — see :func:`_cheby_op_chunked`).

    ``carry_dtype``: dtype of the carried term tuples (see
    :func:`cheby_op`); row sums and elementwise math stay in the signal
    dtype."""
    from pygsp_tpu.core import chunked as ck

    odt = dtype or x.dtype
    cdt = jnp.dtype(carry_dtype) if carry_dtype is not None else odt
    lmax = jnp.asarray(lmax, dtype=odt)
    a1 = lmax / 2
    a2 = lmax / 2
    R = L.offdiag.chunk_rows
    dshape = (-1,) + (1,) * (x.ndim - 1)
    diag_c = ck.chunk_signal(
        ck.permute_in(L.offdiag, L.diag).reshape(dshape), R)
    xc = ck.chunk_signal(ck.permute_in(L.offdiag, x), R)
    sc = 2.0 / a1
    fdiag_c = ck.chunk_signal(
        ck.permute_in(L.offdiag, (L.diag - a2) * sc).reshape(dshape), R)
    fmat = L.offdiag

    if cdt == odt:
        def cast(t):
            return t
        spmm_kw = {}
    else:
        def cast(t):
            return tuple(tk.astype(cdt) for tk in t)
        spmm_kw = {'out_dtype': cdt}    # carry-width fold output (see
        #                                 _cheby_op_chunked)

    t_old = cast(xc)
    yc0 = fmat.spmm_chunks(t_old, **spmm_kw)
    t_cur = cast(tuple((d * xk + yk - a2 * xk) / a1
                       for d, xk, yk in zip(diag_c, xc, yc0)))

    def recur(t_old, t_cur):
        yc = fmat.spmm_chunks(t_cur, **spmm_kw)
        return cast(tuple(fd * tk + sc * yk - to
                          for fd, tk, yk, to in zip(fdiag_c, t_cur, yc,
                                                    t_old)))

    return t_old, t_cur, recur


def _cheby_synthesis_chunked(L: LaplacianOp, lmax, c, x: jax.Array,
                             carry_dtype=None):
    """:func:`cheby_synthesis` on chunked/windowed operators: the same
    hot-path recurrence as :func:`_cheby_op_chunked` (chunk-tuple carry,
    hoisted permutes), with the per-step accumulation contracting the
    trailing filter axis instead of broadcasting one."""
    from pygsp_tpu.core import chunked as ck

    nf, m1 = c.shape
    t_old, t_cur, recur = _chunked_recurrence(L, lmax, x,
                                              carry_dtype=carry_dtype)
    acc = tuple(jnp.sum(0.5 * c[:, 0] * to + c[:, 1] * tc, axis=-1)
                for to, tc in zip(t_old, t_cur))
    if m1 > 2:
        def step(carry, ck_row):
            t_old, t_cur, acc = carry
            t_new = recur(t_old, t_cur)
            acc = tuple(a + jnp.sum(ck_row * t, axis=-1)
                        for a, t in zip(acc, t_new))
            return (t_cur, t_new, acc), None

        (_, _, acc), _ = jax.lax.scan(step, (t_old, t_cur, acc),
                                      c[:, 2:].T)
    out = acc[0] if len(acc) == 1 else jnp.concatenate(acc)
    return ck.permute_out(L.offdiag, out)


def _cheby_coeff_grads_chunked(L: LaplacianOp, lmax, m1, x, g):
    """``c̄[f,k] = ⟨T̃_k x, ḡ_f⟩`` on chunked/windowed operators: one
    hot-path recurrence on ``x``, contracting every term against the
    (once-permuted, chunked) cotangent bank."""
    from pygsp_tpu.core import chunked as ck

    R = L.offdiag.chunk_rows
    gp = ck.permute_in(L.offdiag, jnp.moveaxis(g, 0, -1))  # (N, ..., Nf)
    gc = ck.chunk_signal(gp, R)

    def dot_all(t_chunks):
        s = 0
        for tk, gk in zip(t_chunks, gc):
            axes = tuple(range(tk.ndim))
            s = s + jnp.tensordot(gk, tk,
                                  axes=(axes, axes))     # (Nf,) via last
        return s

    t_old, t_cur, recur = _chunked_recurrence(L, lmax, x)
    s0 = dot_all(t_old)
    s1 = dot_all(t_cur)
    if m1 > 2:
        def step(carry, _):
            t_old, t_cur = carry
            t_new = recur(t_old, t_cur)
            return (t_cur, t_new), dot_all(t_new)

        _, ss = jax.lax.scan(step, (t_old, t_cur), None, length=m1 - 2)
        return jnp.concatenate([(0.5 * s0)[None], s1[None], ss]).T
    return jnp.stack([0.5 * s0, s1]).T
