r"""
Fused Pallas TPU kernels for the probabilistic ODE solver.

The sequential time loop is the latency wall of the solver: under plain XLA
each of the ``n_steps`` scan iterations re-runs a graph of tiny
:math:`q \times q` ops at ~17 us/step on a v5e — slower than a desktop CPU.
These kernels fuse the ENTIRE forward filter (and backward smoother) into a
single Pallas kernel: the loop runs inside the kernel, the state lives in
vector registers/VMEM scratch, and each step costs a handful of VPU ops.

Design notes (Mosaic constraints shape everything here):

* All values are strictly 2-D tiles; the per-block state is kept as Python
  lists of ``(n_block, 1)`` columns ("column registers"), so per-step matrix
  algebra unrolls at trace time into scalar-coefficient FMAs on columns with
  **zero gathers, zero reshapes and zero concatenates** in the loop body.
* Covariances are symmetric: only the upper triangle is carried
  (``q(q+1)/2`` columns).
* Time is processed in **chunks over a Pallas grid**: per-chunk output
  blocks stream VMEM -> HBM automatically between grid steps (double
  buffered), while the filter state persists across grid steps in VMEM
  scratch.  This keeps VMEM usage at a few buffers of ``chunk`` rows
  regardless of ``n_steps`` (a monolithic kernel OOMs VMEM at 10k steps).
  The backward smoother uses a reversed block ``index_map`` to stream the
  same way, right to left.
* The ODE right-hand side and its block-diagonal Jacobian enter as
  "flat" callables with 2-D-safe signatures (see
  :mod:`rodeo_tpu.models` ``*_flat`` variants) — arbitrary user ``jnp``
  code cannot be traced into Mosaic safely.
* The kernels expect **Taylor-preconditioned** inputs
  (:mod:`rodeo_tpu.ops.precond`): float32 needs the O(1)-conditioned prior,
  and the Joseph-form update is used throughout.

The public entry point :func:`solve_mv_fused` matches the ``solve_mv``
signature/contract for supported configurations (``n_bmeas == 1``,
standard form, EK1/zero-order interrogations, ``q <= 5`` for the smoother).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rodeo_tpu.ops.precond import taylor_scale, scale_prior

__all__ = ["fused_filter", "fused_smoother", "solve_mv_fused",
           "solve_mv_fused_stationary", "basic_fused_batch",
           "solve_mv_fused_batch_grad", "basic_fused_batch_grad",
           "jvp_jac_flat", "chol_packed", "unpack_chol",
           "resolve_kalman_type"]


def _tri_idx(q):
    """Upper-triangle (i, j) pairs and a dense->packed index map."""
    pairs = [(i, j) for i in range(q) for j in range(i, q)]
    where = {}
    for k, (i, j) in enumerate(pairs):
        where[(i, j)] = k
        where[(j, i)] = k
    return pairs, where


def _coef_mul(a, col):
    """Multiply a column by a coefficient that may be a trace-time float
    (0.0 -> dropped, 1.0 -> identity) or a (n_block, 1) column."""
    if isinstance(a, float):
        if a == 0.0:
            return None
        if a == 1.0:
            return col
    return a * col


def _acc(acc, term):
    if term is None:
        return acc
    return term if acc is None else acc + term


def _sym_quadform(q, A, P_cols, where):
    r"""
    Columns of the upper triangle of ``A P A'`` where ``A`` is a
    list-of-lists of coefficient columns and ``P_cols`` is packed-symmetric.
    Unrolled at trace time into FMAs on ``(n_block, 1)`` columns.
    """
    T = [[None] * q for _ in range(q)]
    for i in range(q):
        for k in range(q):
            acc = None
            for j in range(q):
                acc = _acc(acc, _coef_mul(A[i][j], P_cols[where[(j, k)]]))
            T[i][k] = acc
    out = []
    for i in range(q):
        for l in range(i, q):
            acc = None
            for k in range(q):
                if T[i][k] is None:
                    continue
                acc = _acc(acc, _coef_mul(A[l][k], T[i][k]))
            out.append(acc)
    return out


def _matvec(q, A, v_cols):
    """Columns of ``A v`` with the same coefficient conventions."""
    out = []
    for i in range(q):
        acc = None
        for j in range(q):
            acc = _acc(acc, _coef_mul(A[i][j], v_cols[j]))
        out.append(acc)
    return out


def _read_mat_cols(ref, q):
    """Read a (nb, q*q) ref into a list-of-lists of (nb, 1) columns."""
    return [[ref[:, i * q + j:i * q + j + 1] for j in range(q)]
            for i in range(q)]


def _sym_inv(q, p_cols):
    """Closed-form inverse of a packed-symmetric matrix in column
    arithmetic, scale-normalized against float32 determinant overflow.
    Direct cofactor forms for q <= 3; q = 4, 5 via one level of 2+(q-2)
    block partitioning (Schur complement), recursing into the small
    forms — every operation stays an elementwise FMA on columns, so the
    whole inverse unrolls inside Pallas kernels and batched XLA alike."""
    if q == 1:
        return [1.0 / p_cols[0]]
    if q == 2:
        a, b, d = p_cols
        inv_det = 1.0 / (a * d - b * b)
        return [d * inv_det, -b * inv_det, a * inv_det]
    if q == 3:
        a, b, c, d, e, f = p_cols  # [00,01,02,11,12,22]
        s = jnp.maximum(jnp.abs(a), jnp.maximum(jnp.abs(d), jnp.abs(f)))
        rs = 1.0 / jnp.maximum(s, 1e-30)
        a, b, c, d, e, f = a * rs, b * rs, c * rs, d * rs, e * rs, f * rs
        co00 = d * f - e * e
        co01 = c * e - b * f
        co02 = b * e - c * d
        co11 = a * f - c * c
        co12 = b * c - a * e
        co22 = a * d - b * b
        det = a * co00 + b * co01 + c * co02
        inv_det = rs / det
        return [co00 * inv_det, co01 * inv_det, co02 * inv_det,
                co11 * inv_det, co12 * inv_det, co22 * inv_det]
    if q in (4, 5):
        pairs, where = _tri_idx(q)
        diag = [p_cols[where[(i, i)]] for i in range(q)]
        s = diag[0]
        for dcol in diag[1:]:
            s = jnp.maximum(jnp.abs(s), jnp.abs(dcol))
        rs = 1.0 / jnp.maximum(s, 1e-30)
        pc = [col * rs for col in p_cols]
        k, m = 2, q - 2
        # M = [[A, B], [B', D]] with A (k,k), B (k,m), D (m,m)
        Ainv = _sym_inv(k, [pc[where[(0, 0)]], pc[where[(0, 1)]],
                            pc[where[(1, 1)]]])
        _, whA = _tri_idx(k)
        B = [[pc[where[(i, k + j)]] for j in range(m)] for i in range(k)]
        # C = A^{-1} B
        C = [[None] * m for _ in range(k)]
        for i in range(k):
            for j in range(m):
                acc = None
                for l in range(k):
                    acc = _acc(acc, Ainv[whA[(i, l)]] * B[l][j])
                C[i][j] = acc
        # Schur complement S = D - B' C (packed symmetric)
        _, whS = _tri_idx(m)
        S_cols = []
        for i in range(m):
            for j in range(i, m):
                acc = pc[where[(k + i, k + j)]]
                for l in range(k):
                    acc = acc - B[l][i] * C[l][j]
                S_cols.append(acc)
        Sinv = _sym_inv(m, S_cols)
        # inverse blocks: UL = A^{-1} + C S^{-1} C', UR = -C S^{-1},
        # LR = S^{-1}
        UR = [[None] * m for _ in range(k)]
        for i in range(k):
            for j in range(m):
                acc = None
                for l in range(m):
                    acc = _acc(acc, C[i][l] * Sinv[whS[(l, j)]])
                UR[i][j] = -acc
        out = []
        for i in range(q):
            for j in range(i, q):
                if j < k:                       # UL block
                    acc = Ainv[whA[(i, j)]]
                    for l in range(m):
                        acc = acc - UR[i][l] * C[j][l]
                    out.append(acc * rs)
                elif i < k:                     # UR block
                    out.append(UR[i][j - k] * rs)
                else:                           # LR block
                    out.append(Sinv[whS[(i - k, j - k)]] * rs)
        return out
    raise NotImplementedError("fused kernels support q <= 5")


def _chol_cols(q, p_cols, where, floor=1e-12):
    """Closed-form Cholesky of a packed-symmetric matrix in column layout
    (list of ``n_tri`` like-shaped arrays; returns lower-triangular
    ``L[i][j]``, j <= i, unrolled at trace time — Mosaic-safe).

    Float32-stable: normalized to correlation form (unit diagonal),
    factored with a *relative* pivot floor, rows rescaled.  Without this,
    near-unit correlations make the Schur complements cancel
    catastrophically in f32 (pivot -> ~0, next column -> ~1e20); a
    floored pivot corresponds to ~1e-6 relative noise in a genuinely
    degenerate direction.
    """
    tiny = jnp.asarray(1e-38, p_cols[0].dtype)
    d = [jnp.sqrt(jnp.maximum(p_cols[where[(i, i)]], tiny))
         for i in range(q)]
    rd = [1.0 / di for di in d]
    L = [[None] * (i + 1) for i in range(q)]
    ok = [None] * q     # pivot genuinely positive (not floored)?
    for i in range(q):
        for j in range(i + 1):
            s = p_cols[where[(i, j)]] * (rd[i] * rd[j])
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                ok[i] = s > floor
                L[i][i] = jnp.sqrt(jnp.maximum(s, floor))
            else:
                # a floored pivot marks a (numerically) null direction:
                # the rank-deficient factor has ZEROS below it — dividing
                # cancellation noise by the floored pivot would otherwise
                # blow the remaining columns up by ~1/floor
                L[i][j] = jnp.where(ok[j], s / L[j][j],
                                    jnp.zeros_like(s))
    return [[L[i][j] * d[i] for j in range(i + 1)] for i in range(q)]


def _chol_matvec(q, L, eps_cols):
    """Columns of ``L @ eps`` for a lower-triangular column factor."""
    return [sum(L[i][j] * eps_cols[j] for j in range(i + 1))
            for i in range(q)]


def jvp_jac_flat(ode_flat, n_block, q):
    r"""
    Build a Mosaic-safe block-diagonal Jacobian callable from ``ode_flat``
    alone, via one ``jax.jvp`` per (block, state-column) pair with
    single-entry seed columns (:math:`n_{block} \cdot q` forward-mode
    tangents, unrolled at trace time).  Use when no hand-written
    ``*_jac_flat`` exists; an analytic Jacobian is cheaper.
    """

    def jac_flat(x_cols, th, t):
        def f(cols):
            return ode_flat(cols, th, t)

        out_cols = []
        for j in range(q):
            col = None
            for b in range(n_block):
                seeds = [jnp.zeros((n_block, 1), jnp.float32)
                         for _ in range(q)]
                onehot = jnp.concatenate(
                    [jnp.ones((1, 1), jnp.float32) if bb == b
                     else jnp.zeros((1, 1), jnp.float32)
                     for bb in range(n_block)], axis=0)
                seeds[j] = onehot
                _, tang = jax.jvp(f, (x_cols,), (seeds,))
                piece = tang[b:b + 1, 0:1]
                col = piece if col is None else \
                    jnp.concatenate([col, piece], axis=0)
            out_cols.append(col)
        return out_cols

    return jac_flat


def _pick_chunk(n_steps, target=256):
    """Largest divisor of n_steps that is <= target."""
    best = 1
    for c in range(1, min(target, n_steps) + 1):
        if n_steps % c == 0:
            best = c
    return best




def _const_coefs(prior_weight):
    """If the transition matrix is identical across blocks, return its
    entries as a list-of-lists of Python floats (trace-time constants for
    the kernels); otherwise None."""
    import numpy as np
    try:
        qw = np.asarray(prior_weight)
    except Exception:  # traced values cannot be constants
        return None
    if not np.all(qw == qw[0]):
        return None
    q = qw.shape[-1]
    return [[float(qw[0, i, j]) for j in range(q)] for i in range(q)]


def _static_scaled_qconst(prior_weight_raw, dt, q):
    """Trace-time constants of the Taylor-scaled transition, computed in
    numpy from the *raw* (pre-scaling) prior so it works even when the
    scaling itself is traced under jit.  Returns None if the raw prior is
    a tracer or differs across blocks."""
    import numpy as np
    from scipy.special import gammaln
    try:
        qw = np.asarray(prior_weight_raw, dtype=np.float64)
    except Exception:
        return None
    if not np.all(qw == qw[0]):
        return None
    i = np.arange(q, dtype=np.float64)
    tv = np.sqrt(dt) * dt ** (q - 1.0 - i) / np.exp(gammaln(q - i))
    qs = qw[0] * (tv[None, :] / tv[:, None])
    return [[float(np.float32(qs[i2, j2])) for j2 in range(q)]
            for i2 in range(q)]


# --- forward filter kernel -------------------------------------------------------


def _filter_kernel(ode_flat, jac_flat, mode, chunk, q, n_block, n_tri,
                   q_const, unroll, *refs):
    """One grid step = `chunk` filter steps; state carried in VMEM scratch.

    When the (preconditioned) transition matrix is constant across blocks —
    the IBM prior's Pascal matrix — its entries arrive as trace-time floats
    in ``q_const``, turning the predict matmuls into sparse constant FMAs.
    ``mode`` selects the interrogation scheme traced into the kernel (same
    contract as :func:`_filter_kernel_batch`): ``"kramer"`` (EK1),
    ``"rodeo"`` (EK0, noise :math:`V = W \\Sigma_p W'`), ``"schober"``
    (EK0, zero noise), ``"chkrebtii"`` (rodeo noise, ODE evaluated at a
    posterior-predictive draw using precomputed normals streamed per
    chunk).
    """
    if mode == "chkrebtii":
        (q_ref, r_ref, w_ref, x0_ref, th_ref, tgrid_ref, tv_ref, eps_ref,
         mf_ref, pf_ref, mp_ref, pp_ref, m_scr, p_scr) = refs
    else:
        (q_ref, r_ref, w_ref, x0_ref, th_ref, tgrid_ref, tv_ref,
         mf_ref, pf_ref, mp_ref, pp_ref, m_scr, p_scr) = refs
        eps_ref = None
    pairs, where = _tri_idx(q)
    gi = pl.program_id(0)
    Qm = q_const if q_const is not None else _read_mat_cols(q_ref, q)
    R_cols = [r_ref[:, k:k + 1] for k in range(n_tri)]   # packed triangle
    W_cols = [w_ref[:, j:j + 1] for j in range(q)]
    tv_cols = [tv_ref[:, j:j + 1] for j in range(q)]

    @pl.when(gi == 0)
    def _init():
        m_scr[:] = x0_ref[:]
        p_scr[:] = jnp.zeros((n_block, n_tri), jnp.float32)

    def write_step(ref_m, ref_p, r, m_cols, p_cols):
        for j in range(q):
            ref_m[r, :, j:j + 1] = m_cols[j]
        for k in range(n_tri):
            ref_p[r, :, k:k + 1] = p_cols[k]

    def body(r, carry):
        m_cols = list(carry[:q])
        p_cols = list(carry[q:])
        # predict
        mp_cols = _matvec(q, Qm, m_cols)
        pp_cols = _sym_quadform(q, Qm, p_cols, where)
        pp_cols = [pp_cols[k] + R_cols[k] for k in range(n_tri)]
        if mode == "chkrebtii":
            # interrogate at a posterior-predictive draw (scaled coords)
            Lc = _chol_cols(q, pp_cols, where)
            eta = _chol_matvec(
                q, Lc, [eps_ref[r, :, j:j + 1] for j in range(q)])
            xs_cols = [mp_cols[j] + eta[j] for j in range(q)]
            x_cols = [xs_cols[j] * tv_cols[j] for j in range(q)]
        else:
            # interrogation at the predicted mean (original coordinates)
            x_cols = [mp_cols[j] * tv_cols[j] for j in range(q)]
        t_n = tgrid_ref[gi * chunk + r, 0]
        f0 = ode_flat(x_cols, th_ref, t_n)                 # (nb, 1)
        jd_cols = jac_flat(x_cols, th_ref, t_n) if mode == "kramer" \
            else [None] * q
        H_cols = []
        for j in range(q):
            if jd_cols[j] is None:
                H_cols.append(W_cols[j])
            else:
                H_cols.append(W_cols[j] - jd_cols[j] * tv_cols[j])
        hm = None
        for j in range(q):
            hm = _acc(hm, H_cols[j] * mp_cols[j])
        mm = -f0
        for j in range(q):
            if jd_cols[j] is not None:
                mm = mm + jd_cols[j] * x_cols[j]
        z = -(hm + mm)
        # PH = Pp H' ; S = H Pp H'
        PH_cols = []
        for i in range(q):
            acc = None
            for j in range(q):
                acc = _acc(acc, p_cols_at(pp_cols, where, i, j) * H_cols[j])
            PH_cols.append(acc)
        S = None
        for i in range(q):
            S = _acc(S, H_cols[i] * PH_cols[i])
        if mode in ("rodeo", "chkrebtii"):
            # rodeo interrogation: V = W Pp W' == S, so S_total = 2 S
            S = S + S
        inv_S = 1.0 / S
        gain = [PH_cols[i] * inv_S for i in range(q)]
        mf_cols = [mp_cols[i] + gain[i] * z for i in range(q)]
        # Joseph: (I - K H) Pp (I - K H)'  [+ K V K' for zero-order]
        IKW = [[(1.0 if i == j else 0.0) - gain[i] * H_cols[j]
                for j in range(q)] for i in range(q)]
        pf_cols = _sym_quadform(q, IKW, pp_cols, where)
        if mode in ("rodeo", "chkrebtii"):
            V = S * 0.5
            pf_cols = [pf_cols[k] + gain[i] * gain[j] * V
                       for k, (i, j) in enumerate(pairs)]
        write_step(mp_ref, pp_ref, r, mp_cols, pp_cols)
        write_step(mf_ref, pf_ref, r, mf_cols, pf_cols)
        return tuple(mf_cols) + tuple(pf_cols)

    m0 = [m_scr[:, j:j + 1] for j in range(q)]
    p0 = [p_scr[:, k:k + 1] for k in range(n_tri)]
    # full unroll exposes cross-step instruction-level parallelism to the
    # Mosaic scheduler (the covariance chain of step n+1 can issue while
    # the mean chain of step n drains); Pallas fori_loop supports only
    # unroll = 1 or = num_steps, so unrolling implies a small chunk
    out = jax.lax.fori_loop(0, chunk, body, tuple(m0) + tuple(p0),
                            unroll=True if unroll else 1)
    for j in range(q):
        m_scr[:, j:j + 1] = out[j]
    for k in range(n_tri):
        p_scr[:, k:k + 1] = out[q + k]


def p_cols_at(p_cols, where, i, j):
    return p_cols[where[(i, j)]]


# --- backward smoother kernel: see _smoother_recursion_kernel below -------------


# --- host-side wrappers ------------------------------------------------------------


def _interpret_mode(interpret):
    """Resolve interpret='auto' -> True off-TPU (so CPU tests exercise the
    kernels through the Pallas interpreter)."""
    if interpret != "auto":
        return bool(interpret)
    return jax.default_backend() not in ("tpu", "axon")


def _pack_tri(mat, pairs):
    """(..., q, q) -> packed upper triangle (..., n_tri)."""
    return jnp.stack([mat[..., i, j] for (i, j) in pairs], axis=-1)


def _unpack_tri(packed, q, pairs):
    """Packed (..., n_tri) -> dense symmetric (..., q, q) (scatter-free)."""
    where = {}
    for k, (i, j) in enumerate(pairs):
        where[(i, j)] = k
        where[(j, i)] = k
    rows = [jnp.stack([packed[..., where[(i, j)]] for j in range(q)],
                      axis=-1) for i in range(q)]
    return jnp.stack(rows, axis=-2)


def resolve_kalman_type(kalman_type):
    r"""
    Normalize/validate the fused entries' ``kalman_type``.

    The fused pipelines propagate covariances in Joseph form —
    :math:`(I-KH)\Sigma(I-KH)' + KVK'`, a sum of congruences of PSD
    matrices — which is PSD-by-construction exactly like the reference's
    square-root (QR) form (``/root/reference/src/rodeo/kalmantv/
    square_root.py``); combined with the Taylor preconditioning it covers
    the f32-robustness role that form plays upstream.  The *likelihood
    value* of fenrir/dalton/basic is determined by the propagated
    covariances and is therefore form-independent: both ``"standard"``
    and ``"sqrt"`` ride the same kernels (parity vs the f64 square-root
    reference is tested).  Solution entries (``solve_mv_fused*``) honor
    the square-root output contract by returning Cholesky factors of the
    smoothed covariances (same Gram as the reference's QR factors, which
    are only ever defined up to a right orthogonal transform).
    """
    valid = {"standard": "standard", "sqrt": "sqrt",
             "square-root": "sqrt", "square_root": "sqrt"}
    if kalman_type not in valid:
        raise ValueError(
            "kalman_type must be one of 'standard', 'sqrt'/'square-root'; "
            f"got {kalman_type!r}")
    return valid[kalman_type]


def normalize_prior_pars(kalman_type, prior_pars):
    """Covariance-form ``(prior_weight, prior_var)``: the square-root API
    passes variances as factors (:mod:`rodeo_tpu.kalmantv.square_root`
    ``predict`` contract, e.g. ``prior_pars=(W, cholesky(var))``), while
    the fused pipelines propagate covariances — square the factor so the
    sqrt caller's arguments are drop-in.  ``kalman_type`` must already be
    normalized by :func:`resolve_kalman_type`."""
    if kalman_type == "sqrt" and prior_pars is not None:
        w, v = prior_pars
        return (w, v @ jnp.swapaxes(v, -1, -2))
    return prior_pars


def normalize_meas_var(kalman_type, var_meas):
    """Covariance-form Gaussian measurement variance (the square-root API
    passes ``obs_var`` as a factor); see :func:`normalize_prior_pars`."""
    if kalman_type == "sqrt" and var_meas is not None:
        return var_meas @ jnp.swapaxes(var_meas, -1, -2)
    return var_meas


def chol_packed(packed, q, floor=1e-12, axis=-1):
    r"""
    Closed-form lower Cholesky of packed-symmetric covariances, staying in
    the packed layout (no dense ``(q, q)`` materialization: one batched
    elementwise recurrence over the whole array, unrolled at trace time).

    ``packed`` carries the upper-triangle pairs ``(i, j), i <= j`` of
    :func:`_tri_idx` along ``axis``; the returned array has the same shape
    with entry ``k = (i, j)`` holding the *lower* factor element
    ``L[j, i]`` (``sum_k L[i,k] L[j,k] = P[i,j]``); expand with
    :func:`unpack_chol`.  Correlation-normalized with a relative pivot
    floor (same f32 stabilization as :func:`_chol_cols`); exactly-zero
    covariances (e.g. the Dirac initial state) factor to ~0.
    """
    pairs, where = _tri_idx(q)
    axis = axis % packed.ndim
    cols = [jnp.take(packed, k, axis=axis) for k in range(len(pairs))]
    tiny = jnp.asarray(jnp.finfo(packed.dtype).tiny, packed.dtype)
    d = [jnp.sqrt(jnp.maximum(cols[where[(i, i)]], tiny)) for i in range(q)]
    L = [[None] * (i + 1) for i in range(q)]
    ok = [None] * q
    for i in range(q):
        for j in range(i + 1):
            s = cols[where[(j, i)]] / (d[i] * d[j])
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                ok[i] = s > floor
                L[i][i] = jnp.sqrt(jnp.maximum(s, floor))
            else:
                # zero below floored pivots (rank-deficient factor) — see
                # _chol_cols: dividing by the floored pivot blows the
                # remaining columns up by ~1/floor
                L[i][j] = jnp.where(ok[j], s / L[j][j],
                                    jnp.zeros_like(s))
    out = [L[j][i] * d[j] for (i, j) in pairs]
    return jnp.stack(out, axis=axis)


def unpack_chol(packed):
    """Expand a packed lower-Cholesky factor (..., n_tri) as produced by
    :func:`chol_packed` into a dense lower-triangular (..., q, q) matrix
    (host-side convenience for lane slices of the square-root form's
    ``solve_mv_fused_batch`` output)."""
    n_tri = packed.shape[-1]
    q = {1: 1, 3: 2, 6: 3, 10: 4, 15: 5}[n_tri]
    pairs, _ = _tri_idx(q)
    where = {(i, j): k for k, (i, j) in enumerate(pairs)}
    zero = jnp.zeros_like(packed[..., 0])
    rows = [jnp.stack([packed[..., where[(j, i)]] if j <= i else zero
                       for j in range(q)], axis=-1) for i in range(q)]
    return jnp.stack(rows, axis=-2)


def fused_filter(ode_flat, jac_flat, n_steps,
                 prior_weight, prior_var, ode_weight, ode_init,
                 theta_col, tgrid, t_vec, chunk=None, interpret="auto",
                 raw_q_const=None, unroll=False, mode=None, eps=None):
    """Invoke the fused forward-filter kernel (preconditioned inputs).

    ``mode`` selects the interrogation (default ``"kramer"`` when
    ``jac_flat`` is given, else ``"rodeo"``); ``mode="chkrebtii"``
    additionally requires ``eps`` of shape ``(n_steps, n_block, q)``
    (standard normals for the in-kernel posterior-predictive draws).

    Returns stacked ``(n_steps, n_block, q / n_tri)`` filtered/predicted
    moments for steps ``1..n_steps`` (covariances packed upper-triangular).
    """
    n_block, q = ode_init.shape
    pairs, _ = _tri_idx(q)
    n_tri = len(pairs)
    if mode is None:
        mode = "kramer" if jac_flat is not None else "rodeo"
    if mode == "chkrebtii" and eps is None:
        raise ValueError("mode='chkrebtii' requires eps draws")
    if chunk is None:
        chunk = _pick_chunk(n_steps, target=16 if unroll else 256)
    if n_steps % chunk:
        raise ValueError(
            f"chunk={chunk} must divide n_steps={n_steps} (a non-dividing "
            "chunk would silently drop the last steps); omit chunk= to "
            "auto-pick a divisor")
    n_chunks = n_steps // chunk
    q_const = _const_coefs(prior_weight)
    if q_const is None:
        q_const = raw_q_const
    kern = functools.partial(_filter_kernel, ode_flat, jac_flat, mode,
                             chunk, q, n_block, n_tri, q_const, unroll)
    outs = [
        jax.ShapeDtypeStruct((n_steps, n_block, q), jnp.float32),
        jax.ShapeDtypeStruct((n_steps, n_block, n_tri), jnp.float32),
        jax.ShapeDtypeStruct((n_steps, n_block, q), jnp.float32),
        jax.ShapeDtypeStruct((n_steps, n_block, n_tri), jnp.float32),
    ]
    rep2 = pl.BlockSpec((n_block, q * q), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    repw = pl.BlockSpec((n_block, q), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [
        rep2,                                             # Q
        pl.BlockSpec((n_block, n_tri), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),            # R packed
        repw,                                             # W
        repw,                                             # x0
        pl.BlockSpec(theta_col.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),            # theta
        pl.BlockSpec((n_steps, 1), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),            # tgrid (full)
        pl.BlockSpec((1, q), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),            # t_vec
    ]
    out_specs = [
        pl.BlockSpec((chunk, n_block, q), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, n_block, n_tri), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, n_block, q), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, n_block, n_tri), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    R_packed = _pack_tri(prior_var, pairs)
    inputs = [
        prior_weight.reshape(n_block, q * q).astype(jnp.float32),
        R_packed.astype(jnp.float32),
        ode_weight.astype(jnp.float32),
        ode_init.astype(jnp.float32),
        theta_col.astype(jnp.float32),
        tgrid[:, None].astype(jnp.float32),
        t_vec[None, :].astype(jnp.float32),
    ]
    if mode == "chkrebtii":
        in_specs.append(pl.BlockSpec((chunk, n_block, q),
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))  # eps
        inputs.append(eps.astype(jnp.float32))
    return pl.pallas_call(
        kern, out_shape=outs, grid=(n_chunks,),
        in_specs=in_specs, out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((n_block, q), jnp.float32),
            pltpu.VMEM((n_block, n_tri), jnp.float32),
        ],
        interpret=_interpret_mode(interpret),
    )(*inputs)


def fused_smoother(n_steps, prior_weight, prior_var,
                   mf, pf, mp, pp, mfN, pfN,
                   chunk=None, interpret="auto"):
    """Invoke the fused backward-smoother kernel.

    The smoothing gains/offsets depend only on the *filter* outputs, so
    they are precomputed here as large batched XLA ops (vectorized over
    the whole time axis — MXU/VPU-friendly); the Pallas kernel then runs
    only the irreducibly sequential recursion
    ``m_n = g_n + G_n m_{n+1}``, ``P_n = L_n + G_n P_{n+1} G_n'``,
    whose dependency chain is ~4x shorter than recomputing gains in-loop.

    Args:
        mf, pf: filtered moments for steps ``1..n_steps-1``
            (length ``n_steps - 1``; covariances packed upper-triangular).
        mp, pp: predicted moments for steps ``2..n_steps`` (same length,
            already shifted so row ``r`` holds step ``r+2``).
        mfN, pfN: terminal filtered moments (the smoothing seed).

    Returns smoothed moments for steps ``1..n_steps-1`` (packed).
    """
    from rodeo_tpu.ops.linalg import inv_small
    from rodeo_tpu.utils import mtt, mvdot

    n_len = mf.shape[0]
    n_block, q = mf.shape[1], mf.shape[2]
    pairs, _ = _tri_idx(q)
    n_tri = len(pairs)
    if chunk is None:
        chunk = _pick_chunk(n_len)
    if n_len % chunk:
        raise ValueError(
            f"chunk={chunk} must divide the time axis ({n_len}); omit "
            "chunk= to auto-pick a divisor")
    n_chunks = n_len // chunk

    # batched gain precompute: G = Pf Q' Pp^{-1}, g = mf - G mp, and the
    # Joseph-form offset L = (I - G Q) Pf (I - G Q)' + G R G'
    # (PSD-preserving in float32, unlike the Pf - G Pp G' subtraction)
    Pf = _unpack_tri(pf, q, pairs)
    Pp = _unpack_tri(pp, q, pairs)
    G = (Pf @ mtt(prior_weight)) @ inv_small(Pp)
    g = mf - mvdot(G, mp)
    IGQ = jnp.eye(q, dtype=Pf.dtype) - G @ prior_weight
    L = IGQ @ Pf @ mtt(IGQ) + G @ prior_var @ mtt(G)
    L = 0.5 * (L + mtt(L))
    G_flat = G.reshape(n_len, n_block, q * q).astype(jnp.float32)
    L_packed = _pack_tri(L, pairs).astype(jnp.float32)

    kern = functools.partial(_smoother_recursion_kernel, chunk, q, n_block,
                             n_tri)
    outs = [
        jax.ShapeDtypeStruct((n_len, n_block, q), jnp.float32),
        jax.ShapeDtypeStruct((n_len, n_block, n_tri), jnp.float32),
    ]
    rev = lambda i: (n_chunks - 1 - i, 0, 0)
    in_specs = [
        pl.BlockSpec((chunk, n_block, q), rev,
                     memory_space=pltpu.VMEM),            # g
        pl.BlockSpec((chunk, n_block, q * q), rev,
                     memory_space=pltpu.VMEM),            # G
        pl.BlockSpec((chunk, n_block, n_tri), rev,
                     memory_space=pltpu.VMEM),            # L
        pl.BlockSpec((n_block, q), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),            # terminal mean
        pl.BlockSpec((n_block, n_tri), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),            # terminal cov
    ]
    out_specs = [
        pl.BlockSpec((chunk, n_block, q), rev,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, n_block, n_tri), rev,
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kern, out_shape=outs, grid=(n_chunks,),
        in_specs=in_specs, out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((n_block, q), jnp.float32),
            pltpu.VMEM((n_block, n_tri), jnp.float32),
        ],
        interpret=_interpret_mode(interpret),
    )(g.astype(jnp.float32), G_flat, L_packed, mfN, pfN)


def _smoother_recursion_kernel(chunk, q, n_block, n_tri,
                               g_ref, G_ref, L_ref, mfN_ref, pfN_ref,
                               ms_ref, ps_ref,
                               m_scr, p_scr):
    """Bare backward recursion over precomputed (g, G, L), streamed in
    reverse chunk order with the smoothed state carried in VMEM scratch."""
    pairs, where = _tri_idx(q)
    gi = pl.program_id(0)

    @pl.when(gi == 0)
    def _seed():
        m_scr[:] = mfN_ref[:]
        p_scr[:] = pfN_ref[:]

    def body(k, carry):
        r = chunk - 1 - k
        ms_cols = list(carry[:q])
        ps_cols = list(carry[q:])
        G = [[G_ref[r, :, i * q + j:i * q + j + 1] for j in range(q)]
             for i in range(q)]
        m_out = []
        for i in range(q):
            acc = g_ref[r, :, i:i + 1]
            for j in range(q):
                acc = acc + G[i][j] * ms_cols[j]
            m_out.append(acc)
        gpg = _sym_quadform(q, G, ps_cols, where)
        p_out = [L_ref[r, :, kk:kk + 1] + gpg[kk] for kk in range(n_tri)]
        for j in range(q):
            ms_ref[r, :, j:j + 1] = m_out[j]
        for kk in range(n_tri):
            ps_ref[r, :, kk:kk + 1] = p_out[kk]
        return tuple(m_out) + tuple(p_out)

    m_in = [m_scr[:, j:j + 1] for j in range(q)]
    p_in = [p_scr[:, k:k + 1] for k in range(n_tri)]
    out = jax.lax.fori_loop(0, chunk, body, tuple(m_in) + tuple(p_in))
    for j in range(q):
        m_scr[:, j:j + 1] = out[j]
    for k in range(n_tri):
        p_scr[:, k:k + 1] = out[q + k]


def resolve_interrogation(interrogate, interrogation, jac_flat):
    """Resolve the fused kernels' interrogation ``mode`` from either the
    explicit ``interrogation=`` enum or the ``interrogate=`` callable of
    the :func:`rodeo_tpu.solve.solve_mv` API — validated, never silently
    ignored (a caller passing ``interrogate_chkrebtii`` must get chkrebtii
    semantics or an error, not a different algorithm)."""
    valid = ("kramer", "rodeo", "schober", "chkrebtii")
    if interrogation is not None:
        if interrogation not in valid:
            raise ValueError(
                f"interrogation must be one of {valid}, got "
                f"{interrogation!r}")
        mode = interrogation
    elif interrogate is None:
        mode = "kramer" if jac_flat is not None else "rodeo"
    else:
        from rodeo_tpu import interrogate as _imod
        by_callable = {
            _imod.interrogate_kramer: "kramer",
            _imod.interrogate_rodeo: "rodeo",
            _imod.interrogate_schober: "schober",
            _imod.interrogate_chkrebtii: "chkrebtii",
        }
        mode = by_callable.get(interrogate)
        if mode is None:
            raise ValueError(
                "the fused kernels support only the built-in "
                "interrogations (rodeo_tpu.interrogate.interrogate_"
                "{kramer,rodeo,schober,chkrebtii}); got an unrecognized "
                f"callable {interrogate!r} — use rodeo_tpu.solve / "
                "rodeo_tpu.ops.precond for custom interrogations")
    if mode == "kramer" and jac_flat is None:
        raise ValueError(
            "interrogation='kramer' (EK1) requires a `jac_flat` callable")
    return mode


def solve_mv_fused(key, ode_fun, ode_weight, ode_init,
                   t_min, t_max, n_steps,
                   interrogate=None,
                   prior_pars=None,
                   ode_flat=None, jac_flat=None, interpret="auto",
                   chunk=None, k_compose=None, unroll=False,
                   interrogation=None, kalman_type="standard", **params):
    r"""
    Posterior mean/variance of the ODE solve via fused Pallas kernels.

    Matches :func:`rodeo_tpu.solve.solve_mv` (standard filter,
    Taylor-preconditioned internally) for configurations with one
    measurement row per block and ``q <= 5``.  The ODE enters through
    Mosaic-safe ``ode_flat(x_cols, th, t) -> (n_block, 1)`` and (for EK1)
    ``jac_flat(x_cols, th, t) -> [q columns or None]`` callables; models in
    :mod:`rodeo_tpu.models` provide them.

    The interrogation scheme is taken from ``interrogation=`` (``"kramer"
    | "rodeo" | "schober" | "chkrebtii"``) or inferred from a built-in
    ``interrogate=`` callable; default kramer when ``jac_flat`` is given,
    rodeo otherwise.  ``"chkrebtii"`` requires ``key``.  Unrecognized
    custom interrogations raise (use the XLA paths for those).

    With ``kalman_type="sqrt"`` (or ``"square-root"``) the returned
    variances are lower-Cholesky *factors* of the smoothed covariances,
    matching the square-root form's output contract
    (:mod:`rodeo_tpu.kalmantv.square_root`); the propagation itself rides
    the same Joseph-form kernels, which are PSD-by-construction — see
    :func:`resolve_kalman_type`.

    Returns:
        (tuple): ``mean_state_smooth``, ``var_state_smooth`` with shapes
        ``(n_steps+1, n_block, q[, q])`` (``var`` is a Cholesky factor
        under the square-root form).
    """
    if ode_flat is None:
        raise ValueError(
            "solve_mv_fused requires a Mosaic-safe `ode_flat` callable "
            "(see rodeo_tpu.models.*_flat)")
    kalman_type = resolve_kalman_type(kalman_type)
    prior_pars = normalize_prior_pars(kalman_type, prior_pars)
    mode = resolve_interrogation(interrogate, interrogation, jac_flat)
    n_block, n_bmeas, q = ode_weight.shape
    if n_bmeas != 1:
        raise NotImplementedError("fused kernels require n_bmeas == 1")
    pairs, _ = _tri_idx(q)
    dt = (t_max - t_min) / n_steps
    t_vec = taylor_scale(dt, q, dtype=jnp.float32)
    Qs, Rs = scale_prior(prior_pars, t_vec)
    raw_q_const = _static_scaled_qconst(prior_pars[0], dt, q)
    W_s = (ode_weight * t_vec[None, None, :])[:, 0, :]
    x0_s = (ode_init / t_vec).astype(jnp.float32)
    tgrid = t_min + (t_max - t_min) * (jnp.arange(n_steps) + 1) / n_steps
    theta = params.get("theta")
    theta_col = jnp.zeros((1, 1), jnp.float32) if theta is None \
        else jnp.asarray(theta)[:, None]

    eps = None
    if mode == "chkrebtii":
        if key is None:
            raise ValueError("interrogation='chkrebtii' requires a key")
        eps = jax.random.normal(key, (n_steps, n_block, q), jnp.float32)
    mf, pf, mp, pp = fused_filter(
        ode_flat, jac_flat, n_steps, Qs, Rs, W_s, x0_s,
        theta_col, tgrid, t_vec, chunk=chunk, interpret=interpret,
        raw_q_const=raw_q_const, unroll=unroll, mode=mode, eps=eps)
    # smoother over steps 1..n_steps-1 (terminal = filtered at n_steps).
    # DEFAULT k_compose=16: the plain backward recursion's gain is
    # unipotent in the Taylor-scaled coordinates (Pascal-like, eigenvalues
    # 1 with Jordan blocks), so float32 rounding noise amplifies
    # POLYNOMIALLY over a long sequential recursion (measured: O(1e4)
    # absolute drift over 10k steps on real TPU, caught by the bench
    # accuracy audit); k-step composition injects noise only at N/k
    # boundary steps and recovers interiors in one batched apply, landing
    # at the f32-CPU control accuracy.  Pass k_compose=1 to force the
    # plain recursion (short horizons only).
    if k_compose is None and n_steps >= 512:
        k_compose = 16
    if k_compose is not None and k_compose > 1:
        ms, ps = fused_smoother_composed(
            n_steps, Qs, Rs,
            mf[:-1], pf[:-1], mp[1:], pp[1:], mf[-1], pf[-1],
            raw_q_const=raw_q_const, k_compose=k_compose,
            chunk=chunk, interpret=interpret)
    else:
        ms, ps = fused_smoother(
            n_steps, Qs, Rs,
            mf[:-1], pf[:-1], mp[1:], pp[1:], mf[-1], pf[-1],
            chunk=chunk, interpret=interpret)
    # assemble (n_steps+1) rows: exact init, smoothed 1..N-1, filtered N
    zero_m = x0_s[None]
    zero_p = jnp.zeros((1, n_block, len(pairs)), jnp.float32)
    ms_full = jnp.concatenate([zero_m, ms, mf[-1][None]])
    ps_full = jnp.concatenate([zero_p, ps, pf[-1][None]])
    # unscale back to original coordinates
    t_v = t_vec.astype(ms_full.dtype)
    mean_out = ms_full * t_v
    if kalman_type == "sqrt":
        # factor in packed (scaled) coordinates, unscale rows: if
        # F F' = P_scaled then (T F)(T F)' = T P_scaled T = P
        f_packed = chol_packed(ps_full, q, axis=-1)
        return mean_out, unpack_chol(f_packed) * t_v[:, None]
    var_out = _unpack_tri(ps_full, q, pairs) * (t_v[:, None] * t_v[None, :])
    return mean_out, var_out


# --- k-step composed smoother (latency path) ----------------------------------------
#
# The smoother recursion  m_n = g_n + G_n m_{n+1},  P_n = L_n + G_n P_{n+1} G_n'
# is affine, so k consecutive steps compose exactly into one step of the
# same form:  (G, g, L)_{i..j} = (G_i G_j, g_i + G_i g_j, L_i + G_i L_j G_i').
# Composites are batched XLA ops over the whole time axis (cheap), the
# sequential Pallas kernel then runs only N/k boundary steps (k x shorter
# dependency chain), and the k-1 interior steps of every group recover in
# ONE batched application of the suffix composites to the boundary values.
# Exact in exact arithmetic; fp differs only by reassociation.


def _affine_cov_compose(q, n_tri, where, early, late):
    """Compose two affine-covariance smoother elements in column layout:
    ``early`` then (to its right in time) ``late``; each is
    (G list-of-lists, g list, L packed list) of like-shaped columns."""
    G_i, g_i, L_i = early
    G_j, g_j, L_j = late
    G = [[None] * q for _ in range(q)]
    for i in range(q):
        for j in range(q):
            acc = None
            for l in range(q):
                acc = _acc(acc, G_i[i][l] * G_j[l][j])
            G[i][j] = acc
    g = [g_i[i] + sum(G_i[i][l] * g_j[l] for l in range(q))
         for i in range(q)]
    GLG = _sym_quadform(q, G_i, L_j, where)
    L = [L_i[k] + GLG[k] for k in range(n_tri)]
    return G, g, L


def fused_smoother_composed(n_steps, prior_weight, prior_var,
                            mf, pf, mp, pp, mfN, pfN, raw_q_const,
                            k_compose=8, chunk=None, interpret="auto"):
    """As :func:`fused_smoother`, but with the sequential recursion
    shortened ``k_compose``-fold by exact k-step composition (see module
    comment above).  Returns smoothed moments for steps ``1..n_steps-1``
    (packed covariances), identical to :func:`fused_smoother` up to fp
    reassociation.
    """
    n_len = mf.shape[0]
    n_block, q = mf.shape[1], mf.shape[2]
    pairs, where = _tri_idx(q)
    n_tri = len(pairs)
    q_const = _const_coefs(prior_weight)
    if q_const is None:
        q_const = raw_q_const
    if q_const is None:
        raise NotImplementedError(
            "fused_smoother_composed requires a block-constant transition "
            "available at trace time (a concrete block-constant "
            "prior, e.g. ibm_init, built/cast OUTSIDE jit — an "
            "astype/scale applied inside a jitted closure turns it "
            "into a tracer)")

    # per-step (G, g, L) in column layout (T, nb)
    R_packed = _pack_tri(prior_var, pairs)
    R_cols_b = [R_packed[None, :, kk] for kk in range(n_tri)]
    mf_cols = [mf[:, :, j] for j in range(q)]
    pf_cols = [pf[:, :, kk] for kk in range(n_tri)]
    mpn_cols = [mp[:, :, j] for j in range(q)]
    ppn_cols = [pp[:, :, kk] for kk in range(n_tri)]
    G, g, L = _gain_cols_batched(q, n_tri, q_const, R_cols_b,
                                 mf_cols, pf_cols, mpn_cols, ppn_cols)

    # front-pad with identity elements so k divides the axis — and so
    # the GROUP count is a multiple of 8: n_groups is the boundary
    # kernel's grid axis, and an awkward count (e.g. 157, prime, at
    # k=64 on a 10k grid) forces chunk=1, i.e. one grid step of DMA
    # overhead per composed row (identity elements are exact no-ops,
    # so extra pad costs only n_pad*k batched-compose lanes)
    k = max(1, int(k_compose))
    n_groups = -(-n_len // k)
    if n_groups >= 16:
        n_groups = -(-n_groups // 8) * 8
    n_rows = n_groups * k
    pad = n_rows - n_len

    def pad_front(col, fill):
        if pad == 0:
            return col
        return jnp.concatenate(
            [jnp.full((pad, n_block), fill, col.dtype), col])

    G = [[pad_front(G[i][j], 1.0 if i == j else 0.0) for j in range(q)]
         for i in range(q)]
    g = [pad_front(g[i], 0.0) for i in range(q)]
    L = [pad_front(L[kk], 0.0) for kk in range(n_tri)]

    # suffix composites within each group: comp[i] composes offsets i..k-1
    # (comp[0] = the full-group composite used by the boundary kernel)
    def grp(col):                                  # (n_groups, k, nb)
        return col.reshape(n_groups, k, n_block)
    Gg = [[grp(G[i][j]) for j in range(q)] for i in range(q)]
    gg = [grp(g[i]) for i in range(q)]
    Lg = [grp(L[kk]) for kk in range(n_tri)]
    comp = [None] * k
    comp[k - 1] = ([[Gg[i][j][:, k - 1] for j in range(q)]
                    for i in range(q)],
                   [gg[i][:, k - 1] for i in range(q)],
                   [Lg[kk][:, k - 1] for kk in range(n_tri)])
    for i in range(k - 2, -1, -1):
        elem_i = ([[Gg[a][b][:, i] for b in range(q)] for a in range(q)],
                  [gg[a][:, i] for a in range(q)],
                  [Lg[kk][:, i] for kk in range(n_tri)])
        comp[i] = _affine_cov_compose(q, n_tri, where, elem_i, comp[i + 1])

    # boundary recursion over n_groups composed steps (sequential kernel)
    Gc, gc, Lc = comp[0]
    g_b = jnp.stack(gc, axis=-1)                   # (n_groups, nb, q)
    G_b = jnp.stack([Gc[i][j] for i in range(q) for j in range(q)],
                    axis=-1)                       # (n_groups, nb, q*q)
    L_b = jnp.stack(Lc, axis=-1)                   # (n_groups, nb, n_tri)
    if chunk is None:
        chunk = _pick_chunk(n_groups)
    n_chunks = n_groups // chunk
    kern = functools.partial(_smoother_recursion_kernel, chunk, q, n_block,
                             n_tri)
    rev = lambda i: (n_chunks - 1 - i, 0, 0)
    outs = [
        jax.ShapeDtypeStruct((n_groups, n_block, q), jnp.float32),
        jax.ShapeDtypeStruct((n_groups, n_block, n_tri), jnp.float32),
    ]
    in_specs = [
        pl.BlockSpec((chunk, n_block, q), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, n_block, q * q), rev,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, n_block, n_tri), rev,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_block, q), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_block, n_tri), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((chunk, n_block, q), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, n_block, n_tri), rev,
                     memory_space=pltpu.VMEM),
    ]
    mb, pb = pl.pallas_call(
        kern, out_shape=outs, grid=(n_chunks,),
        in_specs=in_specs, out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((n_block, q), jnp.float32),
            pltpu.VMEM((n_block, n_tri), jnp.float32),
        ],
        interpret=_interpret_mode(interpret),
    )(g_b.astype(jnp.float32),
      G_b.reshape(n_groups, n_block, q * q).astype(jnp.float32),
      L_b.astype(jnp.float32), mfN, pfN)
    # mb[g] = smoothed state at the LEFT edge of group g (row g*k - pad,
    # i.e. offset 0); right-boundary value for group g is mb[g+1] (or the
    # terminal seed for the last group)
    mb_right = jnp.concatenate([mb[1:], mfN[None]])    # (n_groups, nb, q)
    pb_right = jnp.concatenate([pb[1:], pfN[None]])

    # interior recovery: offsets 1..k-1 of every group, one batched op
    mb_r_cols = [mb_right[:, :, j] for j in range(q)]
    pb_r_cols = [pb_right[:, :, kk] for kk in range(n_tri)]
    rows_m = [[mb[:, :, j] for j in range(q)]]         # offset 0 = kernel
    rows_p = [[pb[:, :, kk] for kk in range(n_tri)]]
    for i in range(1, k):
        Gi, gi, Li = comp[i]
        m_i = []
        for a in range(q):
            acc = gi[a]
            for b in range(q):
                acc = acc + Gi[a][b] * mb_r_cols[b]
            m_i.append(acc)
        GP = _sym_quadform(q, Gi, pb_r_cols, where)
        p_i = [Li[kk] + GP[kk] for kk in range(n_tri)]
        rows_m.append(m_i)
        rows_p.append(p_i)
    # interleave offsets back into the time axis: (n_groups, k, nb, d)
    ms = jnp.stack([jnp.stack(rm, axis=-1) for rm in rows_m],
                   axis=1).reshape(n_rows, n_block, q)
    ps = jnp.stack([jnp.stack(rp, axis=-1) for rp in rows_p],
                   axis=1).reshape(n_rows, n_block, n_tri)
    return ms[pad:], ps[pad:]


# --- lane-batched variants ---------------------------------------------------------
#
# Every op in the fused kernels is elementwise over a trailing lane axis, so
# up to ~128 independent solves (parameter candidates, MCMC chains) ride one
# kernel at nearly the wall-clock of a single solve: columns become
# ``(n_block, n_lane)`` tiles and the TPU vector lanes do the batching.
# This is the throughput path; the unbatched kernels above are the latency
# path.


def _filter_kernel_batch(ode_flat, jac_flat, mode, chunk, q, n_block,
                         n_tri, n_lane, q_const, emit,
                         *refs):
    """Lane-batched forward filter: state columns are (n_block, n_lane).

    ``mode`` selects the interrogation scheme traced into the kernel:

    - ``"kramer"``  (EK1): first-order linearization via ``jac_flat``,
      zero measurement noise;
    - ``"rodeo"``   (EK0): zero-order, noise :math:`V = W \\Sigma_p W'`;
    - ``"schober"``: zero-order, zero noise;
    - ``"chkrebtii"``: like rodeo (same :math:`V`), but the ODE is evaluated at a draw
      :math:`x^* = \\mu_p + \\mathrm{chol}(\\Sigma_p)\\,\\epsilon_n` with
      the standard normals :math:`\\epsilon` precomputed OUTSIDE the
      kernel and streamed in per chunk (the in-kernel work is one packed
      column Cholesky + triangular matvec per step).

    ``emit`` selects the kernel outputs (compile-time):

    - ``"states"``: per-step filtered/predicted mean+cov (4 streams) —
      the raw-material layout, whose consumers then compute smoothing
      gains in a separate batched XLA stage;
    - ``"gains"``: per-step smoothing gains ``(G, g, L)`` computed
      in-register off the carry (filtered n-1) and the fresh prediction
      (n), plus the final filtered state.  Same total output traffic as
      "states" (18 columns/step) but the HBM round-trip of the XLA
      gains stage — measured at 44% of the fenrir fused-batch pass at
      512 lanes — disappears entirely.
    """
    if mode == "chkrebtii":
        if emit == "gains":
            (q_ref, r_ref, w_ref, x0_ref, th_ref, tgrid_ref, tv_ref,
             eps_ref, A_ref, b_ref, C_ref, mlast_ref, plast_ref,
             m_scr, p_scr) = refs
        else:
            (q_ref, r_ref, w_ref, x0_ref, th_ref, tgrid_ref, tv_ref,
             eps_ref, mf_ref, pf_ref, mp_ref, pp_ref, m_scr, p_scr) = refs
    else:
        if emit == "gains":
            (q_ref, r_ref, w_ref, x0_ref, th_ref, tgrid_ref, tv_ref,
             A_ref, b_ref, C_ref, mlast_ref, plast_ref,
             m_scr, p_scr) = refs
        else:
            (q_ref, r_ref, w_ref, x0_ref, th_ref, tgrid_ref, tv_ref,
             mf_ref, pf_ref, mp_ref, pp_ref, m_scr, p_scr) = refs
        eps_ref = None
    pairs, where = _tri_idx(q)
    gi = pl.program_id(0)
    Qm = q_const if q_const is not None else _read_mat_cols(q_ref, q)
    R_cols = [r_ref[:, k:k + 1] for k in range(n_tri)]     # (nb,1) bcast
    W_cols = [w_ref[:, j:j + 1] for j in range(q)]
    tv_cols = [tv_ref[:, j:j + 1] for j in range(q)]       # (1,1) bcast

    @pl.when(gi == 0)
    def _init():
        for j in range(q):
            m_scr[j] = x0_ref[j]
        for k in range(n_tri):
            p_scr[k] = jnp.zeros((n_block, n_lane), jnp.float32)

    def body(r, carry):
        m_cols = list(carry[:q])
        p_cols = list(carry[q:])
        mp_cols = _matvec(q, Qm, m_cols)
        pp_cols = _sym_quadform(q, Qm, p_cols, where)
        pp_cols = [pp_cols[k] + R_cols[k] for k in range(n_tri)]
        if emit == "gains":
            # smoothing gain for the transition (n-1 -> n): everything it
            # needs (filtered n-1 = the carry, predicted n = fresh) is in
            # registers right now
            G, g, L = _gain_cols_batched(q, n_tri, Qm, R_cols,
                                         m_cols, p_cols, mp_cols, pp_cols)
            for i in range(q):
                for j in range(q):
                    A_ref[r, i * q + j] = G[i][j]
            for i in range(q):
                b_ref[r, i] = g[i]
            for k in range(n_tri):
                C_ref[r, k] = L[k]
        if mode == "chkrebtii":
            # interrogate at a posterior-predictive draw (scaled coords)
            Lc = _chol_cols(q, pp_cols, where)
            eta = _chol_matvec(q, Lc, [eps_ref[r, j] for j in range(q)])
            xs_cols = [mp_cols[j] + eta[j] for j in range(q)]
            x_cols = [xs_cols[j] * tv_cols[j] for j in range(q)]
        else:
            x_cols = [mp_cols[j] * tv_cols[j] for j in range(q)]
        t_n = tgrid_ref[gi * chunk + r, 0]
        f0 = ode_flat(x_cols, th_ref, t_n)                 # (nb, B)
        jd_cols = jac_flat(x_cols, th_ref, t_n) if mode == "kramer" \
            else [None] * q
        H_cols = []
        for j in range(q):
            if jd_cols[j] is None:
                H_cols.append(W_cols[j])
            else:
                H_cols.append(W_cols[j] - jd_cols[j] * tv_cols[j])
        hm = None
        for j in range(q):
            hm = _acc(hm, H_cols[j] * mp_cols[j])
        mm = -f0
        for j in range(q):
            if jd_cols[j] is not None:
                mm = mm + jd_cols[j] * x_cols[j]
        z = -(hm + mm)
        PH_cols = []
        for i in range(q):
            acc = None
            for j in range(q):
                acc = _acc(acc, p_cols_at(pp_cols, where, i, j) * H_cols[j])
            PH_cols.append(acc)
        S = None
        for i in range(q):
            S = _acc(S, H_cols[i] * PH_cols[i])
        if mode in ("rodeo", "chkrebtii"):
            S = S + S                    # V = W Sigma_p W' doubles S
        inv_S = 1.0 / S
        gain = [PH_cols[i] * inv_S for i in range(q)]
        mf_cols = [mp_cols[i] + gain[i] * z for i in range(q)]
        IKW = [[(1.0 if i == j else 0.0) - gain[i] * H_cols[j]
                for j in range(q)] for i in range(q)]
        pf_cols = _sym_quadform(q, IKW, pp_cols, where)
        if mode in ("rodeo", "chkrebtii"):
            V = S * 0.5
            pf_cols = [pf_cols[k] + gain[i] * gain[j] * V
                       for k, (i, j) in enumerate(pairs)]
        if emit != "gains":
            for j in range(q):
                mp_ref[r, j] = mp_cols[j]
                mf_ref[r, j] = mf_cols[j]
            for k in range(n_tri):
                pp_ref[r, k] = pp_cols[k]
                pf_ref[r, k] = pf_cols[k]
        return tuple(mf_cols) + tuple(pf_cols)

    m0 = [m_scr[j] for j in range(q)]
    p0 = [p_scr[k] for k in range(n_tri)]
    out = jax.lax.fori_loop(0, chunk, body, tuple(m0) + tuple(p0))
    for j in range(q):
        m_scr[j] = out[j]
    for k in range(n_tri):
        p_scr[k] = out[q + k]
    if emit == "gains":
        # constant-index output blocks are revisited every grid step; the
        # final grid step's write is what lands, i.e. the last filtered
        # state — exactly the smoother/terminal-update seed
        for j in range(q):
            mlast_ref[j] = out[j]
        for k in range(n_tri):
            plast_ref[k] = out[q + k]


def _chunk_budget_target(n_lane, n_block=8, n_cols=30,
                         budget_bytes=6 * 2 ** 20):
    """Largest per-grid-step row count whose double-buffered streamed
    blocks fit the VMEM budget (lane dim pads to 128, block dim to the
    next multiple of 8 — lane-FOLDED tiles have ``n_block > 8``, so the
    block dim must be passed or the estimate undercounts VMEM ~3x).
    ``n_cols`` is the number of streamed per-step columns (tiles of
    ``(n_block, n_lane)``) across all in/out streams of the kernel."""
    nb_pad = -(-max(n_block, 1) // 8) * 8
    row_bytes = (n_cols * nb_pad
                 * max(128, ((n_lane + 127) // 128) * 128) * 4)
    return max(4, budget_bytes // (2 * row_bytes))


def _pick_chunk_batch(n_steps, n_lane, n_block=8, n_cols=30,
                      budget_bytes=6 * 2 ** 20):
    """Chunk size keeping the double-buffered output blocks within a VMEM
    budget (lane dim pads to 128, block dim to 8)."""
    return _pick_chunk(
        n_steps, target=_chunk_budget_target(n_lane, n_block, n_cols,
                                             budget_bytes))


def _lane_fold_factor(n_block, n_lane):
    """Lane->sublane fold factor for the batch kernels.

    Column tiles are ``(n_block, n_lane)``; vregs are (8, 128), so a
    small block dim occupies only ``n_block/8`` of every vector op AND
    pads every HBM stream the same way — measured as the 0.39 VPU
    ceiling at ``n_block=3`` (= 3/8).  Folding ``F`` lane groups into
    the sublane dim (tiles ``(n_block*F, n_lane/F)``) makes the tiles
    dense.  ``F = 8/gcd(n_block, 8)`` fills vregs exactly; folding only
    pays (and only applies) when the folded lane dim stays a multiple
    of the 128-lane vreg width.  Per-lane arithmetic is unchanged — the
    fold is a pure relabeling of lanes."""
    best_F, best_occ = 1, n_block / (-(-n_block // 8) * 8)
    for F in (2, 4, 8):
        if n_lane % (F * 128):
            continue
        occ = (n_block * F) / (-(-(n_block * F) // 8) * 8)
        if occ > best_occ + 1e-9:
            best_F, best_occ = F, occ
    return best_F


def _fold_lanes(a, F):
    """Fold ``(..., n_block, n_lane)`` -> ``(..., n_block*F, n_lane/F)``
    (free reshapes: lane ``L = s*(n_lane/F) + l`` maps to sublane group
    ``s`` of its block's ``F`` rows)."""
    if F == 1:
        return a
    shape = a.shape
    nb, nl = shape[-2], shape[-1]
    a = a.reshape(shape[:-1] + (F, nl // F))
    return a.reshape(shape[:-2] + (nb * F, nl // F))


def _unfold_lanes(a, F):
    """Inverse of :func:`_fold_lanes`:
    ``(..., n_block*F, n_lane/F)`` -> ``(..., n_block, n_lane)``."""
    if F == 1:
        return a
    shape = a.shape
    nbf, nlf = shape[-2], shape[-1]
    a = a.reshape(shape[:-2] + (nbf // F, F, nlf))
    return a.reshape(shape[:-2] + (nbf // F, F * nlf))


def _group_sum_rows(x, n_block, fold):
    """Sum the ``n_block`` groups of ``fold`` rows of ``x``
    ``(n_block*fold, L) -> (fold, L)`` — the block-axis reduction that
    respects the lane-fold layout (``fold=1`` reproduces a plain
    keepdims block sum).  Works both inside Mosaic kernels (pure
    slicing + adds) and in XLA wrappers."""
    acc = x[0:fold]
    for b in range(1, n_block):
        acc = acc + x[b * fold:(b + 1) * fold]
    return acc


def fused_filter_batch(ode_flat, jac_flat, n_steps,
                       prior_weight, prior_var, ode_weight, x0_lanes,
                       theta_lanes, tgrid, t_vec, chunk=None,
                       interpret="auto", raw_q_const=None,
                       mode=None, eps=None, emit="states", fold=1):
    """Lane-batched fused forward filter.

    Args:
        x0_lanes (ndarray(q, n_block, n_lane)): Per-lane scaled initial
            states.
        theta_lanes (ndarray(n_theta, n_lane)): Per-lane parameters.
        mode (str | None): Interrogation scheme
            (``"kramer" | "rodeo" | "schober" | "chkrebtii"``; default
            ``"kramer"`` when ``jac_flat`` is given, else ``"rodeo"``).
        eps (ndarray(n_steps, q, n_block, n_lane) | None): Standard
            normals for the ``"chkrebtii"`` interrogation draws.
        emit (str): ``"states"`` (default) or ``"gains"`` — emit per-step
            smoothing gains computed in-register instead of the raw
            filter states, skipping the batched-XLA gains stage (and its
            full HBM round-trip) in the smoothing/backward consumers.
        fold (int): lane->sublane fold factor (:func:`_lane_fold_factor`)
            densifying the ``(n_block, n_lane)`` column tiles to
            ``(n_block*fold, n_lane/fold)`` — up to ``8/n_block`` x on
            both VPU issue slots and HBM streams when ``n_block < 8``.
            All outputs come back in the FOLDED layout (unfold with
            ``_unfold_lanes``); per-lane arithmetic is identical.
        (other args as :func:`fused_filter`; prior/weights shared across
        lanes)

    Returns:
        ``emit="states"``: 4 arrays of shape
        ``(n_steps, q | n_tri, n_block, n_lane)``: filtered mean/cov,
        predicted mean/cov (covs packed).

        ``emit="gains"``: 5 arrays — smoothing gains ``G``
        ``(n_steps, q*q, n_block, n_lane)`` (row-major ``i*q+j``),
        offsets ``g`` ``(n_steps, q, ...)``, Joseph covariances ``L``
        ``(n_steps, n_tri, ...)`` (entry ``n`` maps filtered ``n`` onto
        filtered ``n-1``, with entry 0 seeded by the initial state), and
        the final filtered mean ``(q, n_block, n_lane)`` / packed cov
        ``(n_tri, n_block, n_lane)``.
    """
    q, n_block, n_lane = x0_lanes.shape
    pairs, _ = _tri_idx(q)
    n_tri = len(pairs)
    if mode is None:
        mode = "kramer" if jac_flat is not None else "rodeo"
    if mode == "chkrebtii" and eps is None:
        raise ValueError("mode='chkrebtii' requires eps draws")
    q_const = _const_coefs(prior_weight)
    if q_const is None:
        q_const = raw_q_const
    F = int(fold)
    if F > 1:
        if n_lane % F:
            raise ValueError(f"fold={F} must divide n_lane={n_lane}")
        # fold per-lane data (free reshapes) and repeat the lane-shared
        # per-block rows F times so block b occupies rows b*F:(b+1)*F
        x0_lanes = _fold_lanes(x0_lanes, F)
        theta_lanes = _fold_lanes(theta_lanes, F)
        if eps is not None:
            eps = _fold_lanes(eps, F)
        prior_weight = jnp.repeat(prior_weight, F, axis=0)
        prior_var = jnp.repeat(prior_var, F, axis=0)
        ode_weight = jnp.repeat(ode_weight, F, axis=0)
        n_block, n_lane = n_block * F, n_lane // F
    if chunk is None:
        # streamed per-step columns: 18 for emit="gains" (A 9, b 3,
        # C 6), 30 for emit="states" (4 state streams + chkrebtii eps)
        chunk = _pick_chunk_batch(
            n_steps, n_lane, n_block,
            n_cols=18 if emit == "gains" else 30,
            budget_bytes=12 * 2 ** 20)
    n_chunks = n_steps // chunk
    kern = functools.partial(_filter_kernel_batch, ode_flat, jac_flat,
                             mode, chunk, q, n_block, n_tri, n_lane,
                             q_const, emit)
    if emit == "gains":
        outs = [
            jax.ShapeDtypeStruct((n_steps, q * q, n_block, n_lane),
                                 jnp.float32),
            jax.ShapeDtypeStruct((n_steps, q, n_block, n_lane),
                                 jnp.float32),
            jax.ShapeDtypeStruct((n_steps, n_tri, n_block, n_lane),
                                 jnp.float32),
            jax.ShapeDtypeStruct((q, n_block, n_lane), jnp.float32),
            jax.ShapeDtypeStruct((n_tri, n_block, n_lane), jnp.float32),
        ]
    else:
        outs = [
            jax.ShapeDtypeStruct((n_steps, q, n_block, n_lane), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, n_tri, n_block, n_lane),
                                 jnp.float32),
            jax.ShapeDtypeStruct((n_steps, q, n_block, n_lane), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, n_tri, n_block, n_lane),
                                 jnp.float32),
        ]
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple([0] * len(shape)), memory_space=pltpu.VMEM)
    in_specs = [
        rep((n_block, q * q)),
        rep((n_block, n_tri)),
        rep((n_block, q)),
        rep((q, n_block, n_lane)),
        rep(theta_lanes.shape),
        pl.BlockSpec((n_steps, 1), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        rep((1, q)),
    ]
    operands = [
        prior_weight.reshape(n_block, q * q).astype(jnp.float32),
        _pack_tri(prior_var, pairs).astype(jnp.float32),
        ode_weight.astype(jnp.float32),
        x0_lanes.astype(jnp.float32),
        theta_lanes.astype(jnp.float32),
        tgrid[:, None].astype(jnp.float32),
        t_vec[None, :].astype(jnp.float32),
    ]
    if mode == "chkrebtii":
        in_specs.append(pl.BlockSpec((chunk, q, n_block, n_lane),
                                     lambda i: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(eps.astype(jnp.float32))
    blk = lambda d: pl.BlockSpec((chunk, d, n_block, n_lane),
                                 lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    if emit == "gains":
        out_specs = [blk(q * q), blk(q), blk(n_tri),
                     rep((q, n_block, n_lane)),
                     rep((n_tri, n_block, n_lane))]
    else:
        out_specs = [blk(q), blk(n_tri), blk(q), blk(n_tri)]
    return pl.pallas_call(
        kern, out_shape=outs, grid=(n_chunks,),
        in_specs=in_specs, out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((q, n_block, n_lane), jnp.float32),
            pltpu.VMEM((n_tri, n_block, n_lane), jnp.float32),
        ],
        interpret=_interpret_mode(interpret),
    )(*operands)


def _smoother_kernel_batch(chunk, q, n_block, n_tri, n_lane,
                           g_ref, G_ref, L_ref, mN_ref, pN_ref,
                           ms_ref, ps_ref, m_scr, p_scr):
    """Lane-batched bare smoothing recursion."""
    pairs, where = _tri_idx(q)
    gi = pl.program_id(0)

    @pl.when(gi == 0)
    def _seed():
        for j in range(q):
            m_scr[j] = mN_ref[j]
        for k in range(n_tri):
            p_scr[k] = pN_ref[k]

    def body(k, carry):
        r = chunk - 1 - k
        ms_cols = list(carry[:q])
        ps_cols = list(carry[q:])
        G = [[G_ref[r, i * q + j] for j in range(q)] for i in range(q)]
        m_out = []
        for i in range(q):
            acc = g_ref[r, i]
            for j in range(q):
                acc = acc + G[i][j] * ms_cols[j]
            m_out.append(acc)
        gpg = _sym_quadform(q, G, ps_cols, where)
        p_out = [L_ref[r, kk] + gpg[kk] for kk in range(n_tri)]
        for j in range(q):
            ms_ref[r, j] = m_out[j]
        for kk in range(n_tri):
            ps_ref[r, kk] = p_out[kk]
        return tuple(m_out) + tuple(p_out)

    m_in = [m_scr[j] for j in range(q)]
    p_in = [p_scr[k] for k in range(n_tri)]
    out = jax.lax.fori_loop(0, chunk, body, tuple(m_in) + tuple(p_in))
    for j in range(q):
        m_scr[j] = out[j]
    for k in range(n_tri):
        p_scr[k] = out[q + k]


def _gain_cols_batched(q, n_tri, q_const, R_cols_b,
                       mf_cols, pf_cols, mpn_cols, ppn_cols):
    """Smoothing gains/offsets computed entirely in "column" layout
    (arrays of shape (T, n_block, n_lane)) via the same unrolled helpers
    the kernels use — no dense (q, q) trailing dims are ever materialized,
    which would tile-pad catastrophically on TPU.

    Returns (G cols list-of-lists, g cols, L packed cols).
    """
    pairs, where = _tri_idx(q)
    ppinv = _sym_inv(q, ppn_cols)
    # T1 = Pf Q'  (T1[i][l] = sum_j Pf(i,j) Q[l][j])
    T1 = [[None] * q for _ in range(q)]
    for i in range(q):
        for l in range(q):
            acc = None
            for j in range(q):
                acc = _acc(acc, _coef_mul(
                    q_const[l][j], p_cols_at(pf_cols, where, i, j)))
            T1[i][l] = acc
    G = [[None] * q for _ in range(q)]
    for i in range(q):
        for l in range(q):
            acc = None
            for j in range(q):
                acc = _acc(acc, T1[i][j] * p_cols_at(ppinv, where, j, l))
            G[i][l] = acc
    g = []
    for i in range(q):
        acc = mf_cols[i]
        for j in range(q):
            acc = acc - G[i][j] * mpn_cols[j]
        g.append(acc)
    # Joseph offset: L = (I - G Q) Pf (I - G Q)' + G R G'
    IGQ = [[None] * q for _ in range(q)]
    for i in range(q):
        for j in range(q):
            acc = 1.0 if i == j else None
            s = None
            for k in range(q):
                s = _acc(s, _coef_mul(q_const[k][j], G[i][k]))
            if acc is None:
                IGQ[i][j] = -s
            else:
                IGQ[i][j] = 1.0 - s
    L = _sym_quadform(q, IGQ, pf_cols, where)
    GR = _sym_quadform(q, G, R_cols_b, where)
    L = [L[k] + GR[k] for k in range(n_tri)]
    return G, g, L


def _smoother_kernel_batch_rows(chunk, q, n_block, n_tri, lanes_f, fold,
                                g_ref, G_ref, L_ref, sc_ref,
                                mean_ref, cov_ref, m_scr, p_scr):
    """Rows-emitting smoothing recursion: identical backward affine
    recursion to :func:`_smoother_kernel_batch`, but each stored column
    is scaled and written straight into the PUBLIC ``(T, nb, d, B)``
    layout via an in-register unfold (``(nb*F, B/F) -> (nb, B)``
    reshape).  This removes the XLA assembly pass — measured ~11 of the
    19 us/solve fused-solve budget at 2048 lanes (one full HBM
    round-trip over the mean/cov grids plus a sublane-padded transposed
    write; design.md round-5 closure)."""
    gi = pl.program_id(0)
    pairs, where = _tri_idx(q)
    nb = n_block // fold
    n_lane = lanes_f * fold

    @pl.when(gi == 0)
    def _seed():
        # the first processed element is the synthetic terminal row
        # (G = 0), which ignores the carry — zero seed is exact
        for j in range(q):
            m_scr[j] = jnp.zeros((n_block, lanes_f), jnp.float32)
        for k in range(n_tri):
            p_scr[k] = jnp.zeros((n_block, lanes_f), jnp.float32)

    def body(k, carry):
        r = chunk - 1 - k
        ms_cols = list(carry[:q])
        ps_cols = list(carry[q:])
        G = [[G_ref[r, i * q + j] for j in range(q)] for i in range(q)]
        m_out = []
        for i in range(q):
            acc = g_ref[r, i]
            for j in range(q):
                acc = acc + G[i][j] * ms_cols[j]
            m_out.append(acc)
        gpg = _sym_quadform(q, G, ps_cols, where)
        p_out = [L_ref[r, kk] + gpg[kk] for kk in range(n_tri)]
        for j in range(q):
            mean_ref[r, :, j, :] = (
                m_out[j] * sc_ref[j, 0]).reshape(nb, n_lane)
        for kk in range(n_tri):
            cov_ref[r, :, kk, :] = (
                p_out[kk] * sc_ref[q + kk, 0]).reshape(nb, n_lane)
        return tuple(m_out) + tuple(p_out)

    m_in = [m_scr[j] for j in range(q)]
    p_in = [p_scr[k] for k in range(n_tri)]
    out = jax.lax.fori_loop(0, chunk, body, tuple(m_in) + tuple(p_in))
    for j in range(q):
        m_scr[j] = out[j]
    for k in range(n_tri):
        p_scr[k] = out[q + k]


def smoother_recursion_batch_rows(g_k, G_k, L_k, mN, pN, m0, fold,
                                  m_scales, p_scales, chunk=None,
                                  interpret="auto"):
    r"""
    Backward affine recursion emitting the FULL public solve grid
    ``(n_len + 2, nb, q | n_tri, n_lane)`` — rows ``0 .. N`` including
    the initial and terminal rows — in one kernel pass, already scaled
    to original coordinates.

    The boundary rows ride the recursion as synthetic elements: a
    trailing element ``(G=0, g=mN, L=pN)`` emits the terminal filtered
    state (and reseeds the carry with it, exactly), and a leading
    element ``(G=0, g=m0, L=0)`` emits the exact initial state with zero
    covariance.  Divisibility padding prepends identity elements
    (``G=I, g=0, L=0``) whose output rows are sliced off.

    Args (column layout, possibly lane-folded with factor ``fold``):
        g_k/G_k/L_k: interior backward-kernel parameters, length
            ``n_len`` (rows ``1 .. N-1``).
        mN, pN / m0: terminal filtered state / initial state columns.
        m_scales (ndarray(q,)): per-derivative mean scaling (t_vec).
        p_scales (ndarray(n_tri,)): packed-covariance scaling.

    Returns:
        (tuple): ``mean (n_len+2, nb, q, n_lane)``,
        ``cov_packed (n_len+2, nb, n_tri, n_lane)`` in original
        coordinates, lanes unfolded.
    """
    n_len, q, n_block, lanes_f = g_k.shape
    n_tri = L_k.shape[1]
    nb = n_block // fold
    n_lane = lanes_f * fold

    # augment: [identity pad | row0 | interior | rowN]
    row0_g = m0[None]
    row0_G = jnp.zeros((1,) + G_k.shape[1:], G_k.dtype)
    row0_L = jnp.zeros((1,) + L_k.shape[1:], L_k.dtype)
    rowN_g = mN[None]
    rowN_L = pN[None]
    n_tot = n_len + 2
    # output blocks are padded to 8 sublanes on the d axis, so the VMEM
    # budget per row is ~(18 + 2*8*fold/n_block... ) — empirically the
    # same 8-12-row window as the cols kernel; divisor-of-n_tot required
    target = min(int(chunk) if chunk is not None else 8, n_tot)
    s_chunk = _pick_chunk(n_tot, target=target)
    pad = 0
    if s_chunk < min(4, target):
        s_chunk = min(target, 8)
        pad = (-n_tot) % s_chunk
    eye_rows = jnp.zeros((pad,) + G_k.shape[1:], G_k.dtype)
    for i in range(q):
        eye_rows = eye_rows.at[:, i * q + i].set(1.0)
    g_aug = jnp.concatenate([
        jnp.zeros((pad,) + g_k.shape[1:], g_k.dtype), row0_g, g_k,
        rowN_g])
    G_aug = jnp.concatenate([eye_rows, row0_G, G_k, row0_G])
    L_aug = jnp.concatenate([
        jnp.zeros((pad,) + L_k.shape[1:], L_k.dtype), row0_L, L_k,
        rowN_L])
    n_all = n_tot + pad
    n_chunks = n_all // s_chunk
    scales = jnp.concatenate([
        jnp.asarray(m_scales, jnp.float32).ravel(),
        jnp.asarray(p_scales, jnp.float32).ravel()])[:, None]

    kern = functools.partial(_smoother_kernel_batch_rows, s_chunk, q,
                             n_block, n_tri, lanes_f, fold)
    outs = [
        jax.ShapeDtypeStruct((n_all, nb, q, n_lane), jnp.float32),
        jax.ShapeDtypeStruct((n_all, nb, n_tri, n_lane), jnp.float32),
    ]
    rev4 = lambda i: (n_chunks - 1 - i, 0, 0, 0)
    blk = lambda d: pl.BlockSpec((s_chunk, d, n_block, lanes_f), rev4,
                                 memory_space=pltpu.VMEM)
    out_blk = lambda d: pl.BlockSpec((s_chunk, nb, d, n_lane), rev4,
                                     memory_space=pltpu.VMEM)
    mean_rows, cov_rows = pl.pallas_call(
        kern, out_shape=outs, grid=(n_chunks,),
        in_specs=[blk(q), blk(q * q), blk(n_tri),
                  pl.BlockSpec((q + n_tri, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[out_blk(q), out_blk(n_tri)],
        scratch_shapes=[
            pltpu.VMEM((q, n_block, lanes_f), jnp.float32),
            pltpu.VMEM((n_tri, n_block, lanes_f), jnp.float32),
        ],
        interpret=_interpret_mode(interpret),
    )(g_aug, G_aug, L_aug, scales)
    return mean_rows[pad:], cov_rows[pad:]


def smoother_recursion_batch(g_k, G_k, L_k, mN, pN,
                             chunk=None, interpret="auto"):
    r"""
    Lane-batched backward affine recursion
    ``m_n = g_n + G_n m_{n+1}``, ``P_n = L_n + G_n P_{n+1} G_n'`` in ONE
    Pallas kernel (state carried in VMEM scratch, reverse-streamed
    chunks) — the smoothing workhorse of the batch paths, and ~50x
    faster than an XLA ``associative_scan`` over the same arrays (the
    scan's pad/slice lowering and einsum layout transposes dominated the
    fused daltonng pipeline; measured 96 ms -> ~2 ms at 4k steps).

    Args:
        g_k (ndarray(T, q, n_block, n_lane)): Offsets.
        G_k (ndarray(T, q*q, n_block, n_lane)): Gains, row-major.
        L_k (ndarray(T, n_tri, n_block, n_lane)): Packed noise terms.
        mN, pN: Terminal values ``(q, n_block, n_lane)`` /
            ``(n_tri, n_block, n_lane)``.

    Returns:
        (tuple): ``ms`` (T, q, n_block, n_lane), ``ps`` (T, n_tri,
        n_block, n_lane).
    """
    n_len, q, n_block, n_lane = g_k.shape
    n_tri = L_k.shape[1]
    # empirical sweet spot on v5e: ~9-12 rows per grid step (measured
    # 19.4/19.0 us/solve at 1024/2048 folded lanes vs 27 us at 18 rows
    # — bigger windows defeat the revolving-buffer DMA/compute overlap,
    # smaller ones pay per-grid-step overhead)
    target = min(int(chunk) if chunk is not None
                 else min(12, _chunk_budget_target(
                     n_lane, n_block, n_cols=27,
                     budget_bytes=12 * 2 ** 20)),
                 n_len)
    s_chunk = _pick_chunk(n_len, target=target)
    # a degenerate n_len (prime-ish, largest small divisor < 8) leaves
    # per-grid-step overhead dominating; front-pad with IDENTITY
    # elements (G=I, g=0, L=0 — exact no-ops of the affine recursion)
    # up to a multiple of a modest chunk and slice the pad rows off the
    # outputs.  Do NOT pad toward the full VMEM budget: measured on
    # v5e (Lorenz-10k, 1024 folded lanes) chunk 18 at ~12 MB of
    # streamed blocks runs 1.4x SLOWER than chunk 11 at ~7 MB — high
    # VMEM pressure defeats the revolving-buffer DMA/compute overlap
    pad = 0
    if s_chunk < min(8, target):
        s_chunk = min(target, 16)
        pad = (-n_len) % s_chunk
        zeros_g = jnp.zeros((pad,) + g_k.shape[1:], g_k.dtype)
        eye_rows = jnp.zeros((pad,) + G_k.shape[1:], G_k.dtype)
        for i in range(q):
            eye_rows = eye_rows.at[:, i * q + i].set(1.0)
        g_k = jnp.concatenate([zeros_g, g_k])
        G_k = jnp.concatenate([eye_rows, G_k])
        L_k = jnp.concatenate([jnp.zeros((pad,) + L_k.shape[1:],
                                         L_k.dtype), L_k])
        n_len = n_len + pad
    n_chunks = n_len // s_chunk
    kern = functools.partial(_smoother_kernel_batch, s_chunk, q, n_block,
                             n_tri, n_lane)
    outs = [
        jax.ShapeDtypeStruct((n_len, q, n_block, n_lane), jnp.float32),
        jax.ShapeDtypeStruct((n_len, n_tri, n_block, n_lane), jnp.float32),
    ]
    rev4 = lambda i: (n_chunks - 1 - i, 0, 0, 0)
    blk = lambda d: pl.BlockSpec((s_chunk, d, n_block, n_lane), rev4,
                                 memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple([0] * len(shape)), memory_space=pltpu.VMEM)
    ms, ps = pl.pallas_call(
        kern, out_shape=outs, grid=(n_chunks,),
        in_specs=[blk(q), blk(q * q), blk(n_tri),
                  rep((q, n_block, n_lane)), rep((n_tri, n_block, n_lane))],
        out_specs=[blk(q), blk(n_tri)],
        scratch_shapes=[
            pltpu.VMEM((q, n_block, n_lane), jnp.float32),
            pltpu.VMEM((n_tri, n_block, n_lane), jnp.float32),
        ],
        interpret=_interpret_mode(interpret),
    )(g_k.astype(jnp.float32), G_k.astype(jnp.float32),
      L_k.astype(jnp.float32), mN, pN)
    if pad:
        ms, ps = ms[pad:], ps[pad:]
    return ms, ps


def solve_mv_fused_batch(thetas, ode_weight, ode_inits,
                         t_min, t_max, n_steps,
                         prior_pars,
                         ode_flat, jac_flat=None,
                         chunk=None, interpret="auto",
                         interrogation=None, key=None,
                         kalman_type="standard"):
    r"""
    Lane-batched fused solve: ``n_lane`` independent solves (parameter
    candidates / chains) in one pair of Pallas kernels, batched over the
    TPU vector lanes.  Throughput path — per-solve cost is roughly the
    single-solve kernel time divided by ``n_lane`` (up to ~128 lanes).

    The lane axis is LAST in all outputs (TPU tiling: anything else pads
    tiny trailing dims to (8, 128) tiles and explodes HBM), and the
    covariance comes back packed upper-triangular; use
    ``unpack_cov(var[..., i])`` on a lane slice for a dense matrix.

    Args:
        thetas (ndarray(n_lane, n_theta)): Per-lane parameters.
        ode_inits (ndarray(n_lane, n_block, q)): Per-lane initial states
            (original coordinates).
        interrogation (str | None): ``"kramer" | "rodeo" | "schober" |
            "chkrebtii"`` (default kramer when ``jac_flat`` is given,
            rodeo otherwise).  ``"chkrebtii"`` interrogates at an
            in-kernel posterior-predictive draw and requires ``key``.
        key (PRNGKey | None): PRNG key for stochastic interrogations.
        kalman_type (str): ``"standard"`` (packed covariances) or
            ``"sqrt"``/``"square-root"`` (packed lower-Cholesky factors,
            :func:`chol_packed` layout — expand a lane slice with
            :func:`unpack_chol`); see :func:`resolve_kalman_type`.
        (other args as :func:`solve_mv_fused`; requires a block-constant
        transition, i.e. the IBM prior)

    Returns:
        (tuple):
        - **mean** (ndarray(n_steps+1, n_block, q, n_lane)).
        - **var_packed** (ndarray(n_steps+1, n_block, n_tri, n_lane)):
          packed covariances (standard) or packed factors (square-root).
    """
    n_lane = thetas.shape[0]
    n_block, n_bmeas, q = ode_weight.shape
    kalman_type = resolve_kalman_type(kalman_type)
    prior_pars = normalize_prior_pars(kalman_type, prior_pars)
    if n_bmeas != 1:
        raise NotImplementedError("fused kernels require n_bmeas == 1")
    pairs, _ = _tri_idx(q)
    n_tri = len(pairs)
    dt = (t_max - t_min) / n_steps
    t_vec = taylor_scale(dt, q, dtype=jnp.float32)
    Qs, Rs = scale_prior(prior_pars, t_vec)
    q_const = _const_coefs(Qs)
    if q_const is None:
        q_const = _static_scaled_qconst(prior_pars[0], dt, q)
    if q_const is None:
        raise NotImplementedError(
            "solve_mv_fused_batch requires a block-constant transition "
            "available at trace time (a concrete block-constant "
            "prior, e.g. ibm_init, built/cast OUTSIDE jit — an "
            "astype/scale applied inside a jitted closure turns it "
            "into a tracer)")
    W_s = (ode_weight * t_vec[None, None, :])[:, 0, :]
    x0_lanes = jnp.transpose(
        (ode_inits / t_vec).astype(jnp.float32), (2, 1, 0))   # (q, nb, B)
    tgrid = t_min + (t_max - t_min) * (jnp.arange(n_steps) + 1) / n_steps
    theta_lanes = jnp.transpose(thetas).astype(jnp.float32)

    eps = None
    if interrogation == "chkrebtii":
        if key is None:
            raise ValueError("interrogation='chkrebtii' requires a key")
        eps = jax.random.normal(
            key, (n_steps, q, n_block, n_lane), jnp.float32)
    # forward filter emitting the smoothing gains straight from the
    # kernel; entry 0 (conditioning onto the Dirac initial state) is not
    # needed by the smoother, whose seed is the final filtered state.
    # fold: run the kernels on lane-folded (nb*F, B/F) tiles — dense
    # vregs and dense HBM streams where (nb, B) tiles waste 1 - nb/8
    # of both (the r03 0.39-VPU ceiling); unfolded at assembly below
    F = _lane_fold_factor(n_block, n_lane)
    A_k, b_k, C_k, m_last, p_last = fused_filter_batch(
        ode_flat, jac_flat, n_steps, Qs, Rs, W_s, x0_lanes,
        theta_lanes, tgrid, t_vec, chunk=chunk, interpret=interpret,
        raw_q_const=q_const, mode=interrogation, eps=eps, emit="gains",
        fold=F)
    tri_scale = jnp.stack(
        [t_vec[i] * t_vec[j] for (i, j) in pairs]).astype(jnp.float32)
    # NOTE (round-5 negative result): an in-kernel rows-emitting smoother
    # (:func:`smoother_recursion_batch_rows` — public layout + scaling in
    # the kernel, boundary rows as synthetic recursion elements) measured
    # 24.5 us/solve at 2048 lanes vs 19.0 for this cols-kernel + XLA
    # assembly pipeline: Mosaic lowers the per-column sublane-scattered
    # stores (the in-register (nb*F, B/F) -> (nb, B) unfold against a
    # d-padded output tile) worse than the one XLA transpose round-trip
    # it eliminates.  Kept for the record; see design.md round-5 closure.
    ms, ps = smoother_recursion_batch(b_k[1:], A_k[1:], C_k[1:],
                                      m_last, p_last,
                                      chunk=chunk, interpret=interpret)

    # assemble (N+1, nb, q | n_tri, B) in original coordinates, lanes last
    def rows(a):  # (T, d, nb*F, B/F) -> (T, nb, d, B)
        return jnp.transpose(_unfold_lanes(a, F), (0, 2, 1, 3))

    t_col = t_vec.astype(jnp.float32)[:, None]                # (q, 1)
    mean_rows = jnp.concatenate([
        jnp.transpose(x0_lanes, (1, 0, 2))[None],             # (1, nb, q, B)
        rows(ms),
        rows(m_last[None]),
    ], axis=0) * t_col
    packed_rows = jnp.concatenate([
        jnp.zeros((1, n_block, n_tri, n_lane), jnp.float32),
        rows(ps),
        rows(p_last[None]),
    ], axis=0)
    if kalman_type == "sqrt":
        # factor the scaled covariances in packed layout, then unscale
        # the factor rows (entry k=(i,j) is dense L[j][i], i.e. row j)
        f_rows = chol_packed(packed_rows, q, axis=-2)
        row_scale = jnp.stack(
            [t_vec[j] for (_, j) in pairs]).astype(jnp.float32)
        return mean_rows, f_rows * row_scale[:, None]
    return mean_rows, packed_rows * tri_scale[:, None]


def _smoother_mean_kernel_batch_tan(n_tan, chunk, q, n_block, n_lane,
                                    g_ref, G_ref, mN_ref,
                                    ms_ref, m_scr):
    """Tangent-augmented backward affine MEAN recursion:
    ``m = g + G m⁺``, ``dm_k = dg_k + dG_k m⁺ + G dm_k⁺`` — the smoothing
    counterpart of the tangent-augmented filter.  Offsets/gains stream
    primal + tangents stacked on the d axis; covariances are not carried
    (solution sensitivities need means only)."""
    gi = pl.program_id(0)
    n_aug = 1 + n_tan

    @pl.when(gi == 0)
    def _seed():
        for d in range(n_aug * q):
            m_scr[d] = mN_ref[d]

    def body(k, carry):
        r = chunk - 1 - k
        m_cols = carry[:q]
        G = [[G_ref[r, i * q + j] for j in range(q)] for i in range(q)]
        outs = []
        for i in range(q):
            acc = g_ref[r, i]
            for j in range(q):
                acc = acc + G[i][j] * m_cols[j]
            outs.append(acc)
        for t in range(n_tan):
            dm_cols = carry[(1 + t) * q:(2 + t) * q]
            for i in range(q):
                acc = g_ref[r, (1 + t) * q + i]
                for j in range(q):
                    acc = acc + G_ref[r, (1 + t) * q * q + i * q + j] \
                        * m_cols[j] + G[i][j] * dm_cols[j]
                outs.append(acc)
        for d in range(n_aug * q):
            ms_ref[r, d] = outs[d]
        return tuple(outs)

    m_in = tuple(m_scr[d] for d in range(n_aug * q))
    out = jax.lax.fori_loop(0, chunk, body, m_in)
    for d in range(n_aug * q):
        m_scr[d] = out[d]


def smoother_mean_recursion_batch_tan(g_aug, G_aug, mN_aug, n_tan,
                                      chunk=None, interpret="auto"):
    r"""
    Tangent-augmented lane-batched backward affine MEAN recursion in one
    Pallas kernel: primal ``m = g + G m⁺`` with ``n_tan`` tangent rows
    ``dm_k = dg_k + dG_k m⁺ + G dm_k⁺`` (the derivative recursion of the
    smoothing pass — shared by the fused solve, basic and daltonng
    gradient paths).

    Args:
        g_aug (ndarray(T, (1+n_tan)*q, nb, B)): Primal + tangent offsets.
        G_aug (ndarray(T, (1+n_tan)*q*q, nb, B)): Primal + tangent gains,
            row-major per block.
        mN_aug (ndarray((1+n_tan)*q, nb, B)): Terminal values.

    Returns:
        (ndarray(T, (1+n_tan)*q, nb, B)): Smoothed means + tangents.
    """
    n_aug = 1 + n_tan
    n_len, _, n_block, n_lane = g_aug.shape
    q = g_aug.shape[1] // n_aug
    if chunk is None:
        s_chunk = _pick_chunk_batch(n_len, n_lane * n_aug)
    else:
        s_chunk = _pick_chunk(n_len, target=chunk)
    n_chunks = n_len // s_chunk
    kern = functools.partial(_smoother_mean_kernel_batch_tan, n_tan,
                             s_chunk, q, n_block, n_lane)
    rev4 = lambda i: (n_chunks - 1 - i, 0, 0, 0)
    blk = lambda d: pl.BlockSpec((s_chunk, d, n_block, n_lane), rev4,
                                 memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple([0] * len(shape)), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (n_len, n_aug * q, n_block, n_lane), jnp.float32),
        grid=(n_chunks,),
        in_specs=[blk(n_aug * q), blk(n_aug * q * q),
                  rep((n_aug * q, n_block, n_lane))],
        out_specs=blk(n_aug * q),
        scratch_shapes=[
            pltpu.VMEM((n_aug * q, n_block, n_lane), jnp.float32),
        ],
        interpret=_interpret_mode(interpret),
    )(g_aug.astype(jnp.float32), G_aug.astype(jnp.float32),
      mN_aug.astype(jnp.float32))


def solve_mv_fused_batch_grad(thetas, ode_weight, ode_inits,
                              t_min, t_max, n_steps,
                              prior_pars,
                              ode_flat, jac_flat=None,
                              chunk=None, interpret="auto",
                              kalman_type="standard"):
    r"""
    Lane-batched fused solve posterior mean AND its theta-sensitivities
    via forward-mode tangent-augmented kernels: the tangent filter of
    :mod:`rodeo_tpu.ops.pallas_fenrir`, `jax.jvp` through the (pure XLA)
    smoothing-gain stage, and a tangent-augmented backward mean kernel.
    This is the fused-speed substrate for likelihood gradients whose
    observation model consumes the solution mean (``basic``), and for
    d(solution)/d(theta) sensitivity analysis generally.

    ``ode_inits`` must not depend on theta (tangents seeded zero); EK0/EK1
    interrogations only (``jac_flat`` selects EK1).

    Returns:
        (tuple):
        - **mean** (ndarray(n_steps+1, n_block, q, n_lane)): as
          :func:`solve_mv_fused_batch`.
        - **dmean** (ndarray(n_theta, n_steps+1, n_block, q, n_lane)):
          per-parameter directional derivatives of **mean**.
    """
    kalman_type = resolve_kalman_type(kalman_type)
    prior_pars = normalize_prior_pars(kalman_type, prior_pars)
    from rodeo_tpu.ops.pallas_fenrir import fused_filter_batch_tan

    n_lane, n_theta = thetas.shape
    n_tan = n_theta
    n_aug = 1 + n_tan
    n_block, n_bmeas, q = ode_weight.shape
    if n_bmeas != 1:
        raise NotImplementedError("fused kernels require n_bmeas == 1")
    pairs, _ = _tri_idx(q)
    n_tri = len(pairs)
    dt = (t_max - t_min) / n_steps
    t_vec = taylor_scale(dt, q, dtype=jnp.float32)
    Qs, Rs = scale_prior(prior_pars, t_vec)
    q_const = _static_scaled_qconst(prior_pars[0], dt, q)
    if q_const is None:
        raise NotImplementedError(
            "solve_mv_fused_batch_grad requires a block-constant "
            "transition available at trace time")
    W_s = (ode_weight * t_vec[None, None, :])[:, 0, :]
    x0_lanes = jnp.transpose(
        (ode_inits / t_vec).astype(jnp.float32), (2, 1, 0))   # (q, nb, B)
    tgrid = t_min + (t_max - t_min) * (jnp.arange(n_steps) + 1) / n_steps
    theta_lanes = jnp.transpose(thetas).astype(jnp.float32)
    mode = "kramer" if jac_flat is not None else "rodeo"

    # tangent-augmented filter emitting the smoothing gains (and their
    # tangents) in-kernel — drops the n_aug full-array XLA gains passes;
    # entry 0 conditions onto the Dirac init and is not needed
    from rodeo_tpu.ops.pallas_fenrir import fused_filter_batch_tan as _fbt
    A_aug, b_aug, _, mlast_a, _ = _fbt(
        ode_flat, jac_flat, mode, n_tan, n_steps, Qs, Rs, W_s, x0_lanes,
        theta_lanes, tgrid, t_vec, q_const, chunk=chunk,
        interpret=interpret, emit="gains")
    G_aug = A_aug[1:]                                 # (T-1, n_aug*q*q, ...)
    g_aug = b_aug[1:]                                 # (T-1, n_aug*q, ...)
    mN_aug = mlast_a                                  # (n_aug*q, nb, B)
    ms_aug = smoother_mean_recursion_batch_tan(
        g_aug, G_aug, mN_aug, n_tan, chunk=chunk, interpret=interpret)

    def rows(a):  # (T, d, nb, B) -> (T, nb, d, B)
        return jnp.transpose(a, (0, 2, 1, 3))

    t_col = t_vec.astype(jnp.float32)[:, None]                # (q, 1)
    mean_rows = jnp.concatenate([
        jnp.transpose(x0_lanes, (1, 0, 2))[None],
        rows(ms_aug[:, :q]),
        rows(mlast_a[None, :q]),
    ], axis=0) * t_col
    dmeans = []
    for k in range(n_tan):
        sl = slice((1 + k) * q, (2 + k) * q)
        dmeans.append(jnp.concatenate([
            jnp.zeros((1, n_block, q, n_lane), jnp.float32),  # x0: dtheta 0
            rows(ms_aug[:, sl]),
            rows(mlast_a[None, sl]),
        ], axis=0) * t_col)
    return mean_rows, jnp.stack(dmeans)


def basic_fused_batch_grad(thetas, ode_weight, ode_inits,
                           t_min, t_max, n_steps,
                           prior_pars,
                           obs_data, obs_times, obs_loglik,
                           ode_flat, jac_flat=None,
                           chunk=None, interpret="auto",
                           kalman_type="standard", **params):
    r"""
    Lane-batched fused Basic likelihood AND its theta-gradient: the
    tangent-augmented fused solve (:func:`solve_mv_fused_batch_grad`)
    chained through the user ``obs_loglik`` by `jax.jvp` — the MAP /
    gradient-MCMC workload for plug-in likelihoods at fused speed.

    Returns:
        (tuple): ``loglik (n_lane,)``, ``grad (n_lane, n_theta)``,
        ``mean (n_steps+1, n_block, q, n_lane)``.
    """
    kalman_type = resolve_kalman_type(kalman_type)
    prior_pars = normalize_prior_pars(kalman_type, prior_pars)
    mean_rows, dmean = solve_mv_fused_batch_grad(
        thetas=thetas, ode_weight=ode_weight, ode_inits=ode_inits,
        t_min=t_min, t_max=t_max, n_steps=n_steps, prior_pars=prior_pars,
        ode_flat=ode_flat, jac_flat=jac_flat, chunk=chunk,
        interpret=interpret)
    sim_times = jnp.linspace(t_min, t_max, n_steps + 1)
    obs_ind = jnp.searchsorted(sim_times, obs_times)

    def lls_of(ode_rows):
        ode_obs = ode_rows[obs_ind]               # (n_obs, nb, q, n_lane)
        return jax.vmap(lambda od: obs_loglik(obs_data, od, **params),
                        in_axes=-1)(ode_obs)

    lls = lls_of(mean_rows)
    grads = [jax.jvp(lls_of, (mean_rows,), (dmean[k],))[1]
             for k in range(dmean.shape[0])]
    return lls, jnp.stack(grads, axis=-1), mean_rows


# --- stationary-gain latency path ---------------------------------------------
#
# When the interrogation's measurement matrix H is constant in time — EK0
# always (H = W), EK1 whenever the model's block-diagonal Jacobian is
# state-independent (e.g. Lorenz63) — the covariance/gain Riccati
# recursion is autonomous and converges geometrically to its fixed point:
# measured on the Lorenz63-10k flagship config, the Kalman gain is within
# 4e-7 (relative) of steady state after 10 steps, i.e. constant at f32
# resolution.  The 10k-step covariance chain of the fused filter — its
# measured critical path — is therefore redundant: run an exact n_warm-step
# prefix, freeze the gain, and the remaining sequential work is ONLY the
# (nonlinear, irreducible) mean chain.  The backward smoother then has a
# CONSTANT gain G*, so it stops being sequential at all: the recursion
# m_n = g_n + G m_{n+1} is solved by a log2(N)-level doubling scan of
# batched einsums (and likewise the covariance recursion, by conjugation).


def _mean_gain_kernel(ode_flat, chunk, q, n_block, q_const, unroll,
                      w_ref, k_ref, x0_ref, th_ref, tgrid_ref, tv_ref,
                      mf_ref, m_scr):
    """Mean chain with streamed per-step gains: the innovation reduces to
    z = f(x_pred) - W mu_pred for BOTH EK0 and EK1 (the Jacobian terms of
    H mu + mm cancel exactly), so no Jacobian evaluation is needed."""
    gi = pl.program_id(0)
    Qm = q_const
    W_cols = [w_ref[:, j:j + 1] for j in range(q)]
    tv_cols = [tv_ref[:, j:j + 1] for j in range(q)]

    @pl.when(gi == 0)
    def _init():
        m_scr[:] = x0_ref[:]

    def body(r, carry):
        m_cols = list(carry)
        mp_cols = _matvec(q, Qm, m_cols)
        x_cols = [mp_cols[j] * tv_cols[j] for j in range(q)]
        t_n = tgrid_ref[gi * chunk + r, 0]
        f0 = ode_flat(x_cols, th_ref, t_n)
        wm = None
        for j in range(q):
            wm = _acc(wm, W_cols[j] * mp_cols[j])
        z = f0 - wm
        mf_cols = [mp_cols[i] + k_ref[r, :, i:i + 1] * z for i in range(q)]
        for j in range(q):
            mf_ref[r, :, j:j + 1] = mf_cols[j]
        return tuple(mf_cols)

    out = jax.lax.fori_loop(0, chunk, body,
                            tuple(m_scr[:, j:j + 1] for j in range(q)),
                            unroll=True if unroll else 1)
    for j in range(q):
        m_scr[:, j:j + 1] = out[j]


def _mean_boundary_kernel(ode_flat, k_group, q, n_block, q_const,
                          w_ref, kst_ref, x0_ref, th_ref, tgrid_ref,
                          tv_ref, bnd_ref, m_scr):
    """Store-free constant-gain mean chain: one grid step = one k-step
    group, whose ENTRY state is the only store (the per-step VMEM column
    stores of the full filter cost ~1.6-2.8 us/step vs ~95 ns/step for
    the same math store-free — tools/exp_store.py)."""
    gi = pl.program_id(0)
    Qm = q_const
    W_cols = [w_ref[:, j:j + 1] for j in range(q)]
    K_cols = [kst_ref[:, j:j + 1] for j in range(q)]
    tv_cols = [tv_ref[:, j:j + 1] for j in range(q)]

    @pl.when(gi == 0)
    def _init():
        m_scr[:] = x0_ref[:]

    bnd_ref[0] = m_scr[:]                 # group-entry state (1 store)

    def body(r, carry):
        m_cols = list(carry)
        mp_cols = _matvec(q, Qm, m_cols)
        x_cols = [mp_cols[j] * tv_cols[j] for j in range(q)]
        t_n = tgrid_ref[gi * k_group + r, 0]
        f0 = ode_flat(x_cols, th_ref, t_n)
        wm = None
        for j in range(q):
            wm = _acc(wm, W_cols[j] * mp_cols[j])
        z = f0 - wm
        return tuple(mp_cols[i] + K_cols[i] * z for i in range(q))

    out = jax.lax.fori_loop(0, k_group, body,
                            tuple(m_scr[:, j:j + 1] for j in range(q)))
    for j in range(q):
        m_scr[:, j:j + 1] = out[j]


def _mean_recovery_kernel(ode_flat, k_group, q, n_block, n_group, q_const,
                          w_ref, kst_ref, bnd_ref, th_ref, t_ref, tv_ref,
                          mf_ref):
    """Group-parallel interior recovery: lanes = time groups, each lane
    re-runs its group's k-step mean chain from the stored boundary state;
    stores are (n_block, n_group)-wide rows, amortized across groups."""
    Qm = q_const
    W_cols = [w_ref[:, j:j + 1] for j in range(q)]
    K_cols = [kst_ref[:, j:j + 1] for j in range(q)]
    tv_cols = [tv_ref[:, j:j + 1] for j in range(q)]

    def body(r, carry):
        m_cols = list(carry)
        mp_cols = _matvec(q, Qm, m_cols)
        x_cols = [mp_cols[j] * tv_cols[j] for j in range(q)]
        t_row = t_ref[r]                               # (1, n_group)
        f0 = ode_flat(x_cols, th_ref, t_row)
        wm = None
        for j in range(q):
            wm = _acc(wm, W_cols[j] * mp_cols[j])
        z = f0 - wm
        mf_cols = [mp_cols[i] + K_cols[i] * z for i in range(q)]
        for j in range(q):
            mf_ref[r, j] = mf_cols[j]
        return tuple(mf_cols)

    jax.lax.fori_loop(0, k_group, body,
                      tuple(bnd_ref[j] for j in range(q)))


def solve_mv_fused_stationary(key, ode_fun, ode_weight, ode_init,
                              t_min, t_max, n_steps,
                              interrogate=None,
                              prior_pars=None,
                              ode_flat=None, jac_flat=None,
                              interpret="auto", chunk=None,
                              n_warm=64, unroll=True, two_phase=True,
                              interrogation=None, kalman_type="standard",
                              **params):
    r"""
    :func:`solve_mv_fused` specialization for time-constant measurement
    matrices (see module comment above): exact ``n_warm``-step Riccati
    prefix, steady-state gains beyond it (correct to ~4e-7 relative after
    10 steps on the flagship config), a mean-only sequential kernel, and
    a fully batched doubling-scan smoother.

    VALIDITY: EK0 (``interrogation="rodeo"``) for any model; EK1
    (``"kramer"``) only when ``jac_flat`` is state-independent (the
    caller asserts this — e.g. Lorenz63's in-block Jacobian).  Same
    return contract as :func:`solve_mv_fused` (including the square-root
    form's Cholesky-factor variances under ``kalman_type="sqrt"``).
    """
    del key, ode_fun
    kalman_type = resolve_kalman_type(kalman_type)
    prior_pars = normalize_prior_pars(kalman_type, prior_pars)
    if ode_flat is None:
        raise ValueError(
            "solve_mv_fused_stationary requires a Mosaic-safe `ode_flat`")
    mean_out, var_out = _solve_mv_fused_stationary_impl(
        ode_weight, ode_init, t_min, t_max, n_steps, interrogate,
        prior_pars, ode_flat, jac_flat, interpret, chunk, n_warm,
        unroll, two_phase, interrogation, **params)
    if kalman_type == "sqrt":
        from rodeo_tpu.ops.linalg import chol_small
        var_out = chol_small(var_out)
    return mean_out, var_out


def _solve_mv_fused_stationary_impl(ode_weight, ode_init, t_min, t_max,
                                    n_steps, interrogate, prior_pars,
                                    ode_flat, jac_flat, interpret, chunk,
                                    n_warm, unroll, two_phase,
                                    interrogation, **params):
    # NB the host-side assembly (gain recovery from covariances, the
    # mp = Q mf recovery) avoids matmul/einsum primitives entirely and
    # uses unrolled elementwise column sums: the TPU's DEFAULT f32 dot
    # precision is bfloat16 passes (~8e-3 relative), which on the
    # ~1e6-magnitude Taylor-scaled quantities seeded perturbations that
    # chaotic dynamics amplified 1000x over the exact path (measured:
    # 1.34 vs 1.2e-3 max abs err at t<=4 on Lorenz-10k)
    mode = resolve_interrogation(interrogate, interrogation, jac_flat)
    if mode not in ("kramer", "rodeo"):
        raise NotImplementedError(
            "stationary gains require a deterministic time-constant "
            "interrogation (kramer with state-independent Jacobian, or "
            "rodeo)")
    n_block, n_bmeas, q = ode_weight.shape
    if n_bmeas != 1:
        raise NotImplementedError("fused kernels require n_bmeas == 1")
    pairs, where = _tri_idx(q)
    n_tri = len(pairs)
    dt = (t_max - t_min) / n_steps
    t_vec = taylor_scale(dt, q, dtype=jnp.float32)
    Qs, Rs = scale_prior(prior_pars, t_vec)
    raw_q_const = _static_scaled_qconst(prior_pars[0], dt, q)
    W_s = (ode_weight * t_vec[None, None, :])[:, 0, :].astype(jnp.float32)
    x0_s = (ode_init / t_vec).astype(jnp.float32)
    tgrid = t_min + (t_max - t_min) * (jnp.arange(n_steps) + 1) / n_steps
    theta = params.get("theta")
    theta_col = jnp.zeros((1, 1), jnp.float32) if theta is None         else jnp.asarray(theta)[:, None]
    n_warm = min(n_warm, n_steps)
    # two-phase schedule: the tail (n_steps - n_warm) splits into G groups
    # of 64 steps (boundary-store sequential kernel + group-parallel
    # recovery); the warm prefix absorbs the remainder
    k_group = 64
    n_group = max((n_steps - n_warm) // k_group, 0) if two_phase else 0
    if n_group >= 2:
        n_warm = n_steps - n_group * k_group

    # --- exact Riccati prefix (full fused filter on n_warm steps) -------
    mfw, pfw, mpw, ppw = fused_filter(
        ode_flat, jac_flat, n_warm, Qs, Rs, W_s, x0_s, theta_col,
        tgrid[:n_warm], t_vec, chunk=_pick_chunk(n_warm, target=16),
        interpret=interpret, raw_q_const=raw_q_const, unroll=True,
        mode=mode)

    # constant H (nb, q): EK0 -> W; EK1 -> W - jac * t (jac evaluated at a
    # dummy state: state-independence is the validity contract)
    if mode == "kramer":
        dummy = [jnp.zeros((n_block, 1), jnp.float32) for _ in range(q)]
        jd = jac_flat(dummy, theta_col.astype(jnp.float32),
                      jnp.float32(t_min))
        H = W_s - jnp.concatenate(
            [(jd[j] if jd[j] is not None else
              jnp.zeros((n_block, 1), jnp.float32)) * t_vec[j]
             for j in range(q)], axis=1)
    else:
        H = W_s

    # gains from the prefix predicted covariances + frozen steady state
    ppw_d = _unpack_tri(ppw, q, pairs)                    # (n_warm,nb,q,q)
    PH = sum(ppw_d[..., j] * H[None, :, None, j] for j in range(q))
    S = sum(H[None, :, i] * PH[..., i] for i in range(q))
    if mode == "rodeo":
        S = 2.0 * S
    K_pre = PH / S[..., None]                             # (n_warm,nb,q)
    gains = jnp.concatenate([
        K_pre,
        jnp.broadcast_to(K_pre[-1], (n_steps - n_warm, n_block, q)),
    ], axis=0)

    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    K_star = K_pre[-1].astype(jnp.float32)                # (nb, q)
    if n_group >= 2:
        # --- two-phase STORE-FREE mean chain ----------------------------
        # phase S: sequential over the tail, ONE store per 64-step group
        kern_s = functools.partial(
            _mean_boundary_kernel, ode_flat, k_group, q, n_block,
            raw_q_const)
        tg_tail = tgrid[n_warm:]
        bnd = pl.pallas_call(
            kern_s,
            out_shape=jax.ShapeDtypeStruct((n_group, n_block, q),
                                           jnp.float32),
            grid=(n_group,),
            in_specs=[rep((n_block, q)), rep((n_block, q)),
                      rep((n_block, q)), rep(theta_col.shape),
                      pl.BlockSpec((n_group * k_group, 1),
                                   lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      rep((1, q))],
            out_specs=pl.BlockSpec((1, n_block, q), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n_block, q), jnp.float32)],
            interpret=_interpret_mode(interpret),
        )(W_s, K_star, mfw[-1].astype(jnp.float32),
          theta_col.astype(jnp.float32),
          tg_tail[:, None].astype(jnp.float32),
          t_vec[None, :].astype(jnp.float32))

        # phase R: lanes = groups, interior rows recomputed in parallel;
        # stores are (nb, n_group)-wide.  NB ode_flat receives a (1, G)
        # time ROW here (per-lane times) — fine for elementwise time use.
        bnd_lanes = jnp.transpose(bnd, (2, 1, 0))         # (q, nb, G)
        t_lanes = jnp.transpose(
            tg_tail.reshape(n_group, k_group))[:, None, :]  # (k, 1, G)
        kern_r = functools.partial(
            _mean_recovery_kernel, ode_flat, k_group, q, n_block, n_group,
            raw_q_const)
        mfr = pl.pallas_call(
            kern_r,
            out_shape=jax.ShapeDtypeStruct((k_group, q, n_block, n_group),
                                           jnp.float32),
            grid=(1,),
            in_specs=[rep((n_block, q)), rep((n_block, q)),
                      rep((q, n_block, n_group)), rep(theta_col.shape),
                      rep((k_group, 1, n_group)), rep((1, q))],
            out_specs=rep((k_group, q, n_block, n_group)),
            interpret=_interpret_mode(interpret),
        )(W_s, K_star, bnd_lanes.astype(jnp.float32),
          theta_col.astype(jnp.float32), t_lanes.astype(jnp.float32),
          t_vec[None, :].astype(jnp.float32))
        tail_rows = jnp.transpose(mfr, (3, 0, 2, 1)).reshape(
            n_group * k_group, n_block, q)
        mf = jnp.concatenate([mfw, tail_rows], axis=0)
    else:
        # short horizon: single streamed-gain sequential kernel
        if chunk is None:
            chunk = _pick_chunk(n_steps, target=16 if unroll else 256)
        n_chunks = n_steps // chunk
        kern = functools.partial(_mean_gain_kernel, ode_flat, chunk, q,
                                 n_block, raw_q_const, unroll)
        blk = pl.BlockSpec((chunk, n_block, q), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        mf = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n_steps, n_block, q),
                                           jnp.float32),
            grid=(n_chunks,),
            in_specs=[rep((n_block, q)), blk, rep((n_block, q)),
                      rep(theta_col.shape),
                      pl.BlockSpec((n_steps, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      rep((1, q))],
            out_specs=blk,
            scratch_shapes=[pltpu.VMEM((n_block, q), jnp.float32)],
            interpret=_interpret_mode(interpret),
        )(W_s, gains.astype(jnp.float32), x0_s,
          theta_col.astype(jnp.float32),
          tgrid[:, None].astype(jnp.float32),
          t_vec[None, :].astype(jnp.float32))

    # predicted means recovered batched: mp_n = Q mf_{n-1} (mp_1 = Q x0)
    prev = jnp.concatenate([x0_s[None], mf[:-1]], axis=0)
    if raw_q_const is not None:
        # trace-time constant coefficients: elementwise FMAs, exact f32
        mp = jnp.stack([
            sum(raw_q_const[i][j] * prev[..., j] for j in range(q)
                if raw_q_const[i][j] != 0.0)
            for i in range(q)], axis=-1)
    else:
        Qd = Qs[0].astype(jnp.float32)
        mp = jnp.stack([
            sum(Qd[i, j] * prev[..., j] for j in range(q))
            for i in range(q)], axis=-1)

    # full-horizon covariances: exact prefix + frozen steady state
    pf_tail = jnp.broadcast_to(pfw[-1], (n_steps - n_warm, n_block, n_tri))
    pp_tail = jnp.broadcast_to(ppw[-1], (n_steps - n_warm, n_block, n_tri))
    pf = jnp.concatenate([pfw, pf_tail], axis=0)
    pp = jnp.concatenate([ppw, pp_tail], axis=0)

    # --- backward smoother: k-step composed Pallas recursion ------------
    # (per-step gains derive from the assembled pf/pp arrays: exact over
    # the warm prefix, constant beyond it — no special-casing needed; the
    # all-XLA doubling-scan alternative measured SLOWER end-to-end than
    # the composed Pallas kernel, see docs/design.md round-3 notes)
    ms, ps = fused_smoother_composed(
        n_steps, Qs, Rs, mf[:-1], pf[:-1], mp[1:], pp[1:],
        mf[-1], pf[-1], raw_q_const=raw_q_const, k_compose=64,
        interpret=interpret)
    ms = jnp.concatenate([ms, mf[-1][None]], axis=0)      # rows 1..N
    Ps = _unpack_tri(jnp.concatenate([ps, pf[-1][None]], axis=0), q, pairs)

    # assemble rows 0..N in original coordinates
    t_v = t_vec.astype(jnp.float32)
    mean_out = jnp.concatenate([x0_s[None], ms]) * t_v
    var_rows = jnp.concatenate(
        [jnp.zeros((1, n_block, q, q), jnp.float32), Ps])
    var_out = var_rows * (t_v[:, None] * t_v[None, :])
    return mean_out, var_out


def basic_fused_batch(thetas, ode_weight, ode_inits,
                      t_min, t_max, n_steps,
                      prior_pars,
                      obs_data, obs_times, obs_loglik,
                      ode_flat, jac_flat=None,
                      chunk=None, interpret="auto", interrogation=None,
                      key=None, kalman_type="standard", **params):
    r"""
    Lane-batched fused Basic likelihood: ``n_lane`` plug-in likelihood
    evaluations per kernel pipeline — the fused ``solve_mv`` forward pass
    (:func:`solve_mv_fused_batch`) followed by one batched user
    ``obs_loglik`` evaluation at the smoothed means.  Parity: upstream
    ``basic.py:47-62`` semantics, lane-batched.

    Args:
        obs_loglik (Callable): ``obs_loglik(obs_data, ode_data, **params)``
            as in :func:`rodeo_tpu.inference.basic`.
        (other args as :func:`solve_mv_fused_batch`)

    Returns:
        (tuple):
        - **loglik** (ndarray(n_lane,)).
        - **mean** (ndarray(n_steps+1, n_block, q, n_lane)): solution
          posterior mean (all grid rows, lanes last).
    """
    # the Basic likelihood plugs in the posterior MEAN only, which is
    # identical under both filter forms (see resolve_kalman_type) —
    # validate, accept the sqrt caller's factor-form prior, and ride the
    # shared pipeline
    kalman_type = resolve_kalman_type(kalman_type)
    prior_pars = normalize_prior_pars(kalman_type, prior_pars)
    mean_rows, _ = solve_mv_fused_batch(
        thetas=thetas, ode_weight=ode_weight, ode_inits=ode_inits,
        t_min=t_min, t_max=t_max, n_steps=n_steps, prior_pars=prior_pars,
        ode_flat=ode_flat, jac_flat=jac_flat, chunk=chunk,
        interpret=interpret, interrogation=interrogation, key=key)
    sim_times = jnp.linspace(t_min, t_max, n_steps + 1)
    obs_ind = jnp.searchsorted(sim_times, obs_times)
    ode_obs = mean_rows[obs_ind]                  # (n_obs, nb, q, n_lane)
    lls = jax.vmap(lambda od: obs_loglik(obs_data, od, **params),
                   in_axes=-1)(ode_obs)
    return lls, mean_rows


def unpack_cov(packed):
    """Expand a packed upper-triangular covariance (..., n_tri) into a
    dense symmetric (..., q, q) matrix (host-side convenience for slices
    of :func:`solve_mv_fused_batch` output)."""
    n_tri = packed.shape[-1]
    q = {1: 1, 3: 2, 6: 3, 10: 4, 15: 5}[n_tri]
    pairs, _ = _tri_idx(q)
    return _unpack_tri(packed, q, pairs)
