r"""
Fused Pallas MAGI log-density (lane-batched).

The MAGI filter (``rodeo_tpu/inference/magi.py``, reference
``src/rodeo/inference/magi.py:21-99``) conditions the Gauss-Markov prior
on *exact* pseudo-observations of the first ``n_active`` derivatives of a
fixed expanded path — there is no interrogation and no ODE callback, so
the whole recursion is a linear Kalman filter whose per-step math unrolls
into constant-coefficient FMAs on ``(n_block, n_lane)`` column registers:

1. predict through the trace-time Pascal transition
   (:func:`rodeo_tpu.ops.pallas_kalman._static_scaled_qconst`);
2. forecast log-density of the active block via the closed-form
   packed-symmetric inverse/determinant (``n_active <= 3``);
3. exact-observation update: the active rows of the state collapse onto
   the data (zero variance), the inactive block is conditioned through
   the gain ``G = P_ia S^{-1}``.

Because the active rows reset to the exact data each step, float32
rounding cannot accumulate in the observed components — the kernel needs
none of the k-composition machinery the solve smoother does.

Lane axis = independent path/parameter candidates (MCMC chains over
``(U, \theta)``); per-lane prior noise scale enters as an optional
``sig2_lanes`` multiplier on the scaled process noise.
"""
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rodeo_tpu.ops.precond import taylor_scale, scale_prior
from rodeo_tpu.ops.pallas_kalman import (
    _tri_idx, _pack_tri, _pick_chunk, _pick_chunk_batch, _sym_quadform,
    _sym_inv, _matvec, _interpret_mode, _static_scaled_qconst,
    _group_sum_rows, _fold_lanes, _unfold_lanes, _lane_fold_factor)

__all__ = ["magi_fused_batch", "magi_fused_batch_grad"]

_LOG2PI = 1.8378770664093453


def _sym_det(a, S_cols):
    """Determinant of a packed-symmetric column matrix, a <= 3 (scaled
    coordinates keep it O(1), so no overflow normalization needed)."""
    if a == 1:
        return S_cols[0]
    if a == 2:
        s00, s01, s11 = S_cols
        return s00 * s11 - s01 * s01
    if a == 3:
        s00, s01, s02, s11, s12, s22 = S_cols
        return (s00 * (s11 * s22 - s12 * s12)
                - s01 * (s01 * s22 - s12 * s02)
                + s02 * (s01 * s12 - s11 * s02))
    raise NotImplementedError("magi_fused_batch supports n_active <= 3")


def _magi_kernel_batch(chunk, q, act, n_block, n_tri, q_const, emit, fold,
                       x_ref, r_ref, m0_ref,
                       ld_ref, *rest):
    """One grid step = ``chunk`` MAGI filter steps, state in VMEM scratch;
    per-lane log-density row accumulates in scratch.

    ``emit`` (compile-time): ``"ld"`` emits the log-density only;
    ``"adjoint"`` additionally streams the per-step innovation ``z``,
    packed forecast inverse ``S^{-1}`` and conditioning gain ``G`` — the
    (data-independent-coefficient) inputs of the exact adjoint recursion
    run by :func:`_magi_adjoint_kernel_batch`.
    """
    pairs, where = _tri_idx(q)
    pairs_a, where_a = _tri_idx(act)
    n_tri_a = len(pairs_a)
    if emit == "adjoint":
        if q > act:
            z_ref, s_ref, gG_ref = rest[:3]
            m_scr, p_scr, ld_scr = rest[3:]
        else:
            z_ref, s_ref = rest[:2]
            gG_ref = None
            m_scr, p_scr, ld_scr = rest[2:]
    else:
        m_scr, p_scr, ld_scr = rest
    gi = pl.program_id(0)
    R_cols = [r_ref[k] for k in range(n_tri)]            # (nb, 1)

    @pl.when(gi == 0)
    def _seed():
        for j in range(q):
            m_scr[j] = m0_ref[j]
        for k in range(n_tri):
            p_scr[k] = jnp.zeros_like(m0_ref[0])
        ld_scr[:] = jnp.zeros_like(ld_scr)

    def body(r, carry):
        m_cols = list(carry[:q])
        p_cols = list(carry[q:q + n_tri])
        ld = carry[q + n_tri]
        mp = _matvec(q, q_const, m_cols)
        app = _sym_quadform(q, q_const, p_cols, where)
        pp = [app[k] + R_cols[k] for k in range(n_tri)]
        # forecast log-density of the active block (exact Gaussian;
        # reference magi.py:70-74 uses the non-masked logpdf)
        S_cols = [pp[where[(i, j)]] for (i, j) in pairs_a]
        z = [x_ref[r, j] - mp[j] for j in range(act)]
        invS = _sym_inv(act, S_cols)
        quad = None
        for i in range(act):
            for j in range(act):
                term = z[i] * invS[where_a[(i, j)]] * z[j]
                quad = term if quad is None else quad + term
        det = _sym_det(act, S_cols)
        logp = -0.5 * _group_sum_rows(
            quad + jnp.log(det) + act * _LOG2PI, n_block // fold, fold)
        ld = ld + logp
        # exact-observation update: active rows collapse onto the data;
        # inactive block conditioned via G = P_ia S^{-1}
        G = [[None] * act for _ in range(q)]
        for i in range(act, q):
            for a in range(act):
                acc = None
                for b in range(act):
                    term = pp[where[(i, b)]] * invS[where_a[(b, a)]]
                    acc = term if acc is None else acc + term
                G[i][a] = acc
        m_out = []
        for j in range(act):
            m_out.append(x_ref[r, j])
        for i in range(act, q):
            acc = mp[i]
            for a in range(act):
                acc = acc + G[i][a] * z[a]
            m_out.append(acc)
        zero = jnp.zeros_like(mp[0])
        p_out = []
        for kk, (i, j) in enumerate(pairs):
            if i < act or j < act:
                p_out.append(zero)
            else:
                acc = pp[kk]
                for a in range(act):
                    acc = acc - G[i][a] * pp[where[(a, j)]]
                p_out.append(acc)
        if emit == "adjoint":
            for j in range(act):
                z_ref[r, j] = z[j]
            for k in range(n_tri_a):
                s_ref[r, k] = invS[k]
            if gG_ref is not None:
                for i in range(act, q):
                    for a in range(act):
                        gG_ref[r, (i - act) * act + a] = G[i][a]
        return tuple(m_out) + tuple(p_out) + (ld,)

    m_in = [m_scr[j] for j in range(q)]
    p_in = [p_scr[k] for k in range(n_tri)]
    out = jax.lax.fori_loop(
        0, chunk, body, tuple(m_in) + tuple(p_in) + (ld_scr[:],))
    for j in range(q):
        m_scr[j] = out[j]
    for k in range(n_tri):
        p_scr[k] = out[q + k]
    ld_scr[:] = out[q + n_tri]
    ld_ref[:] = out[q + n_tri]


def magi_fused_batch(ode_data_subsets, ode_expand, n_active, prior_pars,
                     dt, sig2_lanes=None, chunk=None, interpret="auto",
                     **params):
    r"""
    Lane-batched fused MAGI log-density: ``n_lane`` independent paths
    evaluated in one kernel pipeline.  Same value per lane as
    :func:`rodeo_tpu.ops.precond.magi_logdens` up to float32 rounding.

    Args:
        ode_data_subsets (ndarray(n_lane, n_steps+1, n_block, n_sub)):
            Per-lane path subsets (leading lane axis over the plain API's
            ``ode_data_subset``).
        ode_expand (Callable): ``ode_expand(subset, **params)`` mapping
            one subset to the full ``(n_steps+1, n_block, n_deriv)``
            state (vmapped over lanes here; ``params`` shared).
        n_active (int): Number of exactly-observed derivatives
            (``<= 3``).
        prior_pars (tuple): Unscaled ``(prior_weight, prior_var)`` with a
            block-constant transition available at trace time.
        dt (float): Solver step size (builds the Taylor scaling).
        sig2_lanes (ndarray(n_lane,) | None): Optional per-lane
            multiplier on the process-noise variance (e.g. a sampled
            :math:`\sigma^2` relative to the one baked into
            ``prior_pars``).

    Returns:
        (ndarray(n_lane,)): Log-density values.
    """
    expand = jax.vmap(lambda u: ode_expand(u, **params))
    paths = expand(ode_data_subsets)                 # (B, N+1, nb, q)
    ld, _ = _magi_forward(paths, int(n_active), prior_pars, dt,
                          sig2_lanes, chunk, interpret, emit="ld")
    return ld


def _magi_jacobian(dt, t_vec, n_steps, n_block, q, act):
    """Change-of-variables constant back from scaled coordinates (exact
    trace-time constant when dt is static; matches
    :func:`rodeo_tpu.ops.precond.magi_logdens`)."""
    qd = q - 1
    try:
        dt_f = float(dt)
        tv = [math.sqrt(dt_f) * dt_f ** (qd - i) / math.factorial(qd - i)
              for i in range(q)]
        return jnp.float32(
            n_steps * n_block * sum(math.log(t) for t in tv[:act]))
    except TypeError:  # traced dt
        return (n_steps * n_block
                * jnp.sum(jnp.log(t_vec[:act]))).astype(jnp.float32)


def _magi_forward(paths, act, prior_pars, dt, sig2_lanes, chunk,
                  interpret, emit):
    """Shared fused-forward driver over pre-expanded paths.

    Returns ``(ld, aux)`` where ``aux`` is ``None`` for ``emit="ld"`` and
    ``(z_k, s_k, gG_k, t_vec, s_chunk)`` for ``emit="adjoint"``
    (``gG_k`` is ``None`` when ``q == act``)."""
    n_lane, n_tot, n_block, q = paths.shape
    n_steps = n_tot - 1
    if act > min(3, q):
        raise NotImplementedError(
            "magi_fused_batch supports n_active <= 3 (and <= n_deriv)")
    pairs, _ = _tri_idx(q)
    pairs_a, _ = _tri_idx(act)
    n_tri = len(pairs)
    n_tri_a = len(pairs_a)
    q_const = _static_scaled_qconst(prior_pars[0], dt, q)
    if q_const is None:
        raise NotImplementedError(
            "magi_fused_batch requires a block-constant transition "
            "available at trace time (a concrete block-constant "
            "prior, e.g. ibm_init, built/cast OUTSIDE jit — an "
            "astype/scale applied inside a jitted closure turns it "
            "into a tracer)")
    t_vec = taylor_scale(dt, q, dtype=jnp.float32)
    _, Rs = scale_prior(tuple(jnp.asarray(a, jnp.float32)
                              for a in prior_pars), t_vec)
    # lane-fold (emit="ld" only — the adjoint streams stay unfolded);
    # dense tiles where (n_block, n_lane) wastes 1 - nb/8 of every vreg
    F = _lane_fold_factor(n_block, n_lane) if emit == "ld" else 1
    nbf, nlf = n_block * F, n_lane // F
    R_k = jnp.transpose(_pack_tri(Rs, pairs))[..., None]   # (n_tri, nb, 1)
    if sig2_lanes is not None:
        sig2 = jnp.asarray(sig2_lanes, jnp.float32)[None, None, :]
        R_k = _fold_lanes(R_k * sig2, F)                   # (n_tri, nbf, .)
    elif F > 1:
        R_k = jnp.repeat(R_k, F, axis=1)
    paths_s = (paths / t_vec).astype(jnp.float32)
    # kernel layouts: x (N, act, nbf, B/F); seed mean (q, nbf, B/F)
    x_k = _fold_lanes(
        jnp.transpose(paths_s[:, 1:, :, :act], (1, 3, 2, 0)), F)
    m0 = _fold_lanes(jnp.transpose(paths_s[:, 0], (2, 1, 0)), F)

    if chunk is None:
        s_chunk = _pick_chunk_batch(n_steps, nlf, nbf,
                                    n_cols=6 if emit == "ld" else 24,
                                    budget_bytes=12 * 2 ** 20)
    else:
        s_chunk = _pick_chunk(n_steps, target=chunk)
    n_chunks = n_steps // s_chunk
    n_lane_r = R_k.shape[-1]
    kern = functools.partial(_magi_kernel_batch, s_chunk, q, act,
                             nbf, n_tri, q_const, emit, F)
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple([0] * len(shape)), memory_space=pltpu.VMEM)
    blk = lambda d: pl.BlockSpec((s_chunk, d, nbf, nlf),
                                 lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((F, nlf), jnp.float32)]
    out_specs = [pl.BlockSpec((F, nlf), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)]
    if emit == "adjoint":
        out_shape.append(jax.ShapeDtypeStruct(
            (n_steps, act, n_block, n_lane), jnp.float32))
        out_specs.append(blk(act))
        out_shape.append(jax.ShapeDtypeStruct(
            (n_steps, n_tri_a, n_block, n_lane), jnp.float32))
        out_specs.append(blk(n_tri_a))
        if q > act:
            out_shape.append(jax.ShapeDtypeStruct(
                (n_steps, (q - act) * act, n_block, n_lane), jnp.float32))
            out_specs.append(blk((q - act) * act))
    outs = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(n_chunks,),
        in_specs=[
            blk(act),
            rep((n_tri, nbf, n_lane_r)),
            rep((q, nbf, nlf)),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((q, nbf, nlf), jnp.float32),
            pltpu.VMEM((n_tri, nbf, nlf), jnp.float32),
            pltpu.VMEM((F, nlf), jnp.float32),
        ],
        interpret=_interpret_mode(interpret),
    )(x_k, R_k, m0)
    jacobian = _magi_jacobian(dt, t_vec, n_steps, n_block, q, act)
    ld = _unfold_lanes(outs[0], F)[0] - jacobian
    if emit != "adjoint":
        return ld, None
    z_k, s_k = outs[1], outs[2]
    gG_k = outs[3] if q > act else None
    return ld, (z_k, s_k, gG_k, t_vec, s_chunk)


def _magi_adjoint_kernel_batch(chunk, q, act, n_block, q_const,
                               *refs):
    """Exact adjoint of the MAGI filter log-density w.r.t. the (scaled)
    path data.

    The filter's covariance recursion never sees the data, so the adjoint
    is a linear backward recursion with the coefficients the forward pass
    stored: per step ``r`` (with ``lam_r = dL/dm_r``, seeded ``lam_N = 0``)

    .. code-block:: text

        v = S^{-1} z                 (forecast-density term)
        t_a = sum_{i>=act} G[i][a] lam[i]
        dL/dx_r  = lam[:act] + t - v
        lam_{r-1} = Q' [ v - t ; lam[act:] ]

    and ``dL/dm_0 = lam_0`` covers the full ``q``-row seed state.
    """
    pairs_a, where_a = _tri_idx(act)
    n_tri_a = len(pairs_a)
    has_g = q > act
    if has_g:
        z_ref, s_ref, gG_ref = refs[:3]
        gx_ref, lam0_ref = refs[3:5]
        lam_scr = refs[5]
    else:
        z_ref, s_ref = refs[:2]
        gx_ref, lam0_ref = refs[2:4]
        lam_scr = refs[4]
    gi = pl.program_id(0)

    @pl.when(gi == 0)
    def _seed():
        for j in range(q):
            lam_scr[j] = jnp.zeros_like(z_ref[0, 0])

    qT = [[q_const[i][j] for i in range(q)] for j in range(q)]

    def body(k, carry):
        r = chunk - 1 - k
        lam = list(carry)
        z = [z_ref[r, j] for j in range(act)]
        v = []
        for a in range(act):
            acc = None
            for b in range(act):
                term = s_ref[r, where_a[(a, b)]] * z[b]
                acc = term if acc is None else acc + term
            v.append(acc)
        zero = jnp.zeros_like(z[0])
        t = [zero] * act
        if has_g:
            for a in range(act):
                acc = None
                for i in range(act, q):
                    term = gG_ref[r, (i - act) * act + a] * lam[i]
                    acc = term if acc is None else acc + term
                t[a] = acc
        for a in range(act):
            gx_ref[r, a] = lam[a] + t[a] - v[a]
        u = [v[a] - t[a] for a in range(act)] + [lam[i]
                                                 for i in range(act, q)]
        lam_new = _matvec(q, qT, u)
        return tuple(c if c is not None else zero for c in lam_new)

    lam_in = tuple(lam_scr[j] for j in range(q))
    out = jax.lax.fori_loop(0, chunk, body, lam_in)
    for j in range(q):
        lam_scr[j] = out[j]
        lam0_ref[j] = out[j]


def magi_fused_batch_grad(ode_data_subsets, ode_expand, n_active,
                          prior_pars, dt, theta_lanes=None,
                          sig2_lanes=None, chunk=None, interpret="auto",
                          **params):
    r"""
    Fused MAGI log-density **and its exact gradient w.r.t. the path**
    (and optionally per-lane parameters), lane-batched.

    MAGI's MCMC/MAP state is the whole latent path :math:`U_{0:N}` —
    thousands of dimensions — so the forward-mode tangent trick of the
    other ``*_fused_batch_grad`` entries cannot scale here.  Instead this
    runs reverse mode natively: the MAGI filter is linear-Gaussian in the
    expanded path (covariances/gains never see the data), so its adjoint
    is a constant-coefficient backward recursion.  The forward kernel
    additionally streams per-step ``(z, S^{-1}, G)``; a second kernel
    runs the adjoint; the chain rule through ``ode_expand`` (and the
    Taylor scaling) is one ``jax.vjp``.  Cost: ~2x the value-only kernel.

    Parity: matches ``jax.grad`` of
    :func:`rodeo_tpu.ops.precond.magi_logdens` (reference semantics,
    upstream ``src/rodeo/inference/magi.py:21-99``) to float32 accuracy.

    Args:
        theta_lanes (ndarray(n_lane, ...) pytree | None): Optional
            per-lane parameters; when given, ``ode_expand`` is called as
            ``ode_expand(subset, theta=theta_lane, **params)`` and the
            gradient w.r.t. ``theta_lanes`` is returned as well.
        sig2_lanes: As in :func:`magi_fused_batch`; supported in the
            value and in the path/theta gradients, but **no gradient
            w.r.t.** ``sig2_lanes`` is returned (its derivative flows
            through the covariance recursion; use a Gibbs/marginal move
            for :math:`\sigma^2`).
        (other arguments as :func:`magi_fused_batch`)

    Returns:
        (tuple): ``(ld (n_lane,), grad_subsets)`` — plus
        ``grad_theta`` when ``theta_lanes`` is given.
    """
    act = int(n_active)
    if theta_lanes is None:
        expand = lambda U: jax.vmap(
            lambda u: ode_expand(u, **params))(U)
        paths, vjp_fn = jax.vjp(expand, ode_data_subsets)
    else:
        expand = lambda U, TH: jax.vmap(
            lambda u, th: ode_expand(u, theta=th, **params))(U, TH)
        paths, vjp_fn = jax.vjp(expand, ode_data_subsets, theta_lanes)
    n_lane, n_tot, n_block, q = paths.shape
    n_steps = n_tot - 1
    ld, aux = _magi_forward(paths, act, prior_pars, dt, sig2_lanes,
                            chunk, interpret, emit="adjoint")
    z_k, s_k, gG_k, t_vec, s_chunk = aux
    n_chunks = n_steps // s_chunk
    pairs_a, _ = _tri_idx(act)
    n_tri_a = len(pairs_a)
    kern = functools.partial(_magi_adjoint_kernel_batch, s_chunk, q, act,
                             n_block,
                             _static_scaled_qconst(prior_pars[0], dt, q))
    rev = lambda i: (n_chunks - 1 - i, 0, 0, 0)
    blk = lambda d: pl.BlockSpec((s_chunk, d, n_block, n_lane), rev,
                                 memory_space=pltpu.VMEM)
    in_specs = [blk(act), blk(n_tri_a)]
    args = [z_k, s_k]
    if gG_k is not None:
        in_specs.append(blk((q - act) * act))
        args.append(gG_k)
    gx, lam0 = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((n_steps, act, n_block, n_lane),
                                 jnp.float32),
            jax.ShapeDtypeStruct((q, n_block, n_lane), jnp.float32),
        ],
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=[
            blk(act),
            pl.BlockSpec((q, n_block, n_lane), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((q, n_block, n_lane), jnp.float32)],
        interpret=_interpret_mode(interpret),
    )(*args)
    # assemble d ld / d paths (original coordinates) and pull back
    # through ode_expand;  paths_s = paths / t_vec  =>  divide again
    g_s = jnp.zeros((n_lane, n_tot, n_block, q), jnp.float32)
    g_s = g_s.at[:, 1:, :, :act].set(jnp.transpose(gx, (3, 0, 2, 1)))
    g_s = g_s.at[:, 0].set(jnp.transpose(lam0, (2, 1, 0)))
    g_paths = (g_s / t_vec).astype(paths.dtype)
    grads = vjp_fn(g_paths)
    if theta_lanes is None:
        return ld, grads[0]
    return ld, grads[0], grads[1]
