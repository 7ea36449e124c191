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
    _sym_inv, _matvec, _interpret_mode, _static_scaled_qconst)

__all__ = ["magi_fused_batch"]

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


def _magi_kernel_batch(chunk, q, act, n_block, n_tri, q_const,
                       x_ref, r_ref, m0_ref,
                       ld_ref,
                       m_scr, p_scr, ld_scr):
    """One grid step = ``chunk`` MAGI filter steps, state in VMEM scratch;
    per-lane log-density row accumulates in scratch."""
    pairs, where = _tri_idx(q)
    pairs_a, where_a = _tri_idx(act)
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
        logp = -0.5 * jnp.sum(
            quad + jnp.log(det) + act * _LOG2PI, axis=0, keepdims=True)
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
    n_lane = ode_data_subsets.shape[0]
    expand = jax.vmap(lambda u: ode_expand(u, **params))
    paths = expand(ode_data_subsets)                 # (B, N+1, nb, q)
    _, n_tot, n_block, q = paths.shape
    n_steps = n_tot - 1
    act = int(n_active)
    if act > min(3, q):
        raise NotImplementedError(
            "magi_fused_batch supports n_active <= 3 (and <= n_deriv)")
    pairs, _ = _tri_idx(q)
    n_tri = len(pairs)
    q_const = _static_scaled_qconst(prior_pars[0], dt, q)
    if q_const is None:
        raise NotImplementedError(
            "magi_fused_batch requires a block-constant transition "
            "available at trace time")
    t_vec = taylor_scale(dt, q, dtype=jnp.float32)
    _, Rs = scale_prior(tuple(jnp.asarray(a, jnp.float32)
                              for a in prior_pars), t_vec)
    R_k = jnp.transpose(_pack_tri(Rs, pairs))[..., None]   # (n_tri, nb, 1)
    if sig2_lanes is not None:
        sig2 = jnp.asarray(sig2_lanes, jnp.float32)[None, None, :]
        R_k = R_k * sig2                                   # (n_tri, nb, B)
    paths_s = (paths / t_vec).astype(jnp.float32)
    # kernel layouts: x (N, act, nb, B); seed mean (q, nb, B)
    x_k = jnp.transpose(paths_s[:, 1:, :, :act], (1, 3, 2, 0))
    m0 = jnp.transpose(paths_s[:, 0], (2, 1, 0))

    if chunk is None:
        s_chunk = _pick_chunk_batch(n_steps, n_lane)
    else:
        s_chunk = _pick_chunk(n_steps, target=chunk)
    n_chunks = n_steps // s_chunk
    n_lane_r = R_k.shape[-1]
    kern = functools.partial(_magi_kernel_batch, s_chunk, q, act,
                             n_block, n_tri, q_const)
    rep = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple([0] * len(shape)), memory_space=pltpu.VMEM)
    ld = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, n_lane), jnp.float32),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((s_chunk, act, n_block, n_lane),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            rep((n_tri, n_block, n_lane_r)),
            rep((q, n_block, n_lane)),
        ],
        out_specs=pl.BlockSpec((1, n_lane), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((q, n_block, n_lane), jnp.float32),
            pltpu.VMEM((n_tri, n_block, n_lane), jnp.float32),
            pltpu.VMEM((1, n_lane), jnp.float32),
        ],
        interpret=_interpret_mode(interpret),
    )(x_k, R_k, m0)
    # change-of-variables back from scaled coordinates (exact trace-time
    # constant when dt is static; matches precond.magi_logdens)
    qd = q - 1
    try:
        dt_f = float(dt)
        tv = [math.sqrt(dt_f) * dt_f ** (qd - i) / math.factorial(qd - i)
              for i in range(q)]
        jacobian = jnp.float32(
            n_steps * n_block * sum(math.log(t) for t in tv[:act]))
    except TypeError:  # traced dt
        jacobian = (n_steps * n_block
                    * jnp.sum(jnp.log(t_vec[:act]))).astype(jnp.float32)
    return ld[0] - jacobian
