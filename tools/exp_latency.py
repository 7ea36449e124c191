"""
Latency decomposition experiments for the fused single-solve path
(VERDICT r2 item #1: get Lorenz63-10k under 7.0 ms).

Times, on the real TPU chip, isolated pieces of the fused pipeline to
locate the serial bottleneck:

  full_k64_unroll   current best end-to-end solve_mv_fused config
  filter_only       the fused forward filter alone (chunk tuned)
  smoother_k64      composed smoother alone
  affine_filter     filter with interrogations (H, z-offset) STREAMED in
                    (no in-kernel f/jac eval) — cost of the affine sweeps
                    an iterated scheme would run
  cov_gain_only     covariance/gain chain only (streamed H, no mean chain)
  mean_only         mean chain only (streamed gain + H, in-kernel f eval)

Usage:  python tools/exp_latency.py  (on the axon TPU)
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rodeo_tpu.models import lorenz
from rodeo_tpu.interrogate import interrogate_kramer
from rodeo_tpu.ops import pallas_kalman as pk
from rodeo_tpu.ops.pallas_kalman import (
    _tri_idx, _matvec, _sym_quadform, _acc, _pick_chunk, _pack_tri,
    _static_scaled_qconst, p_cols_at, _interpret_mode)
from rodeo_tpu.ops.precond import taylor_scale, scale_prior

N_STEPS = 10000
T_MAX = 20.0


B_AMORT = 8


def drain(o):
    """Host readback of one element — the only reliable completion
    point on this backend (block_until_ready acks enqueue only)."""
    import numpy as np
    leaf = jax.tree_util.tree_leaves(o)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn_one, xs, K=5):
    """K back-to-back fresh-input amortized calls + one drain."""
    fn = jax.jit(lambda xs_: jax.lax.map(fn_one, xs_))
    o = fn(xs)
    drain(o)
    t0 = time.perf_counter()
    drain(o)
    probe = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(K):
        o = fn(jax.tree_util.tree_map(
            lambda a: a * (1 + 1e-6 * (i + 1)), xs))
    drain(o)
    tot = time.perf_counter() - t0 - probe
    return tot / (K * B_AMORT) * 1e3  # ms


def setup():
    cfg = lorenz.setup(n_steps=N_STEPS, t_max=T_MAX, dtype=jnp.float32)
    theta = cfg.pop("theta")
    n_block, n_bmeas, q = cfg["ode_weight"].shape
    dt = (cfg["t_max"] - cfg["t_min"]) / N_STEPS
    t_vec = taylor_scale(dt, q, dtype=jnp.float32)
    Qs, Rs = scale_prior(cfg["prior_pars"], t_vec)
    raw_q_const = _static_scaled_qconst(cfg["prior_pars"][0], dt, q)
    W_s = (cfg["ode_weight"] * t_vec[None, None, :])[:, 0, :]
    x0_s = (cfg["ode_init"] / t_vec).astype(jnp.float32)
    tgrid = cfg["t_min"] + (cfg["t_max"] - cfg["t_min"]) * (
        jnp.arange(N_STEPS) + 1) / N_STEPS
    theta_col = jnp.asarray(theta)[:, None]
    return dict(cfg=cfg, theta=theta, q=q, n_block=n_block, t_vec=t_vec,
                Qs=Qs, Rs=Rs, raw_q_const=raw_q_const, W_s=W_s, x0_s=x0_s,
                tgrid=tgrid, theta_col=theta_col)


# ---------------------------------------------------------------- variants


def _affine_kernel(mode, chunk, q, n_block, n_tri, q_const,
                   r_ref, h_ref, z_ref, x0_ref,
                   mf_ref, pf_ref,
                   m_scr, p_scr):
    """Affine filter sweep: H columns and z offsets precomputed/streamed.

    mode: "full" (mean+cov), "cov" (covariance/gain only; mean chain
    dropped), "mean_fixed_gain" (mean only; gain streamed via h_ref slot
    reuse is NOT done here — see _mean_kernel)."""
    pairs, where = _tri_idx(q)
    gi = pl.program_id(0)
    Qm = q_const
    R_cols = [r_ref[:, k:k + 1] for k in range(n_tri)]

    @pl.when(gi == 0)
    def _init():
        m_scr[:] = x0_ref[:]
        p_scr[:] = jnp.zeros((n_block, n_tri), jnp.float32)

    def body(r, carry):
        m_cols = list(carry[:q])
        p_cols = list(carry[q:])
        pp_cols = _sym_quadform(q, Qm, p_cols, where)
        pp_cols = [pp_cols[k] + R_cols[k] for k in range(n_tri)]
        H_cols = [h_ref[r, :, j:j + 1] for j in range(q)]
        PH_cols = []
        for i in range(q):
            acc = None
            for j in range(q):
                acc = _acc(acc, p_cols_at(pp_cols, where, i, j) * H_cols[j])
            PH_cols.append(acc)
        S = None
        for i in range(q):
            S = _acc(S, H_cols[i] * PH_cols[i])
        inv_S = 1.0 / S
        gain = [PH_cols[i] * inv_S for i in range(q)]
        IKW = [[(1.0 if i == j else 0.0) - gain[i] * H_cols[j]
                for j in range(q)] for i in range(q)]
        pf_cols = _sym_quadform(q, IKW, pp_cols, where)
        if mode == "cov":
            mf_cols = m_cols
        else:
            mp_cols = _matvec(q, Qm, m_cols)
            hm = None
            for j in range(q):
                hm = _acc(hm, H_cols[j] * mp_cols[j])
            zres = z_ref[r, :, 0:1] - hm
            mf_cols = [mp_cols[i] + gain[i] * zres for i in range(q)]
        for j in range(q):
            mf_ref[r, :, j:j + 1] = mf_cols[j]
        for k in range(n_tri):
            pf_ref[r, :, k:k + 1] = pf_cols[k]
        return tuple(mf_cols) + tuple(pf_cols)

    m0 = [m_scr[:, j:j + 1] for j in range(q)]
    p0 = [p_scr[:, k:k + 1] for k in range(n_tri)]
    out = jax.lax.fori_loop(0, chunk, body, tuple(m0) + tuple(p0))
    for j in range(q):
        m_scr[:, j:j + 1] = out[j]
    for k in range(n_tri):
        p_scr[:, k:k + 1] = out[q + k]


def affine_filter(mode, n_steps, Rs, H_all, z_all, x0_s, q, n_block,
                  raw_q_const, chunk=None):
    pairs, _ = _tri_idx(q)
    n_tri = len(pairs)
    if chunk is None:
        chunk = _pick_chunk(n_steps, target=256)
    n_chunks = n_steps // chunk
    kern = functools.partial(_affine_kernel, mode, chunk, q, n_block,
                             n_tri, raw_q_const)
    outs = [
        jax.ShapeDtypeStruct((n_steps, n_block, q), jnp.float32),
        jax.ShapeDtypeStruct((n_steps, n_block, n_tri), jnp.float32),
    ]
    blk = lambda d: pl.BlockSpec((chunk, n_block, d), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    R_packed = _pack_tri(Rs, pairs)
    return pl.pallas_call(
        kern, out_shape=outs, grid=(n_chunks,),
        in_specs=[rep((n_block, n_tri)), blk(q), blk(1),
                  rep((n_block, q))],
        out_specs=[blk(q), blk(n_tri)],
        scratch_shapes=[
            pltpu.VMEM((n_block, q), jnp.float32),
            pltpu.VMEM((n_block, n_tri), jnp.float32),
        ],
        interpret=_interpret_mode("auto"),
    )(R_packed.astype(jnp.float32), H_all, z_all, x0_s)


def _mean_kernel(ode_flat, chunk, q, n_block, q_const,
                 k_ref, h_ref, th_ref, tv_ref, x0_ref,
                 mf_ref, m_scr):
    """Mean chain only: gain and H streamed, in-kernel f eval."""
    gi = pl.program_id(0)
    Qm = q_const
    tv_cols = [tv_ref[:, j:j + 1] for j in range(q)]

    @pl.when(gi == 0)
    def _init():
        m_scr[:] = x0_ref[:]

    def body(r, carry):
        m_cols = list(carry)
        mp_cols = _matvec(q, Qm, m_cols)
        x_cols = [mp_cols[j] * tv_cols[j] for j in range(q)]
        f0 = ode_flat(x_cols, th_ref, 0.0)
        H_cols = [h_ref[r, :, j:j + 1] for j in range(q)]
        hm = None
        for j in range(q):
            hm = _acc(hm, H_cols[j] * mp_cols[j])
        z = f0 - hm
        K_cols = [k_ref[r, :, j:j + 1] for j in range(q)]
        mf_cols = [mp_cols[i] + K_cols[i] * z for i in range(q)]
        for j in range(q):
            mf_ref[r, :, j:j + 1] = mf_cols[j]
        return tuple(mf_cols)

    m0 = [m_scr[:, j:j + 1] for j in range(q)]
    out = jax.lax.fori_loop(0, chunk, body, tuple(m0))
    for j in range(q):
        m_scr[:, j:j + 1] = out[j]


def mean_only(n_steps, K_all, H_all, theta_col, t_vec, x0_s, q, n_block,
              raw_q_const, chunk=None):
    if chunk is None:
        chunk = _pick_chunk(n_steps, target=256)
    n_chunks = n_steps // chunk
    kern = functools.partial(_mean_kernel, lorenz.lorenz_flat, chunk, q,
                             n_block, raw_q_const)
    outs = [jax.ShapeDtypeStruct((n_steps, n_block, q), jnp.float32)]
    blk = lambda d: pl.BlockSpec((chunk, n_block, d), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, out_shape=outs, grid=(n_chunks,),
        in_specs=[blk(q), blk(q), rep(theta_col.shape), rep((1, q)),
                  rep((n_block, q))],
        out_specs=[blk(q)],
        scratch_shapes=[pltpu.VMEM((n_block, q), jnp.float32)],
        interpret=_interpret_mode("auto"),
    )(K_all, H_all, theta_col.astype(jnp.float32),
      t_vec[None, :].astype(jnp.float32), x0_s)[0]


def main():
    s = setup()
    cfg, theta = s["cfg"], s["theta"]
    q, n_block = s["q"], s["n_block"]
    pairs, _ = _tri_idx(q)
    n_tri = len(pairs)
    res = {}
    thetas = jnp.broadcast_to(theta, (B_AMORT, 3)) * \
        (1 + 1e-6 * jnp.arange(B_AMORT, dtype=jnp.float32)[:, None])

    import time as _t
    print("start", _t.strftime("%H:%M:%S"), flush=True)

    # NEW: stationary-gain two-phase path (the round-3 latency design)
    res["stationary"] = timeit(
        lambda th: pk.solve_mv_fused_stationary(
            key=None, interrogate=interrogate_kramer, theta=th,
            ode_flat=lorenz.lorenz_flat, jac_flat=lorenz.lorenz_jac_flat,
            **cfg)[0], thetas)
    print("stationary", res["stationary"], flush=True)

    # end-to-end round-2 best
    res["full_k64_unroll"] = timeit(
        lambda th: pk.solve_mv_fused(
            key=None, interrogate=interrogate_kramer, theta=th,
            ode_flat=lorenz.lorenz_flat, jac_flat=lorenz.lorenz_jac_flat,
            k_compose=64, unroll=True, **cfg)[0], thetas)
    print("full_k64_unroll", res["full_k64_unroll"], flush=True)

    # filter alone
    def filt(th, unroll, chunk):
        theta_col = th[:, None]
        return pk.fused_filter(
            lorenz.lorenz_flat, lorenz.lorenz_jac_flat, N_STEPS,
            s["Qs"], s["Rs"], s["W_s"], s["x0_s"], theta_col,
            s["tgrid"], s["t_vec"], raw_q_const=s["raw_q_const"],
            unroll=unroll, chunk=chunk)[0]

    for label, un, ch in (("filter_unroll16", True, 16),
                          ("filter_chunk250", False, 250),
                          ("filter_unroll8", True, 8),
                          ("filter_unroll40", True, 40)):
        res[label] = timeit(
            functools.partial(filt, unroll=un, chunk=ch), thetas)
        print(label, res[label], flush=True)

    # smoother alone (composed k=64)
    theta_col = jnp.asarray(theta)[:, None]
    mf, pf, mp, pp = jax.jit(lambda th: pk.fused_filter(
        lorenz.lorenz_flat, lorenz.lorenz_jac_flat, N_STEPS,
        s["Qs"], s["Rs"], s["W_s"], s["x0_s"],
        th[:, None], s["tgrid"], s["t_vec"],
        raw_q_const=s["raw_q_const"], unroll=True, chunk=16))(theta)
    batch4 = lambda a: jnp.broadcast_to(a, (B_AMORT,) + a.shape) * \
        (1 + 1e-7 * jnp.arange(B_AMORT,
                               dtype=jnp.float32)[:, None, None, None])
    res["smoother_k64"] = timeit(
        lambda x: pk.fused_smoother_composed(
            N_STEPS, s["Qs"], s["Rs"], x[0][:-1], x[1][:-1], x[2][1:],
            x[3][1:], x[0][-1], x[1][-1], raw_q_const=s["raw_q_const"],
            k_compose=64)[0],
        (batch4(mf), batch4(pf), batch4(mp), batch4(pp)))
    print("smoother_k64", res["smoother_k64"], flush=True)

    # affine filter with streamed interrogations
    key = jax.random.PRNGKey(0)
    H_all = jax.random.normal(key, (N_STEPS, n_block, q)) * 0.1
    H_all = H_all.at[:, :, 1].add(1.0)
    z_all = jax.random.normal(key, (N_STEPS, n_block, 1)) * 0.1
    K_all = jax.random.normal(key, (N_STEPS, n_block, q)) * 0.1
    H_all, z_all, K_all = (H_all.astype(jnp.float32),
                           z_all.astype(jnp.float32),
                           K_all.astype(jnp.float32))
    bat = lambda a: jnp.broadcast_to(a, (B_AMORT,) + a.shape) * \
        (1 + 1e-7 * jnp.arange(B_AMORT,
                               dtype=jnp.float32)[:, None, None, None])

    for label, mode in (("affine_filter", "full"),
                        ("cov_gain_only", "cov")):
        res[label] = timeit(
            lambda hz, mode=mode: affine_filter(
                mode, N_STEPS, s["Rs"], hz[0], hz[1],
                x0_s=s["x0_s"], q=q, n_block=n_block,
                raw_q_const=s["raw_q_const"])[0],
            (bat(H_all), bat(z_all)))
        print(label, res[label], flush=True)

    res["mean_only"] = timeit(
        lambda kh: mean_only(
            N_STEPS, kh[0], kh[1],
            theta_col=theta_col.astype(jnp.float32),
            t_vec=s["t_vec"], x0_s=s["x0_s"], q=q, n_block=n_block,
            raw_q_const=s["raw_q_const"]),
        (bat(K_all), bat(H_all)))
    print("mean_only", res["mean_only"], flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
