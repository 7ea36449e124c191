"""
Sublane-fold experiment for the lane-batched fused filter.

The batch kernels hold state columns as (n_block, n_lane) registers; with
n_block = 3 only 3 of 8 sublanes of every vreg are live, so elementwise
per-step work runs at <= 37.5% vector utilization.  Folding lane groups
into the block axis — (3, 512) -> (12, 128) with block-major row order
(row = b*g + k) — packs the sublanes without changing any arithmetic:

- per-lane state columns:   (nb, B) -> reshape (nb, g, L) -> (nb*g, L)
- per-block constants R/W:  jnp.repeat(arr, g, axis=0)  (matches b*g+k)
- the model RHS slices rows in groups of g instead of 1.

This script measures the REAL fused filter (kramer/EK1, Lorenz63, 10k
steps) at several (B, g) points under the drain protocol, and checks the
folded output against the unfolded baseline bit-for-bit.
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
import numpy as np

from rodeo_tpu.models import lorenz
from rodeo_tpu.ops import pallas_kalman as pk
from rodeo_tpu.ops.precond import taylor_scale, scale_prior

N_STEPS = 10000
T_MAX = 20.0


def lorenz_flat_g(g):
    """Group-parameterized Lorenz RHS: block rows are g-tall groups."""
    def flat(x_cols, th, t):
        del t
        x0 = x_cols[0]
        x, y, z = x0[0:g], x0[g:2 * g], x0[2 * g:3 * g]
        rho, sigma, beta = th[0:g], th[g:2 * g], th[2 * g:3 * g]
        f0 = -sigma * x + sigma * y
        f1 = rho * x - y - x * z
        f2 = -beta * z + x * y
        return jnp.concatenate([f0, f1, f2], axis=0)
    return flat


def lorenz_jac_flat_g(g):
    def jac(x_cols, th, t):
        del x_cols, t
        sigma, beta = th[g:2 * g], th[2 * g:3 * g]
        one = jnp.ones_like(sigma)
        col0 = jnp.concatenate([-sigma, -one, -beta], axis=0)
        return [col0] + [None] * 2
    return jac


def build_inputs(B):
    cfg = lorenz.setup(n_steps=N_STEPS, t_max=T_MAX, dtype=jnp.float32)
    theta = cfg.pop("theta")
    q = 3
    t_vec = taylor_scale(T_MAX / N_STEPS, q, dtype=jnp.float32)
    Qs, Rs = scale_prior(cfg["prior_pars"], t_vec)
    x0 = cfg["ode_init"] / t_vec
    x0_lanes = jnp.broadcast_to(
        jnp.transpose(x0)[:, :, None], (q, 3, B)).astype(jnp.float32)
    thetas = jnp.broadcast_to(theta[:, None], (3, B)) \
        * (1 + 1e-6 * jnp.arange(B, dtype=jnp.float32)[None, :])
    tgrid = jnp.linspace(T_MAX / N_STEPS, T_MAX, N_STEPS,
                         dtype=jnp.float32)
    return dict(prior_weight=Qs, prior_var=Rs,
                ode_weight=(cfg["ode_weight"][:, 0, :] * t_vec[None, :]),
                x0_lanes=x0_lanes, theta_lanes=thetas, tgrid=tgrid,
                t_vec=t_vec)


def fold(inp, g):
    """Fold lane groups into the block axis (block-major rows)."""
    q = 3
    B = inp["x0_lanes"].shape[-1]
    L = B // g
    out = dict(inp)
    out["prior_weight"] = jnp.repeat(inp["prior_weight"], g, axis=0)
    out["prior_var"] = jnp.repeat(inp["prior_var"], g, axis=0)
    out["ode_weight"] = jnp.repeat(inp["ode_weight"], g, axis=0)
    out["x0_lanes"] = inp["x0_lanes"].reshape(q, 3 * g, L)
    out["theta_lanes"] = inp["theta_lanes"].reshape(3 * g, L)
    return out


def drain(o):
    np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0]


def measure(fn, arg, K=6):
    # NOTE: inputs must be precomputed — an eager op inside the timed
    # loop serializes the tunnel pipeline (measured: 24 -> 116 ms/pass)
    o = fn(arg)
    drain(o)
    t0 = time.perf_counter()
    drain(o)
    probe = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(K):
        o = fn(arg)
    drain(o)
    return (time.perf_counter() - t0 - probe) / K


def run_filter(inp, g, chunk=None, full=False):
    flat = lorenz_flat_g(g) if g > 1 else lorenz.lorenz_flat
    jac = lorenz_jac_flat_g(g) if g > 1 else lorenz.lorenz_jac_flat
    def f(thetas):
        outs = pk.fused_filter_batch(
            flat, jac, N_STEPS,
            inp["prior_weight"], inp["prior_var"], inp["ode_weight"],
            inp["x0_lanes"], thetas, inp["tgrid"], inp["t_vec"],
            chunk=chunk)
        if full:
            return outs[0]
        # scalar checksum: timing must not transfer the 184 MB output
        # over the tunnel (the kernel still writes it all to HBM)
        return outs[0][-1].sum() + outs[1][-1].sum()
    return jax.jit(f)


def main():
    res = {}
    # correctness: folded == baseline after unfold (g=4, B=512)
    inp = build_inputs(512)
    base = run_filter(inp, 1, full=True)(inp["theta_lanes"])
    f4 = fold(inp, 4)
    fol = run_filter(f4, 4, full=True)(f4["theta_lanes"])
    fol_u = fol.reshape(N_STEPS, 3, 3, 4, 128).reshape(N_STEPS, 3, 3, 512)
    err = float(jnp.max(jnp.abs(fol_u - base)))
    scale = float(jnp.max(jnp.abs(base)))
    res["fold4_max_abs_diff"] = err
    res["fold4_scale"] = scale
    print(f"fold g=4 vs baseline: max|diff|={err:.3g} (scale {scale:.3g})",
          flush=True)

    import os
    points = os.environ.get("FOLD_POINTS", "512:1,2,4;1024:1,4,8;2048:1,8,16")
    sweep = []
    for part in points.split(";"):
        Bs, gstr = part.split(":")
        sweep.append((int(Bs), tuple(int(x) for x in gstr.split(","))))
    for B, gs in sweep:
        inp = build_inputs(B)
        for g in gs:
            fi = fold(inp, g) if g > 1 else inp
            try:
                fn = run_filter(fi, g)
                t = measure(fn, fi["theta_lanes"])
            except Exception as e:  # noqa: BLE001
                res[f"B{B}_g{g}_error"] = repr(e)[:200]
                print(f"B={B} g={g}: ERROR {repr(e)[:120]}", flush=True)
                continue
            us = t * 1e6 / B
            res[f"B{B}_g{g}_us_per_solve"] = round(us, 3)
            print(f"B={B} g={g} ({3*g}x{B//g}): {us:.2f} us/solve "
                  f"({t*1e3:.1f} ms/pass)", flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
