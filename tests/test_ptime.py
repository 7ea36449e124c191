"""
Parallel-in-time associative-scan filter/smoother tests: exact agreement
with the sequential scans, and convergence of the iterated solver.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import rodeo_tpu
from rodeo_tpu.kalmantv import standard
from rodeo_tpu.ops.ptime import (
    parallel_filter, parallel_smooth_mv, solve_mv_iterated)
from rodeo_tpu.interrogate import interrogate_rodeo, interrogate_kramer
from problems import fitz_fun, fitz_setup


@pytest.fixture(scope="module")
def affine_model():
    """Random affine state-space model over a block axis."""
    rng = np.random.default_rng(3)
    n_steps, n_block, s, m = 40, 2, 3, 1
    Q = jnp.asarray(0.5 * rng.standard_normal((n_block, s, s)))
    a = rng.standard_normal((n_block, s, s))
    R = jnp.asarray(np.einsum("bij,bkj->bik", a, a) + np.eye(s))
    H = jnp.asarray(rng.standard_normal((n_steps, n_block, m, s)))
    d = jnp.asarray(rng.standard_normal((n_steps, n_block, m)))
    c = rng.standard_normal((n_steps, n_block, m, m))
    V = jnp.asarray(np.einsum("nbij,nbkj->nbik", c, c) + 0.1 * np.eye(m))
    y = jnp.asarray(rng.standard_normal((n_steps, n_block, m)))
    m0 = jnp.asarray(rng.standard_normal((n_block, s)))
    P0 = jnp.zeros((n_block, s, s))
    return dict(Q=Q, R=R, H=H, d=d, V=V, y=y, m0=m0, P0=P0,
                n_steps=n_steps)


def _sequential_filter(mdl):
    """Reference: sequential scan of the standard kernels."""
    def step(carry, xs):
        mf, vf = carry
        H, d, V, y = xs
        mp, vp = standard.predict(
            mf, vf, jnp.zeros_like(mf), mdl["Q"], mdl["R"])
        mf2, vf2 = standard.update(mp, vp, y, d, H, V)
        return (mf2, vf2), (mp, vp, mf2, vf2)

    _, (mp, vp, mf, vf) = jax.lax.scan(
        step, (mdl["m0"], mdl["P0"]),
        (mdl["H"], mdl["d"], mdl["V"], mdl["y"]))
    return mp, vp, mf, vf


def test_parallel_filter_matches_sequential(affine_model):
    mdl = affine_model
    out = parallel_filter(
        mean_init=mdl["m0"], var_init=mdl["P0"],
        prior_weight=mdl["Q"], prior_var=mdl["R"],
        wgt_meas=mdl["H"], mean_meas=mdl["d"],
        var_meas=mdl["V"], x_meas=mdl["y"])
    mp, vp, mf, vf = _sequential_filter(mdl)
    np.testing.assert_allclose(out["state_filt"][0][1:], mf,
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(out["state_filt"][1][1:], vf,
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(out["state_pred"][0][1:], mp,
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(out["state_pred"][1][1:], vp,
                               rtol=1e-8, atol=1e-10)


def test_parallel_filter_nonzero_init(affine_model):
    mdl = dict(affine_model)
    rng = np.random.default_rng(5)
    a = rng.standard_normal((2, 3, 3))
    mdl["P0"] = jnp.asarray(0.1 * np.einsum("bij,bkj->bik", a, a))
    out = parallel_filter(
        mean_init=mdl["m0"], var_init=mdl["P0"],
        prior_weight=mdl["Q"], prior_var=mdl["R"],
        wgt_meas=mdl["H"], mean_meas=mdl["d"],
        var_meas=mdl["V"], x_meas=mdl["y"])
    mp, vp, mf, vf = _sequential_filter(mdl)
    np.testing.assert_allclose(out["state_filt"][0][1:], mf,
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(out["state_filt"][1][1:], vf,
                               rtol=1e-8, atol=1e-10)


@pytest.fixture(scope="module")
def fitz():
    return fitz_setup()


def test_solve_mv_parallel_smoother(fitz):
    """solve_mv(temporal='parallel') == solve_mv(temporal='sequential')."""
    kwargs = dict(
        key=None, ode_fun=fitz_fun, ode_weight=fitz["W"],
        ode_init=fitz["x0_block"], t_min=fitz["t_min"], t_max=fitz["t_max"],
        n_steps=fitz["n_steps"], interrogate=interrogate_kramer,
        prior_pars=fitz["prior_pars"], theta=fitz["theta"])
    mu_s, var_s = rodeo_tpu.solve_mv(temporal="sequential", **kwargs)
    mu_p, var_p = rodeo_tpu.solve_mv(temporal="parallel", **kwargs)
    np.testing.assert_allclose(mu_p, mu_s, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(var_p, var_s, rtol=1e-6, atol=1e-10)


def test_solve_mv_parallel_smoother_sqrt(fitz):
    """Parallel smoother in square-root mode matches standard covariances."""
    prior_weight, prior_var = fitz["prior_pars"]
    kwargs = dict(
        key=None, ode_fun=fitz_fun, ode_weight=fitz["W"],
        ode_init=fitz["x0_block"], t_min=fitz["t_min"], t_max=fitz["t_max"],
        n_steps=fitz["n_steps"], interrogate=interrogate_kramer,
        theta=fitz["theta"])
    mu_s, var_s = rodeo_tpu.solve_mv(
        prior_pars=fitz["prior_pars"], kalman_type="standard", **kwargs)
    mu_p, chol_p = rodeo_tpu.solve_mv(
        prior_pars=(prior_weight, jnp.linalg.cholesky(prior_var)),
        kalman_type="square-root", temporal="parallel", **kwargs)
    np.testing.assert_allclose(mu_p, mu_s, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        chol_p @ jnp.swapaxes(chol_p, -1, -2), var_s, rtol=1e-5, atol=1e-8)


def test_solve_mv_iterated_converges(fitz):
    """The iterated parallel solver converges to the sequential solution.

    Only the first-order (kramer/EK1) interrogation yields a contractive
    global-relinearization map — zero-order schemes are plain Picard
    iterations whose global map has spectral radius > 1 on stiff systems
    (hence parallel-in-time ODE filters use EK1; cf. Bosch et al 2023)."""
    kwargs = dict(
        key=None, ode_fun=fitz_fun, ode_weight=fitz["W"],
        ode_init=fitz["x0_block"], t_min=fitz["t_min"], t_max=fitz["t_max"],
        n_steps=fitz["n_steps"], interrogate=interrogate_kramer,
        prior_pars=fitz["prior_pars"], theta=fitz["theta"])
    mu_s, var_s = rodeo_tpu.solve_mv(**kwargs)
    mu_p, var_p = solve_mv_iterated(n_iter=40, **kwargs)
    np.testing.assert_allclose(mu_p, mu_s, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(var_p, var_s, rtol=1e-5, atol=1e-11)
    # jittability of the full parallel-in-time pipeline
    mu_j, _ = jax.jit(
        lambda th: solve_mv_iterated(
            n_iter=40, **{**kwargs, "theta": th}))(fitz["theta"])
    np.testing.assert_allclose(mu_j, mu_p, rtol=1e-10)


def test_windowed_iterated_chaotic_lorenz():
    """Windowed parallel-in-time on a CHAOTIC horizon: each window is
    warm-started from its carried boundary state (a global coarse warm
    start diverges from the true trajectory and used to poison every
    window), transient relinearization excursions are clamped instead of
    NaN-locking, and with enough sweeps per window the result matches the
    sequential solution exactly."""
    from rodeo_tpu.models import lorenz
    cfg = lorenz.setup(n_steps=1000, t_max=5.0, dtype=jnp.float64)
    th = cfg.pop("theta")
    mu_s, _ = rodeo_tpu.solve_mv(
        key=None, interrogate=interrogate_kramer, theta=th, **cfg)
    mu_p, _ = solve_mv_iterated(
        key=None, interrogate=interrogate_kramer, theta=th,
        n_iter=40, window_size=100, window_warm="boundary", **cfg)
    np.testing.assert_allclose(np.asarray(mu_p[:, :, 0]),
                               np.asarray(mu_s[:, :, 0]),
                               rtol=1e-6, atol=1e-6)
