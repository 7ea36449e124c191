"""
Time-sharded parallel-in-time filter/smoother tests (8 virtual CPU devices,
f64): exact agreement with the single-chip associative-scan path and with
the sequential scans, plus the divisibility guard.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rodeo_tpu.kalmantv import standard
from rodeo_tpu.ops.ptime import (
    parallel_filter, parallel_smooth_mv, solve_mv_iterated)
from rodeo_tpu.parallel import (
    make_mesh, sharded_parallel_filter, sharded_parallel_smooth_mv,
    sharded_solve_mv_iterated)
from rodeo_tpu.interrogate import interrogate_kramer
from problems import fitz_fun, fitz_setup


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(axis_name="time")


@pytest.fixture(scope="module")
def affine_model():
    """Random affine state-space model, n_steps divisible by 8 devices."""
    rng = np.random.default_rng(11)
    n_steps, n_block, s, m = 48, 2, 3, 1
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


def _filter_args(mdl):
    return dict(
        mean_init=mdl["m0"], var_init=mdl["P0"],
        prior_weight=mdl["Q"], prior_var=mdl["R"],
        wgt_meas=mdl["H"], mean_meas=mdl["d"],
        var_meas=mdl["V"], x_meas=mdl["y"])


def test_sharded_filter_matches_single_chip(affine_model, mesh):
    out_s = sharded_parallel_filter(
        mesh=mesh, **_filter_args(affine_model))
    out_1 = parallel_filter(**_filter_args(affine_model))
    for k in ("state_filt", "state_pred"):
        for i in range(2):
            np.testing.assert_allclose(out_s[k][i], out_1[k][i],
                                       rtol=1e-9, atol=1e-11)


def test_sharded_filter_nonzero_init(affine_model, mesh):
    mdl = dict(affine_model)
    rng = np.random.default_rng(7)
    a = rng.standard_normal((2, 3, 3))
    mdl["P0"] = jnp.asarray(0.1 * np.einsum("bij,bkj->bik", a, a))
    out_s = sharded_parallel_filter(mesh=mesh, **_filter_args(mdl))
    out_1 = parallel_filter(**_filter_args(mdl))
    for k in ("state_filt", "state_pred"):
        for i in range(2):
            np.testing.assert_allclose(out_s[k][i], out_1[k][i],
                                       rtol=1e-9, atol=1e-11)


def test_sharded_filter_jit(affine_model, mesh):
    """The sharded filter must trace/compile under jit."""
    fn = jax.jit(lambda **kw: sharded_parallel_filter(mesh=mesh, **kw))
    out_s = fn(**_filter_args(affine_model))
    out_1 = parallel_filter(**_filter_args(affine_model))
    np.testing.assert_allclose(out_s["state_filt"][0],
                               out_1["state_filt"][0],
                               rtol=1e-9, atol=1e-11)


def test_sharded_smoother_matches_single_chip(affine_model, mesh):
    mdl = affine_model
    out = parallel_filter(**_filter_args(mdl))
    args = dict(
        ode_init=mdl["m0"],
        mean_state_filt=out["state_filt"][0],
        var_state_filt=out["state_filt"][1],
        mean_state_pred=out["state_pred"][0],
        var_state_pred=out["state_pred"][1],
        prior_weight=mdl["Q"], prior_var=mdl["R"])
    mu_s, var_s = sharded_parallel_smooth_mv(mesh=mesh, **args)
    mu_1, var_1 = parallel_smooth_mv(**args)
    np.testing.assert_allclose(mu_s, mu_1, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(var_s, var_1, rtol=1e-9, atol=1e-11)


def test_sharded_filter_divisibility_guard(affine_model, mesh):
    mdl = {k: (v[:-1] if isinstance(v, jnp.ndarray) and v.ndim and
               v.shape[0] == affine_model["n_steps"] else v)
           for k, v in affine_model.items()}
    with pytest.raises(ValueError, match="divisible"):
        sharded_parallel_filter(mesh=mesh, **_filter_args(mdl))


def test_sharded_iterated_solve_fitz(mesh):
    """Multi-chip iterated parallel solve == single-chip iterated solve ==
    (to solver tolerance) the sequential solve, on FitzHugh-Nagumo."""
    fitz = fitz_setup()
    kwargs = dict(
        key=None, ode_fun=fitz_fun, ode_weight=fitz["W"],
        ode_init=fitz["x0_block"], t_min=fitz["t_min"],
        t_max=fitz["t_max"], n_steps=fitz["n_steps"],
        interrogate=interrogate_kramer,
        prior_pars=fitz["prior_pars"], n_iter=10, theta=fitz["theta"])
    # jit the full sharded pipeline (mesh and callables close over) —
    # eager shard_map dispatch over 8 virtual devices is pathologically
    # slow, and real users run the solver jitted anyway
    mu_s, var_s = jax.jit(
        lambda prior_pars, theta: sharded_solve_mv_iterated(
            mesh=mesh, **{**kwargs, "prior_pars": prior_pars,
                          "theta": theta}))(
        kwargs["prior_pars"], kwargs["theta"])
    mu_1, var_1 = jax.jit(
        lambda prior_pars, theta: solve_mv_iterated(
            **{**kwargs, "prior_pars": prior_pars, "theta": theta}))(
        kwargs["prior_pars"], kwargs["theta"])
    np.testing.assert_allclose(mu_s, mu_1, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(var_s, var_1, rtol=1e-7, atol=1e-10)


def test_sharded_filter_tv_matches_single_chip(mesh):
    """Time-varying sharded filter == single-chip tv parallel filter."""
    from rodeo_tpu.ops.ptime import parallel_filter_tv
    from rodeo_tpu.parallel import sharded_parallel_filter_tv
    rng = np.random.default_rng(21)
    n_steps, n_block, s, m = 48, 2, 3, 1
    Q = jnp.asarray(0.4 * rng.standard_normal((n_steps, n_block, s, s)))
    c = jnp.asarray(rng.standard_normal((n_steps, n_block, s)))
    a = rng.standard_normal((n_steps, n_block, s, s))
    R = jnp.asarray(np.einsum("nbij,nbkj->nbik", a, a) + 0.5 * np.eye(s))
    H = jnp.asarray(rng.standard_normal((n_steps, n_block, m, s)))
    d = jnp.asarray(rng.standard_normal((n_steps, n_block, m)))
    cc = rng.standard_normal((n_steps, n_block, m, m))
    V = jnp.asarray(np.einsum("nbij,nbkj->nbik", cc, cc) + 0.1 * np.eye(m))
    y = jnp.asarray(rng.standard_normal((n_steps, n_block, m)))
    m0 = jnp.asarray(rng.standard_normal((n_block, s)))
    a0 = rng.standard_normal((n_block, s, s))
    P0 = jnp.asarray(0.2 * np.einsum("bij,bkj->bik", a0, a0))
    args = dict(mean_init=m0, var_init=P0, wgt_state=Q, mean_state=c,
                var_state=R, wgt_meas=H, mean_meas=d, var_meas=V,
                x_meas=y)
    out_s = jax.jit(lambda: sharded_parallel_filter_tv(mesh=mesh, **args))()
    out_1 = parallel_filter_tv(**args)
    for k in ("state_filt", "state_pred"):
        for i in range(2):
            np.testing.assert_allclose(out_s[k][i], out_1[k][i],
                                       rtol=1e-9, atol=1e-11)
