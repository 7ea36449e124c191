"""
``scan_unroll`` is a pure scheduling knob: unrolled time loops must give
bit-identical results to the default (``jax.lax.scan`` semantics do not
change with ``unroll``; this pins the wrapper threading through every
solver / inference scan site).
"""
import numpy as np
import jax
import jax.numpy as jnp

import rodeo_tpu
from rodeo_tpu.ops import precond
from rodeo_tpu.ops.scan import scan_unroll, get_scan_unroll
from rodeo_tpu.inference import fenrir, dalton, magi_logdens
from rodeo_tpu.interrogate import interrogate_kramer
from problems import fitz_fun, fitz_setup


def _obs_model(setup, n_obs=6):
    obs_times = jnp.linspace(setup["t_min"], setup["t_max"], n_obs)
    D = jnp.zeros((n_obs, 2, 1, 3)).at[:, :, :, 0].set(1.0)
    Om = 0.01 * jnp.broadcast_to(jnp.eye(1), (n_obs, 2, 1, 1))
    y = jnp.asarray(
        np.random.default_rng(3).normal(size=(n_obs, 2, 1)))
    return dict(obs_data=y, obs_times=obs_times, obs_weight=D, obs_var=Om)


def test_unroll_context_restores():
    assert get_scan_unroll() is None      # auto by default
    with scan_unroll(8):
        assert get_scan_unroll() == 8
        with scan_unroll(4):
            assert get_scan_unroll() == 4
        assert get_scan_unroll() == 8
    assert get_scan_unroll() is None


def test_solve_mv_unroll_identical():
    s = fitz_setup(n_steps_per_unit=10, t_max=3.0)
    kw = dict(key=None, ode_fun=fitz_fun, ode_weight=s["W"],
              ode_init=s["x0_block"], t_min=s["t_min"], t_max=s["t_max"],
              n_steps=s["n_steps"], interrogate=interrogate_kramer,
              prior_pars=s["prior_pars"], theta=s["theta"])
    mu0, var0 = rodeo_tpu.solve_mv(**kw)
    with scan_unroll(4):
        mu4, var4 = jax.jit(lambda: rodeo_tpu.solve_mv(**kw))()
    # unrolling replays the identical per-step graph; the only deltas are
    # jit constant-folding of the trace-time prior coefficients (~1e-13)
    np.testing.assert_allclose(np.asarray(mu0), np.asarray(mu4),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(var0), np.asarray(var4),
                               rtol=1e-9, atol=1e-12)


def test_solve_sim_unroll_identical():
    s = fitz_setup(n_steps_per_unit=10, t_max=3.0)
    kw = dict(key=jax.random.PRNGKey(7), ode_fun=fitz_fun,
              ode_weight=s["W"], ode_init=s["x0_block"], t_min=s["t_min"],
              t_max=s["t_max"], n_steps=s["n_steps"],
              interrogate=interrogate_kramer, prior_pars=s["prior_pars"],
              method="eigh", theta=s["theta"])
    xs0 = rodeo_tpu.solve_sim(**kw)
    with scan_unroll(8):
        xs8 = jax.jit(lambda: rodeo_tpu.solve_sim(**kw))()
    np.testing.assert_array_equal(np.asarray(xs0), np.asarray(xs8))


def test_fenrir_dalton_unroll_identical():
    s = fitz_setup(n_steps_per_unit=10, t_max=3.0)
    obs = _obs_model(s)
    kw = dict(key=None, ode_fun=fitz_fun, ode_weight=s["W"],
              ode_init=s["x0_block"], t_min=s["t_min"], t_max=s["t_max"],
              n_steps=s["n_steps"], interrogate=interrogate_kramer,
              prior_pars=s["prior_pars"], theta=s["theta"], **obs)
    for fn in (fenrir, dalton, precond.fenrir, precond.dalton):
        ll0 = fn(**kw)
        with scan_unroll(8):
            ll8 = jax.jit(lambda f=fn: f(**kw))()
        # unrolling moves XLA fusion boundaries, so reassociation can
        # perturb the last ulp or two — but nothing more
        np.testing.assert_allclose(np.asarray(ll0), np.asarray(ll8),
                                   rtol=1e-12)


def test_magi_unroll_identical():
    s = fitz_setup(n_steps_per_unit=10, t_max=3.0)
    mu, _ = rodeo_tpu.solve_mv(
        key=None, ode_fun=fitz_fun, ode_weight=s["W"],
        ode_init=s["x0_block"], t_min=s["t_min"], t_max=s["t_max"],
        n_steps=s["n_steps"], interrogate=interrogate_kramer,
        prior_pars=s["prior_pars"], theta=s["theta"])

    def expand(u, **p):
        pad = jnp.zeros(u.shape[:-1] + (1,), u.dtype)
        return jnp.concatenate([u, pad], axis=-1)

    kw = dict(ode_data_subset=mu[:, :, :2], ode_expand=expand, n_active=2,
              prior_pars=s["prior_pars"], kalman_type="standard")
    ll0 = magi_logdens(**kw)
    with scan_unroll(8):
        ll8 = jax.jit(lambda: magi_logdens(**kw))()
    np.testing.assert_array_equal(np.asarray(ll0), np.asarray(ll8))


def test_scan_remat_identical_value_and_grad():
    """`scan_remat` changes the reverse-pass schedule only: value and
    gradient match the default to fp-roundoff."""
    from rodeo_tpu.ops.scan import scan_remat
    s = fitz_setup(n_steps_per_unit=10, t_max=3.0)
    obs = _obs_model(s)
    kw = dict(key=None, ode_fun=fitz_fun, ode_weight=s["W"],
              ode_init=s["x0_block"], t_min=s["t_min"], t_max=s["t_max"],
              n_steps=s["n_steps"], interrogate=interrogate_kramer,
              prior_pars=s["prior_pars"], **obs)
    f = lambda th: fenrir(theta=th, **kw)
    v0, g0 = jax.value_and_grad(f)(s["theta"])
    with scan_remat(), scan_unroll(4):
        v1, g1 = jax.jit(jax.value_and_grad(f))(s["theta"])
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-8)
