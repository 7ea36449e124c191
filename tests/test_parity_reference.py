"""
Numerical parity tests against the upstream reference (mlysy/rodeo), imported
read-only from /root/reference/src and executed on CPU in float64.

These verify the BASELINE requirement that solver outputs and fenrir/dalton
log-likelihood values match the reference to ~1e-8.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/reference/src")

import importlib  # noqa: E402

try:
    import rodeo as ref_rodeo  # noqa: E402
    import rodeo.interrogate as ref_interrogate  # noqa: E402
    from rodeo.prior import ibm_init as ref_ibm_init  # noqa: E402
except ImportError:  # upstream checkout absent (e.g. CI): skip the module
    pytest.skip("reference rodeo checkout not available",
                allow_module_level=True)

# the `fenrir`/`dalton`/`magi_logdens` function re-exports shadow the
# submodule attributes (in both libraries), so resolve modules explicitly
ref_fenrir_mod = importlib.import_module("rodeo.inference.fenrir")
ref_dalton_mod = importlib.import_module("rodeo.inference.dalton")
ref_magi_mod = importlib.import_module("rodeo.inference.magi")

import rodeo_tpu  # noqa: E402
import rodeo_tpu.interrogate as tpu_interrogate  # noqa: E402
from rodeo_tpu.prior import ibm_init  # noqa: E402

tpu_fenrir_mod = importlib.import_module("rodeo_tpu.inference.fenrir")
tpu_dalton_mod = importlib.import_module("rodeo_tpu.inference.dalton")
tpu_magi_mod = importlib.import_module("rodeo_tpu.inference.magi")

from problems import fitz_fun, fitz_setup


@pytest.fixture(scope="module")
def fitz():
    return fitz_setup(n_steps_per_unit=10, t_max=6.0)


def _solve_kwargs(fitz, interrogate, **extra):
    kw = dict(
        key=fitz["key"], ode_fun=fitz_fun, ode_weight=fitz["W"],
        ode_init=fitz["x0_block"], t_min=fitz["t_min"], t_max=fitz["t_max"],
        n_steps=fitz["n_steps"], interrogate=interrogate,
        prior_pars=fitz["prior_pars"], theta=fitz["theta"])
    kw.update(extra)
    return kw


def test_ibm_init_parity():
    ours = ibm_init(0.05, 4, jnp.array([0.1, 0.5, 2.0]))
    theirs = ref_ibm_init(0.05, 4, jnp.array([0.1, 0.5, 2.0]))
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a, b, rtol=1e-12)


@pytest.mark.parametrize("name", ["rodeo", "schober", "kramer"])
def test_solve_mv_parity(fitz, name):
    ours_i = getattr(tpu_interrogate, f"interrogate_{name}")
    ref_i = getattr(ref_interrogate, f"interrogate_{name}")
    mu, var = rodeo_tpu.solve_mv(**_solve_kwargs(fitz, ours_i))
    mu_r, var_r = ref_rodeo.solve_mv(**_solve_kwargs(fitz, ref_i))
    np.testing.assert_allclose(mu, mu_r, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(var, var_r, rtol=1e-8, atol=1e-12)


def test_solve_mv_chkrebtii_parity(fitz):
    """Same key => bit-compatible stochastic interrogation draws."""
    from functools import partial
    ours_i = partial(tpu_interrogate.interrogate_chkrebtii,
                     kalman_type="standard")
    ref_i = partial(ref_interrogate.interrogate_chkrebtii,
                    kalman_type="standard")
    mu, _ = rodeo_tpu.solve_mv(**_solve_kwargs(fitz, ours_i))
    mu_r, _ = ref_rodeo.solve_mv(**_solve_kwargs(fitz, ref_i))
    np.testing.assert_allclose(mu, mu_r, rtol=1e-9, atol=1e-12)


def test_solve_sim_parity(fitz):
    xs = rodeo_tpu.solve_sim(
        **_solve_kwargs(fitz, tpu_interrogate.interrogate_rodeo))
    xs_r = ref_rodeo.solve_sim(
        **_solve_kwargs(fitz, ref_interrogate.interrogate_rodeo))
    np.testing.assert_allclose(xs, xs_r, rtol=1e-7, atol=1e-9)


def _obs_setup(fitz, rng):
    """Noisy partial observations of the FitzHugh solution on a coarse grid."""
    n_obs = 7
    obs_times = jnp.linspace(fitz["t_min"], fitz["t_max"], n_obs)
    n_block = fitz["n_vars"]
    n_bobs = 1
    obs_weight = jnp.zeros((n_obs, n_block, n_bobs, fitz["n_deriv"]))
    obs_weight = obs_weight.at[:, :, :, 0].set(1.0)
    obs_var = 0.01 * jnp.broadcast_to(
        jnp.eye(n_bobs), (n_obs, n_block, n_bobs, n_bobs))
    obs_data = jnp.asarray(
        rng.standard_normal((n_obs, n_block, n_bobs)) * 0.1
        + np.array([[-1.0], [1.0]]))
    return obs_data, obs_times, obs_weight, obs_var


def test_fenrir_parity(fitz):
    rng = np.random.default_rng(7)
    obs_data, obs_times, obs_weight, obs_var = _obs_setup(fitz, rng)
    kw = dict(obs_data=obs_data, obs_times=obs_times,
              obs_weight=obs_weight, obs_var=obs_var)
    ll = tpu_fenrir_mod.fenrir(
        **_solve_kwargs(fitz, tpu_interrogate.interrogate_kramer), **kw)
    ll_r = ref_fenrir_mod.fenrir(
        **_solve_kwargs(fitz, ref_interrogate.interrogate_kramer), **kw)
    np.testing.assert_allclose(ll, ll_r, rtol=1e-8)

    mu, var = tpu_fenrir_mod.solve_mv(
        **_solve_kwargs(fitz, tpu_interrogate.interrogate_kramer), **kw)
    mu_r, var_r = ref_fenrir_mod.solve_mv(
        **_solve_kwargs(fitz, ref_interrogate.interrogate_kramer), **kw)
    np.testing.assert_allclose(mu, mu_r, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(var, var_r, rtol=1e-7, atol=1e-10)


def test_dalton_parity(fitz):
    rng = np.random.default_rng(8)
    obs_data, obs_times, obs_weight, obs_var = _obs_setup(fitz, rng)
    kw = dict(obs_data=obs_data, obs_times=obs_times,
              obs_weight=obs_weight, obs_var=obs_var)
    ll = tpu_dalton_mod.dalton(
        **_solve_kwargs(fitz, tpu_interrogate.interrogate_kramer), **kw)
    ll_r = ref_dalton_mod.dalton(
        **_solve_kwargs(fitz, ref_interrogate.interrogate_kramer), **kw)
    np.testing.assert_allclose(ll, ll_r, rtol=1e-8)

    mu, var = tpu_dalton_mod.solve_mv(
        **_solve_kwargs(fitz, tpu_interrogate.interrogate_kramer), **kw)
    mu_r, var_r = ref_dalton_mod.solve_mv(
        **_solve_kwargs(fitz, ref_interrogate.interrogate_kramer), **kw)
    np.testing.assert_allclose(mu, mu_r, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(var, var_r, rtol=1e-7, atol=1e-10)

    xs = tpu_dalton_mod.solve_sim(
        **_solve_kwargs(fitz, tpu_interrogate.interrogate_kramer), **kw)
    xs_r = ref_dalton_mod.solve_sim(
        **_solve_kwargs(fitz, ref_interrogate.interrogate_kramer), **kw)
    np.testing.assert_allclose(xs, xs_r, rtol=1e-7, atol=1e-9)


def test_daltonng_parity(fitz):
    """Parity is checked with a FULL-rank observation log-likelihood (one
    informing every state component): with a partially-observed state, the
    reference's Laplace pseudo-observation produces zero-weight/
    zero-variance rows that make the stacked innovation matrix exactly
    singular, and upstream ``dalton.py:613-622`` returns NaN (this was
    previously hidden by ``assert_allclose``'s ``equal_nan=True``
    default).  Our implementation regularizes those vacuous rows to exact
    identity updates; the partially-observed case is covered by
    ``test_daltonng_partial_obs_finite``."""
    rng = np.random.default_rng(9)
    obs_data, obs_times, obs_weight, obs_var = _obs_setup(fitz, rng)

    def obs_loglik_i(obs_data_i, state, i, **params):
        # Gaussian loglik informing ALL state components of each block
        return jnp.sum(
            -0.5 * (obs_data_i[:, 0:1] - state) ** 2 / 0.01
            - 0.5 * jnp.log(2 * jnp.pi * 0.01))

    kw = dict(obs_data=obs_data, obs_times=obs_times,
              obs_loglik_i=obs_loglik_i)
    ll = tpu_dalton_mod.daltonng(
        **_solve_kwargs(fitz, tpu_interrogate.interrogate_kramer), **kw)
    ll_r = ref_dalton_mod.daltonng(
        **_solve_kwargs(fitz, ref_interrogate.interrogate_kramer), **kw)
    assert np.isfinite(float(ll_r)), "reference NaN: fixture invalid"
    np.testing.assert_allclose(ll, ll_r, rtol=1e-7, equal_nan=False)

    mu, var = tpu_dalton_mod.solve_mv_nn(
        **_solve_kwargs(fitz, tpu_interrogate.interrogate_kramer), **kw)
    mu_r, var_r = ref_dalton_mod.solve_mv_nn(
        **_solve_kwargs(fitz, ref_interrogate.interrogate_kramer), **kw)
    assert np.all(np.isfinite(np.asarray(mu_r)))
    np.testing.assert_allclose(mu, mu_r, rtol=1e-8, atol=1e-10,
                               equal_nan=False)


def test_daltonng_partial_obs_finite(fitz):
    """With a partially-observed state the reference NaNs (exactly
    singular stacked innovation); the vacuous-row regularization keeps
    ours finite — a deliberate, documented fix, not a parity bug."""
    rng = np.random.default_rng(9)
    obs_data, obs_times, obs_weight, obs_var = _obs_setup(fitz, rng)

    def obs_loglik_i(obs_data_i, state, i, **params):
        mean = state[:, 0]
        return jnp.sum(
            -0.5 * (obs_data_i[:, 0] - mean) ** 2 / 0.01
            - 0.5 * jnp.log(2 * jnp.pi * 0.01))

    kw = dict(obs_data=obs_data, obs_times=obs_times,
              obs_loglik_i=obs_loglik_i)
    ll = tpu_dalton_mod.daltonng(
        **_solve_kwargs(fitz, tpu_interrogate.interrogate_kramer), **kw)
    assert np.isfinite(float(ll)), "daltonng not finite on partial obs"
    ll_r = ref_dalton_mod.daltonng(
        **_solve_kwargs(fitz, ref_interrogate.interrogate_kramer), **kw)
    assert not np.isfinite(float(ll_r)), (
        "reference is now finite here; restore the strict parity check")


def test_magi_parity(fitz):
    rng = np.random.default_rng(10)
    # NB: with exact (zero-noise) pseudo-observations the magi filter
    # recursion amplifies fp rounding ~15x per step, so any two correct
    # implementations diverge beyond ~8 steps; parity is checked on the
    # numerically stable range (a joint-MVN oracle test covers correctness).
    n_steps = 6
    n_vars = fitz["n_vars"]
    q = fitz["n_deriv"]
    # smooth low-amplitude trajectory + unit-scale prior, so the logdens is
    # well conditioned and parity can be checked tightly
    U = 0.1 * jnp.cumsum(
        jnp.asarray(rng.standard_normal((n_steps + 1, n_vars, q - 1))),
        axis=0)
    prior_pars = ibm_init(0.5, q, jnp.ones(n_vars))

    def ode_expand(u, **params):
        pad = jnp.zeros(u.shape[:-1] + (1,))
        return jnp.concatenate([u, pad], axis=-1)

    ll = tpu_magi_mod.magi_logdens(
        ode_data_subset=U, ode_expand=ode_expand, n_active=2,
        prior_pars=prior_pars, kalman_type="standard")
    ll_r = ref_magi_mod.magi_logdens(
        ode_data_subset=U, ode_expand=ode_expand, n_active=2,
        prior_pars=prior_pars, kalman_type="standard")
    np.testing.assert_allclose(ll, ll_r, rtol=1e-8)


def test_basic_parity(fitz):
    ref_basic_mod = importlib.import_module("rodeo.inference.basic")
    tpu_basic_mod = importlib.import_module("rodeo_tpu.inference.basic")
    rng = np.random.default_rng(11)
    obs_data, obs_times, _, _ = _obs_setup(fitz, rng)

    def obs_loglik(obs_data, ode_data, **params):
        return jnp.sum(
            -0.5 * (obs_data[..., 0] - ode_data[..., 0]) ** 2 / 0.01)

    kw = dict(obs_data=obs_data, obs_times=obs_times, obs_loglik=obs_loglik)
    ll, Xt = tpu_basic_mod.basic(
        **_solve_kwargs(fitz, tpu_interrogate.interrogate_rodeo), **kw)
    ll_r, Xt_r = ref_basic_mod.basic(
        **_solve_kwargs(fitz, ref_interrogate.interrogate_rodeo), **kw)
    np.testing.assert_allclose(ll, ll_r, rtol=1e-8)
    np.testing.assert_allclose(Xt, Xt_r, rtol=1e-8, atol=1e-11)
