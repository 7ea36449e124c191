"""Large-state (dense-layout) non-Gaussian DALTON.

Completes the five-method inference matrix in the d >> 1 regime:
``daltonng`` runs on the heat semi-discretization through the
preconditioned dense path (`rodeo_tpu/ops/precond.py:daltonng`), with two
oracles:

1. **Gaussian-observation identity**: with a Gaussian ``obs_loglik_i`` the
   Laplace linearization is exact, and Chib's identity
   ``log p(Y|Z) = log p(Y|x*) + log p(x*|Z) - log p(x*|Y,Z)`` holds at any
   path ``x*`` for a linear-Gaussian model — so ``daltonng`` must equal the
   Gaussian ``dalton`` on the same data to numerical precision.
2. **Coordinate invariance**: the ``n_deriv`` Taylor-scaled dense layout
   must reproduce the plain implementation's value.

Reference semantics: /root/reference/src/rodeo/inference/dalton.py:550-698
(``_solve_filter_nn``) and :849-949 (``daltonng`` assembly); the reference
has no large-state configuration or test for this path.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from rodeo_tpu.interrogate import interrogate_kramer
from rodeo_tpu.models import heat
from rodeo_tpu.ops import precond
from rodeo_tpu.inference import daltonng as daltonng_plain


def _heat_fixture(d=16, p=3, n_steps=100, n_obs=8, obs_sd=0.01, seed=0):
    """Mild heat configuration (plain f64 path stable) with grid-aligned
    observation times strictly after t0 and a kappa-keyword RHS."""
    cfg = heat.setup(d=d, n_deriv=p, n_steps=n_steps, kappa=0.002,
                     prior_sigma=0.5, dtype=jnp.float64)
    exact = cfg.pop("exact")
    cfg.pop("n_deriv")
    obs_idx = np.linspace(n_steps // n_obs, n_steps, n_obs, dtype=int)
    obs_times = jnp.array(
        cfg["t_min"] + obs_idx * (cfg["t_max"] - cfg["t_min"]) / n_steps)
    rng = np.random.default_rng(seed)
    u_true = np.stack([exact(float(t)) for t in obs_times])
    y = u_true[:, None, :] + obs_sd * rng.standard_normal((n_obs, 1, d))
    kw = dict(key=None, ode_fun=cfg["ode_fun"],
              ode_weight=cfg["ode_weight"], ode_init=cfg["ode_init"],
              t_min=cfg["t_min"], t_max=cfg["t_max"], n_steps=n_steps,
              interrogate=interrogate_kramer,
              prior_pars=cfg["prior_pars"],
              obs_times=obs_times)
    return kw, jnp.asarray(y), u_true, d, p, obs_sd


def _gauss_loglik(d, p, obs_sd):
    """Normalized Gaussian obs log-likelihood on the position coordinates
    of the dense interleaved state."""
    c = float(d) * (np.log(obs_sd) + 0.5 * np.log(2.0 * np.pi))

    def obs_ll(y_i, x_i, i, **params):
        u = x_i[0, ::p]
        return jnp.sum(-0.5 * ((y_i[0] - u) / obs_sd) ** 2) - c

    return obs_ll


def test_daltonng_gaussian_matches_dalton():
    """Laplace is exact for Gaussian observations and Chib's identity is
    exact for the linear(-izable affine) heat model, so daltonng ==
    Gaussian dalton on identical data."""
    kw, y, _, d, p, obs_sd = _heat_fixture()
    n_obs = y.shape[0]
    D = np.zeros((n_obs, 1, d, d * p))
    for i in range(d):
        D[:, 0, i, i * p] = 1.0
    ll_g = float(precond.dalton(
        obs_data=y, obs_weight=jnp.asarray(D),
        obs_var=(obs_sd ** 2) * jnp.broadcast_to(
            jnp.eye(d), (n_obs, 1, d, d)),
        n_deriv=p, **kw))
    ll_ng = float(precond.daltonng(
        obs_data=y, obs_loglik_i=_gauss_loglik(d, p, obs_sd),
        n_deriv=p, **kw))
    assert np.isfinite(ll_g) and np.isfinite(ll_ng)
    # "relative error below 1e-6": allclose's bound is rtol*|desired|,
    # so expressing it via atol avoids double-multiplying by |ll_g|
    np.testing.assert_allclose(ll_ng, ll_g, rtol=0,
                               atol=1e-6 * max(1.0, abs(ll_g)))


def test_daltonng_dense_layout_invariance():
    """precond.daltonng (Taylor-scaled coordinates) reproduces the plain
    implementation's value.

    Restricted to d=8 / n_steps=50: the PLAIN (unscaled) daltonng path
    loses its backward-pass log-densities to catastrophic conditioning
    already at d=16/n=100 *in float64* (returns ~-1e121), which is the
    very failure the Taylor-scaled preconditioned path removes — the
    precond value stays finite and stable across d (and is pinned against
    the exact Gaussian dalton in test_daltonng_gaussian_matches_dalton).
    """
    kw, y, _, d, p, obs_sd = _heat_fixture(d=8, n_steps=50, n_obs=5)
    obs_ll = _gauss_loglik(d, p, obs_sd)
    ll_plain = float(daltonng_plain(
        obs_data=y, obs_loglik_i=obs_ll, **kw))
    ll_pre = float(precond.daltonng(
        obs_data=y, obs_loglik_i=obs_ll, n_deriv=p, **kw))
    np.testing.assert_allclose(ll_pre, ll_plain, rtol=1e-6)


def test_daltonng_poisson_large_state():
    """Genuinely non-Gaussian observations (Poisson counts with a log
    link on the positions): finite value, finite kappa-gradient, and the
    likelihood prefers the true diffusivity over badly wrong ones."""
    kw, _, u_true, d, p, _ = _heat_fixture(d=16, n_steps=100, n_obs=8)
    rate0 = 80.0
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.poisson(rate0 * np.exp(u_true))[:, None, :],
                    jnp.float64)

    def obs_ll(y_i, x_i, i, **params):
        eta = jnp.log(rate0) + x_i[0, ::p]
        return jnp.sum(y_i[0] * eta - jnp.exp(eta) - gammaln(y_i[0] + 1.0))

    L_unit = jnp.asarray(heat.laplacian(d, kappa=1.0), jnp.float64)

    def ode_fun(X_t, t, kappa=0.002):
        return (kappa * (L_unit @ X_t[0, ::p]))[None, :]

    kw = {**kw, "ode_fun": ode_fun}

    def ll(kappa):
        return precond.daltonng(
            obs_data=y, obs_loglik_i=obs_ll, n_deriv=p, kappa=kappa, **kw)

    ll_true, g_true = jax.value_and_grad(ll)(jnp.asarray(0.002))
    assert np.isfinite(float(ll_true))
    assert np.isfinite(float(g_true))
    for bad in (0.0005, 0.008):
        assert float(ll(jnp.asarray(bad))) < float(ll_true)


def test_daltonng_stationary_matches_plain():
    """daltonng_stationary (hoisted-affine, span(H')-perp projected
    densities, n_warm pinned to n_steps) reproduces precond.daltonng on
    the mild d=8 heat fixture — the parity the round-4 advisor found
    asserted only in a docstring."""
    from rodeo_tpu.ops.stationary import daltonng_stationary
    kw, y, _, d, p, obs_sd = _heat_fixture(d=8, n_steps=50, n_obs=5)
    obs_ll = _gauss_loglik(d, p, obs_sd)
    ll_pre = float(precond.daltonng(
        obs_data=y, obs_loglik_i=obs_ll, n_deriv=p, **kw))
    ll_st = float(daltonng_stationary(
        obs_data=y, obs_loglik_i=obs_ll, n_deriv=p, **kw))
    np.testing.assert_allclose(ll_st, ll_pre, rtol=0,
                               atol=1e-6 * max(1.0, abs(ll_pre)))


def test_daltonng_stationary_kappa_gradient():
    """kappa-gradient of daltonng_stationary agrees with the exact
    preconditioned path's gradient on a kappa-parametrized heat RHS."""
    from rodeo_tpu.ops.stationary import daltonng_stationary
    kw, y, _, d, p, obs_sd = _heat_fixture(d=8, n_steps=50, n_obs=5)
    obs_ll = _gauss_loglik(d, p, obs_sd)
    L_unit = jnp.asarray(heat.laplacian(d, kappa=1.0), jnp.float64)

    def ode_fun(X_t, t, kappa=0.002):
        return (kappa * (L_unit @ X_t[0, ::p]))[None, :]

    kw = {**kw, "ode_fun": ode_fun}
    k0 = jnp.asarray(0.002)
    v_pre, g_pre = jax.value_and_grad(lambda k: precond.daltonng(
        obs_data=y, obs_loglik_i=obs_ll, n_deriv=p, kappa=k, **kw))(k0)
    v_st, g_st = jax.value_and_grad(lambda k: daltonng_stationary(
        obs_data=y, obs_loglik_i=obs_ll, n_deriv=p, kappa=k, **kw))(k0)
    np.testing.assert_allclose(float(v_st), float(v_pre), rtol=1e-8)
    np.testing.assert_allclose(float(g_st), float(g_pre), rtol=1e-5)


def test_daltonng_stationary_rejects_measurement_noise():
    """interrogate_rodeo carries var_meas = W Sigma W' != 0, which breaks
    the core's structural-null-space projection — the wrapper must
    NaN-poison the result (device-side guard, round-4 advisor #2), not
    return a silently wrong likelihood."""
    from rodeo_tpu.interrogate import interrogate_rodeo
    from rodeo_tpu.ops.stationary import daltonng_stationary
    kw, y, _, d, p, obs_sd = _heat_fixture(d=8, n_steps=50, n_obs=5)
    obs_ll = _gauss_loglik(d, p, obs_sd)
    kw = {**kw, "interrogate": interrogate_rodeo}
    ll = jax.jit(lambda: daltonng_stationary(
        obs_data=y, obs_loglik_i=obs_ll, n_deriv=p, **kw))()
    assert not np.isfinite(float(ll))
