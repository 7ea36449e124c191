"""Stationary-gain fenrir likelihood (`rodeo_tpu.ops.stationary.
fenrir_stationary`): value and gradient must match the exact
preconditioned fenrir path on an affine ODE up to the gain-freeze
tolerance, under every observation-layout edge case the segment logic
distinguishes (obs at the terminal row, obs inside the warm prefix,
irregular gaps)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rodeo_tpu.interrogate import interrogate_kramer
from rodeo_tpu.models import heat
from rodeo_tpu.ops import precond
from rodeo_tpu.ops.stationary import fenrir_stationary

D, P, N_STEPS = 8, 3, 50
KAPPA = 0.002


def _ode_fun(L_unit):
    def ode_fun(X_t, t, kappa=KAPPA):
        u = X_t[0, ::P]
        return (kappa * (L_unit @ u))[None, :]
    return ode_fun


def _setup(obs_idx):
    """Heat-model fenrir arguments with observations at grid rows
    ``obs_idx`` (mild regime so the exact f64 path is a valid oracle)."""
    cfg = heat.setup(d=D, n_deriv=P, n_steps=N_STEPS, kappa=KAPPA,
                     prior_sigma=0.5, dtype=jnp.float64)
    exact = cfg.pop("exact")
    obs_idx = np.asarray(obs_idx)
    n_obs = len(obs_idx)
    obs_times = jnp.array(
        cfg["t_min"] + obs_idx * (cfg["t_max"] - cfg["t_min"]) / N_STEPS)
    rng = np.random.default_rng(0)
    y = np.stack([exact(float(t)) for t in obs_times])[:, None, :] \
        + 0.01 * rng.standard_normal((n_obs, 1, D))
    obs_weight = np.zeros((n_obs, 1, D, D * P))
    for i in range(D):
        obs_weight[:, 0, i, i * P] = 1.0
    L_unit = jnp.asarray(heat.laplacian(D, kappa=1.0))
    return dict(
        key=None, ode_fun=_ode_fun(L_unit), ode_weight=cfg["ode_weight"],
        ode_init=cfg["ode_init"], t_min=cfg["t_min"], t_max=cfg["t_max"],
        n_steps=N_STEPS, interrogate=interrogate_kramer,
        prior_pars=cfg["prior_pars"], obs_data=jnp.asarray(y),
        obs_times=obs_times, obs_weight=jnp.asarray(obs_weight),
        obs_var=1e-4 * jnp.broadcast_to(jnp.eye(D), (n_obs, 1, D, D)))


@pytest.mark.parametrize("obs_idx", [
    np.linspace(0, N_STEPS, 6, dtype=int),     # incl. rows 0 and N
    np.array([7, 19, 23, 41]),                 # interior, irregular gaps
    np.array([3, 5, 48]),                      # obs inside the warm prefix
    np.array([N_STEPS]),                       # terminal row only
])
def test_value_matches_exact_path(obs_idx):
    kw = _setup(obs_idx)
    ll_exact = float(precond.fenrir(n_deriv=P, **kw))
    ll_stat = float(fenrir_stationary(n_deriv=P, n_warm=20, **kw))
    assert abs(ll_stat - ll_exact) < 1e-7 * max(abs(ll_exact), 1.0)


def test_gradient_matches_exact_path():
    kw = _setup(np.linspace(0, N_STEPS, 6, dtype=int))
    g_exact = float(jax.grad(
        lambda k: precond.fenrir(n_deriv=P, kappa=k, **kw))(KAPPA))
    g_stat = float(jax.grad(
        lambda k: fenrir_stationary(n_deriv=P, n_warm=30, kappa=k,
                                    **kw))(KAPPA))
    assert abs(g_stat - g_exact) < 1e-6 * abs(g_exact)


def test_jittable_with_traced_data_and_params():
    kw = _setup(np.array([10, 20, 30, 40]))
    obs_data = kw.pop("obs_data")

    @jax.jit
    def ll(kappa, y):
        return fenrir_stationary(n_deriv=P, n_warm=15, kappa=kappa,
                                 obs_data=y, **kw)

    ll_ref = float(fenrir_stationary(n_deriv=P, n_warm=15,
                                     obs_data=obs_data, **kw))
    assert abs(float(ll(KAPPA, obs_data)) - ll_ref) \
        < 1e-9 * max(abs(ll_ref), 1.0)
    g = float(jax.grad(ll)(KAPPA, obs_data))
    assert np.isfinite(g)


def test_n_warm_fallback_to_exact():
    kw = _setup(np.array([10, 30]))
    ll_exact = float(precond.fenrir(n_deriv=P, **kw))
    ll_fb = float(fenrir_stationary(n_deriv=P, n_warm=N_STEPS, **kw))
    assert abs(ll_fb - ll_exact) < 1e-10 * max(abs(ll_exact), 1.0)


def test_exact_mode_on_slow_riccati_config():
    """The d=32 heat benchmark config has Riccati slow modes (rho~0.96)
    where moderate n_warm leaves an O(1) gradient bias; n_warm=n_steps
    must be exact to machine precision, value AND gradient."""
    d, p, n_steps, kappa = 16, 3, 80, 0.01
    cfg = heat.setup(d=d, n_deriv=p, n_steps=n_steps, kappa=kappa,
                     prior_sigma=5e3, dtype=jnp.float64)
    exact = cfg.pop("exact")
    obs_idx = np.linspace(8, n_steps, 10, dtype=int)
    obs_times = np.asarray(obs_idx / n_steps)
    rng = np.random.default_rng(1)
    y = np.stack([exact(float(t)) for t in obs_times])[:, None, :] \
        + 0.01 * rng.standard_normal((10, 1, d))
    D = np.zeros((10, 1, d, d * p))
    for i in range(d):
        D[:, 0, i, i * p] = 1.0
    L_unit = jnp.asarray(heat.laplacian(d, kappa=1.0))

    def ode_fun(X_t, t, kappa=kappa):
        return (kappa * (L_unit @ X_t[0, ::p]))[None, :]

    kw = dict(key=None, ode_fun=ode_fun, ode_weight=cfg["ode_weight"],
              ode_init=cfg["ode_init"], t_min=0.0, t_max=1.0,
              n_steps=n_steps, interrogate=interrogate_kramer,
              prior_pars=cfg["prior_pars"], obs_data=jnp.asarray(y),
              obs_times=obs_times, obs_weight=jnp.asarray(D),
              obs_var=1e-4 * jnp.broadcast_to(jnp.eye(d),
                                              (10, 1, d, d)))
    v_e, g_e = jax.value_and_grad(
        lambda k: precond.fenrir(n_deriv=p, kappa=k, **kw))(kappa)
    v, g = jax.value_and_grad(
        lambda k: fenrir_stationary(n_deriv=p, n_warm=n_steps, kappa=k,
                                    **kw))(kappa)
    assert abs(float(v - v_e)) < 1e-10 * abs(float(v_e))
    assert abs(float(g - g_e)) < 1e-9 * abs(float(g_e))


def test_traced_obs_times_raises():
    kw = _setup(np.array([10, 30]))
    obs_times = kw.pop("obs_times")
    with pytest.raises(ValueError, match="concrete"):
        jax.jit(lambda t: fenrir_stationary(
            n_deriv=P, obs_times=t, **kw))(obs_times)


def test_duplicate_obs_rows_raise():
    kw = _setup(np.array([10, 30]))
    kw["obs_times"] = jnp.array([0.2, 0.2])
    with pytest.raises(ValueError, match="distinct grid rows"):
        fenrir_stationary(n_deriv=P, **kw)


def test_stochastic_interrogation_raises():
    kw = _setup(np.array([10, 30]))
    kw["key"] = jax.random.PRNGKey(0)
    with pytest.raises(ValueError, match="deterministic"):
        fenrir_stationary(n_deriv=P, **kw)
