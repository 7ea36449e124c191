"""float32 regression for the daltonng Laplace ridge (the r03 bench
audit's 2-4x drift): on a fine grid the Taylor scaling makes the
pseudo-observation Hessian diagonal ~t_vec[0]^2 tiny, and a
mis-normalized singularity test regularized EVERY observation — the
f32 filter then ignored the data and stayed on the unconditioned ODE
path.  With a diffuse prior and data deliberately offset from the ODE
path, the correct posterior moves substantially toward the data, so an
unpinned filter is loudly distinguishable (rel. likelihood error ~1.3
pre-fix vs ~2e-3 post-fix on this config)."""
import numpy as np
import jax
import jax.numpy as jnp

from rodeo_tpu.interrogate import interrogate_kramer
from rodeo_tpu.prior import ibm_init
from rodeo_tpu.ops import precond

N_STEPS, Q, SIGMA, OBS_VAR = 400, 3, 5e5, 0.01


def _args(dtype):
    def ode_fun(X, t, **params):
        return -X[:, 0:1]

    W = jnp.zeros((1, 1, Q), dtype).at[0, 0, 1].set(1.0)
    x0 = jnp.array([[1.0, -1.0, 1.0]], dtype)
    prior = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, dtype),
        ibm_init(1.0 / N_STEPS, Q, jnp.array([SIGMA])))
    n_obs = 5
    obs_times = jnp.linspace(0.2, 1.0, n_obs).astype(dtype)
    # data OFFSET from the ODE path: the likelihood value then hinges on
    # the Laplace update actually pulling the filter toward the data
    y = (jnp.exp(-obs_times)[:, None, None] + 0.5).astype(dtype)

    def obs_loglik_i(obs_i, state, i, **params):
        return jnp.sum(-0.5 * (obs_i[:, 0] - state[:, 0]) ** 2 / OBS_VAR)

    return dict(key=None, ode_fun=ode_fun, ode_weight=W, ode_init=x0,
                t_min=0.0, t_max=1.0, n_steps=N_STEPS,
                interrogate=interrogate_kramer, prior_pars=prior,
                obs_data=y, obs_times=obs_times,
                obs_loglik_i=obs_loglik_i)


def test_daltonng_f32_matches_f64():
    ll64 = float(precond.daltonng(**_args(jnp.float64)))
    ll32 = float(precond.daltonng(**_args(jnp.float32)))
    assert np.isfinite(ll32)
    assert abs(ll32 - ll64) < 5e-3 * abs(ll64), (ll32, ll64)


def test_solve_mv_nn_f32_tracks_f64_posterior():
    # the f32 non-Gaussian posterior mean must track the f64 one at the
    # observation rows (an unpinned f32 filter stays on the ODE path,
    # ~0.18 away from the f64 posterior on this config)
    mean64, _ = precond.dalton_solve_mv_nn(**_args(jnp.float64))
    kw = _args(jnp.float32)
    mean32, _ = precond.dalton_solve_mv_nn(**kw)
    rows = np.asarray(
        jnp.searchsorted(jnp.linspace(0.0, 1.0, N_STEPS + 1),
                         kw["obs_times"]))
    dev = np.asarray(mean32)[rows, 0, 0] - np.asarray(mean64)[rows, 0, 0]
    assert np.max(np.abs(dev)) < 0.05, dev
