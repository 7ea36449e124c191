"""
Inference-layer oracle tests — a gap in the reference's own test suite
(SURVEY.md section 4: fenrir/dalton/magi have no unit tests upstream).

For a LINEAR ODE, the kramer (EK1) interrogation is exact and constant, so
the whole solver is a linear-Gaussian state-space model and the fenrir /
dalton likelihood p(Y | Z = 0) has a closed form computable from the joint
multivariate normal of (Z_{1:N}, Y_obs).  Both algorithms must reproduce it
to near machine precision.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import importlib

from rodeo_tpu.prior import ibm_init
from rodeo_tpu.interrogate import interrogate_kramer

fenrir_mod = importlib.import_module("rodeo_tpu.inference.fenrir")
dalton_mod = importlib.import_module("rodeo_tpu.inference.dalton")


@pytest.fixture(scope="module")
def linear_setup():
    """d/dt x = a x with an IBM(q=2) prior, one block."""
    a = 0.8
    n_deriv = 3
    t_min, t_max, n_steps = 0.0, 2.0, 20
    dt = (t_max - t_min) / n_steps

    def ode_fun(X, t, **params):
        return jnp.array([[a * X[0, 0]]])

    W = jnp.zeros((1, 1, n_deriv)).at[:, :, 1].set(1.0)
    x0 = jnp.array([[1.0, a, a * a]])
    prior_pars = ibm_init(dt, n_deriv, jnp.array([0.5]))

    # exact effective measurement row for Z_n = (W + wgt_meas) X_n:
    # kramer gives wgt_meas = -df/dx = [-a, 0, 0]
    H = np.zeros((1, n_deriv))
    H[0, 0] = -a
    H[0, 1] = 1.0

    # observations Y_m = D X_m + noise at a subset of grid points
    rng = np.random.default_rng(21)
    obs_idx = np.array([5, 10, 15, 20])
    obs_times = jnp.asarray(t_min + obs_idx * dt)
    D = np.zeros((len(obs_idx), 1, 1, n_deriv))
    D[:, :, :, 0] = 1.0
    omega = 0.04
    obs_var = omega * jnp.broadcast_to(
        jnp.eye(1), (len(obs_idx), 1, 1, 1))
    obs_data = jnp.asarray(
        np.exp(a * np.asarray(obs_times))[:, None, None]
        + 0.1 * rng.standard_normal((len(obs_idx), 1, 1)))
    return dict(a=a, ode_fun=ode_fun, W=W, x0=x0, prior_pars=prior_pars,
                t_min=t_min, t_max=t_max, n_steps=n_steps, dt=dt, H=H,
                obs_idx=obs_idx, obs_times=obs_times, D=D,
                obs_var=obs_var, obs_data=obs_data, omega=omega)


def _oracle_loglik(s):
    """log p(Y = y | Z = 0) from the joint MVN, by brute force."""
    n_steps, n_deriv = s["n_steps"], 3
    Q = np.asarray(s["prior_pars"][0][0])
    R = np.asarray(s["prior_pars"][1][0])
    x0 = np.asarray(s["x0"][0])
    # joint of states x_1..x_N (x_0 deterministic)
    mu = np.zeros((n_steps, n_deriv))
    V = np.zeros((n_steps, n_deriv, n_steps, n_deriv))
    mu[0] = Q @ x0
    V[0, :, 0, :] = R
    for n in range(1, n_steps):
        mu[n] = Q @ mu[n - 1]
        V[n, :, n, :] = Q @ V[n - 1, :, n - 1, :] @ Q.T + R
        for m in range(n):
            V[m, :, n, :] = V[m, :, n - 1, :] @ Q.T
            V[n, :, m, :] = V[m, :, n, :].T
    # measurement stack: Z_n = H x_n (n=1..N), then Y at obs indices
    H = s["H"]
    rows = []
    offsets = []
    for n in range(n_steps):
        rows.append(("z", n, H, 0.0))
    Dsel = s["D"][0, 0]  # (1, n_deriv), same selector for all obs
    for i, n_idx in enumerate(s["obs_idx"]):
        rows.append(("y", n_idx - 1, Dsel, s["omega"]))
    k = len(rows)
    mean_m = np.zeros(k)
    cov_m = np.zeros((k, k))
    for r, (_, n, Hr, var) in enumerate(rows):
        mean_m[r] = (Hr @ mu[n]).item()
        for r2, (_, n2, Hr2, var2) in enumerate(rows):
            cov_m[r, r2] = (Hr @ V[n, :, n2, :] @ Hr2.T).item()
        cov_m[r, r] += var
    vals = np.concatenate([
        np.zeros(n_steps),
        np.asarray(s["obs_data"][:, 0, 0]),
    ])

    def mvn_logpdf(x, mean, cov):
        d = x - mean
        sign, logdet = np.linalg.slogdet(cov)
        return -0.5 * (d @ np.linalg.solve(cov, d) + logdet
                       + len(x) * np.log(2 * np.pi))

    log_joint = mvn_logpdf(vals, mean_m, cov_m)
    log_z = mvn_logpdf(vals[:n_steps], mean_m[:n_steps],
                       cov_m[:n_steps, :n_steps])
    return log_joint - log_z


def test_fenrir_exact_on_linear_ode(linear_setup):
    s = linear_setup
    ll = fenrir_mod.fenrir(
        key=None, ode_fun=s["ode_fun"], ode_weight=s["W"],
        ode_init=s["x0"], t_min=s["t_min"], t_max=s["t_max"],
        n_steps=s["n_steps"], interrogate=interrogate_kramer,
        prior_pars=s["prior_pars"],
        obs_data=s["obs_data"], obs_times=s["obs_times"],
        obs_weight=jnp.asarray(s["D"]), obs_var=s["obs_var"])
    ll_oracle = _oracle_loglik(s)
    np.testing.assert_allclose(float(ll), ll_oracle, rtol=1e-8)


def test_dalton_exact_on_linear_ode(linear_setup):
    s = linear_setup
    ll = dalton_mod.dalton(
        key=None, ode_fun=s["ode_fun"], ode_weight=s["W"],
        ode_init=s["x0"], t_min=s["t_min"], t_max=s["t_max"],
        n_steps=s["n_steps"], interrogate=interrogate_kramer,
        prior_pars=s["prior_pars"],
        obs_data=s["obs_data"], obs_times=s["obs_times"],
        obs_weight=jnp.asarray(s["D"]), obs_var=s["obs_var"])
    ll_oracle = _oracle_loglik(s)
    np.testing.assert_allclose(float(ll), ll_oracle, rtol=1e-8)


def test_fenrir_dalton_agree_sqrt(linear_setup):
    """Square-root backend gives the same likelihood values."""
    s = linear_setup
    pw, pv = s["prior_pars"]
    prior_sqrt = (pw, jnp.linalg.cholesky(pv))
    obs_var_sqrt = jnp.sqrt(s["obs_var"])
    kw = dict(
        key=None, ode_fun=s["ode_fun"], ode_weight=s["W"],
        ode_init=s["x0"], t_min=s["t_min"], t_max=s["t_max"],
        n_steps=s["n_steps"], interrogate=interrogate_kramer,
        obs_data=s["obs_data"], obs_times=s["obs_times"],
        obs_weight=jnp.asarray(s["D"]))
    ll_oracle = _oracle_loglik(s)
    ll_f = fenrir_mod.fenrir(prior_pars=prior_sqrt, obs_var=obs_var_sqrt,
                             kalman_type="square-root", **kw)
    np.testing.assert_allclose(float(ll_f), ll_oracle, rtol=1e-7)
    ll_d = dalton_mod.dalton(prior_pars=prior_sqrt, obs_var=obs_var_sqrt,
                             kalman_type="square-root", **kw)
    np.testing.assert_allclose(float(ll_d), ll_oracle, rtol=1e-7)
