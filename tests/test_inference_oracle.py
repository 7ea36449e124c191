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


# ---------------------------------------------------------------------------
# MAGI: the log-density p(U, Z=0 | theta) is itself a joint-MVN density of
# the "observed" derivative rows under the IBM prior (Dirac init at X_0), so
# it has a dense closed form.  This covers the regime the parity test cannot:
# with exact (zero-noise) pseudo-observations, the subtractive covariance
# update loses PSD within ~20 steps and any fp difference amplifies ~15x per
# step.  On non-ODE-consistent paths (where every MCMC/optimization iterate
# lives) the reference implementation silently returns values ~3x off this
# oracle; the Joseph-form update used here tracks it to ~1e-7 relative.
# ---------------------------------------------------------------------------

magi_mod = importlib.import_module("rodeo_tpu.inference.magi")


def _magi_dense_logdens(ode_state, prior_pars, n_active):
    """Exact log p(x_meas_{1:N} | X_0) by the dense joint MVN, per block."""
    Q, R = [np.asarray(a, dtype=np.float64) for a in prior_pars]
    ode_state = np.asarray(ode_state, dtype=np.float64)
    n_tot, n_block, q = ode_state.shape
    N = n_tot - 1
    na = n_active
    total = 0.0
    for b in range(n_block):
        Qb, Rb = Q[b], R[b]
        P = [np.zeros((q, q))]            # Var(X_n | X_0)
        mu = [ode_state[0, b]]            # E[X_n | X_0]
        for _ in range(N):
            P.append(Qb @ P[-1] @ Qb.T + Rb)
            mu.append(Qb @ mu[-1])
        S = np.zeros((N * na, N * na))
        for m in range(1, N + 1):
            S[(m - 1) * na:m * na, (m - 1) * na:m * na] = P[m][:na, :na]
            acc = P[m]
            for n in range(m + 1, N + 1):
                acc = acc @ Qb.T          # Cov(X_m, X_n) = P_m (Q^T)^{n-m}
                S[(m - 1) * na:m * na, (n - 1) * na:n * na] = acc[:na, :na]
                S[(n - 1) * na:n * na, (m - 1) * na:m * na] = acc[:na, :na].T
        z = np.concatenate([ode_state[m, b, :na] - mu[m][:na]
                            for m in range(1, N + 1)])
        _, logdet = np.linalg.slogdet(S)
        total += -0.5 * (z @ np.linalg.solve(S, z) + logdet
                         + z.size * np.log(2 * np.pi))
    return total


@pytest.fixture(scope="module")
def magi_setup():
    """FitzHugh-style expand on a sinusoid path — deliberately NOT an ODE
    solution, so the pseudo-observation residuals are large (the hard
    regime)."""
    n_vars, n_deriv, n_active = 2, 3, 2
    theta = jnp.array([0.2, 0.2, 3.0])
    t_min, t_max, n_steps = 0.0, 4.0, 40
    dt = (t_max - t_min) / n_steps
    times = jnp.linspace(t_min, t_max, n_steps + 1)
    prior_pars = ibm_init(dt, n_deriv, jnp.array([30.0, 30.0]))

    def fitz_fun(X, t, **params):
        a, b, c = params["theta"]
        V, R = X[:, 0]
        return jnp.array([[c * (V - V ** 3 / 3 + R)],
                          [-1 / c * (V - a + b * R)]])

    def ode_expand(U, **params):
        f = jax.vmap(lambda u: fitz_fun(u, 0.0, **params))(U)
        return jnp.concatenate([U, f, jnp.zeros_like(f)], axis=-1)

    U = jnp.stack([jnp.sin(times / 3), jnp.cos(times / 4)],
                  axis=-1)[..., None]
    return dict(U=U, ode_expand=ode_expand, n_active=n_active,
                prior_pars=prior_pars, theta=theta, dt=dt)


@pytest.mark.parametrize("kalman_type", ["standard", "square-root"])
def test_magi_dense_oracle(magi_setup, kalman_type):
    s = magi_setup
    prior = s["prior_pars"]
    if kalman_type == "square-root":
        prior = (prior[0], jnp.linalg.cholesky(prior[1]))
    ll = magi_mod.magi_logdens(
        ode_data_subset=s["U"], ode_expand=s["ode_expand"],
        n_active=s["n_active"], prior_pars=prior,
        kalman_type=kalman_type, theta=s["theta"])
    ll_oracle = _magi_dense_logdens(
        s["ode_expand"](s["U"], theta=s["theta"]), s["prior_pars"],
        s["n_active"])
    np.testing.assert_allclose(float(ll), ll_oracle, rtol=1e-6)


def test_magi_precond_dense_oracle(magi_setup):
    """The f32-oriented preconditioned entry point hits the same oracle."""
    precond = importlib.import_module("rodeo_tpu.ops.precond")
    s = magi_setup
    ll = precond.magi_logdens(
        ode_data_subset=s["U"], ode_expand=s["ode_expand"],
        n_active=s["n_active"], prior_pars=s["prior_pars"],
        dt=s["dt"], theta=s["theta"])
    ll_oracle = _magi_dense_logdens(
        s["ode_expand"](s["U"], theta=s["theta"]), s["prior_pars"],
        s["n_active"])
    np.testing.assert_allclose(float(ll), ll_oracle, rtol=1e-6)


def test_basic_f32_floor_non_chaotic():
    """The ``basic`` plug-in likelihood's large f32 error on chaotic
    systems is trajectory divergence, not a pipeline defect: on the
    non-chaotic FitzHugh model the same f32 pipeline tracks its f64
    value at the ordinary rounding floor (see the float32 admonition in
    :mod:`rodeo_tpu.inference.basic` and the bench ``basic_fitz`` row)."""
    from rodeo_tpu.models import fitzhugh
    from rodeo_tpu.ops import precond

    def b_loglik(obs_data, ode_data, **p):
        return jnp.sum(-0.5 * (obs_data[..., 0] - ode_data[..., 0]) ** 2)

    vals = {}
    for dtype in (jnp.float64, jnp.float32):
        cfg = fitzhugh.setup(n_steps=200, t_max=10.0, dtype=dtype)
        th = cfg.pop("theta")
        obs_t = jnp.linspace(0.0, 10.0, 11).astype(dtype)
        y = jnp.asarray(np.random.default_rng(2).normal(
            size=(11, 2, 1)), dtype)
        vals[str(dtype)], _ = precond.basic(
            key=None, interrogate=interrogate_kramer, theta=th,
            obs_data=y, obs_times=obs_t, obs_loglik=b_loglik, **cfg)
    ref = float(vals[str(jnp.float64)])
    rel = abs(float(vals[str(jnp.float32)]) - ref) / max(abs(ref), 1e-30)
    assert rel < 1e-3, rel
