"""Hoisted-affine DALTON likelihood (`rodeo_tpu.ops.stationary.
dalton_stationary`): value and gradient must match the exact
preconditioned DALTON path on an affine ODE (the joint filter is exact
by construction; the marginal filter carries the fenrir_stationary
freeze tolerance), under the observation-layout edge cases the segment
logic distinguishes."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rodeo_tpu.models import heat
from rodeo_tpu.ops import precond
from rodeo_tpu.ops.stationary import dalton_stationary

D, P, N_STEPS = 8, 3, 50
KAPPA = 0.002


def _setup(obs_idx, n_obs_max=None):
    kw, kappa0 = heat.fenrir_setup(
        d=D, n_deriv=P, n_steps=N_STEPS, n_obs=5, kappa=KAPPA,
        prior_sigma=0.5, dtype=jnp.float64)
    obs_idx = np.asarray(obs_idx)
    n_obs = len(obs_idx)
    # re-cut the observation arrays onto the requested rows
    t_min, t_max = kw["t_min"], kw["t_max"]
    obs_times = np.asarray(t_min + obs_idx * (t_max - t_min) / N_STEPS)
    rng = np.random.default_rng(1)
    cfg = heat.setup(d=D, n_deriv=P, n_steps=N_STEPS, kappa=KAPPA,
                     prior_sigma=0.5, dtype=jnp.float64)
    exact = cfg["exact"]
    y = np.stack([exact(float(t)) for t in obs_times])[:, None, :] \
        + 0.01 * rng.standard_normal((n_obs, 1, D))
    Dw = np.zeros((n_obs, 1, D, D * P))
    for i in range(D):
        Dw[:, 0, i, i * P] = 1.0
    kw = dict(kw, obs_data=jnp.asarray(y), obs_times=obs_times,
              obs_weight=jnp.asarray(Dw),
              obs_var=1e-4 * jnp.broadcast_to(jnp.eye(D),
                                              (n_obs, 1, D, D)))
    return kw, kappa0


@pytest.mark.parametrize("obs_idx", [
    np.linspace(0, N_STEPS, 6, dtype=int),     # incl. rows 0 and N
    np.array([7, 19, 23, 41]),                 # interior, irregular gaps
    np.array([3, 5, 48]),                      # obs inside the warm prefix
    np.array([N_STEPS]),                       # terminal row only
])
def test_value_matches_exact_path(obs_idx):
    kw, kappa0 = _setup(obs_idx)
    ll_exact = float(precond.dalton(n_deriv=P, kappa=kappa0, **kw))
    ll_stat = float(dalton_stationary(
        n_deriv=P, n_warm=N_STEPS, kappa=kappa0, validate=False, **kw))
    # exact mode: fp-level agreement with the preconditioned path
    assert abs(ll_stat - ll_exact) < 1e-8 * max(abs(ll_exact), 1.0)


def test_frozen_accuracy_dial():
    kw, kappa0 = _setup(np.array([10, 20, 30, 40]))
    ll_exact = float(precond.dalton(n_deriv=P, kappa=kappa0, **kw))
    ll_frozen = float(dalton_stationary(
        n_deriv=P, n_warm=20, kappa=kappa0, validate=False, **kw))
    # identical per-row observation models route to the two-transient
    # frozen JOINT pass; the freeze error follows the fenrir_stationary
    # accuracy model with the inter-observation gap (10 rows here) as
    # the effective tail — measured ~3e-7 relative on this fixture
    assert abs(ll_frozen - ll_exact) < 3e-6 * max(abs(ll_exact), 1.0)
    g_exact = float(jax.grad(
        lambda k: precond.dalton(n_deriv=P, kappa=k, **kw))(kappa0))
    g_frozen = float(jax.grad(lambda k: dalton_stationary(
        n_deriv=P, n_warm=20, kappa=k, validate=False, **kw))(kappa0))
    assert abs(g_frozen - g_exact) < 1e-5 * abs(g_exact)


def test_nonidentical_obs_falls_back_to_exact():
    kw, kappa0 = _setup(np.array([10, 25, 40]))
    # perturb one observation row's variance: the frozen two-transient
    # path is invalid, so the wrapper must route to the exact core and
    # still match precond.dalton at fp level despite n_warm < n_steps...
    obs_var = np.array(kw["obs_var"], copy=True)
    obs_var[1] *= 2.0
    kw = dict(kw, obs_var=jnp.asarray(obs_var))
    ll_exact = float(precond.dalton(n_deriv=P, kappa=kappa0, **kw))
    ll_stat = float(dalton_stationary(
        n_deriv=P, n_warm=N_STEPS, kappa=kappa0, validate=False, **kw))
    assert abs(ll_stat - ll_exact) < 1e-8 * max(abs(ll_exact), 1.0)
    # ... and the JOINT part stays exact even at small n_warm (only the
    # frozen MARGINAL tail approximates, which is tiny on this fixture)
    ll_nw = float(dalton_stationary(
        n_deriv=P, n_warm=20, kappa=kappa0, validate=False, **kw))
    assert abs(ll_nw - ll_exact) < 1e-7 * max(abs(ll_exact), 1.0)


def test_gradient_matches_exact_path():
    kw, kappa0 = _setup(np.linspace(0, N_STEPS, 6, dtype=int))
    g_exact = float(jax.grad(
        lambda k: precond.dalton(n_deriv=P, kappa=k, **kw))(kappa0))
    g_stat = float(jax.grad(
        lambda k: dalton_stationary(n_deriv=P, n_warm=N_STEPS, kappa=k,
                                    validate=False, **kw))(kappa0))
    assert abs(g_stat - g_exact) < 1e-8 * abs(g_exact)


def test_jittable_with_traced_data_and_params():
    kw, kappa0 = _setup(np.array([10, 25, 40]))
    obs_data = kw.pop("obs_data")

    @jax.jit
    def ll(k, y):
        return dalton_stationary(n_deriv=P, n_warm=N_STEPS, kappa=k,
                                 validate=False, obs_data=y, **kw)

    v1 = float(ll(kappa0, obs_data))
    v2 = float(ll(kappa0 * 1.001, obs_data))
    assert np.isfinite(v1) and v1 != v2


def test_rejects_stochastic_interrogation_and_traced_times():
    kw, kappa0 = _setup(np.array([10]))
    with pytest.raises(ValueError, match="deterministic"):
        dalton_stationary(n_deriv=P, kappa=kappa0,
                          **{**kw, "key": jax.random.PRNGKey(0)})
    with pytest.raises(ValueError, match="concrete"):
        jax.jit(lambda t: dalton_stationary(
            n_deriv=P, kappa=kappa0, **{**kw, "obs_times": t}))(
                jnp.asarray(kw["obs_times"]))
