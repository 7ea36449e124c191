"""Dense/non-blocked (large-state) layout through the preconditioned
inference wrappers: `n_deriv` pass-through must reproduce the plain
implementations' values (coordinate-invariant likelihoods)."""
import numpy as np
import jax
import jax.numpy as jnp

from rodeo_tpu.interrogate import interrogate_kramer
from rodeo_tpu.models import heat
from rodeo_tpu.ops import precond
from rodeo_tpu.inference import fenrir as fenrir_plain
from rodeo_tpu.inference import dalton as dalton_plain
from rodeo_tpu.inference import basic as basic_plain


def _setup():
    # mild regime (kappa and prior scaled down) so the PLAIN f64 path is
    # stable and can serve as the oracle; the production large-state
    # configs must use the preconditioned path (see test_heat.py)
    d, p, n_steps = 8, 3, 50
    cfg = heat.setup(d=d, n_deriv=p, n_steps=n_steps, kappa=0.002,
                     prior_sigma=0.5, dtype=jnp.float64)
    exact = cfg.pop("exact")
    cfg.pop("n_deriv")
    n_obs = 6
    obs_idx = np.linspace(0, n_steps, n_obs, dtype=int)
    obs_times = jnp.array(
        cfg["t_min"] + obs_idx * (cfg["t_max"] - cfg["t_min"]) / n_steps)
    rng = np.random.default_rng(0)
    y = np.stack([exact(float(t)) for t in obs_times])[:, None, :] \
        + 0.01 * rng.standard_normal((n_obs, 1, d))
    obs_weight = np.zeros((n_obs, 1, d, d * p))
    for i in range(d):
        obs_weight[:, 0, i, i * p] = 1.0
    kw = dict(key=None, ode_fun=cfg["ode_fun"],
              ode_weight=cfg["ode_weight"], ode_init=cfg["ode_init"],
              t_min=cfg["t_min"], t_max=cfg["t_max"], n_steps=n_steps,
              interrogate=interrogate_kramer,
              prior_pars=cfg["prior_pars"], obs_data=jnp.asarray(y),
              obs_times=obs_times, obs_weight=jnp.asarray(obs_weight),
              obs_var=1e-4 * jnp.broadcast_to(jnp.eye(d),
                                              (n_obs, 1, d, d)))
    return kw, p


def test_fenrir_dense_layout():
    kw, p = _setup()
    ll_plain = float(fenrir_plain(**kw))
    ll_pre = float(precond.fenrir(n_deriv=p, **kw))
    assert abs(ll_plain - ll_pre) < 1e-7 * max(abs(ll_plain), 1.0)


def test_dalton_dense_layout():
    kw, p = _setup()
    ll_plain = float(dalton_plain(**kw))
    ll_pre = float(precond.dalton(n_deriv=p, **kw))
    assert abs(ll_plain - ll_pre) < 1e-6 * max(abs(ll_plain), 1.0)


def test_basic_dense_layout():
    kw, p = _setup()

    def obs_loglik(obs_data, ode_data, **params):
        u = ode_data[:, 0, ::3]
        return jnp.sum(-0.5 * (obs_data[:, 0, :] - u) ** 2 / 1e-4)

    kw_b = {k: v for k, v in kw.items()
            if k not in ("obs_weight", "obs_var")}
    ll_plain, _ = basic_plain(obs_loglik=obs_loglik, **kw_b)
    ll_pre, _ = precond.basic(obs_loglik=obs_loglik, n_deriv=p, **kw_b)
    assert abs(float(ll_plain) - float(ll_pre)) \
        < 1e-7 * max(abs(float(ll_plain)), 1.0)
