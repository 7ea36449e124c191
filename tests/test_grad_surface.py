"""
Differentiability sweep: ``jax.value_and_grad`` must be finite across the
whole inference surface, in both plain-f64 and preconditioned forms and
for sequential and parallel-in-time modes.  (The reference's jit/grad
tests cover only the solver entry points, ``tests/test_rodeojit.py``
upstream; likelihood gradients are its flagship use case — MAP/HMC in
``docs/examples/parameter.md`` — but are never tested there.)
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import rodeo_tpu
from rodeo_tpu.models import fitzhugh
from rodeo_tpu.ops import precond
from rodeo_tpu.interrogate import interrogate_kramer
from rodeo_tpu.inference import fenrir, dalton, daltonng, basic


@pytest.fixture(scope="module")
def setup():
    cfg = fitzhugh.setup(n_steps=40, t_max=2.0, dtype=jnp.float64)
    th = cfg.pop("theta")
    n_obs = 5
    obs_times = jnp.linspace(0.0, 2.0, n_obs)
    D = jnp.zeros((n_obs, 2, 1, 3)).at[:, :, :, 0].set(1.0)
    Om = 0.01 * jnp.broadcast_to(jnp.eye(1), (n_obs, 2, 1, 1))
    yobs = jnp.asarray(np.random.default_rng(3).normal(size=(n_obs, 2, 1)))
    obs = dict(obs_data=yobs, obs_times=obs_times, obs_weight=D, obs_var=Om)
    return cfg, th, obs


def _assert_grad_finite(fn, th):
    v, g = jax.value_and_grad(fn)(th)
    assert bool(jnp.isfinite(v)), v
    assert bool(jnp.all(jnp.isfinite(g))), g
    assert float(jnp.linalg.norm(g)) > 0.0


@pytest.mark.parametrize("temporal", ["sequential", "parallel"])
def test_grad_solve_mv(setup, temporal):
    cfg, th, _ = setup
    _assert_grad_finite(lambda t: jnp.sum(rodeo_tpu.solve_mv(
        key=None, interrogate=interrogate_kramer, theta=t,
        temporal=temporal, **cfg)[0]), th)


@pytest.mark.parametrize("fn_name,temporal", [
    ("fenrir", "sequential"), ("fenrir", "parallel"),
    ("dalton", None), ("precond.fenrir", "sequential"),
    ("precond.dalton", None)])
def test_grad_gaussian_likelihoods(setup, fn_name, temporal):
    cfg, th, obs = setup
    fns = {"fenrir": fenrir, "dalton": dalton,
           "precond.fenrir": precond.fenrir,
           "precond.dalton": precond.dalton}
    fn = fns[fn_name]
    kw = dict(key=None, interrogate=interrogate_kramer, **cfg, **obs)
    if temporal is not None:
        kw["temporal"] = temporal
    _assert_grad_finite(lambda t: fn(theta=t, **kw), th)


def test_grad_nongaussian_and_basic(setup):
    cfg, th, obs = setup

    def nn_ll(o, s, i, **p):
        return jnp.sum(-0.5 * (o[:, 0] - s[:, 0]) ** 2 / 0.01)

    for fn in (daltonng, precond.daltonng):
        _assert_grad_finite(lambda t, f=fn: f(
            key=None, interrogate=interrogate_kramer, theta=t,
            obs_data=obs["obs_data"], obs_times=obs["obs_times"],
            obs_loglik_i=nn_ll, **cfg), th)

    def b_ll(obs_data, ode_data, **p):
        return jnp.sum(-0.5 * (obs_data[..., 0] - ode_data[..., 0]) ** 2)

    _assert_grad_finite(lambda t: basic(
        key=None, interrogate=interrogate_kramer, theta=t,
        obs_data=obs["obs_data"], obs_times=obs["obs_times"],
        obs_loglik=b_ll, **cfg)[0], th)


def test_grad_precond_fenrir_f32(setup):
    """The TPU-mode (f32, preconditioned) likelihood gradient is finite."""
    _, _, obs = setup
    cfg32 = fitzhugh.setup(n_steps=40, t_max=2.0, dtype=jnp.float32)
    th32 = cfg32.pop("theta")
    obs32 = {k: v.astype(jnp.float32) for k, v in obs.items()}
    _assert_grad_finite(lambda t: precond.fenrir(
        key=None, interrogate=interrogate_kramer, theta=t,
        **cfg32, **obs32), th32.astype(jnp.float32))
