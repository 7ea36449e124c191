"""
Shared test problems: FitzHugh-Nagumo in block form (the reference's shared
fixture problem, cf. `/root/reference/tests/utils.py:fitz_setup`).
"""
import jax
import jax.numpy as jnp
import numpy as np

from rodeo_tpu.prior import ibm_init


def fitz_fun(X_t, t, **params):
    """FitzHugh-Nagumo ODE in block form."""
    a, b, c = params["theta"]
    V, R = X_t[0, 0], X_t[1, 0]
    return jnp.array([
        [c * (V - V * V * V / 3 + R)],
        [-1.0 / c * (V - a + b * R)],
    ])


def fitz_odeint(X_t, t, theta):
    """FitzHugh-Nagumo for scipy.integrate.odeint."""
    a, b, c = theta
    V, R = X_t
    return np.array([c * (V - V * V * V / 3 + R), -1 / c * (V - a + b * R)])


def fitz_setup(n_steps_per_unit=20, t_max=10.0, sigma=0.001):
    n_vars = 2
    n_deriv = 3
    t_min = 0.0
    n_steps = int(n_steps_per_unit * (t_max - t_min))
    dt = (t_max - t_min) / n_steps
    theta = jnp.array([0.2, 0.2, 3.0])
    x0_block = jnp.array([[-1.0, 1.0, 0.0], [1.0, 1.0 / 3.0, 0.0]])
    W = jnp.zeros((n_vars, 1, n_deriv))
    W = W.at[:, :, 1].set(1.0)
    prior_pars = ibm_init(dt, n_deriv, jnp.array([sigma] * n_vars))
    return dict(
        n_vars=n_vars, n_deriv=n_deriv,
        t_min=t_min, t_max=t_max, n_steps=n_steps, dt=dt,
        theta=theta, x0_block=x0_block, W=W, prior_pars=prior_pars,
        key=jax.random.PRNGKey(0),
    )
