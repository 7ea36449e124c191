"""
Higher-order ODEs and the square-root filter: solve the second-order ODE of
Chkrebtii et al (2016),

    x''(t) = sin(2t) - x(t),   x(0) = -1, x'(0) = 0,

with analytic solution x(t) = (2 sin t - 3 cos t - sin 2t) / 3, using the
square-root filter and the stochastic chkrebtii interrogation (mirrors
docs/examples/higher_order.md of the reference).

Run: python examples/higher_order.py
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import rodeo_tpu
from rodeo_tpu.prior import ibm_init
from rodeo_tpu.interrogate import interrogate_chkrebtii


def higher_fun(x, t, **params):
    """x'' = sin(2t) - x in block form; state X = (x, x', x'', x''')."""
    return jnp.array([[jnp.sin(2 * t) - x[0, 0]]])


def exact_sol(t):
    return (2 * np.sin(t) - 3 * np.cos(t) - np.sin(2 * t)) / 3.0


def main():
    n_deriv = 4
    t_min, t_max, n_steps = 0.0, 10.0, 200
    # W selects the SECOND derivative for a 2nd-order ODE
    W = jnp.zeros((1, 1, n_deriv)).at[:, :, 2].set(1.0)
    # initial state: x=-1, x'=0, x''=sin(0)-x=1, x'''=2cos(0)-x'=2
    x0 = jnp.array([[-1.0, 0.0, 1.0, 2.0]])
    prior_Q, prior_R = ibm_init((t_max - t_min) / n_steps, n_deriv,
                                jnp.array([0.5]))
    # square-root filter: priors enter as Cholesky factors
    prior_pars = (prior_Q, jnp.linalg.cholesky(prior_R))

    mu, chol = rodeo_tpu.solve_mv(
        key=jax.random.PRNGKey(0), ode_fun=higher_fun, ode_weight=W,
        ode_init=x0, t_min=t_min, t_max=t_max, n_steps=n_steps,
        interrogate=partial(interrogate_chkrebtii,
                            kalman_type="square-root"),
        prior_pars=prior_pars, kalman_type="square-root")

    tseq = np.linspace(t_min, t_max, n_steps + 1)
    err = np.max(np.abs(np.asarray(mu[:, 0, 0]) - exact_sol(tseq)))
    print(f"max abs error vs analytic solution: {err:.2e}")
    assert err < 0.05


if __name__ == "__main__":
    main()
