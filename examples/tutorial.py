"""
Quickstart: solve the FitzHugh-Nagumo ODE probabilistically and compare
against scipy's LSODA (mirrors the reference README walkthrough /
docs/examples/tutorial.md).

Run: python examples/tutorial.py
"""
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import rodeo_tpu
from rodeo_tpu.prior import ibm_init
from rodeo_tpu.utils import first_order_pad
from rodeo_tpu.interrogate import interrogate_rodeo
from rodeo_tpu.models.fitzhugh import fitzhugh_fun


def main():
    n_vars, n_deriv = 2, 3
    t_min, t_max = 0.0, 40.0
    n_steps = 800
    theta = jnp.array([0.2, 0.2, 3.0])

    W, pad = first_order_pad(fitzhugh_fun, n_vars, n_deriv)
    x0 = pad(jnp.array([-1.0, 1.0]), t_min, theta=theta)
    prior_pars = ibm_init((t_max - t_min) / n_steps, n_deriv,
                          jnp.array([0.01] * n_vars))

    solve = jax.jit(lambda th: rodeo_tpu.solve_mv(
        key=jax.random.PRNGKey(0), ode_fun=fitzhugh_fun, ode_weight=W,
        ode_init=x0, t_min=t_min, t_max=t_max, n_steps=n_steps,
        interrogate=interrogate_rodeo, prior_pars=prior_pars, theta=th))
    mu, var = solve(theta)

    # compare against scipy odeint
    from scipy.integrate import odeint

    def fitz_np(X, t, theta):
        a, b, c = theta
        V, R = X
        return np.array([c * (V - V ** 3 / 3 + R), -1 / c * (V - a + b * R)])

    tseq = np.linspace(t_min, t_max, n_steps + 1)
    exact = odeint(fitz_np, np.array([-1.0, 1.0]), tseq,
                   args=(np.asarray(theta),))
    err = np.max(np.abs(np.asarray(mu[:, :, 0]) - exact))
    print(f"solution shape: {mu.shape}; max abs err vs LSODA: {err:.2e}")
    sd = np.sqrt(np.asarray(var[:, :, 0, 0]))
    print(f"posterior sd at t_max: {sd[-1]}")


if __name__ == "__main__":
    main()
