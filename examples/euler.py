"""
Euler's method baseline (counterpart of `/root/reference/examples/euler.py`):
a jitted lax.scan Euler integrator, compared against the probabilistic
solver on FitzHugh-Nagumo.

Run: PYTHONPATH=. python examples/euler.py
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import rodeo_tpu
from rodeo_tpu.interrogate import interrogate_kramer
from rodeo_tpu.models import fitzhugh


@partial(jax.jit, static_argnums=(0, 5))
def euler(fun, x0, theta, tmin, tmax, n_steps):
    r"""Euler approximation of the ODE-IVP on a fixed grid."""
    step_size = (tmax - tmin) / n_steps

    def scan_fun(x_old, t):
        x_new = x_old + fun(x_old, tmin + step_size * t, theta) * step_size
        return x_new, x_new

    _, X_t = lax.scan(scan_fun, x0, jnp.arange(n_steps))
    return jnp.concatenate([x0[None], X_t])


def main():
    cfg = fitzhugh.setup(n_steps=250, dtype=jnp.float64)
    theta = cfg.pop("theta")

    def fitz_first_order(x, t, th):
        a, b, c = th
        V, R = x
        return jnp.array([c * (V - V ** 3 / 3 + R), -1 / c * (V - a + b * R)])

    xs_euler = euler(fitz_first_order, jnp.array([-1.0, 1.0]), theta,
                     cfg["t_min"], cfg["t_max"], cfg["n_steps"])
    mu, _ = rodeo_tpu.solve_mv(key=None, interrogate=interrogate_kramer,
                               theta=theta, **cfg)
    err = float(jnp.max(jnp.abs(xs_euler - mu[:, :, 0])))
    print(f"Euler vs probabilistic solver, max |diff| over the grid: "
          f"{err:.4f}  (Euler's O(h) bias dominates)")


if __name__ == "__main__":
    main()
