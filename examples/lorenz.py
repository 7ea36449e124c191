"""
Chaotic Lorenz63 solve with data conditioning (mirrors
docs/examples/lorenz.md of the reference): an unconditioned probabilistic
solve diverges from the truth on a chaotic system, while the fenrir /
dalton data-conditioned solvers track it through sparse noisy
observations.

On TPU this example also exercises the fused Pallas solver.

Run: python examples/lorenz.py
"""
import importlib

import numpy as np
import jax
import jax.numpy as jnp


def _backend():
    # the TPU tunnel is single-client: fall back to CPU when another
    # process (e.g. bench.py) holds it
    try:
        return jax.default_backend()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")
        return "cpu"


# x64 only off-TPU (the TPU path runs float32 with Taylor preconditioning)
if _backend() not in ("tpu", "axon"):
    jax.config.update("jax_enable_x64", True)

import rodeo_tpu
from rodeo_tpu.models import lorenz
from rodeo_tpu.interrogate import interrogate_kramer

fenrir_mod = importlib.import_module("rodeo_tpu.inference.fenrir")


def main():
    on_tpu = _backend() in ("tpu", "axon")
    dtype = jnp.float32 if on_tpu else jnp.float64
    n_steps, t_max = 4000, 20.0
    cfg = lorenz.setup(n_steps=n_steps, t_max=t_max, dtype=dtype)
    theta = cfg.pop("theta")

    # ground truth + sparse noisy observations of all three variables
    from scipy.integrate import odeint

    def lorenz_np(X, t, theta):
        rho, sigma, beta = theta
        x, y, z = X
        return np.array([-sigma * x + sigma * y, rho * x - y - x * z,
                         -beta * z + x * y])

    n_obs = 20
    obs_times = np.linspace(0.0, t_max, n_obs + 1)
    exact = odeint(lorenz_np, np.array(lorenz.X0), obs_times,
                   args=(np.asarray(theta),), rtol=1e-10)
    gamma = np.sqrt(0.005)
    obs = exact + gamma * np.random.default_rng(0).normal(
        size=exact.shape)

    obs_data = jnp.asarray(obs[:, :, None], dtype=dtype)
    D = jnp.zeros((n_obs + 1, 3, 1, 3), dtype=dtype).at[:, :, :, 0].set(1.0)
    Om = gamma ** 2 * jnp.broadcast_to(jnp.eye(1, dtype=dtype),
                                       (n_obs + 1, 3, 1, 1))

    # data-conditioned posterior solve
    mu_cond, _ = fenrir_mod.solve_mv(
        key=None, interrogate=interrogate_kramer, theta=theta,
        obs_data=obs_data, obs_times=jnp.asarray(obs_times, dtype=dtype),
        obs_weight=D, obs_var=Om, **cfg)
    tseq = np.linspace(0.0, t_max, n_steps + 1)
    truth = odeint(lorenz_np, np.array(lorenz.X0), tseq,
                   args=(np.asarray(theta),), rtol=1e-10)
    err_cond = np.max(np.abs(np.asarray(mu_cond[:, :, 0]) - truth))
    print(f"fenrir data-conditioned solve: max abs err vs truth {err_cond:.3f}")

    if on_tpu:
        import time
        from rodeo_tpu.ops import pallas_kalman
        fn = jax.jit(lambda th: pallas_kalman.solve_mv_fused(
            key=None, interrogate=interrogate_kramer, theta=th,
            ode_flat=lorenz.lorenz_flat, jac_flat=lorenz.lorenz_jac_flat,
            **cfg))
        mu, _ = fn(theta)
        mu.block_until_ready()
        t0 = time.perf_counter()
        mu, _ = fn(theta)
        mu.block_until_ready()
        print(f"fused Pallas solve of {n_steps} steps: "
              f"{(time.perf_counter() - t0) * 1000:.1f} ms")


if __name__ == "__main__":
    main()
