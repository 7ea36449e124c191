"""
Solution-uncertainty visualization data (the reference README figure,
`examples/chkrebtii_graph.py` upstream): draw sample solution paths of the
second-order Chkrebtii ODE at several grid resolutions and report how the
posterior dispersion shrinks as the grid refines.

Writes chkrebtii_graph.png if matplotlib is available, else prints a table.

Run: python examples/chkrebtii_graph.py
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
    """x'' = sin(2t) - x in block form."""
    return jnp.array([[jnp.sin(2 * t) - x[0, 0]]])


def exact_sol(t):
    return (2 * np.sin(t) - 3 * np.cos(t) - np.sin(2 * t)) / 3.0


def main():
    n_deriv = 4
    t_min, t_max = 0.0, 10.0
    x0 = jnp.array([[-1.0, 0.0, 1.0, 2.0]])
    W = jnp.zeros((1, 1, n_deriv)).at[:, :, 2].set(1.0)
    n_draws = 20
    results = {}
    for n_steps in [50, 100, 200]:
        prior_pars = ibm_init((t_max - t_min) / n_steps, n_deriv,
                              jnp.array([0.5]))
        draw = jax.jit(jax.vmap(lambda key: rodeo_tpu.solve_sim(
            key=key, ode_fun=higher_fun, ode_weight=W, ode_init=x0,
            t_min=t_min, t_max=t_max, n_steps=n_steps,
            interrogate=partial(interrogate_chkrebtii,
                                kalman_type="standard"),
            prior_pars=prior_pars)))
        keys = jax.random.split(jax.random.PRNGKey(0), n_draws)
        xs = draw(keys)  # (n_draws, n_steps+1, 1, n_deriv)
        tseq = np.linspace(t_min, t_max, n_steps + 1)
        paths = np.asarray(xs[:, :, 0, 0])
        spread = np.mean(np.std(paths, axis=0))
        err = np.mean(np.abs(paths.mean(axis=0) - exact_sol(tseq)))
        results[n_steps] = (tseq, paths, spread, err)
        print(f"n_steps={n_steps:4d}: mean posterior spread {spread:.4f}, "
              f"mean abs error of the posterior mean {err:.4f}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 3, figsize=(12, 3.2), sharey=True)
        for ax, (n_steps, (tseq, paths, _, _)) in zip(axes, results.items()):
            for p in paths:
                ax.plot(tseq, p, color="C0", alpha=0.2, lw=0.7)
            tt = np.linspace(t_min, t_max, 500)
            ax.plot(tt, exact_sol(tt), "k--", lw=1.2, label="exact")
            ax.set_title(f"N = {n_steps}")
            ax.set_xlabel("t")
        axes[0].set_ylabel("x(t)")
        axes[0].legend()
        fig.tight_layout()
        fig.savefig("chkrebtii_graph.png", dpi=120)
        print("wrote chkrebtii_graph.png")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
