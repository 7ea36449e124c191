r"""
Basic (plug-in) likelihood approximation.

Computes :math:`\log p(Y_{0:M} \mid Z_{1:N})` by plugging the smoothed
posterior mean :math:`\mu_{0:N|N}` of the ODE solution into a user-supplied
observation log-likelihood:

.. math::

    \log p(Y_{0:M} \mid Z_{1:N}) \approx
      \sum_{i=0}^M \log p(Y_i \mid X_{n(i)} = \mu_{n(i)|N}),

matching observation times to the closest solver grid point.

Functional parity target: ``/root/reference/src/rodeo/inference/basic.py``.
"""
import jax
import jax.numpy as jnp

from rodeo_tpu.solve import solve_mv
from rodeo_tpu.ops.linalg import full_matmul_precision

__all__ = ["basic"]


@full_matmul_precision
def basic(key, ode_fun, ode_weight, ode_init,
          t_min, t_max, n_steps,
          interrogate,
          prior_pars,
          obs_data, obs_times, obs_loglik,
          kalman_type="standard", temporal="sequential", **params):
    r"""
    Basic approximate log-likelihood of :math:`p(Y_{0:M} \mid Z_{1:N})`.

    Args:
        key (PRNGKey): PRNG key.
        ode_fun (Callable): Block-form ODE function.
        ode_weight (ndarray(n_block, n_bmeas, n_bstate)): :math:`W`.
        ode_init (ndarray(n_block, n_bstate)): Initial state.
        t_min, t_max (float): Solution interval.
        n_steps (int): Number of solver steps.
        interrogate (Callable): Interrogation scheme.
        prior_pars (tuple): ``(prior_weight, prior_var)``.
        obs_data (ndarray(n_obs, n_bobs)): Observations.
        obs_times (ndarray(n_obs)): Observation times.
        obs_loglik (Callable): ``obs_loglik(obs_data, ode_data, **params)``.
        kalman_type (str): ``"standard"`` or ``"square-root"``.
        temporal (str): ``"sequential"`` or ``"parallel"`` — the latter
            runs the underlying smoother parallel-in-time
            (:mod:`rodeo_tpu.ops.ptime`); TPU-only addition, values
            identical.  For lane-batched throughput use
            :func:`rodeo_tpu.ops.pallas_kalman.basic_fused_batch`.
        params: Optional model parameters.

    Returns:
        (tuple): the log-likelihood value and the smoothed solution ``Xt``.
    """
    Xt, _ = solve_mv(
        key=key,
        ode_fun=ode_fun,
        ode_weight=ode_weight,
        ode_init=ode_init,
        t_min=t_min,
        t_max=t_max,
        n_steps=n_steps,
        interrogate=interrogate,
        prior_pars=prior_pars,
        kalman_type=kalman_type,
        temporal=temporal,
        **params,
    )
    sim_times = jnp.linspace(t_min, t_max, n_steps + 1)
    ode_data = Xt[jnp.searchsorted(sim_times, obs_times)]
    return obs_loglik(obs_data, ode_data, **params), Xt
