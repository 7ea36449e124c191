r"""
Taylor-mode preconditioning of the solver state.

The IBM prior over ``(x, x', ..., x^{(q)})`` with step ``dt`` has transition
and noise matrices whose entries span :math:`dt^{\pm q}` — condition numbers
of :math:`10^{12}` and beyond for fine grids, which overflows float32's
precision and is why the unpreconditioned covariance filter NaNs on TPU.

Changing coordinates to :math:`\tilde x = T^{-1} x` with the diagonal

.. math:: T_{ii} = \sqrt{dt} \; dt^{\,q-i} / (q-i)!

renders the prior dt-free: :math:`\tilde Q = T^{-1} Q T` becomes the Pascal
(binomial) matrix and :math:`\tilde R = T^{-1} R T^{-1}` a Hilbert-like
matrix — both with :math:`O(1)` condition.  (Cf. Krämer & Hennig 2020,
*Stable implementation of probabilistic ODE solvers* — the same trick used
by f32-first probabilistic-numerics codes.)

The wrappers below run the existing solvers entirely in scaled coordinates
(diagonal rescaling of inputs, interrogation adapter, diagonal unscaling of
outputs), so the covariance-form filter — the fastest form on TPU — becomes
numerically sound in float32.  Quadratic forms like the rodeo interrogation
variance :math:`W \Sigma W'` are invariant under the transform.
"""
import jax
import jax.numpy as jnp
import jax.scipy as jsp

import rodeo_tpu.solve as _solve
from rodeo_tpu.ops import ptime as _ptime
from rodeo_tpu.ops.linalg import fast_linalg

__all__ = ["taylor_scale", "scale_prior", "solve_mv", "solve_sim",
           "solve_mv_iterated", "fenrir", "dalton"]


def _factorial(x):
    return jnp.exp(jsp.special.gammaln(x + 1.0))


def taylor_scale(dt, n_deriv, dtype=None):
    r"""
    Diagonal preconditioner ``t_vec`` with
    ``t_vec[i] = sqrt(dt) * dt**(q-i) / (q-i)!`` for ``q = n_deriv - 1``.

    Returns:
        (ndarray(n_deriv,)): The diagonal of :math:`T`.
    """
    i = jnp.arange(n_deriv, dtype=dtype or jnp.float64)
    q = n_deriv - 1.0
    return jnp.sqrt(dt) * dt ** (q - i) / _factorial(q - i)


def scale_prior(prior_pars, t_vec):
    r"""
    Transform prior parameters into scaled coordinates:
    :math:`\tilde Q_{ij} = Q_{ij} t_j / t_i`,
    :math:`\tilde R_{ij} = R_{ij} / (t_i t_j)`.

    Entrywise diagonal scaling — exact (no cancellation), so it restores
    conditioning even if the input was computed in low precision.
    """
    prior_weight, prior_var = prior_pars
    t = t_vec.astype(prior_weight.dtype)
    Qs = prior_weight * (t[None, :] / t[:, None])
    Rs = prior_var / (t[:, None] * t[None, :])
    return Qs, Rs


def _wrap_interrogate(interrogate, ode_weight_orig, t_vec):
    """Adapter: scaled-coordinate solver state <-> user-space interrogation.

    The solver hands over scaled predicted moments and the scaled weight
    matrix; the user's interrogation runs on original coordinates and its
    returned ``wgt_meas`` is scaled back.
    """

    def wrapped(key, ode_fun, ode_weight, t, mean_state_pred,
                var_state_pred, **params):
        t_v = t_vec.astype(mean_state_pred.dtype)
        mean_orig = mean_state_pred * t_v
        # guard against float32 overflow through the user ODE's polynomial
        # terms during divergent *transient* sweeps of the iterated
        # parallel solver — never binds for a sane converged trajectory
        if mean_orig.dtype == jnp.float32:
            mean_orig = jnp.clip(jnp.nan_to_num(mean_orig), -1e10, 1e10)
        var_orig = var_state_pred * (t_v[:, None] * t_v[None, :])
        wgt_meas, mean_meas, var_meas = interrogate(
            key=key, ode_fun=ode_fun, ode_weight=ode_weight_orig, t=t,
            mean_state_pred=mean_orig, var_state_pred=var_orig, **params)
        return wgt_meas * t_v, mean_meas, var_meas

    return wrapped


def _scaled_inputs(ode_weight, ode_init, prior_pars, t_min, t_max, n_steps):
    n_deriv = ode_init.shape[-1]
    dt = (t_max - t_min) / n_steps
    t_vec = taylor_scale(dt, n_deriv, dtype=ode_init.dtype)
    return (
        t_vec,
        ode_weight * t_vec[None, None, :].astype(ode_weight.dtype),
        ode_init / t_vec.astype(ode_init.dtype),
        scale_prior(prior_pars, t_vec),
    )


def solve_mv(key, ode_fun, ode_weight, ode_init,
             t_min, t_max, n_steps,
             interrogate,
             prior_pars,
             kalman_type="standard", temporal="sequential", **params):
    r"""
    Preconditioned :func:`rodeo_tpu.solve.solve_mv`: identical posterior (up
    to fp), but the filter/smoother run in Taylor-scaled coordinates — use
    this on TPU in float32 (the covariance form NaNs otherwise once the
    prior's dynamic range exceeds ~1e7).

    Same signature and return contract as :func:`rodeo_tpu.solve.solve_mv`.
    """
    t_vec, W_s, x0_s, prior_s = _scaled_inputs(
        ode_weight, ode_init, prior_pars, t_min, t_max, n_steps)
    with fast_linalg():
        mean_s, var_s = _solve.solve_mv(
            key=key, ode_fun=ode_fun, ode_weight=W_s, ode_init=x0_s,
            t_min=t_min, t_max=t_max, n_steps=n_steps,
            interrogate=_wrap_interrogate(interrogate, ode_weight, t_vec),
            prior_pars=prior_s, kalman_type=kalman_type, temporal=temporal,
            **params)
    t_v = t_vec.astype(mean_s.dtype)
    if kalman_type == "square-root":
        var_out = var_s * t_v[:, None]
    else:
        var_out = var_s * (t_v[:, None] * t_v[None, :])
    return mean_s * t_v, var_out


def solve_sim(key, ode_fun, ode_weight, ode_init,
              t_min, t_max, n_steps,
              interrogate,
              prior_pars,
              kalman_type="standard", **params):
    r"""
    Preconditioned :func:`rodeo_tpu.solve.solve_sim` (see :func:`solve_mv`).
    """
    t_vec, W_s, x0_s, prior_s = _scaled_inputs(
        ode_weight, ode_init, prior_pars, t_min, t_max, n_steps)
    with fast_linalg():
        xs = _solve.solve_sim(
            key=key, ode_fun=ode_fun, ode_weight=W_s, ode_init=x0_s,
            t_min=t_min, t_max=t_max, n_steps=n_steps,
            interrogate=_wrap_interrogate(interrogate, ode_weight, t_vec),
            prior_pars=prior_s, kalman_type=kalman_type, **params)
    return xs * t_vec.astype(xs.dtype)


def fenrir(key, ode_fun, ode_weight, ode_init,
           t_min, t_max, n_steps,
           interrogate,
           prior_pars,
           obs_data, obs_times, obs_weight, obs_var,
           temporal="sequential", **params):
    r"""
    Preconditioned :func:`rodeo_tpu.inference.fenrir.fenrir`.

    The observation model transforms as :math:`\tilde D = D T`; the
    log-density of the Y-space observations is invariant under the state
    coordinate change, so this returns the same value as the plain
    implementation — but float32-stable on TPU.  ``temporal="parallel"``
    runs the backward pass as a parallel-in-time associative scan.
    """
    from rodeo_tpu.inference import fenrir as _fenrir_fn
    t_vec, W_s, x0_s, prior_s = _scaled_inputs(
        ode_weight, ode_init, prior_pars, t_min, t_max, n_steps)
    obs_weight_s = obs_weight * t_vec.astype(obs_weight.dtype)
    with fast_linalg():
        return _fenrir_fn(
            key=key, ode_fun=ode_fun, ode_weight=W_s, ode_init=x0_s,
            t_min=t_min, t_max=t_max, n_steps=n_steps,
            interrogate=_wrap_interrogate(interrogate, ode_weight, t_vec),
            prior_pars=prior_s,
            obs_data=obs_data, obs_times=obs_times,
            obs_weight=obs_weight_s, obs_var=obs_var,
            temporal=temporal, **params)


def dalton(key, ode_fun, ode_weight, ode_init,
           t_min, t_max, n_steps,
           interrogate,
           prior_pars,
           obs_data, obs_times, obs_weight, obs_var,
           **params):
    r"""
    Preconditioned :func:`rodeo_tpu.inference.dalton.dalton`
    (see :func:`fenrir`).
    """
    from rodeo_tpu.inference import dalton as _dalton_fn
    t_vec, W_s, x0_s, prior_s = _scaled_inputs(
        ode_weight, ode_init, prior_pars, t_min, t_max, n_steps)
    obs_weight_s = obs_weight * t_vec.astype(obs_weight.dtype)
    with fast_linalg():
        return _dalton_fn(
            key=key, ode_fun=ode_fun, ode_weight=W_s, ode_init=x0_s,
            t_min=t_min, t_max=t_max, n_steps=n_steps,
            interrogate=_wrap_interrogate(interrogate, ode_weight, t_vec),
            prior_pars=prior_s,
            obs_data=obs_data, obs_times=obs_times,
            obs_weight=obs_weight_s, obs_var=obs_var, **params)


def solve_mv_iterated(key, ode_fun, ode_weight, ode_init,
                      t_min, t_max, n_steps,
                      interrogate,
                      prior_pars,
                      **kwargs):
    r"""
    Preconditioned :func:`rodeo_tpu.ops.ptime.solve_mv_iterated` — the fully
    parallel-in-time engine in Taylor-scaled coordinates (required for f32).

    Extra keyword arguments (``n_iter``, ``warm_start``, ``n_coarse``,
    ``window_size``) pass through.
    """
    t_vec, W_s, x0_s, prior_s = _scaled_inputs(
        ode_weight, ode_init, prior_pars, t_min, t_max, n_steps)
    with fast_linalg():
        mean_s, var_s = _ptime.solve_mv_iterated(
            key=key, ode_fun=ode_fun, ode_weight=W_s, ode_init=x0_s,
            t_min=t_min, t_max=t_max, n_steps=n_steps,
            interrogate=_wrap_interrogate(interrogate, ode_weight, t_vec),
            prior_pars=prior_s, **kwargs)
    t_v = t_vec.astype(mean_s.dtype)
    return mean_s * t_v, var_s * (t_v[:, None] * t_v[None, :])
