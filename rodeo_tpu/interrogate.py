r"""
Interrogation schemes for the probabilistic ODE solver.

An interrogation maps the predicted state distribution at time :math:`t_n`
to a linearized measurement model :math:`(B_n, a_n, V_n)` for the
pseudo-observation :math:`Z_n = 0`:

.. math::

    Z_n \approx (W + B_n) X_n + a_n + V_n^{1/2} \eta_n.

Implemented schemes (functional parity target:
``/root/reference/src/rodeo/interrogate.py``):

- :func:`interrogate_rodeo` — zero-order linearization with
  :math:`V_n = W \Sigma_{n|n-1} W'` (the rodeo default).
- :func:`interrogate_schober` — zero-order with :math:`V_n = 0`
  (Schober et al 2019).
- :func:`interrogate_chkrebtii` — stochastic interrogation sampling
  :math:`x^* \sim N(\mu_{n|n-1}, \Sigma_{n|n-1})` (Chkrebtii et al 2016).
- :func:`interrogate_kramer` — first-order (EK1) Taylor linearization
  (Krämer et al 2021).

The interrogation callable signature is the L3a contract of the reference
(``interrogate.py:87-115``): ``(key, ode_fun, ode_weight, t,
mean_state_pred, var_state_pred, **params) -> (wgt_meas, mean_meas,
var_meas)`` with stacked block shapes.
"""
import jax
import jax.numpy as jnp

from rodeo_tpu.utils import mvdot, quadform

__all__ = [
    "interrogate_rodeo",
    "interrogate_schober",
    "interrogate_chkrebtii",
    "interrogate_kramer",
]


def interrogate_rodeo(key, ode_fun, ode_weight, t,
                      mean_state_pred, var_state_pred,
                      **params):
    r"""
    Rodeo interrogation: zero-order linearization at the predicted mean with
    measurement variance :math:`V_n = W \Sigma_{n|n-1} W'`.

    Parity: ``interrogate.py:87-115``.

    Args:
        key (PRNGKey): PRNG key (unused; present for interface uniformity).
        ode_fun (Callable): Block-form ODE function ``f(X, t, **params)``.
        ode_weight (ndarray(n_block, n_bmeas, n_bstate)): Weight matrix ``W``.
        t (float): Time point.
        mean_state_pred (ndarray(n_block, n_bstate)): :math:`\mu_{n|n-1}`.
        var_state_pred (ndarray(n_block, n_bstate, n_bstate)): :math:`\Sigma_{n|n-1}`.
        params: Optional model parameters forwarded to ``ode_fun``.

    Returns:
        (tuple):
        - **wgt_meas** (ndarray(n_block, n_bmeas, n_bstate)): zeros.
        - **mean_meas** (ndarray(n_block, n_bmeas)): :math:`-f(\mu_{n|n-1}, t)`.
        - **var_meas** (ndarray(n_block, n_bmeas, n_bmeas)).
    """
    var_meas = quadform(ode_weight, var_state_pred)
    mean_meas = -ode_fun(mean_state_pred, t, **params)
    return jnp.zeros_like(ode_weight), mean_meas, var_meas


def interrogate_schober(key, ode_fun, ode_weight, t,
                        mean_state_pred, var_state_pred,
                        **params):
    r"""
    Schober et al (2019) interrogation: zero-order with :math:`V_n = 0`.

    Parity: ``interrogate.py:50-62``.  Same arguments and returns as
    :func:`interrogate_rodeo`.
    """
    n_block, n_bmeas, _ = ode_weight.shape
    var_meas = jnp.zeros(
        (n_block, n_bmeas, n_bmeas), dtype=mean_state_pred.dtype)
    mean_meas = -ode_fun(mean_state_pred, t, **params)
    return jnp.zeros_like(ode_weight), mean_meas, var_meas


def interrogate_chkrebtii(key, ode_fun, ode_weight, t,
                          mean_state_pred, var_state_pred,
                          kalman_type, **params):
    r"""
    Chkrebtii et al (2016) stochastic interrogation: evaluates the ODE at a
    draw :math:`x^* \sim N(\mu_{n|n-1}, \Sigma_{n|n-1})`.

    Parity: ``interrogate.py:13-47`` including the per-block key-split tree,
    so draws match the reference bit-for-bit given the same key.  Requires
    the extra ``kalman_type`` argument because the predicted variance arrives
    either in covariance or square-root form.

    Same returns as :func:`interrogate_rodeo`.
    """
    n_block, n_bstate = mean_state_pred.shape
    key, *subkeys = jax.random.split(key, num=n_block + 1)
    subkeys = jnp.array(subkeys)
    if kalman_type == "standard":
        var_meas = quadform(ode_weight, var_state_pred)
        x_state = jax.vmap(jax.random.multivariate_normal)(
            subkeys, mean_state_pred, var_state_pred)
    elif kalman_type == "square-root":
        # var_state_pred is a factor L: draw x* = mu + (W L) z with z ~ N(0, I)
        var_meas = ode_weight @ var_state_pred
        random_norm = jax.vmap(
            jax.random.normal, in_axes=(0, None))(subkeys, (n_bstate,))
        x_state = mean_state_pred + mvdot(var_meas, random_norm)
    else:
        raise NotImplementedError
    mean_meas = -ode_fun(x_state, t, **params)
    return jnp.zeros_like(ode_weight), mean_meas, var_meas


def interrogate_kramer(key, ode_fun, ode_weight, t,
                       mean_state_pred, var_state_pred,
                       **params):
    r"""
    Krämer et al (2021) first-order interrogation (EK1): linearizes
    :math:`f` at the predicted mean with its block-diagonal Jacobian.

    Parity: ``interrogate.py:65-84``.  Assumes off-block-diagonal Jacobian
    entries are zero (the block-independence assumption of the solver).

    Same returns as :func:`interrogate_rodeo`.
    """
    n_block, n_bmeas, n_bstate = ode_weight.shape
    fun_meas = -ode_fun(mean_state_pred, t, **params)
    jac = jax.jacfwd(ode_fun)(mean_state_pred, t, **params)
    # extract the block diagonal: jac has shape (n_block, n_bmeas, n_block, n_bstate)
    jac = jnp.diagonal(jac, axis1=0, axis2=2)        # (n_bmeas, n_bstate, n_block)
    jac = jnp.moveaxis(jac, -1, 0)                   # (n_block, n_bmeas, n_bstate)
    wgt_meas = -jac
    mean_meas = fun_meas + mvdot(jac, mean_state_pred)
    var_meas = jnp.zeros(
        (n_block, n_bmeas, n_bmeas), dtype=mean_state_pred.dtype)
    return wgt_meas, mean_meas, var_meas
