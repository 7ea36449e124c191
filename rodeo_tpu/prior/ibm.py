r"""
q-times integrated Brownian motion (IBM) solution prior.

For the prior :math:`x^{(q)}(t) = \sigma B(t)`, the discrete-time transition
and process-noise matrices have the closed forms

.. math::

    Q_{ij} = \mathbb{1}_{i \le j} \frac{(\Delta t)^{j-i}}{(j-i)!}, \qquad
    R_{ij} = \sigma^2
      \frac{(\Delta t)^{2q-1-i-j}}{(2q-1-i-j)\,(q-i)!\,(q-j)!}.

Functional parity target: ``/root/reference/src/rodeo/prior/ibm.py``
(``ibm_state``, ``ibm_init``).  Everything here is closed-form and device
resident, so the prior construction traces into the same XLA program as the
solve.
"""
import jax
import jax.numpy as jnp
import jax.scipy as jsp

__all__ = ["ibm_state", "ibm_init"]


def _factorial(x):
    """Real-argument factorial via the gamma function: ``x!`` for integer x."""
    return jnp.exp(jsp.special.gammaln(x + 1.0))


def ibm_state(dt, q, sigma):
    r"""
    Transition matrix ``Q`` and process-noise matrix ``R`` of the q-times
    integrated Brownian motion over a step of size ``dt``.

    Parity: ``prior/ibm.py:37-62``.

    Args:
        dt (float): Step size.
        q (int): Number of integrations (state dimension is ``q + 1``).
        sigma (float): Diffusion scale.

    Returns:
        (tuple): ``Q`` (q+1, q+1) and ``R`` (q+1, q+1).
    """
    I, J = jnp.meshgrid(jnp.arange(q + 1), jnp.arange(q + 1),
                        indexing="ij", sparse=True)
    upper = J - I
    Q = jnp.nan_to_num(dt ** upper / _factorial(upper), 0)
    pow_r = (2.0 * q + 1.0) - I - J
    num = dt ** pow_r
    den = pow_r * _factorial(q - I) * _factorial(q - J)
    R = sigma ** 2 * num / den
    return Q, R


def ibm_init(dt, n_deriv, sigma):
    r"""
    Stacked block IBM prior parameters for the Kalman solver.

    Builds one ``(q+1, q+1)`` pair with unit diffusion and broadcasts it to
    ``n_block = len(sigma)`` blocks, scaling the noise of block ``b`` by
    ``sigma[b]**2``.  Parity: ``prior/ibm.py:65-88``.

    Args:
        dt (float): Step size.
        n_deriv (int): State dimension per block (``q + 1``).
        sigma (ndarray(n_block)): Per-block diffusion scales.

    Returns:
        (tuple):
        - **prior_weight** (ndarray(n_block, n_deriv, n_deriv)): :math:`Q`.
        - **prior_var** (ndarray(n_block, n_deriv, n_deriv)): :math:`R`.
    """
    sigma = jnp.asarray(sigma)
    n_block = sigma.shape[0]
    wgt_one, var_one = ibm_state(dt, n_deriv - 1, 1.0)
    prior_weight = jnp.broadcast_to(
        wgt_one, (n_block,) + wgt_one.shape)
    prior_var = sigma[:, None, None] ** 2 * var_one
    return prior_weight, prior_var
