r"""
Collapse stacked block prior parameters into a single dense block.

Used for non-blocked operation (one big ``(d*q, d*q)`` state instead of ``d``
independent ``(q, q)`` blocks).  Functional parity target:
``/root/reference/src/rodeo/prior/indep_init.py``.
"""
import jax
import jax.scipy.linalg as jsl

__all__ = ["indep_init"]


def indep_init(prior_pars):
    r"""
    Combine blocks of prior parameters into dense matrices.

    Args:
        prior_pars (tuple): ``(prior_weight, prior_var)`` stacked block
            arrays of shape ``(n_block, p, p)``.

    Returns:
        (tuple): ``(prior_weight, prior_var)`` as single dense blocks of
        shape ``(1, n_block * p, n_block * p)``.
    """
    prior_weight, prior_var = prior_pars
    prior_weight = jsl.block_diag(*prior_weight)[None, :]
    prior_var = jsl.block_diag(*prior_var)[None, :]
    return prior_weight, prior_var
