r"""
Pseudo-marginal MCMC: random-walk Rosenbluth-Metropolis-Hastings kernels
with **auxiliary variables**.

The ``logdensity_fn`` has signature ``logdensity_fn(position, rng_key) ->
(logdensity, auxdata)``: the density is stochastic (e.g. a Chkrebtii-style
marginal likelihood evaluated on a fresh ODE draw) and the auxiliary data
(e.g. the sampled solution path) is carried in the chain state.

Functional parity target:
``/root/reference/src/rodeo/inference/pseudo_marginal.py``, which forks
``blackjax.mcmc.random_walk``.  Unlike the reference, this module is fully
self-contained — the ~100 lines of proposal/acceptance machinery from
blackjax are reimplemented here (same semantics, blackjax-compatible
``SamplingAlgorithm`` interface with ``init`` / ``step``), so the library has
no blackjax dependency.

Every kernel is a pure jittable function; vmap over chains and shard the
chain axis over a device mesh with :mod:`rodeo_tpu.parallel` for multi-chip
scaling.
"""
from typing import Callable, NamedTuple, Optional, Any

import jax
import jax.flatten_util
import jax.numpy as jnp

__all__ = [
    "RWAState",
    "RWAInfo",
    "SamplingAlgorithm",
    "init",
    "normal",
    "build_rmh",
    "build_additive_step",
    "build_irmh",
    "build_rmh_transition_energy",
    "normal_random_walk",
    "additive_step_random_walk",
    "irmh_as_top_level_api",
    "rmh_as_top_level_api",
]


class RWAState(NamedTuple):
    """State of the Random Walk Auxiliary (RWA) chain."""

    position: Any
    """Current position of the chain."""

    logdensity: float
    """Current value of the log-density."""

    auxdata: Any = None
    """Current value of the auxiliary data."""


class RWAInfo(NamedTuple):
    """Additional information about one RWA chain step."""

    acceptance_rate: float
    """Acceptance probability of the proposed transition."""

    is_accepted: bool
    """Whether the proposed state was accepted."""

    proposal: RWAState
    """The proposed state of the chain."""


class SamplingAlgorithm(NamedTuple):
    """A pair of pure functions ``(init, step)`` defining an MCMC algorithm
    (blackjax-compatible interface)."""

    init: Callable
    step: Callable


# --- building blocks -----------------------------------------------------------


def init(position, logdensity_fn: Callable, rng_key) -> RWAState:
    """
    Create an initial chain state from a position.

    Parity: ``pseudo_marginal.py:135-149``.  The PRNG key is threaded into
    ``logdensity_fn`` because the density is stochastic.
    """
    logdensity, auxdata = logdensity_fn(position, rng_key)
    return RWAState(position, logdensity, auxdata)


def generate_gaussian_noise(rng_key, position, sigma):
    """
    Gaussian noise with the same pytree structure as ``position``.

    ``sigma`` may be a scalar, a vector of per-coordinate standard
    deviations, or a full covariance square-root matrix (as in
    ``blackjax.util.generate_gaussian_noise``).
    """
    flat, unravel = jax.flatten_util.ravel_pytree(position)
    z = jax.random.normal(rng_key, flat.shape, dtype=flat.dtype)
    sigma = jnp.asarray(sigma)
    if sigma.ndim <= 1:
        noise = sigma * z
    elif sigma.ndim == 2:
        noise = sigma @ z
    else:
        raise ValueError("sigma must be a scalar, vector or matrix.")
    return unravel(noise)


def normal(sigma) -> Callable:
    """
    Normal random-walk proposal: step ~ N(0, sigma sigma').

    Parity: ``blackjax.mcmc.random_walk.normal`` as used at
    ``pseudo_marginal.py:58-61``.
    """
    if jnp.ndim(sigma) > 2:
        raise ValueError("sigma must be a vector or a matrix.")

    def propose(rng_key, position):
        return generate_gaussian_noise(rng_key, position, sigma)

    return propose


def static_binomial_sampling(rng_key, log_p_accept, prev_state, new_state):
    """
    Metropolis accept/reject with probability ``min(1, exp(log_p_accept))``.

    Matches ``blackjax.mcmc.proposal.static_binomial_sampling`` semantics as
    used at ``pseudo_marginal.py:456,476``.
    """
    p_accept = jnp.minimum(jnp.exp(log_p_accept), 1.0)
    do_accept = jax.random.bernoulli(rng_key, p_accept)
    accepted_state = jax.tree_util.tree_map(
        lambda new, prev: jnp.where(do_accept, new, prev),
        new_state, prev_state)
    return accepted_state, (do_accept, p_accept, None)


def build_rmh_transition_energy(proposal_logdensity_fn: Optional[Callable]) -> Callable:
    """
    Transition energy of an RMH move.  Parity: ``pseudo_marginal.py:438-449``.

    ``proposal_logdensity_fn(state_from, state_to)`` must return the
    log-density of the proposal move *from* the first argument *to* the
    second (i.e. :math:`\\log q(x_{\\text{to}} \\mid x_{\\text{from}})`,
    evaluated at the SECOND argument's position).  With that convention
    the assembled acceptance ratio is the textbook Metropolis-Hastings
    :math:`\\pi(x') q(x \\mid x') / [\\pi(x)\\, q(x' \\mid x)]` — pinned
    against the closed form in
    ``tests/test_pseudo_marginal_kernels.py``.  (The energy
    :math:`E(\\text{prev} \\to \\text{new}) = -\\log \\pi(x_{\\text{new}})
    - \\log q(x_{\\text{prev}} \\mid x_{\\text{new}})` carries the
    reverse-move density, as in the reference's blackjax fork.)
    """
    if proposal_logdensity_fn is None:

        def transition_energy(prev_state, new_state):
            return -new_state.logdensity

    else:

        def transition_energy(prev_state, new_state):
            return -new_state.logdensity - proposal_logdensity_fn(
                new_state, prev_state)

    return transition_energy


def compute_asymmetric_acceptance_ratio(transition_energy: Callable) -> Callable:
    """
    Log acceptance ratio from a transition energy, following the
    blackjax convention (``blackjax.mcmc.proposal``).
    """

    def acceptance_ratio(prev_state, new_state):
        return transition_energy(new_state, prev_state) - \
            transition_energy(prev_state, new_state)

    return acceptance_ratio


def rmh_proposal(
    logdensity_fn: Callable,
    transition_distribution: Callable,
    compute_acceptance_ratio: Callable,
    sample_proposal: Callable = static_binomial_sampling,
) -> Callable:
    """
    Generator of RMH sample proposals with auxiliary data.

    Parity: ``pseudo_marginal.py:452-483`` — in particular the 3-way key
    split into ``(key_proposal, key_accept, key_logdensity)`` so the
    stochastic log-density gets its own key each step.
    """

    def generate(rng_key, previous_state: RWAState):
        key_proposal, key_accept, key_logdensity = jax.random.split(rng_key, 3)
        position = previous_state.position
        new_position = transition_distribution(key_proposal, position)
        new_logdensity, new_auxdata = logdensity_fn(
            new_position, key_logdensity)
        proposed_state = RWAState(new_position, new_logdensity, new_auxdata)
        log_p_accept = compute_acceptance_ratio(previous_state, proposed_state)
        accepted_state, info = sample_proposal(
            key_accept, log_p_accept, previous_state, proposed_state)
        do_accept, p_accept, _ = info
        return accepted_state, do_accept, p_accept

    return generate


# --- kernels --------------------------------------------------------------------


def build_rmh():
    """
    Build a Rosenbluth-Metropolis-Hastings kernel with auxiliary variables.

    Parity: ``pseudo_marginal.py:332-379``.

    Returns:
        (Callable): ``kernel(rng_key, state, logdensity_fn,
        transition_generator, proposal_logdensity_fn=None) ->
        (RWAState, RWAInfo)``.
    """

    def kernel(rng_key, state: RWAState, logdensity_fn: Callable,
               transition_generator: Callable,
               proposal_logdensity_fn: Optional[Callable] = None):
        transition_energy = build_rmh_transition_energy(proposal_logdensity_fn)
        acceptance_ratio = compute_asymmetric_acceptance_ratio(
            transition_energy)
        proposal_generator = rmh_proposal(
            logdensity_fn, transition_generator, acceptance_ratio)
        new_state, do_accept, p_accept = proposal_generator(rng_key, state)
        return new_state, RWAInfo(p_accept, do_accept, new_state)

    return kernel


def build_additive_step():
    """
    RMH kernel with an additive-step proposal
    (``x' = x + step``).  Parity: ``pseudo_marginal.py:152-172``.
    """

    def kernel(rng_key, state: RWAState, logdensity_fn: Callable,
               random_step: Callable):
        def proposal_generator(key_proposal, position):
            move = random_step(key_proposal, position)
            return jax.tree_util.tree_map(jnp.add, position, move)

        inner_kernel = build_rmh()
        return inner_kernel(rng_key, state, logdensity_fn, proposal_generator)

    return kernel


def build_irmh() -> Callable:
    """
    Independent-proposal RMH kernel (proposal does not depend on the current
    position).  Parity: ``pseudo_marginal.py:235-274``.
    """

    def kernel(rng_key, state: RWAState, logdensity_fn: Callable,
               proposal_distribution: Callable,
               proposal_logdensity_fn: Optional[Callable] = None):
        def proposal_generator(rng_key, position):
            del position
            return proposal_distribution(rng_key)

        inner_kernel = build_rmh()
        return inner_kernel(
            rng_key, state, logdensity_fn, proposal_generator,
            proposal_logdensity_fn)

    return kernel


# --- top-level APIs ---------------------------------------------------------------


def additive_step_random_walk(logdensity_fn: Callable,
                              random_step: Callable) -> SamplingAlgorithm:
    """
    User interface for the additive-step RMH.
    Parity: ``pseudo_marginal.py:192-232``.
    """
    kernel = build_additive_step()

    def init_fn(position, rng_key=None):
        return init(position, logdensity_fn, rng_key)

    def step_fn(rng_key, state):
        return kernel(rng_key, state, logdensity_fn, random_step)

    return SamplingAlgorithm(init_fn, step_fn)


def normal_random_walk(logdensity_fn: Callable, sigma) -> SamplingAlgorithm:
    """
    Gaussian additive-step random-walk Metropolis-Hastings sampler.
    Parity: ``pseudo_marginal.py:175-189``.
    """
    return additive_step_random_walk(logdensity_fn, normal(sigma))


def irmh_as_top_level_api(
    logdensity_fn: Callable,
    proposal_distribution: Callable,
    proposal_logdensity_fn: Optional[Callable] = None,
) -> SamplingAlgorithm:
    """
    User interface for the independent RMH.
    Parity: ``pseudo_marginal.py:277-329``.

    ``proposal_logdensity_fn(state_from, state_to)`` (needed because an
    independent proposal is NOT symmetric) follows the convention of
    :func:`build_rmh_transition_energy`: return the proposal log-density
    evaluated at the SECOND argument's position, i.e. for an independent
    proposal ``q`` simply ``log q(state_to.position)``.
    """
    kernel = build_irmh()

    def init_fn(position, rng_key=None):
        return init(position, logdensity_fn, rng_key)

    def step_fn(rng_key, state):
        return kernel(rng_key, state, logdensity_fn,
                      proposal_distribution, proposal_logdensity_fn)

    return SamplingAlgorithm(init_fn, step_fn)


def save_state(path, state: RWAState):
    """
    Checkpoint a (possibly vmapped) chain state to ``path`` (.npz).

    The reference provides no persistence (SURVEY.md section 5); long
    multi-chip MCMC runs need resumable state.
    """
    import numpy as np
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez(path, n_leaves=len(leaves),
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})


def load_state(path, like: RWAState = None) -> RWAState:
    """Restore a chain state saved by :func:`save_state`.

    Args:
        path: File path.
        like (RWAState | None): A state with the same pytree structure
            (needed when ``position``/``auxdata`` are non-trivial pytrees);
            defaults to the flat single-leaf-per-field layout.
    """
    import numpy as np
    data = np.load(path)
    n = int(data["n_leaves"])
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    template = like if like is not None else RWAState(
        position=0, logdensity=0.0, auxdata=0)
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def rmh_as_top_level_api(
    logdensity_fn: Callable,
    proposal_generator: Callable,
    proposal_logdensity_fn: Optional[Callable] = None,
) -> SamplingAlgorithm:
    """
    User interface for the general RMH.
    Parity: ``pseudo_marginal.py:382-435``.

    For an asymmetric ``proposal_generator``, supply
    ``proposal_logdensity_fn(state_from, state_to)`` returning the
    transition log-density from the first argument to the second (see
    :func:`build_rmh_transition_energy`).
    """
    kernel = build_rmh()

    def init_fn(position, rng_key=None):
        return init(position, logdensity_fn, rng_key)

    def step_fn(rng_key, state):
        return kernel(rng_key, state, logdensity_fn,
                      proposal_generator, proposal_logdensity_fn)

    return SamplingAlgorithm(init_fn, step_fn)
