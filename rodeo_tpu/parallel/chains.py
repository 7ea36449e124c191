r"""
Sharded vmapped MCMC chains and parameter sweeps.

The pseudo-marginal MCMC stack (:mod:`rodeo_tpu.inference.pseudo_marginal`)
re-enters a full ODE solve per step per chain; scaling it means running many
chains at once.  Chains are vmapped into one XLA program (so per-block
:math:`q \times q` algebra batches into MXU-sized ops) and the chain axis is
sharded over a device mesh with ``jax.jit`` + ``NamedSharding`` — pure data
parallelism over ICI, zero cross-chip collectives inside a step.

These helpers realize BASELINE.json config #5 ("pseudo_marginal MCMC +
magi Markov-prior inference, vmapped chains").
"""
import jax
import jax.numpy as jnp

from rodeo_tpu.parallel.mesh import make_mesh, batch_sharding

__all__ = ["run_chains", "sharded_loglik"]


def run_chains(alg, init_positions, key, n_samples,
               mesh=None, axis_name="chain"):
    r"""
    Run many MCMC chains in parallel, sharded over a device mesh.

    Args:
        alg (SamplingAlgorithm): e.g.
            :func:`rodeo_tpu.inference.pseudo_marginal.normal_random_walk`.
            ``alg.init(position, rng_key)`` / ``alg.step(rng_key, state)``
            must be vmappable (pseudo-marginal kernels are).
        init_positions (pytree): Initial positions with a leading chain
            axis of size ``n_chains``.
        key (PRNGKey): Base PRNG key.
        n_samples (int): Number of MCMC steps.
        mesh (jax.sharding.Mesh | None): Device mesh; default is a 1-D mesh
            over all devices named ``axis_name``.
        axis_name (str): Mesh axis to shard chains over.

    Returns:
        (tuple):
        - **positions** (pytree): Sampled positions with shape
          ``(n_samples, n_chains, ...)``.
        - **final_state** (RWAState): Final vmapped chain state.
        - **accept_rate** (ndarray(n_chains,)): Mean acceptance rate.
    """
    if mesh is None:
        mesh = make_mesh(axis_name=axis_name)
    n_chains = jax.tree_util.tree_leaves(init_positions)[0].shape[0]
    shard = batch_sharding(mesh, axis_name)

    init_keys = jax.random.split(key, n_chains + 1)
    key, chain_keys = init_keys[0], init_keys[1:]

    @jax.jit
    def init_all(positions, chain_keys):
        return jax.vmap(alg.init)(positions, chain_keys)

    state = init_all(
        jax.device_put(init_positions, shard),
        jax.device_put(chain_keys, shard))

    def one_step(state, step_key):
        step_keys = jax.random.split(step_key, n_chains)
        state, info = jax.vmap(alg.step)(step_keys, state)
        return state, (state.position, info.is_accepted)

    @jax.jit
    def run(state, key):
        step_keys = jax.random.split(key, n_samples)
        state, (positions, accepted) = jax.lax.scan(
            one_step, state, step_keys)
        return state, positions, jnp.mean(accepted, axis=0)

    final_state, positions, accept_rate = run(state, key)
    return positions, final_state, accept_rate


def sharded_loglik(loglik_fn, thetas, keys=None, mesh=None,
                   axis_name="batch"):
    r"""
    Evaluate a log-likelihood (e.g. fenrir/dalton closure) over a batch of
    parameter candidates, vmapped and sharded over the mesh.

    Args:
        loglik_fn (Callable): ``loglik_fn(theta)`` or
            ``loglik_fn(theta, key)`` if ``keys`` is given.
        thetas (pytree): Parameter batch with a leading axis.
        keys (ndarray | None): Optional per-candidate PRNG keys.
        mesh, axis_name: As in :func:`run_chains`.

    Returns:
        (ndarray): Log-likelihood values, one per candidate.
    """
    if mesh is None:
        mesh = make_mesh(axis_name=axis_name)
    shard = batch_sharding(mesh, axis_name)
    thetas = jax.device_put(thetas, shard)
    if keys is None:
        fn = jax.jit(jax.vmap(loglik_fn))
        return fn(thetas)
    keys = jax.device_put(keys, shard)
    fn = jax.jit(jax.vmap(loglik_fn))
    return fn(thetas, keys)
