"""Kernel-level correctness of the pseudo-marginal MCMC surface:
irmh / build_irmh acceptance ratio against the closed form,
additive_step_random_walk with a custom step, and the adversarial
pseudo-marginal semantics (the auxiliary re-draw changes the accepted
logdensity; a rejection keeps the previous noisy estimate without
re-evaluation).  Parity target:
/root/reference/src/rodeo/inference/pseudo_marginal.py:152-379."""
import numpy as np
import jax
import jax.numpy as jnp

from rodeo_tpu.inference import pseudo_marginal as pm


def _norm_logpdf(x, mu, sig):
    return -0.5 * ((x - mu) / sig) ** 2 - jnp.log(sig) \
        - 0.5 * jnp.log(2.0 * jnp.pi)


TARGET_MU, TARGET_SIG = 1.0, 0.5
PROP_MU, PROP_SIG = 0.0, 2.0


def _target(p, rng_key):
    return jnp.sum(_norm_logpdf(p, TARGET_MU, TARGET_SIG)), None


def _prop_logdensity(state_from, state_to):
    # convention of build_rmh_transition_energy: the transition density
    # from the first argument to the second — for an independent
    # proposal, log q evaluated at the SECOND argument's position
    return jnp.sum(_norm_logpdf(state_to.position, PROP_MU, PROP_SIG))


def test_irmh_acceptance_matches_closed_form():
    alg = pm.irmh_as_top_level_api(
        _target,
        proposal_distribution=lambda k: PROP_MU + PROP_SIG
        * jax.random.normal(k, (1,)),
        proposal_logdensity_fn=_prop_logdensity,
    )
    state = alg.init(jnp.array([2.0]), jax.random.PRNGKey(0))
    for seed in range(5):
        key = jax.random.PRNGKey(100 + seed)
        new_state, info = alg.step(key, state)
        # reconstruct the proposal draw (rmh_proposal's 3-way key split)
        key_prop, _, _ = jax.random.split(key, 3)
        x_prop = PROP_MU + PROP_SIG * jax.random.normal(key_prop, (1,))
        x_cur = state.position
        log_alpha = (
            float(jnp.sum(_norm_logpdf(x_prop, TARGET_MU, TARGET_SIG)))
            + float(jnp.sum(_norm_logpdf(x_cur, PROP_MU, PROP_SIG)))
            - float(jnp.sum(_norm_logpdf(x_cur, TARGET_MU, TARGET_SIG)))
            - float(jnp.sum(_norm_logpdf(x_prop, PROP_MU, PROP_SIG))))
        alpha = min(1.0, float(np.exp(log_alpha)))
        assert abs(float(info.acceptance_rate) - alpha) < 1e-6, seed
        state = new_state


def test_irmh_samples_target_moments():
    alg = pm.irmh_as_top_level_api(
        _target,
        proposal_distribution=lambda k: PROP_MU + PROP_SIG
        * jax.random.normal(k, (1,)),
        proposal_logdensity_fn=_prop_logdensity,
    )
    state = alg.init(jnp.array([0.0]), jax.random.PRNGKey(1))

    def one(state, key):
        state, info = alg.step(key, state)
        return state, (state.position[0], info.is_accepted)

    keys = jax.random.split(jax.random.PRNGKey(2), 4000)
    _, (xs, acc) = jax.lax.scan(jax.jit(one), state, keys)
    xs = np.asarray(xs[500:])
    assert 0.05 < float(np.mean(np.asarray(acc))) < 0.95
    assert abs(xs.mean() - TARGET_MU) < 0.05
    assert abs(xs.std() - TARGET_SIG) < 0.05


def test_additive_step_symmetric_acceptance():
    # custom (uniform) symmetric step through the public
    # additive_step_random_walk API: alpha = min(1, pi(x') / pi(x))
    half = 1.5
    alg = pm.additive_step_random_walk(
        _target,
        random_step=lambda k, pos: jax.random.uniform(
            k, jnp.shape(pos), minval=-half, maxval=half))
    state = alg.init(jnp.array([2.0]), jax.random.PRNGKey(0))
    for seed in range(5):
        key = jax.random.PRNGKey(200 + seed)
        new_state, info = alg.step(key, state)
        key_prop, _, _ = jax.random.split(key, 3)
        x_prop = state.position + jax.random.uniform(
            key_prop, state.position.shape, minval=-half, maxval=half)
        log_alpha = (
            float(jnp.sum(_norm_logpdf(x_prop, TARGET_MU, TARGET_SIG)))
            - float(jnp.sum(_norm_logpdf(state.position, TARGET_MU,
                                         TARGET_SIG))))
        alpha = min(1.0, float(np.exp(log_alpha)))
        assert abs(float(info.acceptance_rate) - alpha) < 1e-6, seed
        state = new_state


def test_pseudo_marginal_aux_redraw_semantics():
    # stochastic logdensity: value = exact + noise(key); auxdata carries
    # the noise so every statement below is checkable exactly
    def noisy_target(p, rng_key):
        eps = 0.3 * jax.random.normal(rng_key, ())
        return jnp.sum(_norm_logpdf(p, TARGET_MU, TARGET_SIG)) + eps, eps

    alg = pm.normal_random_walk(noisy_target, sigma=jnp.array([0.8]))
    state = alg.init(jnp.array([1.0]), jax.random.PRNGKey(3))
    # the init state itself carries its noise estimate
    exact0 = float(jnp.sum(_norm_logpdf(state.position, TARGET_MU,
                                        TARGET_SIG)))
    assert abs(float(state.logdensity) - exact0
               - float(state.auxdata)) < 1e-12

    step = jax.jit(alg.step)
    n_acc = n_rej = 0
    key = jax.random.PRNGKey(4)
    for _ in range(60):
        key, sk = jax.random.split(key)
        prev = state
        state, info = step(sk, state)
        exact = float(jnp.sum(_norm_logpdf(state.position, TARGET_MU,
                                           TARGET_SIG)))
        if bool(info.is_accepted):
            n_acc += 1
            # the ACCEPTED logdensity is the fresh noisy evaluation:
            # off the exact value by exactly the carried auxdata, which
            # was drawn from key_logdensity of this step
            _, _, key_ld = jax.random.split(sk, 3)
            eps_expected = 0.3 * jax.random.normal(key_ld, ())
            assert abs(float(state.auxdata)
                       - float(eps_expected)) < 1e-12
            assert abs(float(state.logdensity) - exact
                       - float(state.auxdata)) < 1e-10
        else:
            n_rej += 1
            # a REJECTED step keeps the previous noisy estimate —
            # pseudo-marginal chains never re-evaluate the current point
            assert float(state.logdensity) == float(prev.logdensity)
            assert float(state.auxdata) == float(prev.auxdata)
            assert np.array_equal(np.asarray(state.position),
                                  np.asarray(prev.position))
    assert n_acc > 5 and n_rej > 5


def test_rmh_top_level_api_with_asymmetric_proposal():
    # general rmh with a drifting (asymmetric) proposal and the matching
    # correction: chain still targets the right distribution
    drift = 0.3

    def prop_gen(k, pos):
        return pos + drift + 0.7 * jax.random.normal(k, jnp.shape(pos))

    def prop_logdens(state_from, state_to):
        return jnp.sum(_norm_logpdf(
            state_to.position, state_from.position + drift, 0.7))

    alg = pm.rmh_as_top_level_api(_target, prop_gen, prop_logdens)
    state = alg.init(jnp.array([0.0]), jax.random.PRNGKey(5))

    def one(state, key):
        state, _ = alg.step(key, state)
        return state, state.position[0]

    keys = jax.random.split(jax.random.PRNGKey(6), 6000)
    _, xs = jax.lax.scan(jax.jit(one), state, keys)
    xs = np.asarray(xs[1000:])
    assert abs(xs.mean() - TARGET_MU) < 0.06
    assert abs(xs.std() - TARGET_SIG) < 0.06
