"""
Lockstep NUTS runner tests: exactness on Gaussian targets (posterior
moments), agreement with the lockstep HMC runner, pytree positions,
per-lane termination masking, and step-size adaptation plumbing.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rodeo_tpu.parallel import make_nuts_runner, adapt_step_size
from rodeo_tpu.parallel.chains import make_hmc_runner


def _gauss_logpost_grad(mean, cov_inv):
    mean = jnp.asarray(mean, jnp.float32)
    cov_inv = jnp.asarray(cov_inv, jnp.float32)

    def fn(pos):
        d = pos - mean
        ll = -0.5 * jnp.einsum("li,ij,lj->l", d, cov_inv, d)
        g = -jnp.einsum("ij,lj->li", cov_inv, d)
        return ll, g

    return fn


@pytest.fixture(scope="module")
def corr_gauss():
    """3-d correlated Gaussian target."""
    mean = np.array([1.0, -2.0, 0.5])
    L = np.array([[1.0, 0.0, 0.0],
                  [0.8, 0.6, 0.0],
                  [-0.3, 0.5, 0.4]])
    cov = L @ L.T
    return mean, cov, np.linalg.inv(cov)


def test_nuts_gaussian_moments(corr_gauss):
    mean, cov, cov_inv = corr_gauss
    n_lane, n_samples = 64, 400
    # smallest target eigenvalue ~0.05 -> leapfrog stability needs
    # step << sqrt(0.05) ~ 0.22
    runner = make_nuts_runner(
        _gauss_logpost_grad(mean, cov_inv), n_lane, n_samples,
        step_size=0.15, max_depth=6)
    init = jnp.zeros((n_lane, 3), jnp.float32)
    pos, ll, acc = runner(init, jax.random.PRNGKey(0))
    assert pos.shape == (n_samples, n_lane, 3)
    assert np.all(np.isfinite(pos)) and np.all(np.isfinite(ll))
    assert np.all(np.asarray(acc) > 0.8)
    draws = np.asarray(pos[150:]).reshape(-1, 3)      # burn-in discard
    np.testing.assert_allclose(draws.mean(axis=0), mean, atol=0.1)
    np.testing.assert_allclose(np.cov(draws.T), cov, atol=0.1)


def test_nuts_matches_hmc_moments(corr_gauss):
    """NUTS and HMC target the same posterior -> same moments."""
    mean, cov, cov_inv = corr_gauss
    n_lane = 64
    fn = _gauss_logpost_grad(mean, cov_inv)
    init = jnp.zeros((n_lane, 3), jnp.float32)
    nuts = make_nuts_runner(fn, n_lane, 250, 0.15, max_depth=5)
    hmc = make_hmc_runner(fn, n_lane, 250, 0.15, n_leapfrog=16)
    p_n, _, _ = nuts(init, jax.random.PRNGKey(1))
    p_h, _, _ = hmc(init, jax.random.PRNGKey(2))
    m_n = np.asarray(p_n[80:]).reshape(-1, 3).mean(axis=0)
    m_h = np.asarray(p_h[80:]).reshape(-1, 3).mean(axis=0)
    np.testing.assert_allclose(m_n, m_h, atol=0.15)


def test_nuts_pytree_positions():
    """Dict-valued positions flatten/unflatten transparently."""
    def fn(pos):
        a, b = pos["a"], pos["b"]                    # (L, 2), (L, 1, 2)
        ll = -0.5 * (jnp.sum(a * a, axis=-1)
                     + jnp.sum(b * b, axis=(-1, -2)))
        return ll, {"a": -a, "b": -b}

    n_lane = 16
    init = {"a": jnp.ones((n_lane, 2)), "b": jnp.ones((n_lane, 1, 2))}
    runner = make_nuts_runner(fn, n_lane, 50, 0.6, max_depth=3)
    pos, ll, acc = runner(init, jax.random.PRNGKey(3))
    assert pos["a"].shape == (50, n_lane, 2)
    assert pos["b"].shape == (50, n_lane, 1, 2)
    draws = np.asarray(pos["a"][20:]).reshape(-1, 2)
    np.testing.assert_allclose(draws.mean(axis=0), 0.0, atol=0.15)
    np.testing.assert_allclose(draws.std(axis=0), 1.0, atol=0.2)


def test_nuts_step_size_validation():
    fn = _gauss_logpost_grad(np.zeros(2), np.eye(2))
    runner = make_nuts_runner(fn, 4, 5, step_size=0.3, max_depth=2)
    init = jnp.zeros((4, 2), jnp.float32)
    with pytest.raises(ValueError, match="step_size"):
        runner(init, jax.random.PRNGKey(0),
               step_size_override=jnp.ones(3))
    with pytest.raises(ValueError, match="max_depth"):
        make_nuts_runner(fn, 4, 5, 0.3, max_depth=0)


def test_nuts_divergence_masking():
    """A pathologically large step diverges; the runner must stay finite
    and report ~zero acceptance instead of NaNs."""
    fn = _gauss_logpost_grad(np.zeros(2), 100.0 * np.eye(2))
    runner = make_nuts_runner(fn, 8, 20, step_size=50.0, max_depth=4)
    init = 0.1 * jnp.ones((8, 2), jnp.float32)
    pos, ll, acc = runner(init, jax.random.PRNGKey(4))
    assert np.all(np.isfinite(np.asarray(pos)))
    assert np.all(np.isfinite(np.asarray(ll)))
    assert np.all(np.asarray(acc) < 0.1)


def test_nuts_adapt_step_size(corr_gauss):
    """Dual-averaging adaptation drives the NUTS accept statistic toward
    the 0.8 target band."""
    mean, cov, cov_inv = corr_gauss
    fn = _gauss_logpost_grad(mean, cov_inv)
    runner = make_nuts_runner(fn, 32, 32, 0.5, max_depth=4)
    init = jnp.zeros((32, 3), jnp.float32)
    eps, pos, acc = adapt_step_size(
        runner, init, jax.random.PRNGKey(5), init_step=0.5,
        target_accept=0.8, n_windows=8)
    assert 0.6 < acc < 0.95
    assert float(jnp.min(eps)) > 0.0


def test_adapt_warmup_mass_matrix():
    """Diagonal-mass warmup on a badly anisotropic Gaussian: the adapted
    per-dimension step must track the posterior scales and the warmed
    sampler must recover the moments a scalar step cannot mix across."""
    from rodeo_tpu.parallel import adapt_warmup
    var = np.array([0.01, 1.0, 100.0])

    def fn(pos):
        v = jnp.asarray(var, jnp.float32)
        return -0.5 * jnp.sum(pos * pos / v, axis=-1), -pos / v

    n_lane = 32
    runner = make_nuts_runner(fn, n_lane, 32, 0.1, max_depth=5)
    init = jnp.zeros((n_lane, 3), jnp.float32)
    eps, pos, acc = adapt_warmup(
        runner, init, jax.random.PRNGKey(0), init_step=0.1,
        target_accept=0.8, n_windows=6, n_var_windows=3)
    assert acc > 0.6
    e = np.asarray(eps)
    # adapted steps ordered like the posterior stds (0.1, 1, 10)
    assert e[0] < e[1] < e[2]
    assert 3.0 < e[2] / e[1] < 30.0
    main = make_nuts_runner(fn, n_lane, 200, eps, max_depth=6)
    positions, ll, _ = main(pos, jax.random.PRNGKey(1))
    d = np.asarray(positions[50:]).reshape(-1, 3)
    assert np.all(np.abs(d.mean(axis=0)) < 0.5 * np.sqrt(var))
    np.testing.assert_allclose(d.var(axis=0), var, rtol=0.3)


def test_adapt_warmup_rejects_pytree():
    from rodeo_tpu.parallel import adapt_warmup
    fn = _gauss_logpost_grad(np.zeros(2), np.eye(2))
    runner = make_nuts_runner(fn, 4, 5, 0.3, max_depth=2)
    with pytest.raises(ValueError, match="n_lane, n_dim"):
        adapt_warmup(runner, {"a": jnp.zeros((4, 2))},
                     jax.random.PRNGKey(0), 0.3)
