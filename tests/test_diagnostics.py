"""MCMC diagnostics: ESS and split-Rhat against analytic targets."""
import numpy as np
import pytest

from rodeo_tpu.parallel import ess, rhat


def _ar1(rng, n, m, rho):
    x = np.zeros((n, m))
    x[0] = rng.normal(size=m)
    innov = rng.normal(size=(n, m)) * np.sqrt(1 - rho ** 2)
    for t in range(1, n):
        x[t] = rho * x[t - 1] + innov[t]
    return x


def test_ess_iid():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2000, 8))
    e = ess(x)
    assert 0.75 * 16000 < e < 1.3 * 16000, e


def test_ess_ar1():
    """AR(1) with coefficient rho has ESS/N = (1-rho)/(1+rho)."""
    rng = np.random.default_rng(1)
    rho = 0.8
    x = _ar1(rng, 5000, 8, rho)
    e = ess(x)
    expected = 40000 * (1 - rho) / (1 + rho)
    assert 0.6 * expected < e < 1.6 * expected, (e, expected)


def test_ess_penalizes_disagreeing_chains():
    """Chains individually white but centered apart must read a LOW
    combined ESS (the between-chain term inflates var_plus)."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1000, 4)) + np.array([0.0, 3.0, -3.0, 6.0])
    assert ess(x) < 200


def test_ess_param_axis():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(500, 4, 3))
    e = ess(x)
    assert e.shape == (3,)
    assert np.all(e > 800)


def test_rhat_converged_vs_not():
    rng = np.random.default_rng(4)
    good = rng.normal(size=(1000, 6))
    assert abs(rhat(good) - 1.0) < 0.02
    bad = rng.normal(size=(1000, 6)) + np.arange(6) * 2.0
    assert rhat(bad) > 1.5
    # within-chain drift is caught by the split
    drift = rng.normal(size=(1000, 6)) \
        + np.linspace(0, 4, 1000)[:, None]
    assert rhat(drift) > 1.2
    # param axis
    both = np.stack([good, bad], axis=2)
    r = rhat(both)
    assert r.shape == (2,)
    assert r[0] < 1.02 < r[1]


def test_validation():
    with pytest.raises(ValueError):
        ess(np.zeros((3, 2)))
    with pytest.raises(ValueError):
        ess(np.zeros((10,)))
    with pytest.raises(ValueError):
        rhat(np.zeros((3, 2)))
    # stuck chains: ESS 0, not a crash
    assert ess(np.ones((100, 4))) == 0.0
