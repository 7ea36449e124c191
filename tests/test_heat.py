"""Large-state heat-equation model: exact-eigenvector anchor + the
Cholesky PD solve path (`solve_psd`) it rides under `fast_linalg`."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rodeo_tpu import solve_mv
from rodeo_tpu.interrogate import interrogate_kramer
from rodeo_tpu.models import heat
from rodeo_tpu.ops import precond
from rodeo_tpu.ops.linalg import fast_linalg, solve_psd, solve_small


def test_solve_psd_matches_lu():
    """Cholesky branch (fast_linalg, n > 5) agrees with the LU default on
    PD systems, for vector and matrix right-hand sides, batched."""
    rng = np.random.default_rng(7)
    for n, batch in [(8, ()), (12, (3,)), (6, (2, 4))]:
        m = rng.standard_normal(batch + (n, n))
        a = jnp.asarray(m @ np.swapaxes(m, -1, -2) + n * np.eye(n))
        b = jnp.asarray(rng.standard_normal(batch + (n, 2)))
        v = jnp.asarray(rng.standard_normal(batch + (n,)))
        x_lu = solve_psd(a, b)
        xv_lu = solve_psd(a, v)
        with fast_linalg():
            x_chol = solve_psd(a, b)
            xv_chol = solve_psd(a, v)
        # default dispatch is the LU path
        np.testing.assert_array_equal(np.asarray(x_lu),
                                      np.asarray(solve_small(a, b)))
        np.testing.assert_allclose(np.asarray(x_chol), np.asarray(x_lu),
                                   atol=1e-10, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(xv_chol), np.asarray(xv_lu),
                                   atol=1e-10, rtol=1e-10)
        assert x_chol.shape == b.shape and xv_chol.shape == v.shape


def test_solve_psd_small_uses_closed_form():
    """n <= 5 under fast_linalg stays on the adjugate closed form
    (bit-identical to solve_small's fast path)."""
    rng = np.random.default_rng(3)
    m = rng.standard_normal((4, 3, 3))
    a = jnp.asarray(m @ np.swapaxes(m, -1, -2) + 3 * np.eye(3))
    b = jnp.asarray(rng.standard_normal((4, 3, 2)))
    with fast_linalg():
        np.testing.assert_array_equal(np.asarray(solve_psd(a, b)),
                                      np.asarray(solve_small(a, b)))


def test_heat_exact_solution():
    """The discretized system's closed form: the solver tracks
    exp(mu1 t) u0 to f64 accuracy on a small grid."""
    cfg = heat.setup(d=8, n_deriv=3, n_steps=200, dtype=jnp.float64)
    exact = cfg.pop("exact")
    p = cfg.pop("n_deriv")
    mu, _ = jax.jit(
        lambda: solve_mv(key=None, interrogate=interrogate_kramer, **cfg)
    )()
    u_end = np.asarray(mu[-1, 0, ::p])
    np.testing.assert_allclose(u_end, exact(cfg["t_max"]), atol=1e-8)


def test_heat_precond_whole_trajectory():
    """The preconditioned path (fast_linalg -> Cholesky innovation solves,
    n_bobs = d = 16 > 5) tracks the discretized system's closed form
    exp(mu1 t) u0 at EVERY grid time, not just the endpoint.  (The plain
    unscaled path cannot be a comparator here: its backward-smoothed
    interior states overflow on this problem class in f64 — ~1e79 at
    d=16/N=100 — which is exactly why the preconditioned coordinates are
    the supported large-state route.)"""
    cfg = heat.setup(d=16, n_deriv=3, n_steps=100, dtype=jnp.float64)
    exact = cfg.pop("exact")
    p = cfg.pop("n_deriv")
    mu_pre, var_pre = jax.jit(
        lambda: precond.solve_mv(key=None, interrogate=interrogate_kramer,
                                 n_deriv=p, **cfg)
    )()
    ts = np.linspace(cfg["t_min"], cfg["t_max"], cfg["n_steps"] + 1)
    traj_exact = np.stack([exact(t) for t in ts])
    np.testing.assert_allclose(np.asarray(mu_pre[:, 0, ::p]), traj_exact,
                               atol=1e-7)
    assert bool(jnp.all(jnp.isfinite(var_pre)))


def test_heat_precond_robust_at_bench_prior():
    """At the benchmark prior scale (sigma = 5e3) the plain covariance-form
    posterior overflows in its unobserved high-derivative components (~1e74
    at d=16/N=100 in f64); the Taylor-preconditioned path stays finite
    everywhere and exact on the solution track."""
    cfg = heat.setup(d=16, n_deriv=3, n_steps=100, dtype=jnp.float64)
    exact = cfg.pop("exact")
    p = cfg.pop("n_deriv")
    mu_pre, var_pre = jax.jit(
        lambda: precond.solve_mv(key=None, interrogate=interrogate_kramer,
                                 n_deriv=p, **cfg)
    )()
    assert bool(jnp.all(jnp.isfinite(mu_pre)))
    assert bool(jnp.all(jnp.isfinite(var_pre)))
    np.testing.assert_allclose(np.asarray(mu_pre[-1, 0, ::p]),
                               exact(cfg["t_max"]), atol=1e-7)
