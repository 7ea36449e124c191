"""
Square-root form on the fused entries.

The fused pipelines propagate covariances in Joseph form (PSD by
construction — the property the reference's QR form exists to protect);
`kalman_type="square-root"` is accepted everywhere with the upstream
calling convention (prior/observation variances passed as FACTORS,
reference ``square_root.py:30-101``), likelihood values form-independent,
and solution variances returned as Cholesky factors.  These tests pin the
drop-in contract: same arguments a `rodeo.solve_mv(kalman_type=
"square-root")` user already holds, factor-level outputs, f64 XLA sqrt
parity.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rodeo_tpu.ops import precond, pallas_kalman
from rodeo_tpu.ops.pallas_kalman import (
    chol_packed, unpack_chol, unpack_cov, _pack_tri, _tri_idx)
from rodeo_tpu.interrogate import interrogate_kramer
from rodeo_tpu.models import lorenz


def _sqrt_pars(cfg):
    """Factor-form (prior_pars, ...) as a square-root caller passes them."""
    w, v = cfg["prior_pars"]
    return dict(cfg, prior_pars=(w, jnp.linalg.cholesky(v)))


def _obs_setup(n_obs, t_max, dtype, seed=5):
    rng = np.random.default_rng(seed)
    obs_times = jnp.linspace(0.0, t_max, n_obs).astype(dtype)
    D = jnp.zeros((n_obs, 3, 1, 3), dtype).at[:, :, :, 0].set(1.0)
    Om = 0.01 * jnp.broadcast_to(jnp.eye(1, dtype=dtype),
                                 (n_obs, 3, 1, 1))
    yobs = jnp.asarray(rng.normal(size=(n_obs, 3, 1)) * 3, dtype)
    return obs_times, D, Om, yobs


def test_chol_packed_roundtrip():
    """chol_packed/unpack_chol: Gram reconstructs the packed covariance,
    in both the trailing-packed and lanes-last (axis=-2) layouts."""
    rng = np.random.default_rng(0)
    q = 3
    pairs, _ = _tri_idx(q)
    A = jnp.asarray(rng.normal(size=(7, 2, q, q)))
    P = A @ jnp.swapaxes(A, -1, -2) + 0.1 * jnp.eye(q)
    packed = _pack_tri(P, pairs)
    L = unpack_chol(chol_packed(packed, q, axis=-1))
    np.testing.assert_allclose(L @ jnp.swapaxes(L, -1, -2), P,
                               rtol=1e-6, atol=1e-9)
    assert np.allclose(np.triu(np.asarray(L), 1), 0.0)
    # lanes-last layout: (T, nb, n_tri, B)
    packed_b = jnp.moveaxis(_pack_tri(P, pairs), 0, -1)   # (2, n_tri, 7)
    f_b = chol_packed(packed_b, q, axis=-2)
    L_b = unpack_chol(jnp.moveaxis(f_b, -1, 0))           # (7, 2, q, q)
    np.testing.assert_allclose(L_b, L, rtol=1e-12, atol=1e-12)
    # exactly-zero covariance factors to ~0 (Dirac initial state)
    z = chol_packed(jnp.zeros((len(pairs),)), q, axis=-1)
    np.testing.assert_allclose(np.asarray(z), 0.0, atol=1e-12)


def test_solve_mv_fused_sqrt():
    """solve_mv_fused(kalman_type='square-root'): factor-form prior in,
    lower-Cholesky factors out, same Gram as the standard form."""
    cfg = lorenz.setup(n_steps=200, t_max=2.0, dtype=jnp.float32)
    theta = cfg.pop("theta")
    kw = dict(key=None, interrogate=interrogate_kramer, theta=theta,
              ode_flat=lorenz.lorenz_flat, jac_flat=lorenz.lorenz_jac_flat)
    mu_std, var_std = pallas_kalman.solve_mv_fused(**kw, **cfg)
    mu_sq, fac = pallas_kalman.solve_mv_fused(
        kalman_type="square-root", **kw, **_sqrt_pars(cfg))
    # factor-form prior squares back to the covariance up to f32 rounding;
    # the chaotic recursion amplifies that over 200 steps (same allowance
    # as test_fused_jittable)
    np.testing.assert_allclose(np.asarray(mu_sq), np.asarray(mu_std),
                               rtol=5e-2, atol=5e-2)
    assert np.allclose(np.triu(np.asarray(fac), 1), 0.0)
    gram = fac @ jnp.swapaxes(fac, -1, -2)
    scale = np.abs(np.asarray(var_std)).max()
    np.testing.assert_allclose(np.asarray(gram) / scale,
                               np.asarray(var_std) / scale, atol=1e-3)


def test_solve_mv_fused_sqrt_matches_xla_sqrt_f64():
    """Fused sqrt solve vs the f64 XLA square-root path (the upstream
    semantics target): means and covariances (factor Grams) agree at f32
    accuracy."""
    import rodeo_tpu
    cfg32 = lorenz.setup(n_steps=100, t_max=1.0, dtype=jnp.float32)
    cfg64 = lorenz.setup(n_steps=100, t_max=1.0, dtype=jnp.float64)
    th32, th64 = cfg32.pop("theta"), cfg64.pop("theta")
    mu_f, fac_f = pallas_kalman.solve_mv_fused(
        key=None, interrogate=interrogate_kramer, theta=th32,
        ode_flat=lorenz.lorenz_flat, jac_flat=lorenz.lorenz_jac_flat,
        kalman_type="square-root", **_sqrt_pars(cfg32))
    mu_x, fac_x = rodeo_tpu.solve_mv(
        key=None, interrogate=interrogate_kramer, theta=th64,
        kalman_type="square-root", **_sqrt_pars(cfg64))
    # rtol 1e-2: the f32 factor->covariance prior round-trip perturbs the
    # inputs at ~1e-7, which 100 chaotic Lorenz steps amplify
    np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_x),
                               rtol=1e-2, atol=1e-2)
    gram_f = fac_f @ jnp.swapaxes(fac_f, -1, -2)
    gram_x = fac_x @ jnp.swapaxes(fac_x, -1, -2)
    scale = np.abs(np.asarray(gram_x)).max()
    np.testing.assert_allclose(np.asarray(gram_f) / scale,
                               np.asarray(gram_x) / scale, atol=1e-3)


def test_solve_mv_fused_batch_sqrt():
    """Lane-batched sqrt solve: packed factors (lanes last) whose Grams
    match the standard batch covariances."""
    cfg = lorenz.setup(n_steps=128, t_max=1.0, dtype=jnp.float32)
    theta = cfg.pop("theta")
    B = 3
    thetas = jnp.stack([theta * (1.0 + 0.01 * i) for i in range(B)])
    inits = jnp.broadcast_to(cfg["ode_init"], (B,) + cfg["ode_init"].shape)
    kw = dict(thetas=thetas, ode_weight=cfg["ode_weight"], ode_inits=inits,
              t_min=cfg["t_min"], t_max=cfg["t_max"],
              n_steps=cfg["n_steps"], ode_flat=lorenz.lorenz_flat,
              jac_flat=lorenz.lorenz_jac_flat)
    # exact-input identity: the standard run fed the SQUARED factor prior
    # goes through the bitwise-identical pipeline, so the sqrt run's
    # factors must reproduce exactly its covariances (up to the
    # factorization's own rounding) — isolates chol_packed from the
    # chaotic sensitivity to the prior round-trip
    w, v = cfg["prior_pars"]
    v_fac = jnp.linalg.cholesky(v)
    mu_std, var_std = pallas_kalman.solve_mv_fused_batch(
        prior_pars=(w, v_fac @ jnp.swapaxes(v_fac, -1, -2)), **kw)
    mu_sq, fac = pallas_kalman.solve_mv_fused_batch(
        prior_pars=(w, v_fac), kalman_type="square-root", **kw)
    np.testing.assert_allclose(np.asarray(mu_sq), np.asarray(mu_std),
                               rtol=1e-6, atol=1e-6)
    for b in range(B):
        L = unpack_chol(fac[..., b])
        gram = _pack_tri(L @ jnp.swapaxes(L, -1, -2),
                         _tri_idx(L.shape[-1])[0])
        v_b = np.asarray(var_std[..., b])
        scale = np.abs(v_b).max()
        np.testing.assert_allclose(np.asarray(gram) / scale, v_b / scale,
                                   atol=1e-5)


def test_fenrir_fused_sqrt_matches_xla_sqrt_f64():
    """fenrir_fused(kalman_type='square-root') with factor-form prior and
    observation variances == the f64 XLA square-root fenrir."""
    import importlib
    from rodeo_tpu.ops import pallas_fenrir
    fen = importlib.import_module("rodeo_tpu.inference.fenrir")
    ll = {}
    for dtype in (jnp.float32, jnp.float64):
        cfg = lorenz.setup(n_steps=400, t_max=4.0, dtype=dtype)
        theta = cfg.pop("theta")
        obs_times, D, Om, yobs = _obs_setup(9, 4.0, dtype)
        Om_fac = jnp.linalg.cholesky(Om)
        kw = dict(key=None, interrogate=interrogate_kramer, theta=theta,
                  obs_data=yobs, obs_times=obs_times, obs_weight=D,
                  obs_var=Om_fac, kalman_type="square-root",
                  **_sqrt_pars(cfg))
        if dtype == jnp.float32:
            ll["fused"] = pallas_fenrir.fenrir_fused(
                ode_flat=lorenz.lorenz_flat,
                jac_flat=lorenz.lorenz_jac_flat, **kw)
        else:
            ll["xla"] = fen.fenrir(**kw)
    np.testing.assert_allclose(float(ll["fused"]), float(ll["xla"]),
                               rtol=2e-3)


def test_dalton_fused_batch_sqrt_is_value_identical():
    """Factor-form sqrt arguments produce the same DALTON value as the
    standard form with the squared variances (shared kernel, exact input
    normalization)."""
    from rodeo_tpu.ops import pallas_dalton
    cfg = lorenz.setup(n_steps=100, t_max=1.0, dtype=jnp.float32)
    theta = cfg.pop("theta")
    obs_times, D, Om, yobs = _obs_setup(5, 1.0, jnp.float32, seed=8)
    B = 2
    thetas = jnp.stack([theta, theta * 1.01])
    inits = jnp.broadcast_to(cfg["ode_init"], (B,) + cfg["ode_init"].shape)
    kw = dict(thetas=thetas, ode_weight=cfg["ode_weight"], ode_inits=inits,
              t_min=cfg["t_min"], t_max=cfg["t_max"],
              n_steps=cfg["n_steps"], obs_data=yobs, obs_times=obs_times,
              obs_weight=D, ode_flat=lorenz.lorenz_flat,
              jac_flat=lorenz.lorenz_jac_flat)
    ll_std = pallas_dalton.dalton_fused_batch(
        prior_pars=cfg["prior_pars"], obs_var=Om, **kw)
    ll_sq = pallas_dalton.dalton_fused_batch(
        prior_pars=_sqrt_pars(cfg)["prior_pars"],
        obs_var=jnp.linalg.cholesky(Om), kalman_type="sqrt", **kw)
    # the only difference is the factor->covariance squaring of the inputs
    np.testing.assert_allclose(np.asarray(ll_sq), np.asarray(ll_std),
                               rtol=1e-5)


def test_kalman_type_validation():
    """Unknown kalman_type raises everywhere (never silently ignored)."""
    from rodeo_tpu.ops import pallas_fenrir
    cfg = lorenz.setup(n_steps=16, t_max=0.2, dtype=jnp.float32)
    theta = cfg.pop("theta")
    with pytest.raises(ValueError, match="kalman_type"):
        pallas_kalman.solve_mv_fused(
            key=None, interrogate=interrogate_kramer, theta=theta,
            ode_flat=lorenz.lorenz_flat, jac_flat=lorenz.lorenz_jac_flat,
            kalman_type="qr", **cfg)
    with pytest.raises(ValueError, match="kalman_type"):
        pallas_fenrir.fenrir_fused_batch(
            thetas=theta[None], ode_weight=cfg["ode_weight"],
            ode_inits=cfg["ode_init"][None], t_min=cfg["t_min"],
            t_max=cfg["t_max"], n_steps=cfg["n_steps"],
            prior_pars=cfg["prior_pars"], obs_data=None, obs_times=None,
            obs_weight=jnp.zeros((1, 3, 1, 3)), obs_var=None,
            ode_flat=lorenz.lorenz_flat, kalman_type="cholesky")
