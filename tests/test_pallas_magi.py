"""
Fused MAGI (lane-batched, Pallas interpreter on CPU) must match the
float64 XLA `precond.magi_logdens` per lane.

The MAGI filter conditions on *exact* pseudo-observations, so the active
state components reset to the data every step and float32 rounding has
nowhere to accumulate — the fused path tracks the f64 value to ~1e-5
relative even over thousands of steps.
"""
import numpy as np
import jax.numpy as jnp

import rodeo_tpu
from rodeo_tpu.ops import precond
from rodeo_tpu.ops.pallas_magi import magi_fused_batch
from rodeo_tpu.interrogate import interrogate_kramer
from rodeo_tpu.models import lorenz

N_STEPS, T_MAX = 200, 2.0


def _path():
    cfg = lorenz.setup(n_steps=N_STEPS, t_max=T_MAX, dtype=jnp.float64)
    theta = cfg.pop("theta")
    mu, _ = rodeo_tpu.solve_mv(
        key=None, interrogate=interrogate_kramer, theta=theta, **cfg)
    return cfg, mu


def ode_expand(u, **p):
    pad = jnp.zeros(u.shape[:-1] + (1,), u.dtype)
    return jnp.concatenate([u, pad], axis=-1)


def test_magi_fused_batch_matches_precond():
    cfg, mu = _path()
    dt = T_MAX / N_STEPS
    B = 4
    rng = np.random.default_rng(7)
    base = mu[:, :, :2]
    # additive roughness separates lanes; the Lorenz demo prior is so
    # diffuse (sigma ~ 5e7) that the logdens is nearly flat in the path,
    # so tighten the process noise for a discriminating test
    subsets = jnp.stack([
        base + 0.2 * i * jnp.asarray(rng.normal(size=base.shape))
        for i in range(B)])
    Qw, Rv = cfg["prior_pars"]
    prior_pars = (Qw, Rv * 1e-5)
    for act in (1, 2):
        lls = magi_fused_batch(
            subsets, ode_expand, act, prior_pars, dt)
        assert lls.shape == (B,)
        refs = np.array([float(precond.magi_logdens(
            ode_data_subset=subsets[i], ode_expand=ode_expand,
            n_active=act, prior_pars=prior_pars, dt=dt))
            for i in range(B)])
        rel = np.max(np.abs((np.asarray(lls) - refs) / refs))
        assert rel < 2e-4, (act, np.asarray(lls), refs)
        # perturbed lanes must actually separate
        assert np.std(refs) > 100.0
        assert np.std(np.asarray(lls)) > 100.0


def test_magi_fused_batch_sig2_lanes():
    """Per-lane process-noise multiplier matches rescaled prior_pars."""
    cfg, mu = _path()
    dt = T_MAX / N_STEPS
    B = 3
    subsets = jnp.broadcast_to(mu[None, :, :, :2],
                               (B,) + mu[:, :, :2].shape)
    sig2 = jnp.array([0.5, 1.0, 2.0])
    lls = magi_fused_batch(
        subsets, ode_expand, 2, cfg["prior_pars"], dt, sig2_lanes=sig2)
    Qw, Rv = cfg["prior_pars"]
    refs = np.array([float(precond.magi_logdens(
        ode_data_subset=subsets[i], ode_expand=ode_expand, n_active=2,
        prior_pars=(Qw, Rv * float(sig2[i])), dt=dt)) for i in range(B)])
    rel = np.max(np.abs((np.asarray(lls) - refs) / refs))
    assert rel < 2e-4, (np.asarray(lls), refs)
