"""State-axis (model-parallel) sharding of the stationary large-state
solver over the virtual 8-device mesh: values must match the unsharded
path up to collective reassociation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rodeo_tpu.interrogate import interrogate_kramer
from rodeo_tpu.models import heat
from rodeo_tpu.ops.stationary import solve_mv_stationary
from rodeo_tpu.parallel.large_state import sharded_solve_mv_stationary
from rodeo_tpu.parallel.mesh import make_mesh


def _cfg():
    # d=16, n_deriv=3 -> state dim 48 = 6 per device on the 8-mesh
    cfg = heat.setup(d=16, n_deriv=3, n_steps=120, dtype=jnp.float64)
    cfg.pop("exact")
    return cfg, cfg.pop("n_deriv")


def test_sharded_stationary_matches_unsharded():
    cfg, p = _cfg()
    mu_e, var_e = jax.jit(
        lambda: solve_mv_stationary(key=None,
                                    interrogate=interrogate_kramer,
                                    n_deriv=p, n_warm=40, **cfg))()
    mesh = make_mesh(8, axis_name="state")
    mu_s, var_s = sharded_solve_mv_stationary(
        mesh, key=None, interrogate=interrogate_kramer,
        n_deriv=p, n_warm=40, **cfg)
    assert len(mu_s.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_e),
                               rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_e),
                               rtol=1e-10, atol=1e-10)


def test_sharded_stationary_diag_and_validation():
    cfg, p = _cfg()
    mesh = make_mesh(8, axis_name="state")
    mu_s, var_d = sharded_solve_mv_stationary(
        mesh, key=None, interrogate=interrogate_kramer,
        n_deriv=p, n_warm=40, var_out="diag", **cfg)
    assert var_d.shape == (cfg["n_steps"] + 1, 1, 48)
    assert bool(jnp.all(jnp.isfinite(var_d)))
    # indivisible state dim is rejected up front
    cfg_bad = heat.setup(d=13, n_deriv=3, n_steps=60, dtype=jnp.float64)
    cfg_bad.pop("exact")
    p_bad = cfg_bad.pop("n_deriv")
    with pytest.raises(ValueError, match="divide"):
        sharded_solve_mv_stationary(
            mesh, key=None, interrogate=interrogate_kramer,
            n_deriv=p_bad, n_warm=40, **cfg_bad)
