"""
Unit tests for the Kalman kernel layer (standard and square-root backends)
against the brute-force joint-MVN oracle, mirroring the reference's oracle
strategy (`/root/reference/tests/test_standard.py`, `test_square_root.py`)
with an independent oracle implementation.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rodeo_tpu.kalmantv import standard, square_root
from gm_oracle import (
    joint_mv, theta_given_y, mvn_cond_on_next, rand_state_space)


def _chol(mats):
    return np.linalg.cholesky(mats)


@pytest.fixture(scope="module", params=[(1, 2), (2, 4), (3, 5)])
def setup(request):
    n_meas, n_state = request.param
    rng = np.random.default_rng(n_meas * 100 + n_state)
    n_tot = 3
    pars = rand_state_space(rng, n_tot, n_state, n_meas)
    joint = joint_mv(**pars)
    y = rng.standard_normal((n_tot, n_meas))
    x_next = rng.standard_normal(n_state)
    return dict(pars=pars, joint=joint, y=y, x_next=x_next,
                n_state=n_state, n_meas=n_meas)


def _filter_quantities(setup):
    """Oracle values for one predict/update cycle at n=1."""
    j, y = setup["joint"], setup["y"]
    mean_past, var_past = theta_given_y(0, y[0:1], j)       # theta_{0|0}
    mean_pred, var_pred = theta_given_y(1, y[0:1], j)       # theta_{1|0}
    mean_filt, var_filt = theta_given_y(1, y[0:2], j)       # theta_{1|1}
    return mean_past, var_past, mean_pred, var_pred, mean_filt, var_filt


def test_standard_predict_update(setup):
    pars = setup["pars"]
    mean_past, var_past, mean_pred, var_pred, mean_filt, var_filt = \
        _filter_quantities(setup)
    mp, vp = standard.predict(
        mean_state_past=jnp.asarray(mean_past),
        var_state_past=jnp.asarray(var_past),
        mean_state=jnp.asarray(pars["mean_state"][1]),
        wgt_state=jnp.asarray(pars["wgt_state"][0]),
        var_state=jnp.asarray(pars["var_state"][1]),
    )
    np.testing.assert_allclose(mp, mean_pred, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(vp, var_pred, rtol=1e-7, atol=1e-9)
    mf, vf = standard.update(
        mean_state_pred=mp,
        var_state_pred=vp,
        x_meas=jnp.asarray(setup["y"][1]),
        mean_meas=jnp.asarray(pars["mean_meas"][1]),
        wgt_meas=jnp.asarray(pars["wgt_meas"][1]),
        var_meas=jnp.asarray(pars["var_meas"][1]),
    )
    np.testing.assert_allclose(mf, mean_filt, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(vf, var_filt, rtol=1e-7, atol=1e-9)


def test_standard_filter(setup):
    pars = setup["pars"]
    mean_past, var_past, mean_pred, var_pred, mean_filt, var_filt = \
        _filter_quantities(setup)
    mp, vp, mf, vf = standard.filter(
        mean_state_past=jnp.asarray(mean_past),
        var_state_past=jnp.asarray(var_past),
        mean_state=jnp.asarray(pars["mean_state"][1]),
        wgt_state=jnp.asarray(pars["wgt_state"][0]),
        var_state=jnp.asarray(pars["var_state"][1]),
        x_meas=jnp.asarray(setup["y"][1]),
        mean_meas=jnp.asarray(pars["mean_meas"][1]),
        wgt_meas=jnp.asarray(pars["wgt_meas"][1]),
        var_meas=jnp.asarray(pars["var_meas"][1]),
    )
    np.testing.assert_allclose(mp, mean_pred, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(vf, var_filt, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(mf, mean_filt, rtol=1e-7, atol=1e-9)


def test_standard_forecast(setup):
    pars = setup["pars"]
    _, _, mean_pred, var_pred, _, _ = _filter_quantities(setup)
    mfo, vfo = standard.forecast(
        mean_state_pred=jnp.asarray(mean_pred),
        var_state_pred=jnp.asarray(var_pred),
        mean_meas=jnp.asarray(pars["mean_meas"][1]),
        wgt_meas=jnp.asarray(pars["wgt_meas"][1]),
        var_meas=jnp.asarray(pars["var_meas"][1]),
    )
    W, d, V = pars["wgt_meas"][1], pars["mean_meas"][1], pars["var_meas"][1]
    np.testing.assert_allclose(mfo, W @ mean_pred + d, rtol=1e-7)
    np.testing.assert_allclose(vfo, W @ var_pred @ W.T + V, rtol=1e-7)


def _smooth_quantities(setup):
    """Oracle values for one smoothing step: x_0 given x_1 and y_{0:1}."""
    j, y = setup["joint"], setup["y"]
    mean_next, var_next = theta_given_y(1, y[0:2], j)       # theta_{1|1}
    mean_filt, var_filt = theta_given_y(0, y[0:1], j)       # theta_{0|0}
    mean_pred, var_pred = theta_given_y(1, y[0:1], j)       # theta_{1|0}
    mean_joint, var_joint = theta_given_y([0, 1], y[0:2], j)
    mean_smooth = mean_joint[0]
    var_smooth = var_joint[0, :, 0, :]
    mean_sim, var_sim, A, b = mvn_cond_on_next(
        mean_joint, var_joint, setup["x_next"])
    return dict(mean_next=mean_next, var_next=var_next,
                mean_filt=mean_filt, var_filt=var_filt,
                mean_pred=mean_pred, var_pred=var_pred,
                mean_smooth=mean_smooth, var_smooth=var_smooth,
                mean_sim=mean_sim, var_sim=var_sim, A=A, b=b)


def test_standard_smooth(setup):
    pars = setup["pars"]
    q = _smooth_quantities(setup)
    kwargs = dict(
        mean_state_next=jnp.asarray(q["mean_next"]),
        var_state_next=jnp.asarray(q["var_next"]),
        mean_state_filt=jnp.asarray(q["mean_filt"]),
        var_state_filt=jnp.asarray(q["var_filt"]),
        mean_state_pred=jnp.asarray(q["mean_pred"]),
        var_state_pred=jnp.asarray(q["var_pred"]),
        wgt_state=jnp.asarray(pars["wgt_state"][0]),
    )
    ms, vs = standard.smooth_mv(**kwargs)
    np.testing.assert_allclose(ms, q["mean_smooth"], rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(vs, q["var_smooth"], rtol=1e-7, atol=1e-9)

    msim, vsim = standard.smooth_sim(
        x_state_next=jnp.asarray(setup["x_next"]),
        mean_state_filt=kwargs["mean_state_filt"],
        var_state_filt=kwargs["var_state_filt"],
        mean_state_pred=kwargs["mean_state_pred"],
        var_state_pred=kwargs["var_state_pred"],
        wgt_state=kwargs["wgt_state"],
    )
    np.testing.assert_allclose(msim, q["mean_sim"], rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(vsim, q["var_sim"], rtol=1e-7, atol=1e-9)

    # fused smooth
    ms2, vs2, mm2, vv2 = standard.smooth(
        x_state_next=jnp.asarray(setup["x_next"]), **kwargs)
    np.testing.assert_allclose(ms2, msim, rtol=1e-12)
    np.testing.assert_allclose(vs2, vsim, rtol=1e-12)
    np.testing.assert_allclose(mm2, ms, rtol=1e-12)
    np.testing.assert_allclose(vv2, vs, rtol=1e-12)

    # smooth_cond: backward kernel parameters
    A, b, V = standard.smooth_cond(
        mean_state_filt=kwargs["mean_state_filt"],
        var_state_filt=kwargs["var_state_filt"],
        mean_state_pred=kwargs["mean_state_pred"],
        var_state_pred=kwargs["var_state_pred"],
        wgt_state=kwargs["wgt_state"],
    )
    np.testing.assert_allclose(A, q["A"], rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(b, q["b"], rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(V, q["var_sim"], rtol=1e-7, atol=1e-9)


# --- square-root backend -------------------------------------------------------


def test_sqrt_predict_update(setup):
    pars = setup["pars"]
    mean_past, var_past, mean_pred, var_pred, mean_filt, var_filt = \
        _filter_quantities(setup)
    mp, lp = square_root.predict(
        mean_state_past=jnp.asarray(mean_past),
        var_state_past=jnp.asarray(_chol(var_past)),
        mean_state=jnp.asarray(pars["mean_state"][1]),
        wgt_state=jnp.asarray(pars["wgt_state"][0]),
        var_state=jnp.asarray(_chol(pars["var_state"][1])),
    )
    np.testing.assert_allclose(mp, mean_pred, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(lp @ lp.T, var_pred, rtol=1e-7, atol=1e-9)
    mf, lf = square_root.update(
        mean_state_pred=mp,
        var_state_pred=lp,
        x_meas=jnp.asarray(setup["y"][1]),
        mean_meas=jnp.asarray(pars["mean_meas"][1]),
        wgt_meas=jnp.asarray(pars["wgt_meas"][1]),
        var_meas=jnp.asarray(_chol(pars["var_meas"][1])),
    )
    np.testing.assert_allclose(mf, mean_filt, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(lf @ lf.T, var_filt, rtol=1e-7, atol=1e-9)


def test_sqrt_smooth(setup):
    pars = setup["pars"]
    q = _smooth_quantities(setup)
    var_state_sqrt = jnp.asarray(_chol(pars["var_state"][1]))
    kwargs = dict(
        mean_state_next=jnp.asarray(q["mean_next"]),
        var_state_next=jnp.asarray(_chol(q["var_next"])),
        mean_state_filt=jnp.asarray(q["mean_filt"]),
        var_state_filt=jnp.asarray(_chol(q["var_filt"])),
        mean_state_pred=jnp.asarray(q["mean_pred"]),
        var_state_pred=jnp.asarray(_chol(q["var_pred"])),
        wgt_state=jnp.asarray(pars["wgt_state"][0]),
        var_state=var_state_sqrt,
    )
    ms, ls = square_root.smooth_mv(**kwargs)
    np.testing.assert_allclose(ms, q["mean_smooth"], rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(
        ls @ ls.T, q["var_smooth"], rtol=1e-6, atol=1e-8)

    msim, lsim = square_root.smooth_sim(
        x_state_next=jnp.asarray(setup["x_next"]),
        mean_state_filt=kwargs["mean_state_filt"],
        var_state_filt=kwargs["var_state_filt"],
        mean_state_pred=kwargs["mean_state_pred"],
        var_state_pred=kwargs["var_state_pred"],
        wgt_state=kwargs["wgt_state"],
        var_state=var_state_sqrt,
    )
    np.testing.assert_allclose(msim, q["mean_sim"], rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(
        lsim @ lsim.T, q["var_sim"], rtol=1e-6, atol=1e-8)

    A, b, LV = square_root.smooth_cond(
        mean_state_filt=kwargs["mean_state_filt"],
        var_state_filt=kwargs["var_state_filt"],
        mean_state_pred=kwargs["mean_state_pred"],
        var_state_pred=kwargs["var_state_pred"],
        wgt_state=kwargs["wgt_state"],
        var_state=var_state_sqrt,
    )
    np.testing.assert_allclose(A, q["A"], rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(b, q["b"], rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(LV @ LV.T, q["var_sim"], rtol=1e-6, atol=1e-8)

    ms2, ls2, mm2, lv2 = square_root.smooth(
        x_state_next=jnp.asarray(setup["x_next"]), **kwargs)
    np.testing.assert_allclose(ms2, msim, rtol=1e-12)
    np.testing.assert_allclose(mm2, ms, rtol=1e-12)
    np.testing.assert_allclose(ls2 @ ls2.T, lsim @ lsim.T, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(lv2 @ lv2.T, ls @ ls.T, rtol=1e-9, atol=1e-11)


def test_sqrt_forecast(setup):
    pars = setup["pars"]
    _, _, mean_pred, var_pred, _, _ = _filter_quantities(setup)
    mfo, vfo = square_root.forecast(
        mean_state_pred=jnp.asarray(mean_pred),
        var_state_pred=jnp.asarray(_chol(var_pred)),
        mean_meas=jnp.asarray(pars["mean_meas"][1]),
        wgt_meas=jnp.asarray(pars["wgt_meas"][1]),
        var_meas=jnp.asarray(_chol(pars["var_meas"][1])),
    )
    W, d, V = pars["wgt_meas"][1], pars["mean_meas"][1], pars["var_meas"][1]
    np.testing.assert_allclose(mfo, W @ mean_pred + d, rtol=1e-7)
    np.testing.assert_allclose(vfo, W @ var_pred @ W.T + V, rtol=1e-6, atol=1e-9)


# --- batch polymorphism ---------------------------------------------------------


def test_batched_equals_vmap(setup):
    """The kernels natively batched over a leading axis must agree with
    per-block vmap (the reference's calling convention)."""
    pars = setup["pars"]
    n_state, n_meas = setup["n_state"], setup["n_meas"]
    rng = np.random.default_rng(42)
    B = 5
    mean_past = jnp.asarray(rng.standard_normal((B, n_state)))
    a = rng.standard_normal((B, n_state, n_state))
    var_past = jnp.asarray(np.einsum("bij,bkj->bik", a, a))
    mean_state = jnp.asarray(rng.standard_normal((B, n_state)))
    wgt_state = jnp.asarray(rng.standard_normal((B, n_state, n_state)))
    b2 = rng.standard_normal((B, n_state, n_state))
    var_state = jnp.asarray(np.einsum("bij,bkj->bik", b2, b2))

    batched = standard.predict(mean_past, var_past, mean_state,
                               wgt_state, var_state)
    vmapped = jax.vmap(standard.predict)(mean_past, var_past, mean_state,
                                         wgt_state, var_state)
    for x, y in zip(batched, vmapped):
        np.testing.assert_allclose(x, y, rtol=1e-12)

    x_meas = jnp.asarray(rng.standard_normal((B, n_meas)))
    mean_meas = jnp.asarray(rng.standard_normal((B, n_meas)))
    wgt_meas = jnp.asarray(rng.standard_normal((B, n_meas, n_state)))
    c = rng.standard_normal((B, n_meas, n_meas))
    var_meas = jnp.asarray(np.einsum("bij,bkj->bik", c, c) + np.eye(n_meas))

    batched = standard.update(*batched, x_meas, mean_meas, wgt_meas, var_meas)
    vmapped = jax.vmap(standard.update)(
        *vmapped, x_meas, mean_meas, wgt_meas, var_meas)
    for x, y in zip(batched, vmapped):
        np.testing.assert_allclose(x, y, rtol=1e-9, atol=1e-11)

    # square-root path
    chol_past = jnp.linalg.cholesky(var_past)
    chol_state = jnp.linalg.cholesky(var_state)
    sb = square_root.predict(mean_past, chol_past, mean_state,
                             wgt_state, chol_state)
    sv = jax.vmap(square_root.predict)(mean_past, chol_past, mean_state,
                                       wgt_state, chol_state)
    np.testing.assert_allclose(sb[0], sv[0], rtol=1e-12)
    np.testing.assert_allclose(
        sb[1] @ jnp.swapaxes(sb[1], -1, -2),
        sv[1] @ jnp.swapaxes(sv[1], -1, -2), rtol=1e-9, atol=1e-12)
