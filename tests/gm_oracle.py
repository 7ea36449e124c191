"""
Brute-force joint-MVN oracle for Gaussian state-space models.

Independent implementation (different construction from the reference's
``tests/gauss_markov.py``): the joint mean/covariance of all states and
measurements is built directly from the state-space recursions

    x_0 = c_0 + R_0^{1/2} e_0
    x_n = c_n + Q_n x_{n-1} + R_n^{1/2} e_n
    y_n = d_n + W_n x_n + V_n^{1/2} h_n

using  Cov(x_m, x_n) = Cov(x_m, x_{n-1}) Q_n'  for m < n.  Any filtering /
smoothing quantity theta_{m|n} then follows by conditioning the joint
Gaussian.  Used as the correctness anchor for the Kalman kernel layer.
"""
import numpy as np


def joint_mv(wgt_state, mean_state, var_state, wgt_meas, mean_meas, var_meas):
    """
    Joint mean and covariance of states ``x_{0:N}`` and measurements
    ``y_{0:N}``.

    Args:
        wgt_state: (N, s, s) transition matrices Q_1..Q_N.
        mean_state: (N+1, s) offsets c_0..c_N.
        var_state: (N+1, s, s) process noises R_0..R_N.
        wgt_meas: (N+1, m, s) measurement matrices W_0..W_N.
        mean_meas: (N+1, m) measurement offsets d_0..d_N.
        var_meas: (N+1, m, m) measurement noises V_0..V_N.

    Returns:
        dict with keys ``mu_x`` (N+1, s), ``V_xx`` (N+1, s, N+1, s),
        ``mu_y`` (N+1, m), ``V_yy`` (N+1, m, N+1, m),
        ``V_xy`` (N+1, s, N+1, m).
    """
    n_tot, n_state = mean_state.shape
    n_meas = mean_meas.shape[1]
    mu_x = np.zeros((n_tot, n_state))
    V_xx = np.zeros((n_tot, n_state, n_tot, n_state))
    mu_x[0] = mean_state[0]
    V_xx[0, :, 0, :] = var_state[0]
    for n in range(1, n_tot):
        Q = wgt_state[n - 1]
        mu_x[n] = mean_state[n] + Q @ mu_x[n - 1]
        V_xx[n, :, n, :] = Q @ V_xx[n - 1, :, n - 1, :] @ Q.T + var_state[n]
        for m in range(n):
            V_xx[m, :, n, :] = V_xx[m, :, n - 1, :] @ Q.T
            V_xx[n, :, m, :] = V_xx[m, :, n, :].T
    mu_y = mean_meas + np.einsum("nij,nj->ni", wgt_meas, mu_x)
    V_xy = np.einsum("msnt,nut->msnu", V_xx, wgt_meas)
    V_yy = np.einsum("mvs,msnu->mvnu", wgt_meas, V_xy)
    for n in range(n_tot):
        V_yy[n, :, n, :] += var_meas[n]
    return {"mu_x": mu_x, "V_xx": V_xx, "mu_y": mu_y,
            "V_yy": V_yy, "V_xy": V_xy}


def theta_given_y(m_idx, y, joint):
    """
    Conditional mean and covariance of states given measurements:
    ``E[x_{m_idx} | y_{0:n}]`` and ``Var(x_{m_idx} | y_{0:n})`` with
    ``n = len(y) - 1``.

    Args:
        m_idx: int or list of ints — state time indices.
        y: (n+1, n_meas) observed measurement values.
        joint: output of :func:`joint_mv`.

    Returns:
        (mean, var): mean of shape (len(m_idx), s) and var of shape
        (len(m_idx), s, len(m_idx), s); both squeezed if m_idx is scalar.
    """
    scalar = np.isscalar(m_idx)
    m_idx = np.atleast_1d(m_idx)
    n_y = y.shape[0]
    n_state = joint["mu_x"].shape[1]
    n_x = len(m_idx)

    mu1 = joint["mu_x"][m_idx].ravel()
    mu2 = joint["mu_y"][:n_y].ravel()
    S11 = joint["V_xx"][np.ix_(m_idx, range(n_state), m_idx, range(n_state))]
    S11 = S11.reshape(n_x * n_state, n_x * n_state)
    S12 = joint["V_xy"][m_idx, :, :n_y, :].reshape(n_x * n_state, -1)
    S22 = joint["V_yy"][:n_y, :, :n_y, :]
    S22 = S22.reshape(mu2.size, mu2.size)
    gain = S12 @ np.linalg.inv(S22)
    mean = mu1 + gain @ (y.ravel() - mu2)
    var = S11 - gain @ S12.T
    mean = mean.reshape(n_x, n_state)
    var = var.reshape(n_x, n_state, n_x, n_state)
    if scalar:
        mean = mean[0]
        var = var[0, :, 0, :]
    return mean, var


def mvn_cond_on_next(mean2, var2, x_next):
    """
    Given the joint of (x_n, x_{n+1}) as ``mean2`` (2, s) / ``var2``
    (2, s, 2, s), return the mean and variance of x_n | x_{n+1} = x_next,
    plus the conditional weight matrix A and offset b.
    """
    s = mean2.shape[1]
    S11 = var2[0, :, 0, :]
    S12 = var2[0, :, 1, :]
    S22 = var2[1, :, 1, :]
    A = S12 @ np.linalg.inv(S22)
    b = mean2[0] - A @ mean2[1]
    V = S11 - A @ S12.T
    return A @ x_next + b, V, A, b


def rand_state_space(rng, n_tot, n_state, n_meas, wgt_scale=0.1):
    """Random well-conditioned time-varying state-space model parameters."""
    def _psd(k, d):
        a = rng.standard_normal((k, d, d))
        return np.einsum("kij,klj->kil", a, a) + \
            0.5 * np.eye(d)[None]
    return {
        "wgt_state": wgt_scale * rng.standard_normal((n_tot - 1, n_state, n_state)),
        "mean_state": rng.standard_normal((n_tot, n_state)),
        "var_state": _psd(n_tot, n_state),
        "wgt_meas": rng.standard_normal((n_tot, n_meas, n_state)),
        "mean_meas": rng.standard_normal((n_tot, n_meas)),
        "var_meas": _psd(n_tot, n_meas),
    }
