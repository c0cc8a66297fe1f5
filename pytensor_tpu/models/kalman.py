"""Linear-Gaussian state-space model: Kalman-filter log-likelihood and
its gradient, built as a Scan over (predict, update) steps with
Cholesky-based innovations solves inside the loop body.

The canonical PyMC/statespace workload on the reference stack (a scan
whose body mixes matmuls, cholesky, triangular solves, and logdet),
exercising Scan BPTT through the linalg pullbacks end to end.  On this
backend the whole filter lowers to ONE lax.scan inside one XLA
executable.

Model:
    x_t = T x_{t-1} + w_t,   w_t ~ N(0, Q)
    y_t = Z x_t    + v_t,    v_t ~ N(0, H)
with log-likelihood sum_t log N(y_t; Z x_t|t-1, F_t) via the innovations
decomposition.
"""

from __future__ import annotations

import numpy as np

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.tensor import linalg as ptl

LOG_2PI = float(np.log(2.0 * np.pi))


def kalman_loglike(ys, T, Z, Q, H, x0, P0):
    """Symbolic Kalman-filter log-likelihood of ``ys`` (n_steps, p).

    All operands are symbolic matrices/vectors; returns a scalar.
    """
    # observation dim: static when known, else the symbolic shape —
    # a fallback constant would silently skew -0.5*p*log(2pi)
    p_static = Z.type.shape[0]

    def step(y_t, x_pred, P_pred, T_, Z_, Q_, H_):
        # innovations
        v = y_t - pt.dot(Z_, x_pred)
        F = pt.dot(Z_, pt.dot(P_pred, Z_.T)) + H_
        L = ptl.cholesky(F)
        alpha = ptl.solve_triangular(L, v, lower=True)
        p_f = (np.float64(p_static) if p_static is not None
               else pt.cast(y_t.shape[0], "float64"))
        ll_t = -0.5 * (pt.sum(alpha ** 2)
                       + 2.0 * pt.sum(pt.log(pt.diagonal(L)))
                       + p_f * LOG_2PI)
        # Kalman gain via two triangular solves: K = P Z^T F^-1
        PZt = pt.dot(P_pred, Z_.T)
        W = ptl.solve_triangular(L, PZt.T, lower=True)
        K = ptl.solve_triangular(L.T, W, lower=False).T
        x_filt = x_pred + pt.dot(K, v)
        P_filt = P_pred - pt.dot(K, pt.dot(Z_, P_pred))
        # predict
        x_next = pt.dot(T_, x_filt)
        P_next = pt.dot(T_, pt.dot(P_filt, T_.T)) + Q_
        return x_next, P_next, ll_t

    (xs, Ps, lls), _ = ptt.scan(
        step,
        sequences=[ys],
        outputs_info=[x0, P0, None],
        non_sequences=[T, Z, Q, H],
    )
    return pt.sum(lls)


def make_kalman_loglike_and_grad(n_steps=64, k=4, p=2, dtype="float64",
                                 seed=0, mode=None):
    """Compiled (T, log_q, log_h) -> (loglike, grads) on simulated data."""
    rng = np.random.default_rng(seed)
    T_true = np.eye(k) * 0.9 + 0.05 * rng.standard_normal((k, k))
    Z_np = rng.standard_normal((p, k)).astype(dtype)
    x = np.zeros(k)
    ys = np.empty((n_steps, p), dtype=dtype)
    for t in range(n_steps):
        x = T_true @ x + 0.3 * rng.standard_normal(k)
        ys[t] = Z_np @ x + 0.2 * rng.standard_normal(p)

    ys_c = pt.as_tensor_variable(ys.astype(dtype))
    Z = pt.as_tensor_variable(Z_np.astype(dtype))
    T = pt.tensor("T", dtype=dtype, shape=(k, k))
    log_q = pt.tensor("log_q", dtype=dtype, shape=())
    log_h = pt.tensor("log_h", dtype=dtype, shape=())
    Q = pt.exp(log_q) * pt.eye(k, k, 0, dtype=dtype)
    H = pt.exp(log_h) * pt.eye(p, p, 0, dtype=dtype)
    x0 = pt.as_tensor_variable(np.zeros(k, dtype=dtype))
    P0 = pt.as_tensor_variable(np.eye(k, dtype=dtype))

    ll = kalman_loglike(ys_c, T, Z, Q, H, x0, P0)
    grads = ptt.grad(ll, [T, log_q, log_h])
    f = ptt.function([T, log_q, log_h], [ll, *grads], mode=mode,
                     name="kalman_loglike")
    f.trust_input = True
    theta0 = (T_true.astype(dtype), np.asarray(np.log(0.09), dtype),
              np.asarray(np.log(0.04), dtype))
    return f, theta0, (ys, Z_np)


def numpy_kalman_loglike(ys, T, Z, q, h, x0=None, P0=None):
    """Plain-numpy filter for testing."""
    n, p = ys.shape
    k = T.shape[0]
    x = np.zeros(k) if x0 is None else x0.copy()
    P = np.eye(k) if P0 is None else P0.copy()
    Q = q * np.eye(k)
    H = h * np.eye(p)
    ll = 0.0
    for t in range(n):
        v = ys[t] - Z @ x
        F = Z @ P @ Z.T + H
        Fi = np.linalg.inv(F)
        ll += -0.5 * (v @ Fi @ v + np.linalg.slogdet(F)[1] + p * LOG_2PI)
        K = P @ Z.T @ Fi
        x = x + K @ v
        P = P - K @ Z @ P
        x = T @ x
        P = T @ P @ T.T + Q
    return ll
