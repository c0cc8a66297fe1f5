"""Kalman-filter state-space model: scan x linalg x BPTT integration
(the PyMC statespace workload shape).  Values vs a plain-numpy filter;
gradients by finite differences; oracle/XLA agreement."""

import numpy as np
import pytest

import pytensor_tpu as ptt
from pytensor_tpu.models.kalman import (
    make_kalman_loglike_and_grad,
    numpy_kalman_loglike,
)


@pytest.fixture(scope="module")
def built():
    return make_kalman_loglike_and_grad(n_steps=32, k=3, p=2, seed=1)


def test_loglike_matches_numpy(built):
    f, theta0, (ys, Z) = built
    Tv, lq, lh = theta0
    ll = float(np.asarray(f(Tv, lq, lh)[0]))
    exp = numpy_kalman_loglike(ys, Tv, Z, np.exp(lq), np.exp(lh))
    np.testing.assert_allclose(ll, exp, rtol=1e-9)


def test_grads_match_fd(built):
    f, theta0, (ys, Z) = built
    Tv, lq, lh = theta0

    def ll_np(T, q, h):
        return numpy_kalman_loglike(ys, T, Z, np.exp(q), np.exp(h))

    _, gT, gq, gh = (np.asarray(r) for r in f(Tv, lq, lh))
    eps = 1e-6
    # scalar params
    num_q = (ll_np(Tv, lq + eps, lh) - ll_np(Tv, lq - eps, lh)) / (2 * eps)
    num_h = (ll_np(Tv, lq, lh + eps) - ll_np(Tv, lq, lh - eps)) / (2 * eps)
    np.testing.assert_allclose(float(gq), num_q, rtol=1e-5)
    np.testing.assert_allclose(float(gh), num_h, rtol=1e-5)
    # a few entries of the transition-matrix grad
    for (i, j) in [(0, 0), (1, 2), (2, 1)]:
        Tp = Tv.copy(); Tp[i, j] += eps
        Tm = Tv.copy(); Tm[i, j] -= eps
        num = (ll_np(Tp, lq, lh) - ll_np(Tm, lq, lh)) / (2 * eps)
        np.testing.assert_allclose(gT[i, j], num, rtol=1e-4, atol=1e-8)


def test_oracle_xla_agree():
    f_x, theta0, _ = make_kalman_loglike_and_grad(n_steps=16, k=3, p=2,
                                                  seed=2)
    f_o, _, _ = make_kalman_loglike_and_grad(n_steps=16, k=3, p=2, seed=2,
                                             mode="FAST_COMPILE")
    rx = [np.asarray(r) for r in f_x(*theta0)]
    ro = [np.asarray(r) for r in f_o(*theta0)]
    for a, b in zip(rx, ro):
        np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-10)
