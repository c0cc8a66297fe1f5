"""Special-function contract grids vs scipy: values over domain sweeps
and FD gradients including the shape-parameter gradients the framework
implements via differentiable continued fractions/series
(scalar/math.py; reference scalar/math.py:1342 BetaInc + ScalarLoop
gradients)."""

from __future__ import annotations

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt

sps = pytest.importorskip("scipy.special")

rng = np.random.default_rng(11)


UNARY_SPECIAL = [
    ("erf", pt.erf, sps.erf, (-3.0, 3.0)),
    ("erfc", pt.erfc, sps.erfc, (-2.0, 2.0)),
    ("erfinv", pt.erfinv, sps.erfinv, (-0.95, 0.95)),
    ("gammaln", pt.gammaln, sps.gammaln, (0.1, 10.0)),
    ("digamma", pt.psi, sps.digamma, (0.2, 8.0)),
    ("trigamma", pt.tri_gamma, lambda v: sps.polygamma(1, v), (0.2, 8.0)),
    ("gamma", pt.gamma, sps.gamma, (0.1, 6.0)),
    ("expit", pt.sigmoid, sps.expit, (-6.0, 6.0)),
    ("log1mexp", pt.log1mexp, lambda v: np.log1p(-np.exp(v)),
     (-6.0, -0.3)),
    ("softplus", pt.softplus, lambda v: np.logaddexp(0, v), (-8.0, 8.0)),
    ("i0", pt.i0, sps.i0, (0.1, 4.0)),
    ("i1", pt.i1, sps.i1, (0.1, 4.0)),
    ("j0", pt.j0, sps.j0, (0.1, 8.0)),
    ("j1", pt.j1, sps.j1, (0.1, 8.0)),
]


@pytest.mark.parametrize("name,build,npf,dom", UNARY_SPECIAL,
                         ids=[u[0] for u in UNARY_SPECIAL])
def test_unary_special_values(name, build, npf, dom):
    lo, hi = dom
    v = np.linspace(lo, hi, 41)
    x = pt.tensor("x", dtype="float64", shape=(41,))
    f = ptt.function([x], build(x))
    got = np.asarray(f(v))
    np.testing.assert_allclose(got, npf(v), rtol=5e-9, atol=1e-12,
                               err_msg=name)


@pytest.mark.parametrize("name,build,npf,dom", UNARY_SPECIAL[:10],
                         ids=[u[0] for u in UNARY_SPECIAL[:10]])
def test_unary_special_grads(name, build, npf, dom):
    lo, hi = dom
    # stay inside the open domain for finite differences
    pad = 0.05 * (hi - lo)
    v = np.linspace(lo + pad, hi - pad, 7)
    # erfinv: the forward approximation error is amplified by the edge
    # curvature (d/dx erfinv grows like exp(erfinv^2)); the gamma
    # family's pole at 0 similarly amplifies FD truncation error —
    # those cells compare at 1e-4, everything else at 1e-5
    tol = 5e-4 if name == "erfinv" else (
        1e-4 if name in ("gammaln", "digamma", "trigamma", "gamma",
                         "log1mexp")
        else 1e-5)
    ptt.verify_grad(lambda x: build(x).sum(), [v],
                    rng=np.random.default_rng(5), abs_tol=tol,
                    rel_tol=tol)


BINARY_SPECIAL = [
    ("gammainc", pt.gammainc, sps.gammainc, (0.5, 5.0), (0.1, 8.0)),
    ("gammaincc", pt.gammaincc, sps.gammaincc, (0.5, 5.0), (0.1, 8.0)),
    ("gammau", pt.gammau,
     lambda a, x: sps.gammaincc(a, x) * sps.gamma(a), (0.5, 5.0),
     (0.1, 8.0)),
]


@pytest.mark.parametrize("name,build,npf,doma,domx", BINARY_SPECIAL,
                         ids=[b[0] for b in BINARY_SPECIAL])
def test_binary_special_values(name, build, npf, doma, domx):
    a = np.linspace(*doma, 9)
    xv = np.linspace(*domx, 9)
    A, X = np.meshgrid(a, xv)
    av = pt.tensor("a", dtype="float64", shape=A.shape)
    x = pt.tensor("x", dtype="float64", shape=X.shape)
    f = ptt.function([av, x], build(av, x))
    np.testing.assert_allclose(np.asarray(f(A, X)), npf(A, X),
                               rtol=1e-7, atol=1e-10, err_msg=name)


def test_betainc_value_grid():
    a = np.linspace(0.5, 4.0, 8)
    b = np.linspace(0.5, 4.0, 8)
    x = np.linspace(0.05, 0.95, 8)
    A, B, X = np.meshgrid(a, b, x)
    av = pt.tensor("a", dtype="float64", shape=A.shape)
    bv = pt.tensor("b", dtype="float64", shape=B.shape)
    xv = pt.tensor("x", dtype="float64", shape=X.shape)
    f = ptt.function([av, bv, xv], pt.betainc(av, bv, xv))
    np.testing.assert_allclose(np.asarray(f(A, B, X)),
                               sps.betainc(A, B, X), rtol=1e-8,
                               atol=1e-11)


def test_betainc_parameter_gradients():
    """d betainc / d{a,b}: the differentiable continued-fraction path
    (the reference computes these via a ScalarLoop gradient)."""
    av = np.array([0.8, 1.5, 3.0])
    bv = np.array([1.2, 2.5, 0.9])
    xv = np.array([0.3, 0.6, 0.8])
    ptt.verify_grad(lambda a, b: pt.betainc(a, b, pt.constant(xv)).sum(),
                    [av, bv], rng=np.random.default_rng(9),
                    abs_tol=1e-5, rel_tol=1e-5)


def test_gammainc_parameter_gradient():
    av = np.array([0.7, 1.8, 3.5])
    xv = np.array([0.5, 2.0, 4.0])
    ptt.verify_grad(lambda a: pt.gammainc(a, pt.constant(xv)).sum(),
                    [av], rng=np.random.default_rng(10),
                    abs_tol=1e-5, rel_tol=1e-5)


def test_hyp2f1_values():
    a, b, c = 1.2, 0.7, 2.3
    xv = np.linspace(-0.8, 0.8, 17)
    x = pt.tensor("x", dtype="float64", shape=(17,))
    f = ptt.function([x], pt.hyp2f1(a, b, c, x))
    # series convergence slows toward |x| -> 1: compare at 1e-7
    np.testing.assert_allclose(np.asarray(f(xv)),
                               sps.hyp2f1(a, b, c, xv), rtol=1e-7)


def test_owens_t_values():
    hv = np.linspace(-2.0, 2.0, 9)
    av = np.linspace(-0.9, 0.9, 9)
    H, A = np.meshgrid(hv, av)
    h = pt.tensor("h", dtype="float64", shape=H.shape)
    a = pt.tensor("a", dtype="float64", shape=A.shape)
    f = ptt.function([h, a], pt.owens_t(h, a))
    np.testing.assert_allclose(np.asarray(f(H, A)), sps.owens_t(H, A),
                               rtol=1e-7, atol=1e-10)