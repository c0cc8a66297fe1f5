"""Elemwise / DimShuffle / CAReduce tests (modeled on reference
tests/tensor/test_elemwise.py strategy: numpy as the expected oracle)."""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from tests.utils import compare_xla_and_py


def test_broadcast_add():
    a = pt.dmatrix("a")
    b = pt.dvector("b")
    out = a + b
    A = np.arange(6.0).reshape(2, 3)
    B = np.array([10.0, 20.0, 30.0])
    res = compare_xla_and_py([a, b], out, [A, B])
    np.testing.assert_allclose(np.asarray(res[0]), A + B)


@pytest.mark.parametrize("fn,np_fn", [
    (pt.exp, np.exp), (pt.log, np.log), (pt.sqrt, np.sqrt),
    (pt.sin, np.sin), (pt.cos, np.cos), (pt.tanh, np.tanh),
    (pt.sigmoid, lambda x: 1 / (1 + np.exp(-x))),
])
def test_unary_math(fn, np_fn):
    x = pt.dvector("x")
    val = np.random.default_rng(0).random(7) + 0.1
    res = compare_xla_and_py([x], fn(x), [val])
    np.testing.assert_allclose(np.asarray(res[0]), np_fn(val), rtol=1e-6)


def test_comparisons_bool_dtype():
    x = pt.dvector("x")
    y = pt.dvector("y")
    out = pt.lt(x, y)
    assert out.type.dtype == "bool"
    res = compare_xla_and_py([x, y], out, [np.array([1.0, 3.0]), np.array([2.0, 2.0])])
    np.testing.assert_array_equal(np.asarray(res[0]), [True, False])


def test_int_float_promotion():
    x = pt.lvector("x")
    y = pt.dvector("y")
    assert (x + y).type.dtype == "float64"
    assert (x + x).type.dtype == "int64"
    from pytensor_tpu.config import config

    # reference semantics: integer division divides at floatX
    assert (x / x).type.dtype == config.floatX


def test_dimshuffle_transpose():
    x = pt.dmatrix("x")
    out = x.T
    X = np.arange(6.0).reshape(2, 3)
    res = compare_xla_and_py([x], out, [X])
    np.testing.assert_allclose(np.asarray(res[0]), X.T)


def test_dimshuffle_broadcast_and_drop():
    x = pt.dvector("x")
    row = x.dimshuffle("x", 0)
    assert row.type.shape == (1, None)
    back = row.dimshuffle(1)
    X = np.arange(3.0)
    res = compare_xla_and_py([x], [row, back], [X])
    np.testing.assert_allclose(np.asarray(res[0]), X[None, :])
    np.testing.assert_allclose(np.asarray(res[1]), X)


@pytest.mark.parametrize("axis", [None, 0, 1, (0, 1)])
def test_sum_prod_axes(axis):
    x = pt.dmatrix("x")
    X = np.arange(6.0).reshape(2, 3) + 1
    res = compare_xla_and_py([x], [pt.sum(x, axis=axis), pt.prod(x, axis=axis)], [X])
    np.testing.assert_allclose(np.asarray(res[0]), X.sum(axis=axis))
    np.testing.assert_allclose(np.asarray(res[1]), X.prod(axis=axis))


def test_sum_int_upcast():
    x = pt.bmatrix("x")
    assert pt.sum(x).type.dtype == "int64"


def test_max_min_argmax():
    x = pt.dmatrix("x")
    X = np.random.default_rng(1).random((4, 5))
    res = compare_xla_and_py(
        [x],
        [pt.max(x, axis=0), pt.min(x, axis=1), pt.argmax(x, axis=1), pt.argmin(x)],
        [X],
    )
    np.testing.assert_allclose(np.asarray(res[0]), X.max(axis=0))
    np.testing.assert_allclose(np.asarray(res[1]), X.min(axis=1))
    np.testing.assert_array_equal(np.asarray(res[2]), X.argmax(axis=1))
    np.testing.assert_array_equal(np.asarray(res[3]), X.argmin())


def test_mean_var_std():
    x = pt.dmatrix("x")
    X = np.random.default_rng(2).random((3, 4))
    res = compare_xla_and_py(
        [x], [pt.mean(x, axis=0), pt.math.var(x, axis=1), pt.std(x)], [X]
    )
    np.testing.assert_allclose(np.asarray(res[0]), X.mean(axis=0))
    np.testing.assert_allclose(np.asarray(res[1]), X.var(axis=1))
    np.testing.assert_allclose(np.asarray(res[2]), X.std())


def test_switch_and_clip():
    x = pt.dvector("x")
    X = np.array([-2.0, 0.5, 3.0])
    res = compare_xla_and_py(
        [x], [pt.switch(x > 0, x, 0 * x), pt.math.clip(x, 0.0, 1.0)], [X]
    )
    np.testing.assert_allclose(np.asarray(res[0]), np.where(X > 0, X, 0))
    np.testing.assert_allclose(np.asarray(res[1]), np.clip(X, 0, 1))


def test_keepdims():
    x = pt.dmatrix("x")
    X = np.ones((2, 3))
    out = pt.sum(x, axis=1, keepdims=True)
    assert out.type.shape[1] == 1
    res = compare_xla_and_py([x], out, [X])
    assert np.asarray(res[0]).shape == (2, 1)


def test_logsumexp_stable():
    x = pt.dvector("x")
    out = pt.math.logsumexp(x)
    f = ptt.function([x], out)
    big = np.array([1000.0, 1000.0])
    np.testing.assert_allclose(float(np.asarray(f(big))), 1000.0 + np.log(2.0))


def test_special_functions():
    import scipy.special as sps

    x = pt.dvector("x")
    X = np.random.default_rng(3).random(5) + 0.5
    res = compare_xla_and_py(
        [x],
        [pt.math.erf(x), pt.math.gammaln(x), pt.math.psi(x), pt.math.softplus(x)],
        [X], rtol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(res[0]), sps.erf(X), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res[1]), sps.gammaln(X), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res[2]), sps.psi(X), rtol=1e-5)
