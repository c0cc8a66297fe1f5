"""Dtype-semantics contract grids.

Reference analogs: tests/tensor/test_casting.py (all-pairs casts),
test_int_div / mod sign grids in tests/tensor/test_math.py, bitwise op
grids, clip/switch edge semantics.  All through compare_xla_and_py
(XLA vs oracle, dtype equality enforced) with numpy as the expectation.
"""

from __future__ import annotations

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from tests.utils import compare_xla_and_py

rng = np.random.default_rng(11)

DTYPES = ["bool", "int8", "int16", "int32", "int64",
          "uint8", "float32", "float64"]


def _sample(dtype, n=6):
    if dtype == "bool":
        return rng.integers(0, 2, n).astype(bool)
    if dtype.startswith("uint"):
        return rng.integers(0, 100, n).astype(dtype)
    if dtype.startswith("int"):
        return rng.integers(-100, 100, n).astype(dtype)
    return (rng.standard_normal(n) * 10).astype(dtype)


# ---------------------------------------------------------------------------
# cast: all src x dst pairs
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dst", DTYPES)
@pytest.mark.parametrize("src", DTYPES)
def test_cast_pair_grid(src, dst):
    x = pt.tensor("x", dtype=src, shape=(6,))
    v = _sample(src)
    if src.startswith("float") and (dst.startswith("int") or dst.startswith("uint")):
        v = np.abs(v)  # negative float -> unsigned is UB across backends
    res = compare_xla_and_py([x], pt.cast(x, dst), [v])
    got = np.asarray(res[0])
    assert str(got.dtype) == dst
    np.testing.assert_array_equal(got, v.astype(dst))


# ---------------------------------------------------------------------------
# integer division / modulo: full sign grid (numpy floor semantics)
# ---------------------------------------------------------------------------

SIGN_PAIRS = [(7, 3), (-7, 3), (7, -3), (-7, -3), (6, 3), (-6, 3),
              (0, 3), (0, -3), (1, 7), (-1, 7)]


@pytest.mark.parametrize("dtype", ["int32", "int64", "float64"])
@pytest.mark.parametrize("name,op,npf", [
    ("floor_div", lambda a, b: a // b, np.floor_divide),
    ("mod", pt.mod, np.mod),
])
def test_intdiv_mod_sign_grid(name, op, npf, dtype):
    a = pt.tensor("a", dtype=dtype, shape=(len(SIGN_PAIRS),))
    b = pt.tensor("b", dtype=dtype, shape=(len(SIGN_PAIRS),))
    av = np.array([p[0] for p in SIGN_PAIRS], dtype=dtype)
    bv = np.array([p[1] for p in SIGN_PAIRS], dtype=dtype)
    res = compare_xla_and_py([a, b], op(a, b), [av, bv])
    np.testing.assert_array_equal(np.asarray(res[0]), npf(av, bv))


def test_int_true_div_gives_float():
    a = pt.tensor("a", dtype="int32", shape=(4,))
    b = pt.tensor("b", dtype="int32", shape=(4,))
    out = a / b
    assert out.type.dtype == ptt.config.floatX or out.type.dtype == "float64"
    av = np.array([1, 7, -7, 9], dtype="int32")
    bv = np.array([2, 2, 2, 3], dtype="int32")
    res = compare_xla_and_py([a, b], out, [av, bv])
    np.testing.assert_allclose(np.asarray(res[0]), av / bv)


# ---------------------------------------------------------------------------
# bitwise: op x int dtype (+ bool logic ops)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dtype", ["int8", "int32", "int64", "uint8"])
@pytest.mark.parametrize("name,op,npf", [
    ("and", pt.bitwise_and, np.bitwise_and),
    ("or", pt.bitwise_or, np.bitwise_or),
    ("xor", pt.bitwise_xor, np.bitwise_xor),
])
def test_bitwise_grid(name, op, npf, dtype):
    a = pt.tensor("a", dtype=dtype, shape=(8,))
    b = pt.tensor("b", dtype=dtype, shape=(8,))
    av, bv = _sample(dtype, 8), _sample(dtype, 8)
    res = compare_xla_and_py([a, b], op(a, b), [av, bv])
    np.testing.assert_array_equal(np.asarray(res[0]), npf(av, bv))


@pytest.mark.parametrize("dtype", ["int8", "int32", "uint8", "bool"])
def test_invert_grid(dtype):
    x = pt.tensor("x", dtype=dtype, shape=(8,))
    v = _sample(dtype, 8)
    res = compare_xla_and_py([x], pt.invert(x), [v])
    np.testing.assert_array_equal(np.asarray(res[0]), np.invert(v))


def test_bool_logic_ops():
    a = pt.tensor("a", dtype="bool", shape=(4,))
    b = pt.tensor("b", dtype="bool", shape=(4,))
    av = np.array([True, True, False, False])
    bv = np.array([True, False, True, False])
    for op, npf in [(pt.and_, np.logical_and), (pt.or_, np.logical_or),
                    (pt.xor, np.logical_xor)]:
        res = compare_xla_and_py([a, b], op(a, b), [av, bv])
        np.testing.assert_array_equal(np.asarray(res[0]), npf(av, bv))


# ---------------------------------------------------------------------------
# clip / switch edge semantics
# ---------------------------------------------------------------------------

def test_clip_min_above_max():
    # reference semantics (NOT numpy's): the min bound is checked first,
    # so min > max yields min where x < min (scalar/basic.py Clip.impl;
    # numpy would return max everywhere).  Required for the pullback to
    # be consistent with the forward value.
    x = pt.dvector("x")
    v = np.array([-5.0, 0.0, 5.0])
    res = compare_xla_and_py([x], pt.clip(x, 3.0, 1.0), [v])
    np.testing.assert_array_equal(np.asarray(res[0]), [3.0, 3.0, 1.0])


@pytest.mark.parametrize("dtype", ["float32", "float64", "int64"])
def test_clip_grid(dtype):
    x = pt.tensor("x", dtype=dtype, shape=(10,))
    v = _sample(dtype, 10)
    lo, hi = (-2, 2)
    res = compare_xla_and_py([x], pt.clip(x, lo, hi), [v])
    np.testing.assert_array_equal(np.asarray(res[0]), np.clip(v, lo, hi))


def test_clip_grad_boundaries():
    x = pt.dvector("x")
    g = ptt.grad(pt.sum(pt.clip(x, -1.0, 1.0)), x)
    f = ptt.function([x], g)
    v = np.array([-2.0, -0.5, 0.5, 2.0])
    # interior gets gradient 1, clipped region 0
    np.testing.assert_array_equal(np.asarray(f(v)), [0.0, 1.0, 1.0, 0.0])


@pytest.mark.parametrize("cshape,xshape", [((4,), (4,)), ((1,), (4,)),
                                           ((3, 1), (3, 4))])
def test_switch_broadcast_grid(cshape, xshape):
    c = pt.tensor("c", dtype="bool", shape=cshape)
    a = pt.tensor("a", dtype="float64", shape=xshape)
    b = pt.tensor("b", dtype="float64", shape=xshape)
    cv = rng.integers(0, 2, cshape).astype(bool)
    av, bv = rng.standard_normal(xshape), rng.standard_normal(xshape)
    res = compare_xla_and_py([c, a, b], pt.switch(c, a, b), [cv, av, bv])
    np.testing.assert_array_equal(np.asarray(res[0]), np.where(cv, av, bv))


# ---------------------------------------------------------------------------
# nan/inf semantics: nan_to_num, isnan/isinf, isclose
# ---------------------------------------------------------------------------

def test_nan_to_num_grid():
    x = pt.dvector("x")
    v = np.array([np.nan, np.inf, -np.inf, 1.5])
    res = compare_xla_and_py([x], pt.nan_to_num(x), [v])
    np.testing.assert_array_equal(np.asarray(res[0]), np.nan_to_num(v))


def test_isnan_isinf_grid():
    x = pt.dvector("x")
    v = np.array([np.nan, np.inf, -np.inf, 0.0, 1.0])
    for op, npf in [(pt.isnan, np.isnan), (pt.isinf, np.isinf)]:
        res = compare_xla_and_py([x], op(x), [v])
        np.testing.assert_array_equal(np.asarray(res[0]), npf(v))


def test_isclose_grid():
    a = pt.dvector("a")
    b = pt.dvector("b")
    av = np.array([1.0, 1.0, np.nan, np.inf])
    bv = np.array([1.0 + 1e-9, 1.1, np.nan, np.inf])
    res = compare_xla_and_py([a, b], pt.isclose(a, b), [av, bv])
    np.testing.assert_array_equal(np.asarray(res[0]), np.isclose(av, bv))
    res = compare_xla_and_py([a, b], pt.isclose(a, b, equal_nan=True),
                             [av, bv])
    np.testing.assert_array_equal(np.asarray(res[0]),
                                  np.isclose(av, bv, equal_nan=True))


# ---------------------------------------------------------------------------
# stable composites: logaddexp / logsumexp / log1mexp
# ---------------------------------------------------------------------------

def test_logaddexp_extreme():
    a = pt.dvector("a")
    b = pt.dvector("b")
    av = np.array([-1000.0, 0.0, 700.0])
    bv = np.array([-1001.0, 0.0, 699.0])
    res = compare_xla_and_py([a, b], pt.logaddexp(a, b), [av, bv])
    np.testing.assert_allclose(np.asarray(res[0]), np.logaddexp(av, bv),
                               rtol=1e-12)


def test_logsumexp_extreme():
    from scipy.special import logsumexp as sp_lse
    x = pt.dmatrix("x")
    v = np.array([[-1000.0, -999.0], [700.0, 702.0]])
    res = compare_xla_and_py([x], pt.logsumexp(x, axis=1), [v])
    np.testing.assert_allclose(np.asarray(res[0]), sp_lse(v, axis=1),
                               rtol=1e-12)


# ---------------------------------------------------------------------------
# median / ptp
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape,axis", [((7,), None), ((6,), None),
                                        ((3, 4), 0), ((3, 4), 1)])
def test_median_grid(shape, axis):
    x = pt.tensor("x", dtype="float64", shape=shape)
    v = rng.standard_normal(shape)
    res = compare_xla_and_py([x], pt.median(x, axis=axis), [v])
    np.testing.assert_allclose(np.asarray(res[0]), np.median(v, axis=axis))


@pytest.mark.parametrize("axis", [None, 0, 1])
def test_ptp_grid(axis):
    x = pt.dmatrix("x")
    v = rng.standard_normal((3, 4))
    res = compare_xla_and_py([x], pt.ptp(x, axis=axis), [v])
    np.testing.assert_allclose(np.asarray(res[0]), np.ptp(v, axis=axis))


# ---------------------------------------------------------------------------
# maximum/minimum nan propagation; power dtype/sign edge cases
# ---------------------------------------------------------------------------

def test_maximum_minimum_nan():
    a = pt.dvector("a")
    b = pt.dvector("b")
    av = np.array([np.nan, 1.0, 2.0])
    bv = np.array([0.0, np.nan, 1.0])
    for op, npf in [(pt.maximum, np.maximum), (pt.minimum, np.minimum)]:
        res = compare_xla_and_py([a, b], op(a, b), [av, bv])
        np.testing.assert_array_equal(np.asarray(res[0]), npf(av, bv))


def test_power_edges():
    a = pt.dvector("a")
    b = pt.dvector("b")
    av = np.array([0.0, 0.0, 2.0, -2.0, 4.0])
    bv = np.array([0.0, 2.0, -1.0, 3.0, 0.5])
    res = compare_xla_and_py([a, b], pt.power(a, b), [av, bv])
    np.testing.assert_allclose(np.asarray(res[0]), np.power(av, bv),
                               rtol=1e-12)


@pytest.mark.parametrize("dtype", ["int32", "int64"])
def test_int_power(dtype):
    a = pt.tensor("a", dtype=dtype, shape=(4,))
    av = np.array([2, 3, 5, 1], dtype=dtype)
    res = compare_xla_and_py([a], a ** 3, [av])
    np.testing.assert_array_equal(np.asarray(res[0]), av ** 3)
