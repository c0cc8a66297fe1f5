"""Port of the semantics audited by the reference's tests/tensor/test_math.py
(3,900 LoC): max/argmax families, clip, outer, division dtypes, dot/matmul,
reductions (dtype/acc_dtype/axis forms), prod gradients with zeros,
is{nan,inf,finite}, polygamma, nan_to_num, median, cov, var/std corners.

Semantics only — assertions mirror what the reference checks, expressed
against this framework's API and the XLA-vs-oracle dual-compile harness.
Documented divergences: XLA flushes subnormals (log1mexp grad near the
subnormal boundary), and the DEFAULT reduction accumulator runs at input
precision like the reference's own JAX backend (an EXPLICIT acc_dtype is
honored on both backends).
"""

from __future__ import annotations

import builtins
import pickle
from itertools import product

import numpy as np
import pytest
import scipy.special

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
import pytensor_tpu.tensor.math as tm
from pytensor_tpu.gradient import grad, verify_grad
from pytensor_tpu.tensor.type import TensorType

from tests.utils import compare_xla_and_py

floatX = ptt.config.floatX
rng = np.random.default_rng(20260818)


def fx(*shape):
    return rng.standard_normal(shape).astype(floatX)


def ev(var, **kwargs):
    """eval via the oracle (reference eval_outputs)."""
    return np.asarray(var.eval(kwargs))


# ---------------------------------------------------------------------------
# Max / Argmax / max_and_argmax (reference TestMaxAndArgmax)
# ---------------------------------------------------------------------------

AXIS_CASES_2D = [(-1, -1), (0, 0), (1, 1), (None, None), ([0, 1], None), ([1, 0], None)]


class TestMaxAndArgmax:
    def test_scalar_empty_axis(self):
        for empty_axis in [(), None]:
            n = pt.as_tensor_variable(5.0)
            v, i = tm.max_and_argmax(n, axis=empty_axis)
            assert ev(v) == 5.0
            assert ev(i) == 0
            assert i.dtype == "int64"
            assert v.type.shape == () and i.type.shape == ()

    def test_empty_axis_tensor_is_identityish(self):
        # axis=() reduces over nothing: max equals the input, argmax is 0
        x = np.asarray(fx(2, 3), dtype=floatX)
        v, i = tm.max_and_argmax(pt.as_tensor_variable(x), axis=())
        np.testing.assert_allclose(ev(v), x)
        assert (ev(i) == 0).all()

    def test_basic_vector(self):
        n = pt.as_tensor_variable(np.array([1.0, 2.0, 3.0, 2.0, -6.0], dtype=floatX))
        v, i = tm.max_and_argmax(n)
        assert ev(v) == 3
        assert ev(i) == 2
        assert i.dtype == "int64"

    @pytest.mark.parametrize("axis,np_axis", AXIS_CASES_2D)
    def test_2d_axis_forms(self, axis, np_axis):
        data = fx(2, 3)
        n = pt.as_tensor_variable(data)
        vt, it = tm.max_and_argmax(n, axis)
        np_max, np_argm = np.max(data, np_axis), np.argmax(data, np_axis)
        assert vt.type.shape == np_max.shape
        assert it.type.shape == np_argm.shape
        assert it.dtype == "int64"
        np.testing.assert_allclose(ev(vt), np_max)
        assert (ev(it) == np_argm).all()

    @pytest.mark.parametrize(
        "axis,np_axis",
        [(-1, -1), (0, 0), (1, 1), (None, None), ([0, 1, 2], None), ([1, 2, 0], None)],
    )
    def test_3d_axis_forms(self, axis, np_axis):
        data = fx(2, 3, 4)
        n = pt.as_tensor_variable(data)
        vt, it = tm.max_and_argmax(n, axis)
        np.testing.assert_allclose(ev(vt), np.max(data, np_axis))
        assert (ev(it) == np.argmax(data, np_axis)).all()

    def test_invalid_axis_raises(self):
        n = pt.as_tensor_variable(fx(2, 3))
        with pytest.raises(ValueError):
            tm.max_and_argmax(n, 3)
        with pytest.raises(ValueError):
            tm.max_and_argmax(n, -3)

    def test_multiple_axes_values(self):
        data = np.arange(24, dtype=floatX).reshape(3, 2, 4)
        x = pt.as_tensor_variable(data)
        vt, it = tm.max_and_argmax(x, [1, -1])
        assert vt.type.shape == (3,) and it.type.shape == (3,)
        assert (ev(vt) == np.array([7, 15, 23])).all()
        # argmax over merged trailing axes: flat index within the (2,4) block
        assert (ev(it) == np.array([7, 7, 7])).all()

    def test_zero_rows(self):
        x = pt.matrix("x")
        m, i = tm.max_and_argmax(x, axis=1)
        f = ptt.function([x], [m, i])
        mv, iv = f(np.zeros((0, 4), dtype=floatX))
        assert np.asarray(mv).shape == (0,)
        assert np.asarray(iv).shape == (0,)

    def test_numpy_input(self):
        v, i = tm.max_and_argmax(np.array([1, 2, 3]), axis=None)
        assert ev(v) == 3
        assert ev(i) == 2

    def test_preserve_broadcastable(self):
        x = pt.matrix().dimshuffle("x", 0, "x", 1, "x")
        y = x.max(axis=1)
        assert y.type.shape == (1, 1, None, 1)

    def test_argmax_grad_is_zero(self):
        from pytensor_tpu.tensor.basic import get_underlying_scalar_constant_value

        x = pt.matrix("x")
        gx = grad(tm.argmax(x, axis=0).sum(), x)
        assert get_underlying_scalar_constant_value(gx) == 0.0

    @pytest.mark.parametrize("axis", [-1, 0, 1, None, [0, 1]])
    def test_max_grad_indicator(self, axis):
        # grad of max wrt x puts 1 at each argmax position
        data = fx(2, 3)
        x = pt.matrix("x")
        g = grad(tm.max(x, axis=axis).sum(), x)
        gval = ptt.function([x], g)(data)
        z = np.zeros_like(data)
        if axis is None or axis == [0, 1]:
            z.flat[np.argmax(data)] = 1
        elif axis in (1, -1):
            z[np.arange(2), np.argmax(data, 1)] = 1
        else:
            z[np.argmax(data, 0), np.arange(3)] = 1
        np.testing.assert_allclose(np.asarray(gval), z)

    def test_verify_grad_multi_axis(self):
        data = fx(2, 3, 4).astype("float64")
        for ax in [[0, 1], [0, 2], [1, 2], None]:
            verify_grad(lambda v: tm.max(v, axis=ax), [data], rng=rng)


class TestArgminArgmax:
    def test_scalar_and_list(self):
        n = pt.as_tensor_variable(np.array([5.0]))
        assert ev(tm.argmin(n)) == 0
        assert ev(tm.argmax(n)) == 0
        n = pt.as_tensor_variable(np.array([1.0, 2.0, 3.0, 2.0, -6.0]))
        assert ev(tm.argmin(n)) == 4
        assert ev(tm.argmax(n)) == 2

    @pytest.mark.parametrize("axis,np_axis", AXIS_CASES_2D)
    def test_2d(self, axis, np_axis):
        data = fx(2, 3)
        n = pt.as_tensor_variable(data)
        assert (ev(tm.argmax(n, axis)) == np.argmax(data, np_axis)).all()
        assert (ev(tm.argmin(n, axis)) == np.argmin(data, np_axis)).all()

    def test_keepdims(self):
        data = fx(2, 3)
        n = pt.as_tensor_variable(data)
        r = ev(tm.argmin(n, axis=1, keepdims=True))
        assert r.shape == (2, 1)
        assert (r.ravel() == np.argmin(data, 1)).all()


class TestMinMax:
    @pytest.mark.parametrize("dtype", ["uint8", "uint16", "uint32", "uint64"])
    def test_uint(self, dtype):
        # full-range unsigned data: min/max keep the dtype and find the
        # true extrema; argmin must NOT go through wrapping negation
        itype = np.iinfo(dtype)
        data = np.array(
            [itype.min + 3, itype.min, itype.max - 5, itype.max], dtype=dtype
        )
        n = pt.vector("n", dtype=dtype)
        min_out, max_out = tm.min(n), tm.max(n)
        assert min_out.dtype == dtype and max_out.dtype == dtype
        f = ptt.function([n], [min_out, max_out, tm.argmin(n), tm.argmax(n)])
        mn, mx, amn, amx = (np.asarray(v) for v in f(data))
        assert mn == itype.min and mx == itype.max
        assert amn == 1 and amx == 3

    def test_uint64_special_value(self):
        data = np.array([0, 9223372036854775], dtype="uint64")
        n = pt.vector("n", dtype="uint64")
        assert np.asarray(ptt.function([n], tm.max(n))(data)) == data.max()

    def test_bool(self):
        data = np.array([True, False])
        n = pt.as_tensor_variable(data)
        assert tm.min(n).dtype == "bool" and tm.max(n).dtype == "bool"
        assert not ev(tm.min(n))
        assert ev(tm.max(n))
        assert ev(tm.argmin(n)) == 1
        assert ev(tm.argmax(n)) == 0

    def test_3d_two_axes(self):
        data = fx(2, 3, 4)
        n = pt.as_tensor_variable(data)
        for fct, nfct in [(tm.max, np.max), (tm.min, np.min)]:
            for axis in [[0, 1], [1, 2], [0, 2]]:
                np.testing.assert_allclose(
                    ev(fct(n, axis)), nfct(data, tuple(axis)))

    def test_grad_min(self):
        data = fx(2, 3).astype("float64")
        for ax in [-1, [0], [1], None]:
            verify_grad(lambda v: tm.min(v, axis=ax), [data], rng=rng)


# ---------------------------------------------------------------------------
# clip (reference TestClip2, test_clip_grad*)
# ---------------------------------------------------------------------------

class TestClip:
    def test_complex_rejected(self):
        for dtype in ["complex64", "complex128"]:
            a = pt.vector(dtype=dtype)
            with pytest.raises(TypeError):
                tm.clip(a, pt.scalar(), pt.scalar())

    def test_clip_repeat_grad(self):
        # x appearing as both operand and bound: total grad is 1 inside
        x, y = pt.vector("x"), pt.vector("y")
        nvals = 50
        xval = rng.random(nvals).astype(floatX)
        g1 = ptt.function([x, y], grad(tm.clip(x, y, x).sum(), x))(
            xval, rng.random(nvals).astype(floatX) - 1.0)
        g2 = ptt.function([x, y], grad(tm.clip(x, x, y).sum(), x))(
            xval, rng.random(nvals).astype(floatX) + 1.0)
        g3 = ptt.function([x], grad(tm.clip(x, x, x).sum(), x))(xval)
        assert (np.asarray(g1) == 1.0).all()
        assert (np.asarray(g2) == 1.0).all()
        assert (np.asarray(g3) == 1.0).all()

    def test_clip_repeat_verify_grad(self):
        val = (rng.random((3, 7)) + 0.1).astype("float64")
        verify_grad(lambda x: tm.clip(x, 0, x), [val], rng=rng)
        verify_grad(lambda x: tm.clip(x, x, 0), [-val], rng=rng)
        verify_grad(lambda x: tm.clip(0, x, x), [val], rng=rng)
        verify_grad(lambda x: tm.clip(x, x, x), [val], rng=rng)

    def test_clip_grad(self):
        verify_grad(lambda x, y, z: tm.clip(x, y, z),
                    [np.asarray([-1.0, 0.5, 2.0]), 0.0, 1.0], rng=rng)

    def test_clip_grad_int(self):
        x, y, z = (pt.scalar(dtype="int32") for _ in range(3))
        grad(tm.clip(x, y, z), [x, y, z])  # must not crash


# ---------------------------------------------------------------------------
# outer (reference TestOuter)
# ---------------------------------------------------------------------------

class TestOuter:
    def test_outer_flattens(self):
        for m in range(1, 4):
            for n in range(1, 4):
                s1 = rng.integers(1, 5, m)
                s2 = rng.integers(1, 5, n)
                v1 = rng.random(tuple(s1)).astype(floatX)
                v2 = rng.random(tuple(s2)).astype(floatX)
                x = pt.tensor(dtype=floatX, shape=(None,) * m)
                y = pt.tensor(dtype=floatX, shape=(None,) * n)
                o = ptt.function([x, y], tm.outer(x, y))(v1, v2)
                np.testing.assert_allclose(
                    np.asarray(o), np.outer(v1, v2), rtol=1e-6)

    @pytest.mark.parametrize(
        "shp0,shp1",
        [((1,), (2,)), ((3,), (1,)), ((3,), (2,)), ((3, 2), (1, 1)),
         ((3, 2), (4, 5)), ((1, 1), (1, 1))],
    )
    def test_grad(self, shp0, shp1):
        data0 = rng.random(shp0).astype("float64")
        data1 = rng.random(shp1).astype("float64")
        verify_grad(tm.outer, [data0, data1], rng=rng)


# ---------------------------------------------------------------------------
# division dtype impls (reference TestDivimpl)
# ---------------------------------------------------------------------------

def test_div_impls():
    i = pt.scalar(dtype="int32")
    ii = pt.scalar(dtype="int64")
    d = pt.scalar(dtype="float64")
    f = pt.scalar(dtype="float32")
    c = pt.scalar(dtype="complex128")

    assert np.allclose(ptt.function([i, d], i / d)(5, 7.0), 5.0 / 7.0)
    assert np.allclose(ptt.function([i, d], d / i)(5, 7.0), 7.0 / 5.0)
    assert np.allclose(ptt.function([i, f], i / f)(5, 11.0), 5.0 / 11.0)
    assert np.allclose(ptt.function([i, f], f / i)(5, 11.0), 11.0 / 5.0)
    assert np.allclose(ptt.function([i, ii], i // ii)(5, 3), 5 // 3)
    assert np.allclose(ptt.function([i, ii], ii // i)(5, 3), 3 // 5)
    assert np.allclose(ptt.function([i, ii], tm.true_div(i, ii))(5, 3), 5.0 / 3.0)
    assert np.allclose(ptt.function([i, ii], tm.true_div(ii, i))(5, 3), 3.0 / 5.0)
    assert np.allclose(
        np.asarray(ptt.function([i, c], i / c)(5, complex(5, 3))), 5.0 / (5 + 3j))
    assert np.allclose(
        np.asarray(ptt.function([i, c], c / i)(5, complex(5, 3))), (5 + 3j) / 5.0)


# ---------------------------------------------------------------------------
# mean / var / std (reference TestMean, test_var)
# ---------------------------------------------------------------------------

class TestMean:
    def test_single_element(self):
        assert tm.mean(np.zeros(1)).eval() == 0.0

    def test_basic(self):
        x = pt.vector()
        data = rng.random(50).astype(floatX)
        assert np.allclose(ptt.function([x], tm.mean(x))(data), np.mean(data))

    def test_list_of_shareds(self):
        ll = [ptt.shared(np.float64(0.0)), ptt.shared(np.float64(2.0))]
        assert tm.mean(ll).eval() == 1.0
        assert tm.sum(ll).eval() == 2.0

    def test_mean_f16(self):
        x = pt.vector(dtype="float16")
        assert x.mean().dtype == "float16"


def test_var_corners():
    a = TensorType("float64", shape=(None, None, None))()
    a_val = np.arange(6, dtype="float64").reshape(1, 2, 3)
    for kw, np_kw in [
        (dict(), dict()),
        (dict(axis=0), dict(axis=0)),
        (dict(axis=1), dict(axis=1)),
        (dict(axis=2), dict(axis=2)),
        (dict(axis=0, ddof=0), dict(axis=0, ddof=0)),
        (dict(axis=1, ddof=1), dict(axis=1, ddof=1)),
        (dict(axis=2, ddof=1), dict(axis=2, ddof=1)),
    ]:
        f = ptt.function([a], tm.var(a, **kw))
        assert np.allclose(f(a_val), np.var(a_val, **np_kw))
    # two-pass corrected variant subtracts the centered-mean error term
    f = ptt.function([a], tm.var(a, ddof=0, corrected=True))
    centered = a_val - np.mean(a_val)
    expect = np.mean(centered**2) - np.mean(centered) ** 2
    assert np.allclose(f(a_val), expect)
    # var must not upcast float16
    assert pt.vector(dtype="float16").var().dtype == "float16"


def test_sum_int8_no_overflow():
    a = TensorType("int8", shape=(None,))()
    assert ptt.function([a], tm.sum(a))([1] * 300) == 300


# ---------------------------------------------------------------------------
# dot / matmul / vec helpers (reference TestDot, TestMatMul,
# test_matrix_vector_ops)
# ---------------------------------------------------------------------------

class TestDot:
    def test_grad_combos(self):
        verify_grad(tm.dot, [fx(2, 3).astype("float64"), fx(3, 2).astype("float64")], rng=rng)
        verify_grad(tm.dot, [fx(2).astype("float64"), fx(2, 3).astype("float64")], rng=rng)
        verify_grad(tm.dot, [fx(3, 2).astype("float64"), fx(2).astype("float64")], rng=rng)
        verify_grad(tm.dot, [fx(2).astype("float64"), fx(2).astype("float64")], rng=rng)

    def test_numpy_inputs_make_variable(self):
        from pytensor_tpu.graph.basic import Variable

        res = tm.dot(np.ones((2, 2)), np.ones((2, 2)))
        assert isinstance(res, Variable)

    def test_grad_keeps_broadcast_pattern(self):
        for bc0 in [(1, 1), (1, None), (None, 1), (None, None)]:
            x = TensorType(dtype="float64", shape=bc0)()
            for bc1 in [(1, 1), (1, None), (None, 1), (None, None)]:
                y = TensorType(dtype="float64", shape=bc1)()
                z = tm.dot(x, y)
                gx = grad(z.sum(), x)
                gy = grad(z.sum(), y)
                # grads must be usable where x/y were (same ndim; any
                # 1-sized dims preserved)
                assert gx.type.ndim == x.type.ndim
                assert gy.type.ndim == y.type.ndim


class TestMatMul:
    @pytest.mark.parametrize(
        "s1,s2",
        [((3,), (3,)), ((5, 3), (3, 2)), ((5, 3), (2, 3, 5)),
         ((5, 3), (3,)), ((5,), (5, 3)), ((2, 2, 4), (2, 4, 2))],
    )
    def test_matches_numpy(self, s1, s2):
        x1 = np.arange(np.prod(s1), dtype=floatX).reshape(s1)
        x2 = np.arange(np.prod(s2), dtype=floatX).reshape(s2)
        np.testing.assert_allclose(
            np.asarray(tm.matmul(x1, x2).eval()), np.matmul(x1, x2), rtol=1e-5)

    def test_scalar_error(self):
        with pytest.raises(ValueError, match="cannot be scalar"):
            tm.matmul(4, [4, 1])

    @pytest.mark.parametrize("dtype", ["float16", "float32", "float64"])
    def test_dtype_param(self, dtype):
        sol = tm.matmul([1, 2, 3], [3, 2, 1], dtype=dtype)
        assert str(np.asarray(sol.eval()).dtype) == dtype


def test_matrix_vector_ops():
    b, k, m, n = 2, 4, 3, 5
    mat_mk = rng.random((b, m, k)).astype(floatX)
    mat_kn = rng.random((b, k, n)).astype(floatX)
    vec_k = rng.random((b, k)).astype(floatX)

    xm = pt.tensor(shape=(b, m, k))
    xk = pt.tensor(shape=(b, k, n))
    xv = pt.tensor(shape=(b, k))

    r = ptt.function([xv], tm.vecdot(xv, xv))(vec_k)
    np.testing.assert_allclose(
        np.asarray(r), np.einsum("bk,bk->b", vec_k, vec_k), rtol=1e-5)
    r = ptt.function([xm, xv], tm.matvec(xm, xv))(mat_mk, vec_k)
    np.testing.assert_allclose(
        np.asarray(r), np.einsum("bmk,bk->bm", mat_mk, vec_k), rtol=1e-5)
    r = ptt.function([xv, xk], tm.vecmat(xv, xk))(vec_k, mat_kn)
    np.testing.assert_allclose(
        np.asarray(r), np.einsum("bk,bkn->bn", vec_k, mat_kn), rtol=1e-5)


# ---------------------------------------------------------------------------
# smallest / largest (reference test_smallest)
# ---------------------------------------------------------------------------

def test_smallest_largest():
    x, y, z = (pt.vector(dtype="float64") for _ in range(3))
    f1 = ptt.function([x], tm.smallest(x))
    assert (np.asarray(f1([1.0, 2.0, 3.0])) == [1, 2, 3]).all()
    f3 = ptt.function([x, y, z], tm.smallest(x, y, z))
    assert (np.asarray(f3([1.0, 3.0, 9.0], [7.0, 7.0, 7.0], [8.0, 2.0, 3.0]))
            == [1, 2, 3]).all()
    sx, sy = pt.scalar(dtype="float64"), pt.scalar(dtype="float64")
    assert ptt.function([sx, sy], tm.smallest(sx, sy))(-4.0, -2.0) == -4
    assert ptt.function([sx, sy], tm.largest(sx, sy))(-4.0, -2.0) == -2


# ---------------------------------------------------------------------------
# power (reference TestPower)
# ---------------------------------------------------------------------------

class TestPower:
    def test_numpy_compare(self):
        A = pt.matrix("A")
        a = rng.random((4, 4)).astype(floatX)
        assert np.allclose(ptt.function([A], tm.power(A, 3))(a), np.power(a, 3))

    def test_multiple_power(self):
        x = pt.vector()
        f = ptt.function([x], tm.power(x, [1.0, 2.0, 3.0]))
        assert np.allclose(f(np.array([1, 2, 3], dtype=floatX)), [1, 4, 27])

    def test_wrong_shape_runtime(self):
        x = pt.vector()
        f = ptt.function([x], tm.power(x, [1.0, 2.0, 3.0]), mode="FAST_COMPILE")
        with pytest.raises(ValueError):
            f(np.array([1, 2, 3, 4], dtype=floatX))


# ---------------------------------------------------------------------------
# prod gradients incl. zeros (reference TestProd)
# ---------------------------------------------------------------------------

class TestProd:
    def test_verify_grad(self):
        x_val = np.array(
            [[0.1, 0.2, 0.3], [0.4, 0.5, 0.6], [0.7, 0.8, 0.9]], dtype="float64")
        verify_grad(lambda x: tm.prod(x, axis=1), [x_val], rng=rng)
        verify_grad(lambda x: tm.sqr(tm.prod(x, axis=1)), [x_val], rng=rng)

    def test_values_and_grad_with_zeros(self):
        x = pt.matrix(dtype="float64")
        x_val = np.array(
            [[1.0, 2.0, 3.0], [0.0, 5.0, 6.0], [0.0, 0.0, 9.0]], dtype="float64")
        p = tm.prod(x, axis=1)
        assert np.allclose(ptt.function([x], p)(x_val), [6.0, 0.0, 0.0])
        verify_grad(lambda x: tm.prod(x, axis=1), [x_val], rng=rng)

    def test_grad_values_with_zeros(self):
        # exact reference values: single zero rows get the product of the
        # rest; double-zero rows get 0 everywhere
        x = pt.matrix(dtype="float64")
        grad_fn = ptt.function([x], grad(tm.prod(x, axis=1).sum(), x))
        x_val1 = np.array(
            [[1, 2, 3], [0, 5, 6], [0, 0, 9]], dtype="float64")
        x_val2 = np.array(
            [[1, 2, 0], [0, 5, 6], [7, 8, 9], [9, 10, 0]], dtype="float64")
        assert np.allclose(
            grad_fn(x_val1), [[6.0, 3.0, 2.0], [30.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
        assert np.allclose(
            grad_fn(x_val2),
            [[0.0, 0.0, 2.0], [30.0, 0.0, 0.0], [72.0, 63.0, 56.0], [0.0, 0.0, 90.0]])
        grad_fn0 = ptt.function([x], grad(tm.prod(x, axis=0).sum(), x))
        assert np.allclose(
            grad_fn0(x_val2),
            [[0.0, 400.0, 0.0], [63.0, 160.0, 0.0], [0.0, 100.0, 0.0], [0.0, 80.0, 0.0]])

    def test_no_zeros_in_input(self):
        x = pt.matrix(dtype="float64")
        x_val = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], dtype="float64")
        pwz = tm.prod(x, axis=1, no_zeros_in_input=True)
        assert np.allclose(ptt.function([x], pwz)(x_val), [6, 120, 504])
        # first and second derivative values from the reference
        pall = tm.prod(x, no_zeros_in_input=True)
        g = grad(pall, x)
        gg = grad(g.sum(), x)
        assert np.allclose(
            ptt.function([x], g)(x_val),
            [[362880.0, 181440.0, 120960.0],
             [90720.0, 72576.0, 60480.0],
             [51840.0, 45360.0, 40320.0]])
        assert np.allclose(
            ptt.function([x], gg)(x_val),
            [[663696.0, 422568.0, 301872.0],
             [233964.0, 190800.0, 161016.0],
             [139248.0, 122652.0, 109584.0]])

    def test_pickle_roundtrip(self):
        from pytensor_tpu.tensor.elemwise import Prod

        op = Prod()
        assert pickle.loads(pickle.dumps(op, protocol=-1)) == op


# ---------------------------------------------------------------------------
# isnan/isinf/isfinite (reference TestIsInfIsNanIsFinite, test_infs)
# ---------------------------------------------------------------------------

class TestIsFuncs:
    vals = [0.0, 1.0, np.nan, np.inf, -np.inf]

    @pytest.mark.parametrize(
        "pt_func,np_func",
        [(tm.isnan, np.isnan), (tm.isinf, np.isinf), (tm.isfinite, np.isfinite)],
    )
    def test_scalar_and_vector(self, pt_func, np_func):
        s = pt.scalar()
        fs = ptt.function([s], pt_func(s))
        for v in self.vals:
            assert bool(np.asarray(fs(np.asarray(v, dtype=floatX)))) == bool(
                np_func(v))
        x = pt.vector()
        fv = ptt.function([x], pt_func(x))
        arr = np.array([np.nan, np.inf, -np.inf, 0, 1, -1], dtype=floatX)
        assert (np.asarray(fv(arr)) == np_func(arr)).all()

    def test_pos_neg_inf(self):
        x = pt.tensor(shape=(7,))
        y = np.array([1, np.inf, 2, np.inf, -np.inf, -np.inf, 4], dtype=floatX)
        np.testing.assert_allclose(
            np.asarray(ptt.function([x], tm.isposinf(x))(y)), [0, 1, 0, 1, 0, 0, 0])
        np.testing.assert_allclose(
            np.asarray(ptt.function([x], tm.isneginf(x))(y)), [0, 0, 0, 0, 1, 1, 0])


# ---------------------------------------------------------------------------
# reduction dtype/acc_dtype semantics (reference TestSumProdReduceDtype,
# TestMeanDtype)
# ---------------------------------------------------------------------------

REDUCE_DTYPES = ["bool", "int8", "int16", "int32", "int64",
                 "uint8", "uint16", "uint32", "float32", "float64"]


class TestReduceDtype:
    @pytest.mark.parametrize("method", ["sum", "prod"])
    def test_default_dtype(self, method):
        axes = [None, 0, 1, [], [0], [1], [0, 1]]
        for idx, dtype in enumerate(REDUCE_DTYPES):
            axis = axes[idx % len(axes)]
            x = pt.matrix(dtype=dtype)
            s = getattr(x, method)(axis=axis)
            assert s.dtype == dict(
                bool="int64", int8="int64", int16="int64", int32="int64",
                uint8="uint64", uint16="uint64", uint32="uint64",
            ).get(dtype, dtype)
            data = (np.random.random((3, 4)) * 3).astype(dtype)
            f = ptt.function([x], s)
            ref = getattr(data.astype(s.dtype) if dtype != "bool" else data,
                          method)(axis=None if axis in (None,) else tuple(
                              axis if isinstance(axis, list) else [axis]) or None)
            if axis == []:
                ref = data.astype(s.dtype)
            np.testing.assert_allclose(np.asarray(f(data)), ref)

    @pytest.mark.parametrize("method", ["sum", "prod"])
    def test_custom_dtype(self, method):
        for input_dtype in ["int8", "uint8", "float32"]:
            x = pt.matrix(dtype=input_dtype)
            for output_dtype in ["int64", "float32", "float64"]:
                var = getattr(x, method)(dtype=output_dtype)
                assert var.dtype == output_dtype
                data = (np.random.random((3, 4)) * 2).astype(input_dtype)
                ptt.function([x], var)(data)
                grad(var.sum(), x, disconnected_inputs="ignore")

    def test_explicit_acc_dtype_precision(self):
        # [1e8, 1, -1e8] in float32 sums to 1 only with a float64
        # accumulator; an explicit acc_dtype must deliver that on both
        # the oracle and XLA (the None default accumulates at input
        # precision like the reference's own JAX backend)
        x = pt.vector(dtype="float32")
        s = tm.sum(x, acc_dtype="float64")
        assert s.dtype == "float32"
        data = np.array([1e8, 1, -1e8], dtype="float32")
        assert np.asarray(ptt.function([x], s, mode="FAST_RUN")(data)) == 1.0
        assert np.asarray(ptt.function([x], s, mode="FAST_COMPILE")(data)) == 1.0

    def test_acc_dtype_downcast_rejected(self):
        with pytest.raises(TypeError):
            tm.sum(pt.vector(dtype="float64"), acc_dtype="float32")
        with pytest.raises(TypeError):
            tm.prod(pt.vector(dtype="complex128"), acc_dtype="complex64")
        # discrete input with continuous accumulator is allowed
        tm.sum(pt.vector(dtype="int64"), acc_dtype="float64")

    def test_mean_default_dtype(self):
        for dtype in REDUCE_DTYPES:
            x = pt.matrix(dtype=dtype)
            m = x.mean()
            if dtype.startswith(("int", "uint")) or dtype == "bool":
                assert m.dtype == "float64"
            else:
                assert m.dtype == dtype
            data = (np.random.random((3, 4)) * 2).astype(dtype)
            np.testing.assert_allclose(
                np.asarray(ptt.function([x], m)(data)),
                np.mean(data.astype(m.dtype)), rtol=1e-6)

    @pytest.mark.parametrize("sum_dtype", ["int64", "float32", "float64"])
    def test_mean_custom_dtype(self, sum_dtype):
        x = pt.matrix(dtype="int8")
        mean_var = x.mean(dtype=sum_dtype)
        if sum_dtype == "int64":
            assert mean_var.dtype == "float64"
        else:
            assert mean_var.dtype == sum_dtype
        data = np.ones((2, 1), dtype="int8")
        np.testing.assert_allclose(np.asarray(
            ptt.function([x], mean_var, mode="FAST_COMPILE")(data)), 1.0)


class TestReduceAxesForms:
    @pytest.mark.parametrize("method", ["sum", "mean", "max", "min", "argmax", "var"])
    def test_axis_forms(self, method):
        axes = [None, 0, 1, [0, 1], np.array(1), [np.array(0), np.array(1)]]
        for a in axes:
            x = pt.matrix()
            getattr(x, method)(a)


# ---------------------------------------------------------------------------
# misc gradients (reference test_grad_useless_sum, tanh broadcast,
# log1mexp limits)
# ---------------------------------------------------------------------------

def test_grad_useless_sum_elided():
    from pytensor_tpu.tensor.elemwise import CAReduce

    x = TensorType(floatX, shape=(1,))("x")
    l = tm.log(1.0 - tm.sigmoid(x))[0]
    g = grad(l, x)
    f = ptt.function([x], g, mode="FAST_RUN")
    assert not any(
        isinstance(n.op, CAReduce) for n in f.maker.fgraph.toposort())
    outputs = [np.asarray(f(np.array([tv], dtype=floatX)))
               for tv in [-100, -1, 0, 1, 100]]
    assert np.allclose(
        np.asarray(outputs).ravel(),
        [-3.72007598e-44, -0.26894142, -0.5, -0.73105858, -1.0])


def test_tanh_grad_broadcast():
    x = pt.tensor(dtype="float32", shape=(1, None, None, None))
    y = pt.tensor(dtype="float32", shape=(1, 1, None, None))
    grad(tm.tanh(x).sum(), x)
    grad(tm.tanh(x + y).sum(), y)
    grad(tm.tanh(x + y).sum(), [x, y])


def test_log1mexp_grad_lim():
    x = pt.scalar(dtype="float64")
    grad_x_fn = ptt.function([x], grad(tm.log1mexp(x), [x])[0])
    assert grad_x_fn(0.0) == -np.inf
    assert grad_x_fn(-0.0) == -np.inf
    assert grad_x_fn(-1e-309) == -np.inf
    # the finite case sits above the subnormal boundary (XLA flushes
    # subnormals, so the reference's -1e-308 probe would read -inf here)
    assert np.isfinite(grad_x_fn(-1e-307))


# ---------------------------------------------------------------------------
# polygamma (reference TestPolyGamma)
# ---------------------------------------------------------------------------

class TestPolyGamma:
    def test_basic(self):
        n = pt.vector("n", dtype="int64")
        x = pt.scalar("x", dtype="float64")
        np.testing.assert_allclose(
            np.asarray(tm.polygamma(n, x).eval({n: np.array([0, 1]), x: 0.5})),
            scipy.special.polygamma([0, 1], 0.5), rtol=1e-6)

    def test_continuous_n_raises(self):
        with pytest.raises(TypeError, match="discrete"):
            tm.polygamma(pt.scalar(dtype="float64"), 0.5)

    def test_complex_x_raises(self):
        with pytest.raises(TypeError, match="complex"):
            tm.polygamma(0, pt.scalar(dtype="complex128"))

    def test_grad_x_matches_digamma(self):
        x = pt.scalar("x", dtype="float64")
        np.testing.assert_allclose(
            np.asarray(grad(tm.polygamma(0, x), wrt=x).eval({x: 0.9})),
            np.asarray(grad(tm.digamma(x), wrt=x).eval({x: 0.9})), rtol=1e-6)

    def test_grad_n_undefined(self):
        from pytensor_tpu.gradient import NullTypeGradError

        n = pt.scalar(dtype="int64")
        with pytest.raises(NullTypeGradError):
            grad(tm.polygamma(n, 0.5), wrt=n)


# ---------------------------------------------------------------------------
# nan_to_num / median / cov / ptp / norm (reference tails)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "nan,posinf,neginf",
    [(0, None, None), (0, 0, 0), (0, None, 1000), (3, 1, -1)],
)
def test_nan_to_num(nan, posinf, neginf):
    x = pt.tensor(shape=(7,))
    f = ptt.function([x], tm.nan_to_num(x, nan, posinf, neginf))
    y = np.array([1, 2, np.nan, np.inf, -np.inf, 3, 4], dtype=floatX)
    pi = np.finfo(y.dtype).max if posinf is None else posinf
    ni = np.finfo(y.dtype).min if neginf is None else neginf
    np.testing.assert_allclose(
        np.asarray(f(y)), np.nan_to_num(y, nan=nan, posinf=pi, neginf=ni))


@pytest.mark.parametrize(
    "ndim,axis",
    [(2, None), (2, 1), (2, (0, 1)), (3, None), (3, (1, 2)), (4, (1, 3, 0))],
)
def test_median(ndim, axis):
    shape_even = tuple(np.arange(1, ndim + 1) * 2)
    shape_odd = tuple(s - 1 for s in shape_even)
    x = pt.tensor(dtype="float64", shape=(None,) * ndim)
    f = ptt.function([x], tm.median(x, axis=axis))
    for shp in (shape_even, shape_odd):
        data = rng.random(shp)
        assert np.allclose(np.asarray(f(data)), np.median(data, axis=axis))


def test_cov():
    x = pt.matrix("x")
    y = pt.matrix("y")
    for rowvar, bias, ddof in product([True, False], [True, False], [None, 2]):
        f = ptt.function([x], tm.cov(x, rowvar=rowvar, bias=bias, ddof=ddof))
        data = rng.random((3, 5)).astype(floatX)
        assert np.allclose(
            np.asarray(f(data)), np.cov(data, rowvar=rowvar, bias=bias, ddof=ddof),
            atol=1e-6)
        f2 = ptt.function([x, y], tm.cov(x, y=y, rowvar=rowvar, bias=bias, ddof=ddof))
        yv = rng.random((3, 5)).astype(floatX)
        assert np.allclose(
            np.asarray(f2(data, yv)),
            np.cov(data, y=yv, rowvar=rowvar, bias=bias, ddof=ddof), atol=1e-6)


def test_ptp_scalar_and_norm():
    x = pt.scalar("x")
    yv = np.asarray(rng.random() * 20 - 10, dtype=floatX)
    assert np.array_equal(np.asarray(ptt.function([x], tm.ptp(x))(yv)), np.ptp(yv))
    v = pt.vector("v")
    assert np.allclose(
        np.asarray(ptt.function([v], v.norm(2))(np.array([1, 1], dtype=floatX))),
        np.sqrt(2))


# ---------------------------------------------------------------------------
# instance-method surface (reference TestTensorInstanceMethods excerpts)
# ---------------------------------------------------------------------------

def test_instance_methods_exist_and_eval():
    x = pt.matrix("x")
    data = fx(3, 3)
    pairs = [
        (x.argmax(), np.argmax(data)),
        (x.argmin(), np.argmin(data)),
        (x.argsort(), np.argsort(data)),
        (x.clip(0.1, 0.4), np.clip(data, 0.1, 0.4)),
        (x.trace(), np.trace(data)),
        (x.cumsum(), np.cumsum(data)),
        (x.cumprod(), np.cumprod(data)),
        (x.ptp(axis=1), np.ptp(data, axis=1)),
        (x.round(), np.round(data)),
        (x.std(), data.std()),
        (x.var(), data.var()),
        (x.prod(), data.prod().astype(floatX)),
        (x.diagonal(), np.diagonal(data)),
    ]
    f = ptt.function([x], [p[0] for p in pairs])
    for got, expect in zip(f(data), (p[1] for p in pairs)):
        np.testing.assert_allclose(np.asarray(got), expect, rtol=2e-6, atol=1e-7)
    # dot method
    y = pt.matrix("y")
    np.testing.assert_allclose(
        np.asarray(ptt.function([x, y], x.dot(y))(data, data)),
        np.dot(data, data), rtol=1e-5)


def test_comparisons_with_ndarray_and_constants():
    x = pt.vector("x")
    data = fx(4)
    other = fx(4)
    f = ptt.function(
        [x], [x < other, x > other, x <= other, x >= other,
              tm.eq(x, other), tm.neq(x, other)])
    res = [np.asarray(r) for r in f(data)]
    np.testing.assert_array_equal(res[0], data < other)
    np.testing.assert_array_equal(res[1], data > other)
    np.testing.assert_array_equal(res[2], data <= other)
    np.testing.assert_array_equal(res[3], data >= other)
    np.testing.assert_array_equal(res[4], data == other)
    np.testing.assert_array_equal(res[5], data != other)
    # reflected: ndarray OP tensor builds a graph for orderings; `==`
    # stays identity equality (reference keeps Variable.__eq__ identity
    # so graphs hash correctly)
    from pytensor_tpu.tensor.variable import TensorVariable

    assert isinstance(other < x, TensorVariable)
    assert isinstance(other >= x, TensorVariable)


def test_isclose_allclose_nan_inf():
    a = pt.vector("a")
    b = pt.vector("b")
    av = np.array([0.0, 1.0, np.nan, np.inf, -np.inf, 2.0], dtype=floatX)
    bv = np.array([0.0, 1.0, np.nan, np.inf, np.inf, 2.0 + 1e-9], dtype=floatX)
    f = ptt.function([a, b], tm.isclose(a, b))
    np.testing.assert_array_equal(np.asarray(f(av, bv)), np.isclose(av, bv))
    fe = ptt.function([a, b], tm.isclose(a, b, equal_nan=True))
    np.testing.assert_array_equal(
        np.asarray(fe(av, bv)), np.isclose(av, bv, equal_nan=True))
    fa = ptt.function([a, b], tm.allclose(a, b))
    assert bool(np.asarray(fa(av, bv))) == bool(np.allclose(av, bv))
