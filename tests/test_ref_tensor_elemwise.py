"""Port of the semantics audited by the reference's tests/tensor/test_elemwise.py
(1,212 LoC): DimShuffle shuffle/drop/augment grids with deferred runtime
checks, Elemwise broadcast grids + the no-runtime-broadcast contract,
CAReduce over every scalar op x dtype x axis-form (incl. NaN propagation and
empty axes), bit-op reduce gradients, static-shape inference corners,
vectorize of elemwise/dimshuffle/reduce, and gradient error paths.

Semantics only — C-linker/inplace/memory-leak tests are N/A by design (XLA
owns buffers; destroy maps are donation metadata here).  Reference file:
/root/reference/tests/tensor/test_elemwise.py.
"""

from __future__ import annotations

import re

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.scalar as ps
import pytensor_tpu.tensor as pt
from pytensor_tpu.gradient import NullTypeGradError, grad, grad_not_implemented
from pytensor_tpu.graph.basic import Apply, Variable
from pytensor_tpu.graph.replace import vectorize_graph
from pytensor_tpu.scalar import ScalarOp
from pytensor_tpu.tensor.basic import as_tensor_variable, second
from pytensor_tpu.tensor.elemwise import CAReduce, DimShuffle, Elemwise
from pytensor_tpu.tensor.math import Sum
from pytensor_tpu.tensor.math import all as pt_all
from pytensor_tpu.tensor.math import any as pt_any
from pytensor_tpu.tensor.math import sum as pt_sum
from pytensor_tpu.tensor.type import TensorType

from tests.utils import compare_xla_and_py

floatX = ptt.config.floatX
rng = np.random.default_rng(20260819)


def _type_for(xsh, dtype=None):
    return TensorType(
        dtype or floatX, shape=tuple(s if s == 1 else None for s in xsh)
    )


# ---------------------------------------------------------------------------
# DimShuffle (reference TestDimShuffle)
# ---------------------------------------------------------------------------

DIMSHUFFLE_CASES = [
    ((2, 3), (1, "x", 0), (3, 1, 2)),
    ((1, 2, 3), (1, 2), (2, 3)),
    ((1, 2, 1, 3), (1, 3), (2, 3)),
    ((2, 3, 4), (2, 1, 0), (4, 3, 2)),
    ((2, 3, 4), ("x", 2, 1, 0, "x"), (1, 4, 3, 2, 1)),
    ((1, 4, 3, 2, 1), (3, 2, 1), (2, 3, 4)),
    ((1, 1, 4), (1, 2), (1, 4)),
    ((1, 1, 1), (), ()),
    ((1,), ("x", "x"), (1, 1)),
]


class TestDimShuffle:
    @pytest.mark.parametrize("xsh,shuffle,zsh", DIMSHUFFLE_CASES)
    def test_perform_both_backends(self, xsh, shuffle, zsh):
        x = _type_for(xsh)("x")
        e = DimShuffle(input_ndim=len(xsh), new_order=shuffle)(x)
        xv = np.asarray(rng.standard_normal(xsh), dtype=floatX)
        (res,) = compare_xla_and_py([x], [e], [xv])
        assert np.asarray(res).shape == zsh
        # and the shape graph agrees
        f = ptt.function([x], e.shape, mode="FAST_COMPILE",
                         on_unused_input="ignore")
        assert tuple(np.atleast_1d(np.asarray(f(xv)))) == zsh

    def test_static_drop_rejected_at_build(self):
        x = TensorType(floatX, shape=(2, 1, None))("x")
        with pytest.raises(TypeError):
            DimShuffle(input_ndim=3, new_order=(1, 2))(x)

    @pytest.mark.parametrize("mode", ["FAST_COMPILE", "FAST_RUN"])
    def test_unknown_drop_checked_at_runtime(self, mode):
        # reference: build succeeds on shape=(None, 1, None), run raises
        x = TensorType(floatX, shape=(None, 1, None))("x")
        e = DimShuffle(input_ndim=3, new_order=(1, 2))(x)
        f = ptt.function([x], e, mode=mode)
        assert np.asarray(f(np.ones((1, 1, 4), dtype=floatX))).shape == (1, 4)
        with pytest.raises(ValueError):
            f(np.ones((2, 1, 4), dtype=floatX))

    def test_duplicate_axis_rejected(self):
        with pytest.raises(ValueError):
            DimShuffle(input_ndim=3, new_order=(0, 1, 2, 0))

    def test_too_big_rank(self):
        x = pt.scalar("x")
        with pytest.raises(
            ValueError,
            match="maximum supported dimension for a TensorType is currently 64",
        ):
            x.dimshuffle(("x",) * 65)

    def test_static_shape(self):
        x = pt.tensor(dtype=floatX, shape=(1, 2), name="x")
        assert x.dimshuffle([0, 1, "x"]).type.shape == (1, 2, 1)

    def test_valid_input_ndim(self):
        assert DimShuffle(input_ndim=2, new_order=(1, 0)).input_ndim == 2
        with pytest.raises(TypeError):
            DimShuffle(input_ndim=(True, False), new_order=(1, 0))


# ---------------------------------------------------------------------------
# Elemwise broadcasting (reference TestBroadcast)
# ---------------------------------------------------------------------------

BROADCAST_CASES = [
    ((3, 5), (3, 5)),
    ((3, 5), (1, 5)),
    ((3, 5), (3, 1)),
    ((1, 5), (5, 1)),
    ((1, 1), (1, 1)),
    ((4096,), (4096,)),
    ((2, 3, 4, 5), (2, 3, 4, 5)),
    ((2, 3, 4, 5), (1, 3, 1, 5)),
    ((2, 3, 4, 5), (1, 1, 1, 1)),
    ((), ()),
]


class TestBroadcast:
    @pytest.mark.parametrize("xsh,ysh", BROADCAST_CASES)
    def test_add_grid(self, xsh, ysh):
        x = _type_for(xsh)("x")
        y = _type_for(ysh)("y")
        e = Elemwise(ps.add)(x, y)
        xv = np.asarray(rng.random(xsh), dtype=floatX)
        yv = np.asarray(rng.random(ysh), dtype=floatX)
        (res,) = compare_xla_and_py([x, y], [e], [xv, yv])
        np.testing.assert_allclose(np.asarray(res), xv + yv, rtol=1e-6)
        # shape graph
        f = ptt.function([x, y], e.shape, mode="FAST_COMPILE")
        assert tuple(np.atleast_1d(np.asarray(f(xv, yv)))) == (xv + yv).shape

    def test_fill(self):
        x = TensorType(floatX, shape=(None, None))("x")
        y = TensorType(floatX, shape=(1, 1))("y")
        e = Elemwise(ps.Second())(x, y)
        xv = np.asarray(rng.random((5, 5)), dtype=floatX)
        yv = np.asarray(rng.random((1, 1)), dtype=floatX)
        (res,) = compare_xla_and_py([x, y], [e], [xv, yv])
        assert (np.asarray(res) == yv).all()

    def test_fill_var(self):
        pt.matrix().fill(3)

    def test_fill_grad(self):
        x = TensorType(floatX, shape=(None, 1, None))("x")
        y = TensorType(floatX, shape=(None, 1, None))("y")
        e = second(x, y)
        g = grad(e.sum(), y)
        assert isinstance(g, Variable)

    def test_weird_strides(self):
        x = _type_for((2,) * 5)("x")
        y = _type_for((2,) * 5)("y")
        e = Elemwise(ps.add)(x, y)
        xv = np.asarray(rng.random((2,) * 5), dtype=floatX)
        yv = np.asarray(rng.random((2,) * 5), dtype=floatX).transpose(4, 0, 3, 1, 2)
        (res,) = compare_xla_and_py([x, y], [e], [xv, yv])
        assert (np.asarray(res) == xv + yv).all()

    def test_same_inputs(self):
        x = _type_for((2, 2))("x")
        e = Elemwise(ps.add)(x, x)
        xv = np.asarray(rng.random((2, 2)), dtype=floatX)
        (res,) = compare_xla_and_py([x], [e], [xv])
        assert (np.asarray(res) == 2 * xv).all()


def check_elemwise_runtime_broadcast(mode):
    """Reference check_elemwise_runtime_broadcast (test_elemwise.py:760)."""
    x_v = pt.matrix("x")
    m_v = pt.vector("m")
    f = ptt.function([x_v, m_v], x_v - m_v, mode=mode)

    for x_sh, m_sh in [((2, 1), (3,)), ((2, 3), (1,))]:
        x = np.ones(x_sh).astype(floatX)
        m = np.zeros(m_sh).astype(floatX)
        with pytest.raises(ValueError, match="Runtime broadcasting not allowed"):
            f(x, m)

    # outright shape mismatch is a backend-specific error
    with pytest.raises((ValueError, TypeError)):
        f(np.ones((2, 4)).astype(floatX), np.zeros((3,)).astype(floatX))


class TestElemwise:
    def test_runtime_broadcast_oracle(self):
        check_elemwise_runtime_broadcast("FAST_COMPILE")

    def test_runtime_broadcast_xla(self):
        check_elemwise_runtime_broadcast("FAST_RUN")

    def test_elemwise_grad_bool(self):
        x = pt.scalar(dtype="bool")
        y = pt.bscalar()
        z = x * y
        dx, dy = grad(z, [x, y])
        assert isinstance(dx, Variable) and isinstance(dy, Variable)

    def test_input_dimensions_overflow(self):
        a, b, c, d, e, f_ = pt.vectors("abcdef")
        s = a + b + c + d + e + f_
        g = ptt.function([a, b, c, d, e, f_], s, mode="FAST_COMPILE")
        g(*[np.zeros(2**11, floatX) for _ in range(6)])

    INFER_CASES = [
        ((5, 6), (5, 6)),
        ((5, 6), (5, 1)),
        ((5, 6), (1, 6)),
        ((5, 1), (5, 6)),
        ((1, 6), (5, 6)),
        ((2, 3, 4, 5), (2, 3, 4, 5)),
        ((2, 3, 4, 5), (2, 3, 1, 5)),
        ((2, 3, 4, 5), (1, 3, 4, 5)),
        ((2, 1, 4, 5), (2, 3, 4, 5)),
        ((2, 3, 4, 1), (2, 3, 4, 5)),
    ]

    @pytest.mark.parametrize("s_left,s_right", INFER_CASES)
    def test_infer_shape(self, s_left, s_right):
        t_left = _type_for(s_left)()
        t_right = _type_for(s_right)()
        e = Elemwise(ps.add)(t_left, t_right)
        f = ptt.function([t_left, t_right], e.shape, mode="FAST_COMPILE")
        lv = np.zeros(s_left, dtype=floatX)
        rv = np.zeros(s_right, dtype=floatX)
        expected = np.broadcast_shapes(s_left, s_right)
        assert tuple(np.atleast_1d(np.asarray(f(lv, rv)))) == expected

    def test_static_shape_unary(self):
        x = pt.tensor(dtype="float64", shape=(None, 0, 1, 5))
        assert pt.exp(x).type.shape == (None, 0, 1, 5)

    def test_static_shape_binary(self):
        t = pt.tensor
        assert (t(dtype="float64", shape=(None, 5))
                + t(dtype="float64", shape=(None, 5))).type.shape == (None, 5)
        assert (t(dtype="float64", shape=(None, 5))
                + t(dtype="float64", shape=(10, 5))).type.shape == (10, 5)
        assert (t(dtype="float64", shape=(1, 5))
                + t(dtype="float64", shape=(10, 5))).type.shape == (10, 5)
        assert (t(dtype="float64", shape=(None, 1))
                + t(dtype="float64", shape=(1, 1))).type.shape == (None, 1)
        assert (t(dtype="float64", shape=(0, 0, 0))
                + t(dtype="float64", shape=(0, 1, None))).type.shape == (0, 0, 0)

    def test_invalid_static_shape(self):
        x = pt.tensor(dtype="float64", shape=(2,))
        y = pt.tensor(dtype="float64", shape=(3,))
        with pytest.raises(ValueError):
            x + y

    @pytest.mark.parametrize(
        "shape_x, shape_y, op, np_op",
        [
            ((3, 5), (7, 1, 3), pt.add, np.add),
            ((2, 3), (1, 4), pt.mul, np.multiply),
        ],
    )
    def test_outer(self, shape_x, shape_y, op, np_op):
        x = pt.tensor(dtype=np.float64, shape=shape_x)
        y = pt.tensor(dtype=np.float64, shape=shape_y)
        z = op.outer(x, y)
        f = ptt.function([x, y], z, mode="FAST_COMPILE")
        x1 = np.ones(shape_x)
        y1 = np.ones(shape_y)
        np.testing.assert_array_equal(np.asarray(f(x1, y1)), np_op.outer(x1, y1))


# ---------------------------------------------------------------------------
# CAReduce (reference TestCAReduce.with_mode, ported as a grid)
# ---------------------------------------------------------------------------

CAREDUCE_CASES = [
    ((5, 6), None),
    ((5, 6), (0, 1)),
    ((5, 6), (0,)),
    ((5, 6), (1,)),
    ((5, 6), (-1,)),
    ((5, 6), (-2,)),
    ((2, 3, 4, 5), (0, 1, 3)),
    ((2, 3, 4, 5), (-2, -3)),
    ((5, 0), None),
    ((5, 0), (0,)),
    ((5, 0), (1,)),
    ((), None),
]

_NP_RED = {
    "add": np.add.reduce,
    "mul": np.multiply.reduce,
    "maximum": np.maximum.reduce,
    "minimum": np.minimum.reduce,
    "or_": np.bitwise_or.reduce,
    "and_": np.bitwise_and.reduce,
    "xor": np.bitwise_xor.reduce,
}


def _np_reduce(name, zv, tosum, xsh):
    if len(tosum) > 1 and any(a < 0 for a in tosum):
        tosum = [a + len(xsh) if a < 0 else a for a in tosum]
    for axis in sorted(tosum, reverse=True):
        zv = _NP_RED[name](zv, axis)
    return np.asarray(zv)


def _careduce_case(scalar_op, dtype, xsh, tosum, test_nan=False, tensor_op=None):
    name = scalar_op.name
    x = _type_for(xsh, dtype)("x")
    if tensor_op is None:
        e = as_tensor_variable(CAReduce(scalar_op, axis=tosum)(x))
    else:
        e = as_tensor_variable(tensor_op(x, axis=tosum))
    norm = (list(range(len(xsh))) if tosum is None
            else [a + len(xsh) if a < 0 else a for a in tosum])

    xv = np.asarray(rng.random(xsh))
    if dtype.startswith(("int", "uint", "bool")):
        xv = np.asarray(xv < 0.5, dtype=dtype)
    else:
        xv = np.asarray(xv, dtype=dtype)
    if test_nan and xv.size > 0:
        flat = xv.flatten()
        flat[0] = np.nan
        xv = flat.reshape(*xsh) if len(xsh) else np.asarray(np.nan, dtype=dtype)

    # identityless reductions over empty axes are undefined (reference skips)
    if name in ("maximum", "minimum", "xor") and np.prod(xv.shape) == 0:
        return

    zv = xv
    if tensor_op is pt_all:
        for axis in sorted(norm, reverse=True):
            zv = np.all(zv, axis if axis >= 0 else axis)
        zv = np.asarray(zv)
    elif tensor_op is pt_any:
        for axis in sorted(norm, reverse=True):
            zv = np.any(zv, axis)
        zv = np.asarray(zv)
    else:
        zv = _np_reduce(name, zv, norm, xsh)
        if dtype == "bool":
            # CAReduce does not upcast bool the way np.add does
            zv = zv.astype(dtype) if name == "add" else zv

    f = ptt.function([x], e, mode="FAST_COMPILE", on_unused_input="ignore")
    got = np.asarray(f(xv))
    assert got.shape == zv.shape
    if test_nan:
        np.testing.assert_array_equal(got, zv.astype(got.dtype))
    else:
        np.testing.assert_allclose(got, zv.astype(got.dtype), rtol=1e-6)

    # shape graph agrees
    fshp = ptt.function([x], e.shape, mode="FAST_COMPILE",
                        on_unused_input="ignore")
    assert tuple(np.atleast_1d(np.asarray(fshp(xv)))) == zv.shape


class TestCAReduce:
    @pytest.mark.parametrize("xsh,tosum", CAREDUCE_CASES)
    @pytest.mark.parametrize("dtype", ["bool", "floatX", "int8", "uint8"])
    def test_perform_arith(self, dtype, xsh, tosum):
        dtype = floatX if dtype == "floatX" else dtype
        for op in (ps.add, ps.mul, ps.maximum, ps.minimum):
            _careduce_case(op, dtype, xsh, tosum)
        _careduce_case(ps.and_, dtype, xsh, tosum, tensor_op=pt_all)
        _careduce_case(ps.or_, dtype, xsh, tosum, tensor_op=pt_any)

    @pytest.mark.parametrize("xsh,tosum", CAREDUCE_CASES)
    @pytest.mark.parametrize("dtype", ["int8", "uint8"])
    def test_perform_bitwise(self, dtype, xsh, tosum):
        for op in (ps.or_, ps.and_, ps.xor):
            _careduce_case(op, dtype, xsh, tosum)

    @pytest.mark.parametrize("xsh,tosum", CAREDUCE_CASES)
    def test_perform_nan(self, xsh, tosum):
        _careduce_case(ps.add, floatX, xsh, tosum, test_nan=True)
        _careduce_case(ps.mul, floatX, xsh, tosum, test_nan=True)
        _careduce_case(ps.maximum, floatX, xsh, tosum, test_nan=True)
        _careduce_case(ps.minimum, floatX, xsh, tosum, test_nan=True)
        _careduce_case(ps.or_, floatX, xsh, tosum, test_nan=True, tensor_op=pt_any)
        _careduce_case(ps.and_, floatX, xsh, tosum, test_nan=True, tensor_op=pt_all)

    def test_repeated_axis(self):
        x = pt.vector("x")
        with pytest.raises(ValueError, match="repeated axis"):
            CAReduce(ps.add, axis=(0, 0))(x)

    def test_scalar_input(self):
        x = pt.scalar("x")
        assert CAReduce(ps.add, axis=(-1,))(x).eval({x: 5}) == 5
        with pytest.raises(np.exceptions.AxisError):
            CAReduce(ps.add, axis=(-2,))(x)

    def test_str(self):
        # repo naming contract (reference asserts its own CAReduce{...})
        assert "Sum" in str(CAReduce(ps.add, axis=None))


class TestBitOpReduceGrad:
    def test_all_grad(self):
        x = pt.bmatrix("x")
        gx = grad(x.all(), x)
        f = ptt.function([x], gx, mode="FAST_COMPILE")
        x_random = (rng.random((5, 7)) < 0.5).astype("int8")
        for x_val in (x_random, np.zeros_like(x_random), np.ones_like(x_random)):
            gx_val = np.asarray(f(x_val))
            assert gx_val.shape == x_val.shape
            assert np.all(gx_val == 0)

    def test_any_grad(self):
        x = pt.bmatrix("x")
        gx = grad(x.any(), x)
        f = ptt.function([x], gx, mode="FAST_COMPILE")
        x_random = (rng.random((5, 7)) < 0.5).astype("int8")
        for x_val in (x_random, np.zeros_like(x_random), np.ones_like(x_random)):
            gx_val = np.asarray(f(x_val))
            assert gx_val.shape == x_val.shape
            assert np.all(gx_val == 0)


# ---------------------------------------------------------------------------
# Gradient error paths (reference test_not_implemented_elemwise_grad)
# ---------------------------------------------------------------------------

def test_not_implemented_elemwise_grad():
    class TestOp(ScalarOp):
        nin = 2

        def __init__(self):
            super().__init__(ps.upgrade_to_float)

        def impl(self, n, x):
            return x * n

        def grad(self, inputs, gout):
            (n, _x) = inputs
            (gz,) = gout
            return [grad_not_implemented(self, 0, n), gz * n]

    test_op = Elemwise(TestOp())
    x = pt.scalar()
    assert isinstance(grad(test_op(2, x), x), Variable)
    with pytest.raises(NullTypeGradError):
        grad(test_op(x, 2), x)


# ---------------------------------------------------------------------------
# Vectorize (reference TestVectorize)
# ---------------------------------------------------------------------------

class TestVectorize:
    def test_elemwise(self):
        vec = pt.tensor(shape=(None,))
        mat = pt.tensor(shape=(None, None))
        out = pt.exp(vec)
        vect_out = vectorize_graph(out, {vec: mat})
        assert isinstance(vect_out.owner.op, Elemwise)
        assert vect_out.owner.op.scalar_op.name == "exp"
        assert vect_out.owner.inputs[0] is mat

    def test_dimshuffle(self):
        col_mat = pt.tensor(shape=(None, 1))
        tcol_mat = pt.tensor(shape=(None, None, 1))
        out = col_mat.dimshuffle(0)  # drop column
        vect_out = vectorize_graph(out, {col_mat: tcol_mat})
        assert isinstance(vect_out.owner.op, DimShuffle)
        assert vect_out.owner.op.new_order == (0, 1)
        assert vect_out.owner.inputs[0] is tcol_mat
        assert vect_out.owner.outputs[0].type.shape == (None, None)

    def test_CAReduce(self):
        mat = pt.tensor(shape=(None, None))
        tns = pt.tensor(shape=(None, None, None))
        out = pt_sum(mat)
        vect_out = vectorize_graph(out, {mat: tns})
        assert isinstance(vect_out.owner.op, CAReduce)
        assert vect_out.owner.op.scalar_op.name == "add"
        assert tuple(vect_out.owner.op.axis) == (1, 2)
        assert vect_out.owner.inputs[0] is tns

        bool_mat = pt.tensor(dtype="bool", shape=(None, None))
        bool_tns = pt.tensor(dtype="bool", shape=(None, None, None))
        out = pt_any(bool_mat, axis=-2)
        vect_out = vectorize_graph(out, {bool_mat: bool_tns})
        assert isinstance(vect_out.owner.op, CAReduce)
        assert vect_out.owner.op.scalar_op.name == "or_"
        assert tuple(vect_out.owner.op.axis) == (1,)
        assert vect_out.owner.inputs[0] is bool_tns


def test_log_zero_no_warning():
    x = pt.scalar("x")
    fn = ptt.function([x], pt.log(x), mode="FAST_COMPILE")
    assert fn(np.asarray(0, dtype=floatX)) == -np.inf
