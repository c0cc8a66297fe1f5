"""Port of the semantics audited by the reference's tests/tensor/test_basic.py
(4,601 LoC): constructors, join/stack/split, shape manipulation, constant
handling, autocasting, diag family, choose/permute, vectorized ctors.

Semantics only — the assertions mirror what the reference checks, expressed
against this framework's API and the XLA-vs-oracle dual-compile harness.
"""

from __future__ import annotations

import pickle

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.gradient import grad, verify_grad
from pytensor_tpu.graph.basic import Constant
from pytensor_tpu.tensor.type import TensorType

from tests.utils import compare_xla_and_py

floatX = ptt.config.floatX
rng = np.random.default_rng(2024)


def fx(*shape):
    return rng.standard_normal(shape).astype(floatX)


# ---------------------------------------------------------------------------
# MakeVector (reference TestMakeVector)
# ---------------------------------------------------------------------------

class TestMakeVector:
    @pytest.mark.parametrize("dtype,vals", [
        ("int8", [1, 2, 3]),
        ("int64", [1, 2, 3]),
        ("float64", [1, 2, 3]),
        ("float32", [1.5, 2.5, 3.5]),
    ])
    def test_make_vector_values(self, dtype, vals):
        from pytensor_tpu.tensor.basic import MakeVector

        consts = [pt.constant(v, dtype="float64") for v in vals]
        out = MakeVector(dtype=dtype)(*consts)
        assert out.type.ndim == 1
        assert out.dtype == dtype
        f = ptt.function([], out, mode="FAST_RUN")
        got = np.asarray(f())
        assert got.dtype == np.dtype(dtype)
        np.testing.assert_array_equal(got, np.asarray(vals, dtype=dtype))

    def test_make_vector_default_is_int64(self):
        # module-level make_vector is MakeVector() with int64 dtype,
        # matching the reference (tensor/basic.py:1997)
        out = pt.make_vector(pt.constant(1, dtype="int8"),
                             pt.constant(2, dtype="int32"))
        assert out.dtype == "int64"

    def test_make_vector_fail(self):
        with pytest.raises((TypeError, ValueError)):
            pt.make_vector(pt.matrix("m"))

    def test_make_vector_empty(self):
        out = pt.make_vector()
        f = ptt.function([], out, mode="FAST_COMPILE")
        assert np.asarray(f()).shape == (0,)

    def test_infer_shape(self):
        a, b = pt.scalar("a"), pt.scalar("b")
        v = pt.make_vector(a, b)
        f = ptt.function([a, b], v.shape, mode="FAST_RUN")
        np.testing.assert_array_equal(np.asarray(f(1.0, 2.0)), [2])

    def test_make_vector_grad(self):
        from pytensor_tpu.tensor.basic import MakeVector

        def op(a, b):
            return pt.sum(MakeVector(dtype="float64")(a, b) ** 2)
        verify_grad(op, [np.asarray(1.5, dtype="float64"),
                         np.asarray(-2.0, dtype="float64")], rng=rng)


# ---------------------------------------------------------------------------
# constant / as_tensor_variable (reference test_constant, TestAsTensorVariable)
# ---------------------------------------------------------------------------

class TestConstant:
    def test_constant_identity(self):
        c = pt.constant(np.zeros((2, 3)))
        assert pt.constant(c) is c
        # ndim/dtype-compatible re-wrap returns the same object
        assert pt.constant(c, ndim=2) is c

    def test_constant_ndim_reshape(self):
        c = pt.constant(1.5, ndim=2)
        assert c.type.ndim == 2
        assert c.data.shape == (1, 1)
        # incompatible ndim raises
        with pytest.raises(ValueError):
            pt.constant(np.zeros((2, 3)), ndim=1)

    def test_constant_equals(self):
        a = pt.constant(np.arange(4))
        b = pt.constant(np.arange(4))
        assert a.equals(b)
        assert not a.equals(pt.constant(np.arange(5)))

    def test_masked_array_not_implemented(self):
        val = np.ma.masked_array([1.0, 2.0], mask=[0, 1])
        with pytest.raises(NotImplementedError):
            pt.constant(val)
        with pytest.raises(NotImplementedError):
            pt.as_tensor_variable(val)


class TestAsTensorVariable:
    def test_tensor_from_scalar(self):
        x = pt.as_tensor_variable(3.0)
        assert isinstance(x, Constant)

    def test_list(self):
        x = pt.as_tensor_variable([1.0, 2.0, 3.0])
        assert x.type.ndim == 1
        # list of variables stacks
        a, b = pt.scalar("a"), pt.scalar("b")
        v = pt.as_tensor_variable([a, b])
        assert v.type.ndim == 1

    def test_ndim_incompatible(self):
        with pytest.raises((ValueError, TypeError)):
            pt.as_tensor_variable(np.zeros((2, 3)), ndim=1)

    def test_bool_python(self):
        x = pt.as_tensor_variable(True)
        assert x.dtype == "bool"

    def test_variable_passthrough(self):
        v = pt.vector("v")
        assert pt.as_tensor_variable(v) is v

    def test_empty_list_dtype(self):
        x = pt.as_tensor_variable([])
        assert x.type.ndim == 1
        assert x.data.shape == (0,)


# ---------------------------------------------------------------------------
# big python ints (reference TestLongTensor)
# ---------------------------------------------------------------------------

class TestLongTensor:
    def test_fit_int64(self):
        for exp in (30, 62):
            for sgn in (1, -1):
                val = sgn * (2 ** exp)
                c = pt.constant(val)
                assert int(c.data) == val

    def test_int64_max(self):
        c = pt.constant(2 ** 63 - 1)
        assert int(c.data) == 2 ** 63 - 1

    def test_2_63_is_uint64(self):
        # does not fit int64; numpy's choice (uint64) — and never a silent
        # wraparound to a negative value
        c = pt.constant(2 ** 63)
        assert int(c.data) == 2 ** 63

    def test_too_big(self):
        with pytest.raises(Exception):
            pt.constant(2 ** 64 + 3)


def test_len_raises():
    for nd in (1, 2, 3):
        x = pt.tensor(dtype=floatX, shape=(None,) * nd)
        with pytest.raises(TypeError):
            len(x)


# ---------------------------------------------------------------------------
# arange (reference TestARange)
# ---------------------------------------------------------------------------

class TestARange:
    def test_integers(self):
        start, stop, step = (pt.scalar(dtype="int64") for _ in range(3))
        out = pt.arange(start, stop, step)
        f = ptt.function([start, stop, step], out, mode="FAST_RUN")
        for a, b, s in [(0, 5, 1), (2, 11, 3), (-5, 1, 1), (10, 2, -2),
                        (10, 2, 1), (0, 0, 1)]:
            np.testing.assert_array_equal(np.asarray(f(a, b, s)),
                                          np.arange(a, b, s))

    def test_default_step_and_start(self):
        stop = pt.scalar(dtype="int64")
        f = ptt.function([stop], pt.arange(stop), mode="FAST_RUN")
        np.testing.assert_array_equal(np.asarray(f(7)), np.arange(7))
        start = pt.scalar(dtype="int64")
        f2 = ptt.function([start, stop], pt.arange(start, stop), mode="FAST_RUN")
        np.testing.assert_array_equal(np.asarray(f2(2, 7)), np.arange(2, 7))

    def test_dtype(self):
        assert pt.arange(5).dtype == "int64"
        assert pt.arange(np.int32(5)).dtype in ("int32", "int64")
        assert pt.arange(5.0).dtype == floatX
        assert pt.arange(pt.constant(5, dtype="int16")).dtype in (
            "int16", "int64")
        # explicit dtype wins
        assert pt.arange(5, dtype="float64").dtype == "float64"

    def test_static_shape(self):
        assert pt.arange(1, 11, 2).type.shape == (5,)
        assert pt.arange(10, 2, -2).type.shape == (4,)
        assert pt.arange(0).type.shape == (0,)
        # symbolic stop -> unknown
        assert pt.arange(pt.scalar(dtype="int64")).type.shape == (None,)

    def test_infer_shape(self):
        stop = pt.scalar(dtype="int64")
        out = pt.arange(stop)
        f = ptt.function([stop], out.shape, mode="FAST_RUN")
        assert int(np.asarray(f(9))[0]) == 9
        assert int(np.asarray(f(0))[0]) == 0

    def test_grads_disconnected_or_zero(self):
        # arange output is integer: gradient wrt bounds is undefined /
        # zero; building a float graph through arange must not crash
        out = pt.sum(pt.arange(5.0) * pt.scalar("s"))
        g = grad(out, pt.get_all_inputs(out)[0] if hasattr(pt, "get_all_inputs") else out.owner.inputs[0].owner.inputs[1])


# ---------------------------------------------------------------------------
# Alloc / ones / zeros / full (reference TestAlloc)
# ---------------------------------------------------------------------------

class TestAlloc:
    def test_alloc_output_values(self):
        v = pt.vector("v")
        out = pt.alloc(v, 4, 5)
        f = ptt.function([v], out, mode="FAST_RUN")
        val = fx(5)
        np.testing.assert_allclose(np.asarray(f(val)),
                                   np.broadcast_to(val, (4, 5)))

    def test_ones_zeros_full(self):
        for ctor, npctor in [(pt.ones, np.ones), (pt.zeros, np.zeros)]:
            f = ptt.function([], ctor((2, 3)), mode="FAST_RUN")
            np.testing.assert_array_equal(np.asarray(f()),
                                          npctor((2, 3), dtype=floatX))
        for shape in [(), 5, (3, 2)]:
            f = ptt.function([], pt.full(shape, 7.0), mode="FAST_RUN")
            np.testing.assert_array_equal(
                np.asarray(f()), np.full(shape, 7.0, dtype=floatX))

    def test_static_shape(self):
        x = pt.alloc(pt.scalar("x"), 2, 3)
        assert x.type.shape == (2, 3)
        s = pt.scalar(dtype="int64")
        y = pt.alloc(pt.scalar("x"), 2, s)
        assert y.type.shape == (2, None)

    def test_runtime_broadcast_oracle_raises(self):
        # runtime broadcasting of a dim not statically 1 is forbidden
        # (reference Alloc._check_runtime_broadcast)
        v = pt.vector("v")
        out = pt.alloc(v, 5, 4)
        f = ptt.function([v], out, mode="FAST_COMPILE")
        val = fx(4)
        np.testing.assert_allclose(np.asarray(f(val)),
                                   np.broadcast_to(val, (5, 4)))
        with pytest.raises(ValueError):
            f(fx(1))

    def test_alloc_grad_sums_broadcast(self):
        def op(x):
            return pt.sum(pt.alloc(x, 4, 3) ** 2)
        verify_grad(op, [rng.standard_normal(3)], rng=rng)

    def test_alloc_of_scalar_grad(self):
        def op(x):
            return pt.sum(pt.alloc(x, 2, 2) * np.array([[1., 2.], [3., 4.]]))
        verify_grad(op, [np.asarray(0.5)], rng=rng)


def test_infer_static_shape():
    # constants and shapes of typed inputs resolve statically
    x = pt.tensor(dtype=floatX, shape=(4, None))
    out = pt.alloc(pt.scalar("s"), x.shape[0], x.shape[1])
    assert out.type.shape[0] == 4


# ---------------------------------------------------------------------------
# eye / tri / tril / triu (reference TestEye, TestTriangle)
# ---------------------------------------------------------------------------

class TestEyeTriangle:
    @pytest.mark.parametrize("n,m,k", [
        (3, 3, 0), (3, 4, 1), (4, 3, -1), (5, 5, 4), (5, 5, -4),
        (2, 2, 3), (1, 1, 0), (3, 3, -3),
    ])
    def test_eye(self, n, m, k):
        f = ptt.function([], pt.eye(n, m, k), mode="FAST_RUN")
        np.testing.assert_array_equal(np.asarray(f()),
                                      np.eye(n, m, k, dtype=floatX))

    def test_eye_symbolic(self):
        n = pt.scalar(dtype="int64")
        f = ptt.function([n], pt.eye(n), mode="FAST_RUN")
        np.testing.assert_array_equal(np.asarray(f(4)), np.eye(4, dtype=floatX))

    def test_eye_static_output_type(self):
        assert pt.eye(3).type.shape == (3, 3)
        assert pt.eye(3, 4).type.shape == (3, 4)

    @pytest.mark.parametrize("k", [-2, -1, 0, 1, 2])
    def test_tri(self, k):
        f = ptt.function([], pt.tri(4, 5, k), mode="FAST_RUN")
        np.testing.assert_array_equal(np.asarray(f()),
                                      np.tri(4, 5, k, dtype=floatX))

    @pytest.mark.parametrize("k", [-3, -1, 0, 1, 3])
    def test_tril_triu(self, k):
        x = pt.matrix("x")
        val = fx(4, 5)
        f = ptt.function([x], [pt.tril(x, k), pt.triu(x, k)], mode="FAST_RUN")
        lo, up = f(val)
        np.testing.assert_array_equal(np.asarray(lo), np.tril(val, k))
        np.testing.assert_array_equal(np.asarray(up), np.triu(val, k))

    def test_tril_preserves_inf(self):
        # mask semantics must preserve exact zeros/infs (select, not multiply)
        x = pt.matrix("x")
        val = np.array([[np.inf, np.nan], [1.0, -np.inf]], dtype="float64")
        xd = pt.tensor(dtype="float64", shape=(None, None))
        f = ptt.function([xd], pt.tril(xd), mode="FAST_RUN")
        got = np.asarray(f(val))
        np.testing.assert_array_equal(got, np.tril(val))

    def test_tril_triu_grad(self):
        verify_grad(lambda x: pt.sum(pt.tril(x) ** 2),
                    [rng.standard_normal((4, 4))], rng=rng)
        verify_grad(lambda x: pt.sum(pt.triu(x, 1) ** 2),
                    [rng.standard_normal((4, 4))], rng=rng)


# ---------------------------------------------------------------------------
# nonzero family (reference TestNonzero)
# ---------------------------------------------------------------------------

class TestNonzero:
    def _vals(self):
        return [
            np.array([0, 1, 0, 3], dtype=floatX),
            (rng.random((4, 5)) > 0.5).astype(floatX),
            (rng.random((2, 3, 4)) > 0.5).astype(floatX),
        ]

    def test_nonzero(self):
        for val in self._vals():
            x = pt.tensor(dtype=floatX, shape=(None,) * val.ndim)
            outs = pt.nonzero(x)
            f = ptt.function([x], list(outs), mode="FAST_COMPILE")
            got = f(val)
            exp = np.nonzero(val)
            assert len(got) == len(exp)
            for g, e in zip(got, exp):
                np.testing.assert_array_equal(np.asarray(g), e)

    def test_flatnonzero(self):
        for val in self._vals():
            x = pt.tensor(dtype=floatX, shape=(None,) * val.ndim)
            f = ptt.function([x], pt.flatnonzero(x), mode="FAST_COMPILE")
            np.testing.assert_array_equal(np.asarray(f(val)),
                                          np.flatnonzero(val))

    def test_nonzero_values(self):
        val = np.array([0, 1, 0, 3, 5], dtype=floatX)
        x = pt.vector("x")
        f = ptt.function([x], pt.nonzero_values(x), mode="FAST_COMPILE")
        np.testing.assert_array_equal(np.asarray(f(val)), val[val != 0])

    def test_nonzero_scalar_raises(self):
        with pytest.raises((ValueError, TypeError)):
            pt.nonzero(pt.scalar("s"))


# ---------------------------------------------------------------------------
# cast (reference TestCast)
# ---------------------------------------------------------------------------

class TestCast:
    def test_can_use_numpy_types(self):
        x = pt.vector(dtype="float32")
        y = pt.cast(x, np.int32)
        assert y.dtype == "int32"
        y2 = pt.cast(x, np.dtype("float64"))
        assert y2.dtype == "float64"

    @pytest.mark.parametrize("from_dt", ["int8", "int32", "float32", "float64"])
    @pytest.mark.parametrize("to_dt", ["int8", "int32", "float32", "float64"])
    def test_between_real_types(self, from_dt, to_dt):
        x = pt.vector(dtype=from_dt)
        val = np.array([1, 2, 3], dtype=from_dt)
        f = ptt.function([x], pt.cast(x, to_dt), mode="FAST_RUN")
        got = np.asarray(f(val))
        assert got.dtype == np.dtype(to_dt)
        np.testing.assert_array_equal(got, val.astype(to_dt))

    def test_cast_grad_is_cast_of_grad(self):
        x = pt.vector(dtype="float64")
        y = pt.sum(pt.cast(x, "float32") ** 2)
        g = grad(y, x)
        assert g.dtype == "float64"


# ---------------------------------------------------------------------------
# get_vector_length (reference test_get_vector_length)
# ---------------------------------------------------------------------------

def test_get_vector_length():
    from pytensor_tpu.tensor.basic import get_vector_length

    assert get_vector_length(pt.constant(np.arange(5))) == 5
    assert get_vector_length(pt.make_vector(pt.scalar(), pt.scalar())) == 2
    x = pt.tensor(dtype=floatX, shape=(4,))
    assert get_vector_length(x) == 4
    # shape of a known-rank tensor
    m = pt.tensor(dtype=floatX, shape=(2, 7))
    assert get_vector_length(m.shape) == 2
    with pytest.raises(ValueError):
        get_vector_length(pt.vector("v"))


# ---------------------------------------------------------------------------
# join / stack / split (reference TestJoinAndSplit)
# ---------------------------------------------------------------------------

class TestJoinAndSplit:
    def test_join_scalar_raises(self):
        a, b = pt.scalar("a"), pt.scalar("b")
        with pytest.raises((TypeError, ValueError)):
            pt.join(0, a, b)

    def test_stack_scalars_makes_vector(self):
        a, b = pt.scalar("a"), pt.scalar("b")
        s = pt.stack([a, b])
        assert s.type.ndim == 1
        f = ptt.function([a, b], s, mode="FAST_RUN")
        np.testing.assert_array_equal(np.asarray(f(1.0, 2.0)), [1.0, 2.0])

    def test_stack_mixed_type_constants(self):
        s = pt.stack([pt.constant(1), pt.constant(2.0),
                      pt.constant(3, dtype="int8")])
        f = ptt.function([], s, mode="FAST_COMPILE")
        np.testing.assert_array_equal(np.asarray(f()), [1, 2, 3])

    def test_stack_new_interface(self):
        a = pt.matrix("a")
        b = pt.matrix("b")
        val_a, val_b = fx(2, 3), fx(2, 3)
        for axis in (0, 1, 2, -1, -3):
            s = pt.stack([a, b], axis=axis)
            f = ptt.function([a, b], s, mode="FAST_RUN")
            np.testing.assert_allclose(np.asarray(f(val_a, val_b)),
                                       np.stack([val_a, val_b], axis=axis))
        with pytest.raises((IndexError, ValueError)):
            pt.stack([a, b], axis=4)
        with pytest.raises((IndexError, ValueError)):
            pt.stack([a, b], axis=-4)

    def test_stack_empty_raises(self):
        with pytest.raises((ValueError, TypeError, IndexError)):
            pt.stack([])

    def test_join_concatenate_one_element(self):
        x = pt.matrix("x")
        assert pt.concatenate([x], axis=1) is x

    def test_join_vectors_and_matrices(self):
        v1, v2 = pt.vector("v1"), pt.vector("v2")
        a, b = fx(3), fx(4)
        f = ptt.function([v1, v2], pt.join(0, v1, v2), mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f(a, b)), np.concatenate([a, b]))
        m1, m2 = pt.matrix("m1"), pt.matrix("m2")
        am, bm = fx(2, 3), fx(2, 3)
        for axis in (0, 1, -1, -2):
            f = ptt.function([m1, m2], pt.join(axis, m1, m2), mode="FAST_RUN")
            np.testing.assert_allclose(np.asarray(f(am, bm)),
                                       np.concatenate([am, bm], axis=axis))

    def test_join_matrix_dtype_upcast(self):
        a = pt.matrix(dtype="int32")
        b = pt.matrix(dtype="float64")
        out = pt.join(0, a, b)
        assert out.dtype == "float64"
        av = np.arange(6, dtype="int32").reshape(2, 3)
        bv = np.arange(6, dtype="float64").reshape(2, 3)
        f = ptt.function([a, b], out, mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f(av, bv)),
                                   np.concatenate([av, bv], axis=0))

    def test_vertical_horizontal_stack(self):
        a, b = pt.matrix("a"), pt.matrix("b")
        av, bv = fx(2, 3), fx(4, 3)
        f = ptt.function([a, b], pt.vertical_stack(a, b), mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f(av, bv)), np.vstack([av, bv]))
        av2, bv2 = fx(3, 2), fx(3, 4)
        f2 = ptt.function([a, b], pt.horizontal_stack(a, b), mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f2(av2, bv2)),
                                   np.hstack([av2, bv2]))

    def test_static_shape_inference(self):
        a = pt.tensor(dtype="int8", shape=(2, 3))
        b = pt.tensor(dtype="int8", shape=(2, 5))
        assert pt.join(1, a, b).type.shape == (2, 8)
        assert pt.join(-1, a, b).type.shape == (2, 8)
        d = pt.tensor(dtype="int8", shape=(2, None))
        assert pt.join(1, a, b, d).type.shape == (2, None)
        with pytest.raises(ValueError, match="match exactly"):
            pt.join(0, pt.ones((2, 3)), pt.ones((2, 5)))

    def test_broadcastable_flag_assignment_mixed_otheraxes(self):
        a = pt.tensor(dtype=floatX, shape=(None, None, 1))
        b = pt.tensor(dtype=floatX, shape=(1, None, 1))
        c = pt.join(1, a, b)
        assert c.type.shape == (1, None, 1)
        c2 = pt.join(pt.constant(1), a, b)
        assert c2.type.shape == (1, None, 1)

    def test_broadcastable_flag_assignment_mixed_thisaxes(self):
        a = pt.tensor(dtype=floatX, shape=(None, None, 1))
        b = pt.tensor(dtype=floatX, shape=(1, None, 1))
        c = pt.join(0, a, b)
        assert c.type.shape[0] != 1

    def test_broadcastable_flags_all_broadcastable_on_joinaxis(self):
        a = pt.tensor(dtype=floatX, shape=(1, None, 1))
        b = pt.tensor(dtype=floatX, shape=(1, None, 1))
        assert pt.join(0, a, b).type.shape[0] != 1

    def test_broadcastable_single_input(self):
        a = pt.tensor(dtype=floatX, shape=(1, None, 1))
        b = pt.join(0, a)
        assert b.type.shape[0] == 1 and b.type.shape[2] == 1

    def test_join_grad(self):
        def op(a, b):
            return pt.sum(pt.join(1, a, b) ** 2)
        verify_grad(op, [rng.standard_normal((2, 3)),
                         rng.standard_normal((2, 4))], rng=rng)

    def test_mixed_ndim_error(self):
        v = pt.vector("v")
        m = pt.matrix("m")
        with pytest.raises(TypeError):
            pt.join(0, v, m)

    def test_split_basic_and_0elem(self):
        x = pt.matrix("x")
        val = fx(4, 6)
        outs = pt.split(x, [1, 3], 2, axis=0)
        f = ptt.function([x], list(outs), mode="FAST_RUN")
        o1, o2 = f(val)
        np.testing.assert_allclose(np.asarray(o1), val[:1])
        np.testing.assert_allclose(np.asarray(o2), val[1:])
        outs0 = pt.split(x, [4, 0], 2, axis=0)
        f0 = ptt.function([x], list(outs0), mode="FAST_COMPILE")
        a, b = f0(val)
        assert np.asarray(b).shape == (0, 6)

    def test_split_neg_raises(self):
        x = pt.matrix("x")
        outs = pt.split(x, [5, -1], 2, axis=0)
        f = ptt.function([x], list(outs), mode="FAST_COMPILE")
        with pytest.raises(ValueError):
            f(fx(4, 6))

    def test_split_sum_mismatch_raises(self):
        x = pt.matrix("x")
        outs = pt.split(x, [1, 1], 2, axis=0)
        f = ptt.function([x], list(outs), mode="FAST_COMPILE")
        with pytest.raises(ValueError):
            f(fx(4, 6))

    def test_split_grad(self):
        def op(x):
            a, b = pt.split(x, [2, 2], 2, axis=0)
            return pt.sum(a ** 2) + pt.sum(b ** 3)
        verify_grad(op, [rng.standard_normal((4, 3))], rng=rng)

    def test_join_pickle_roundtrip(self):
        m1, m2 = pt.matrix("m1"), pt.matrix("m2")
        f = ptt.function([m1, m2], pt.join(0, m1, m2), mode="FAST_RUN")
        f2 = pickle.loads(pickle.dumps(f))
        av, bv = fx(2, 3), fx(1, 3)
        np.testing.assert_allclose(np.asarray(f2(av, bv)),
                                   np.concatenate([av, bv]))

    def test_roll(self):
        x = pt.matrix("x")
        val = fx(3, 4)
        for shift, axis in [(1, 0), (-2, 1), (5, 0), (0, 1), (7, None),
                            (-9, None)]:
            out = pt.roll(x, shift, axis=axis)
            f = ptt.function([x], out, mode="FAST_RUN")
            np.testing.assert_allclose(np.asarray(f(val)),
                                       np.roll(val, shift, axis=axis))


# ---------------------------------------------------------------------------
# TensorFromScalar / ScalarFromTensor (reference test_TensorFromScalar etc.)
# ---------------------------------------------------------------------------

def test_tensor_scalar_roundtrip():
    from pytensor_tpu.tensor.basic import scalar_from_tensor, tensor_from_scalar

    s = pt.scalar("s")
    ss = scalar_from_tensor(s)
    back = tensor_from_scalar(ss) if not isinstance(ss, type(s)) else ss
    f = ptt.function([s], back, mode="FAST_COMPILE")
    assert float(np.asarray(f(3.5))) == 3.5


def test_bool_scalar_from_tensor():
    from pytensor_tpu.tensor.basic import scalar_from_tensor

    b = pt.scalar(dtype="bool")
    out = scalar_from_tensor(b)
    f = ptt.function([b], pt.as_tensor_variable(out), mode="FAST_COMPILE")
    assert bool(np.asarray(f(True)))


# ---------------------------------------------------------------------------
# dimshuffle / flatten / is_flat (reference test_dimshuffle*, test_flatten*)
# ---------------------------------------------------------------------------

class TestDimshuffleFlatten:
    def test_dimshuffle(self):
        x = pt.tensor3("x")
        val = fx(2, 3, 4)
        for pattern, exp in [
            ((2, 0, 1), val.transpose(2, 0, 1)),
            ((1, 2, 0), val.transpose(1, 2, 0)),
            (("x", 0, 1, 2), val[None]),
            ((0, 1, 2, "x"), val[..., None]),
        ]:
            out = x.dimshuffle(*pattern)
            f = ptt.function([x], out, mode="FAST_RUN")
            np.testing.assert_allclose(np.asarray(f(val)), exp)

    def test_dimshuffle_duplicate_raises(self):
        x = pt.vector("x")
        with pytest.raises(ValueError):
            x.dimshuffle((0, 0))

    def test_flatten_default(self):
        x = pt.matrix("x")
        val = fx(3, 4)
        f = ptt.function([x], pt.flatten(x), mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f(val)), val.flatten())

    def test_flatten_scalar(self):
        s = pt.scalar("s")
        out = pt.flatten(s)
        assert out.type.ndim == 1
        f = ptt.function([s], out, mode="FAST_COMPILE")
        np.testing.assert_array_equal(np.asarray(f(3.0)), [3.0])

    def test_flatten_ndim2_of_3(self):
        x = pt.tensor3("x")
        val = fx(2, 3, 4)
        out = pt.flatten(x, ndim=2)
        assert out.type.ndim == 2
        f = ptt.function([x], out, mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f(val)), val.reshape(2, 12))

    def test_flatten_ndim_same(self):
        x = pt.matrix("x")
        out = pt.flatten(x, ndim=2)
        val = fx(3, 4)
        f = ptt.function([x], out, mode="FAST_COMPILE")
        np.testing.assert_allclose(np.asarray(f(val)), val)

    def test_flatten_keeps_static_lead(self):
        x = pt.tensor(dtype=floatX, shape=(1, None, 1))
        assert pt.flatten(x, ndim=2).type.shape[0] == 1

    def test_flatten_invalid_ndim(self):
        x = pt.matrix("x")
        with pytest.raises(ValueError):
            pt.flatten(x, ndim=3)
        with pytest.raises(ValueError):
            pt.flatten(x, ndim=0)

    def test_is_flat(self):
        from pytensor_tpu.tensor.basic import is_flat

        assert is_flat(pt.vector())
        assert not is_flat(pt.matrix())
        assert is_flat(pt.tensor3(), ndim=3)

    def test_flatten_grad(self):
        verify_grad(lambda x: pt.sum(pt.flatten(x) ** 2),
                    [rng.standard_normal((3, 4))], rng=rng)


# ---------------------------------------------------------------------------
# tile (reference TestTile)
# ---------------------------------------------------------------------------

class TestTile:
    @pytest.mark.parametrize("shape,reps", [
        ((3,), (2,)), ((2, 3), (2, 1)), ((2, 3), (1, 3)),
        ((2, 3), (2, 3)), ((2, 3), (2, 3, 4)), ((2, 3, 4), (2, 1, 3)),
        ((3,), 3),
    ])
    def test_values(self, shape, reps):
        x = pt.tensor(dtype=floatX, shape=(None,) * len(shape))
        val = fx(*shape)
        f = ptt.function([x], pt.tile(x, reps), mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f(val)), np.tile(val, reps))

    def test_error_non_integer_reps(self):
        x = pt.vector("x")
        with pytest.raises((TypeError, ValueError)):
            pt.tile(x, 2.5)
        with pytest.raises((TypeError, ValueError)):
            pt.tile(x, (2.5,))

    def test_error_unknown_reps_length(self):
        x = pt.vector("x")
        r = pt.lvector("r")
        with pytest.raises((ValueError, TypeError, NotImplementedError)):
            pt.tile(x, r)

    def test_tile_grad(self):
        verify_grad(lambda x: pt.sum(pt.tile(x, (2, 3)) ** 2),
                    [rng.standard_normal((2, 2))], rng=rng)


# ---------------------------------------------------------------------------
# mgrid / ogrid (reference TestNdGrid)
# ---------------------------------------------------------------------------

def test_mgrid_ogrid_numpy_equiv():
    specs = [
        (slice(0, 4), slice(0, 3)),
        (slice(1, 10, 2), slice(0, 6, 3)),
    ]
    for spec in specs:
        sym = pt.mgrid[spec]
        ref = np.mgrid[spec]
        for s, r in zip(sym, ref):
            f = ptt.function([], s, mode="FAST_COMPILE")
            np.testing.assert_array_equal(np.asarray(f()), r)
        sym_o = pt.ogrid[spec]
        ref_o = np.ogrid[spec]
        for s, r in zip(sym_o, ref_o):
            f = ptt.function([], s, mode="FAST_COMPILE")
            np.testing.assert_array_equal(np.asarray(f()), r)


# ---------------------------------------------------------------------------
# inverse_permutation / permute_row_elements (reference TestInversePermutation
# and TestPermuteRowElements)
# ---------------------------------------------------------------------------

class TestPermutations:
    def test_inverse_dim1(self):
        p = pt.lvector("p")
        inv = pt.inverse_permutation(p)
        f = ptt.function([p], inv, mode="FAST_COMPILE")
        perm = rng.permutation(10)
        got = np.asarray(f(perm))
        np.testing.assert_array_equal(perm[got], np.arange(10))

    def test_inverse_dim2(self):
        p = pt.lmatrix("p")
        inv = pt.inverse_permutation(p)
        f = ptt.function([p], inv, mode="FAST_COMPILE")
        perms = np.stack([rng.permutation(7) for _ in range(3)])
        got = np.asarray(f(perms))
        for row_p, row_i in zip(perms, got):
            np.testing.assert_array_equal(row_p[row_i], np.arange(7))

    def test_permute_1_1(self):
        v = pt.vector("v")
        p = pt.lvector("p")
        out = pt.permute_row_elements(v, p)
        f = ptt.function([v, p], out, mode="FAST_COMPILE")
        val, perm = fx(5), rng.permutation(5)
        np.testing.assert_allclose(np.asarray(f(val, perm)), val[perm])

    def test_permute_2_1(self):
        m = pt.matrix("m")
        p = pt.lvector("p")
        out = pt.permute_row_elements(m, p)
        f = ptt.function([m, p], out, mode="FAST_COMPILE")
        val, perm = fx(3, 5), rng.permutation(5)
        exp = np.stack([row[perm] for row in val])
        np.testing.assert_allclose(np.asarray(f(val, perm)), exp)

    def test_permute_2_2(self):
        m = pt.matrix("m")
        p = pt.lmatrix("p")
        out = pt.permute_row_elements(m, p)
        f = ptt.function([m, p], out, mode="FAST_COMPILE")
        val = fx(3, 5)
        perms = np.stack([rng.permutation(5) for _ in range(3)])
        exp = np.stack([row[pr] for row, pr in zip(val, perms)])
        np.testing.assert_allclose(np.asarray(f(val, perms)), exp)

    def test_permute_grad(self):
        perm = rng.permutation(5)

        def op(x):
            return pt.sum(pt.permute_row_elements(x, perm) ** 2)
        verify_grad(op, [rng.standard_normal(5)], rng=rng)


# ---------------------------------------------------------------------------
# autocast (reference test_autocast_custom / test_autocast_numpy)
# ---------------------------------------------------------------------------

class TestAutocast:
    def test_autocast_custom(self):
        from pytensor_tpu.scalar.compatnames import autocast_float_as

        orig = ptt.config.cast_policy
        if orig != "custom":
            pytest.skip("cast policy not custom")
        assert pt.constant(1.1).dtype == floatX
        with autocast_float_as("float32"):
            assert pt.constant(1.1).dtype == "float32"
        with autocast_float_as("float64"):
            assert pt.constant(1.1).dtype == "float64"
        # int literals pick the smallest fitting dtype chain ending int64
        assert pt.constant(1).dtype in ("int8", "int64")
        assert pt.constant(2 ** 40).dtype == "int64"

    def test_python_float_addition_keeps_floatX(self):
        x = pt.vector(dtype="float32")
        assert (x + 1.1).dtype == "float32"
        assert (x + np.float64(1.1)).dtype == "float64"


# ---------------------------------------------------------------------------
# get_underlying_scalar_constant_value
# ---------------------------------------------------------------------------

class TestGetUnderlyingScalarConstantValue:
    def _g(self, x):
        from pytensor_tpu.tensor.basic import get_underlying_scalar_constant_value
        return get_underlying_scalar_constant_value(x)

    def test_basic(self):
        assert self._g(pt.constant(3)) == 3
        assert self._g(pt.constant(3) + pt.constant(4)) == 7

    def test_dimshuffle(self):
        c = pt.constant(3)
        assert self._g(c.dimshuffle("x")) == 3

    def test_subtensor_of_constant(self):
        c = pt.constant(np.arange(5))
        assert self._g(c[2]) == 2

    def test_make_vector_index(self):
        v = pt.make_vector(pt.constant(1), pt.constant(7), pt.constant(3))
        assert self._g(v[1]) == 7

    def test_shape_i(self):
        x = pt.tensor(dtype=floatX, shape=(None, 4))
        assert self._g(x.shape[1]) == 4

    def test_second(self):
        x = pt.matrix("x")
        assert self._g(pt.second(x, pt.constant(5.0))) == 5.0

    def test_not_constant_raises(self):
        from pytensor_tpu.tensor.exceptions import NotScalarConstantError
        with pytest.raises(NotScalarConstantError):
            self._g(pt.scalar("s"))


# ---------------------------------------------------------------------------
# size (reference TestSize)
# ---------------------------------------------------------------------------

def test_size():
    x = pt.matrix("x")
    f = ptt.function([x], x.size, mode="FAST_COMPILE")
    assert int(np.asarray(f(fx(3, 4)))) == 12
    s = pt.scalar("s")
    f2 = ptt.function([s], s.size, mode="FAST_COMPILE")
    assert int(np.asarray(f2(1.0))) == 1


# ---------------------------------------------------------------------------
# diag / diagonal / ExtractDiag / AllocDiag (reference TestDiag etc.)
# ---------------------------------------------------------------------------

class TestDiagFamily:
    @pytest.mark.parametrize("offset", [-2, -1, 0, 1, 2])
    def test_diag_vector_to_matrix(self, offset):
        v = pt.vector("v")
        val = fx(4)
        f = ptt.function([v], pt.diag(v, offset), mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f(val)), np.diag(val, offset))

    @pytest.mark.parametrize("offset", [-2, 0, 1])
    def test_diag_matrix_to_vector(self, offset):
        m = pt.matrix("m")
        val = fx(4, 5)
        f = ptt.function([m], pt.diag(m, offset), mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f(val)), np.diag(val, offset))

    def test_diag_preserves_nonfinite(self):
        v = pt.tensor(dtype="float64", shape=(None,))
        val = np.array([np.inf, 1.0, np.nan])
        f = ptt.function([v], pt.diag(v), mode="FAST_RUN")
        np.testing.assert_array_equal(np.asarray(f(val)), np.diag(val))

    @pytest.mark.parametrize("offset,axis1,axis2", [
        (0, 0, 1), (1, 0, 1), (-1, 0, 1), (0, 1, 0),
        (0, 0, 2), (1, 2, 0), (-2, 1, 2),
    ])
    def test_diagonal_3d(self, offset, axis1, axis2):
        x = pt.tensor3("x")
        val = fx(3, 4, 5)
        f = ptt.function([x], pt.diagonal(x, offset, axis1, axis2),
                         mode="FAST_RUN")
        np.testing.assert_allclose(
            np.asarray(f(val)), np.diagonal(val, offset, axis1, axis2))

    def test_diagonal_negative_axis(self):
        x = pt.tensor3("x")
        val = fx(3, 4, 5)
        f = ptt.function([x], pt.diagonal(x, 0, -2, -1), mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f(val)),
                                   np.diagonal(val, 0, -2, -1))

    @pytest.mark.parametrize("offset,axis1,axis2", [
        (0, 0, 1), (1, 0, 1), (-1, 1, 0),
    ])
    def test_extract_diag_grad(self, offset, axis1, axis2):
        def op(x):
            return pt.sum(pt.diagonal(x, offset, axis1, axis2) ** 2)
        verify_grad(op, [rng.standard_normal((4, 4))], rng=rng)

    def test_alloc_diag_values(self):
        from pytensor_tpu.tensor.basic import alloc_diag

        val = fx(4)
        for offset, axis1, axis2 in [(0, 0, 1), (1, 0, 1), (-1, 0, 1)]:
            v = pt.vector("v")
            f = ptt.function([v], alloc_diag(v, offset, axis1, axis2),
                             mode="FAST_RUN")
            got = np.asarray(f(val))
            exp = np.diag(val, offset)
            np.testing.assert_allclose(got, exp)

    def test_alloc_diag_grad(self):
        verify_grad(lambda x: pt.sum(pt.diag(x) ** 2),
                    [rng.standard_normal(4)], rng=rng)

    def test_diag_invalid_input_ndim(self):
        with pytest.raises((TypeError, ValueError)):
            pt.diag(pt.tensor4("x"))

    def test_trace(self):
        x = pt.matrix("x")
        val = fx(4, 4)
        f = ptt.function([x], pt.trace(x), mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f(val)), np.trace(val))


# ---------------------------------------------------------------------------
# transpose family (reference test_transpose / swapaxes / moveaxis)
# ---------------------------------------------------------------------------

class TestTransposeFamily:
    def test_transpose(self):
        x = pt.tensor3("x")
        val = fx(2, 3, 4)
        f = ptt.function([x], pt.transpose(x), mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f(val)), val.T)
        f2 = ptt.function([x], pt.transpose(x, (1, 0, 2)), mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f2(val)), val.transpose(1, 0, 2))

    def test_matrix_transpose(self):
        x = pt.tensor3("x")
        val = fx(2, 3, 4)
        f = ptt.function([x], pt.matrix_transpose(x), mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f(val)), np.swapaxes(val, -1, -2))
        with pytest.raises(ValueError):
            pt.matrix_transpose(pt.vector("v"))

    def test_swapaxes(self):
        x = pt.tensor3("x")
        val = fx(2, 3, 4)
        for a1, a2 in [(0, 1), (0, 2), (1, 2), (-1, 0)]:
            f = ptt.function([x], pt.swapaxes(x, a1, a2), mode="FAST_RUN")
            np.testing.assert_allclose(np.asarray(f(val)),
                                       np.swapaxes(val, a1, a2))
        # double swap is identity
        y = pt.swapaxes(pt.swapaxes(x, 0, 1), 0, 1)
        f = ptt.function([x], y, mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f(val)), val)

    def test_swapaxes_errors(self):
        with pytest.raises((ValueError, IndexError, TypeError)):
            pt.swapaxes(pt.scalar("s"), 0, 1)
        with pytest.raises((ValueError, IndexError)):
            pt.swapaxes(pt.matrix("m"), 0, 2)

    def test_moveaxis(self):
        x = pt.tensor3("x")
        val = fx(2, 3, 4)
        for src, dst in [(0, -1), ([0, 1], [1, 0]), (2, 0)]:
            f = ptt.function([x], pt.moveaxis(x, src, dst), mode="FAST_RUN")
            np.testing.assert_allclose(np.asarray(f(val)),
                                       np.moveaxis(val, src, dst))

    def test_moveaxis_error(self):
        with pytest.raises((ValueError, TypeError)):
            pt.moveaxis(pt.matrix("m"), [0, 1], [0])


# ---------------------------------------------------------------------------
# stacklists (reference test_stacklists)
# ---------------------------------------------------------------------------

def test_stacklists():
    a, b, c, d = (pt.scalar(n) for n in "abcd")
    x = pt.stacklists([[a, b], [c, d]])
    assert x.type.ndim == 2
    f = ptt.function([a, b, c, d], x, mode="FAST_COMPILE")
    np.testing.assert_array_equal(np.asarray(f(1., 2., 3., 4.)),
                                  [[1., 2.], [3., 4.]])
    m = pt.matrix("m")
    x2 = pt.stacklists([[m], [m]])
    f2 = ptt.function([m], x2, mode="FAST_COMPILE")
    val = fx(2, 2)
    assert np.asarray(f2(val)).shape == (2, 1, 2, 2)


# ---------------------------------------------------------------------------
# choose (reference TestChoose)
# ---------------------------------------------------------------------------

class TestChoose:
    def test_numpy_compare(self):
        a = pt.lvector("a")
        b = pt.matrix("b")
        av = np.array([2, 3, 1, 0])
        bv = fx(4, 4)
        f = ptt.function([a, b], pt.choose(a, b), mode="FAST_COMPILE")
        np.testing.assert_allclose(np.asarray(f(av, bv)), np.choose(av, bv))

    def test_method(self):
        a = pt.lvector("a")
        b = pt.matrix("b")
        out = a.choose(b)
        assert out.type.ndim == 1

    def test_numpy_compare_tuple(self):
        a = pt.lvector("a")
        b = pt.vector("b")
        c = pt.vector("c")
        av = np.array([0, 1, 0])
        bv, cv = fx(3), fx(3)
        f = ptt.function([a, b, c], pt.choose(a, (b, c)), mode="FAST_COMPILE")
        np.testing.assert_allclose(np.asarray(f(av, bv, cv)),
                                   np.choose(av, (bv, cv)))

    @pytest.mark.parametrize("mode", ["clip", "wrap"])
    def test_modes(self, mode):
        a = pt.lvector("a")
        b = pt.matrix("b")
        av = np.array([5, -3, 1, 0])
        bv = fx(4, 4)
        f = ptt.function([a, b], pt.choose(a, b, mode=mode),
                         mode="FAST_COMPILE")
        np.testing.assert_allclose(np.asarray(f(av, bv)),
                                   np.choose(av, bv, mode=mode))

    def test_dtype_error(self):
        a = pt.vector("a")  # float indices
        b = pt.matrix("b")
        with pytest.raises(TypeError):
            pt.choose(a, b)


# ---------------------------------------------------------------------------
# empty / identity_like / atleast / expand_dims
# ---------------------------------------------------------------------------

def test_empty():
    f = ptt.function([], pt.empty((2, 3), dtype="float64"),
                     mode="FAST_COMPILE")
    got = np.asarray(f())
    assert got.shape == (2, 3) and got.dtype == np.dtype("float64")


def test_identity_like_dtype():
    m = pt.matrix("m")
    out = pt.identity_like(m)
    assert out.dtype == m.dtype
    out2 = pt.identity_like(m, dtype="int8")
    assert out2.dtype == "int8"
    f = ptt.function([m], out, mode="FAST_RUN")
    np.testing.assert_array_equal(np.asarray(f(fx(3, 3))),
                                  np.eye(3, dtype=floatX))


def test_atleast_Nd():
    s = pt.scalar("s")
    v = pt.vector("v")
    m = pt.matrix("m")
    assert pt.atleast_1d(s).type.ndim == 1
    assert pt.atleast_2d(s).type.ndim == 2
    assert pt.atleast_3d(s).type.ndim == 3
    assert pt.atleast_2d(v).type.ndim == 2
    assert pt.atleast_3d(m).type.ndim == 3
    # numpy value parity
    f = ptt.function([v], pt.atleast_2d(v), mode="FAST_COMPILE")
    val = fx(4)
    np.testing.assert_allclose(np.asarray(f(val)), np.atleast_2d(val))
    # list form returns a list
    outs = pt.atleast_1d(s, v)
    assert isinstance(outs, (list, tuple)) and len(outs) == 2


def test_expand_dims():
    v = pt.vector("v")
    val = fx(5)
    for axis in [0, 1, -1, (0, 1), (0, -1)]:
        f = ptt.function([v], pt.expand_dims(v, axis), mode="FAST_COMPILE")
        np.testing.assert_allclose(np.asarray(f(val)),
                                   np.expand_dims(val, axis))


# ---------------------------------------------------------------------------
# take_along_axis (reference TestTakeAlongAxis)
# ---------------------------------------------------------------------------

class TestTakeAlongAxis:
    @pytest.mark.parametrize("shape,axis", [
        ((5,), 0), ((3, 4), 0), ((3, 4), 1), ((3, 4), -1), ((2, 3, 4), 2),
    ])
    def test_values(self, shape, axis):
        x = pt.tensor(dtype=floatX, shape=(None,) * len(shape))
        ind_shape = list(shape)
        ind_shape[axis] = 2
        indices = rng.integers(0, shape[axis], size=tuple(ind_shape))
        i = pt.tensor(dtype="int64", shape=(None,) * len(shape))
        f = ptt.function([x, i], pt.take_along_axis(x, i, axis=axis),
                         mode="FAST_RUN")
        val = fx(*shape)
        np.testing.assert_allclose(np.asarray(f(val, indices)),
                                   np.take_along_axis(val, indices, axis=axis))

    def test_ndim_dtype_failures(self):
        x = pt.matrix("x")
        with pytest.raises((TypeError, ValueError)):
            pt.take_along_axis(x, pt.vector(dtype="int64"), axis=0)
        with pytest.raises((TypeError, IndexError)):
            pt.take_along_axis(x, pt.matrix(), axis=0)  # float indices


# ---------------------------------------------------------------------------
# full_like / *_stack / where (reference tail tests)
# ---------------------------------------------------------------------------

def test_full_like():
    x = pt.matrix("x")
    val = fx(2, 3)
    f = ptt.function([x], pt.full_like(x, 5.0), mode="FAST_COMPILE")
    np.testing.assert_array_equal(np.asarray(f(val)),
                                  np.full_like(val, 5.0))


@pytest.mark.parametrize("fn", [pt.horizontal_stack, pt.vertical_stack])
def test_oriented_stack_functions_errors(fn):
    # the reference deliberately restricts these to >=2 matrix args
    # (tensor/basic.py:2898 comment re numpy hstack/vstack incoherence)
    with pytest.raises(ValueError):
        fn()
    a = pt.tensor3("a")
    with pytest.raises(ValueError):
        fn(a, a)


def test_where():
    c = pt.matrix("c")
    a, b = pt.matrix("a"), pt.matrix("b")
    cond = (rng.random((3, 3)) > 0.5).astype(floatX)
    av, bv = fx(3, 3), fx(3, 3)
    # 3-arg where == switch
    f = ptt.function([c, a, b], pt.where(c, a, b), mode="FAST_RUN")
    np.testing.assert_allclose(np.asarray(f(cond, av, bv)),
                               np.where(cond > 0, av, bv))
    # 1-arg where == nonzero
    f1 = ptt.function([c], list(pt.where(c)), mode="FAST_COMPILE")
    got = f1(cond)
    exp = np.where(cond)
    for g, e in zip(got, exp):
        np.testing.assert_array_equal(np.asarray(g), e)
    with pytest.raises(ValueError):
        pt.where(c, a)


# ---------------------------------------------------------------------------
# vectorize over ctor ops (reference test_vectorize_*)
# ---------------------------------------------------------------------------

class TestVectorizeCtors:
    def test_vectorize_extract_diag(self):
        fn = pt.vectorize(lambda x: pt.diagonal(x), signature="(m,m)->(m)")
        x = pt.tensor3("x")
        out = fn(x)
        f = ptt.function([x], out, mode="FAST_RUN")
        val = fx(3, 4, 4)
        exp = np.stack([np.diagonal(v) for v in val])
        np.testing.assert_allclose(np.asarray(f(val)), exp)

    def test_vectorize_join(self):
        fn = pt.vectorize(lambda a, b: pt.join(0, a, b),
                          signature="(m),(n)->(k)")
        a, b = pt.matrix("a"), pt.matrix("b")
        out = fn(a, b)
        f = ptt.function([a, b], out, mode="FAST_RUN")
        av, bv = fx(3, 2), fx(3, 4)
        exp = np.concatenate([av, bv], axis=1)
        np.testing.assert_allclose(np.asarray(f(av, bv)), exp)


# ---------------------------------------------------------------------------
# dual-compile spot checks for the ctor family (XLA vs oracle)
# ---------------------------------------------------------------------------

def test_ctor_family_dualcheck():
    x = pt.matrix("x")
    v = pt.vector("v")
    val_m, val_v = fx(4, 4), fx(4)
    compare_xla_and_py(
        [x, v],
        [pt.tril(x, -1) + pt.triu(x, 1), pt.diag(v, 1), pt.diagonal(x),
         pt.roll(x, 2, axis=0), pt.join(0, x, x), pt.tile(v, (3, 2)),
         pt.flatten(x), pt.swapaxes(x, 0, 1)],
        [val_m, val_v],
    )
