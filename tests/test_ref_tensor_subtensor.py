"""Port of the semantics audited by the reference's tests/tensor/
test_subtensor.py (3,303 LoC): basic slicing grids, error behavior,
inc/set_subtensor (basic + advanced), duplicate-index accumulation,
ignore_duplicates, advanced static shapes, mixed boolean indexing,
take, and gradients through every indexing family.

Known divergence kept explicit: runtime out-of-bounds indices raise on
the oracle (numpy) but clamp under XLA (graph-build rejects static OOB).
"""

from __future__ import annotations

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.gradient import grad, verify_grad
from pytensor_tpu.tensor.basic import constant
from pytensor_tpu.tensor.subtensor import (
    AdvancedIncSubtensor,
    AdvancedIncSubtensor1,
    AdvancedSubtensor,
    AdvancedSubtensor1,
    IncSubtensor,
    Subtensor,
    inc_subtensor,
    set_subtensor,
    take,
)
from pytensor_tpu.tensor.type import TensorType

floatX = ptt.config.floatX
rng = np.random.default_rng(20260819)


def fx(*shape):
    return rng.standard_normal(shape).astype(floatX)


def run(inputs, out, *vals, mode="FAST_COMPILE"):
    return np.asarray(ptt.function(inputs, out, mode=mode)(*vals))


def run_both(inputs, out, *vals):
    a = run(inputs, out, *vals, mode="FAST_COMPILE")
    b = run(inputs, out, *vals, mode="FAST_RUN")
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8)
    return a


# ---------------------------------------------------------------------------
# basic slicing (reference TestSubtensor)
# ---------------------------------------------------------------------------

class TestBasicSlicing:
    @pytest.mark.parametrize(
        "sl",
        [slice(None), slice(1, None), slice(None, 4), slice(1, 4),
         slice(None, None, 2), slice(None, None, -1), slice(4, 1, -1),
         slice(-3, -1), slice(-1, None, -2), slice(10, None), slice(None, 0)],
    )
    def test_vector_slices(self, sl):
        data = np.arange(6, dtype=floatX)
        x = pt.vector("x")
        got = run_both([x], x[sl], data)
        np.testing.assert_array_equal(got, data[sl])

    def test_matrix_mixed(self):
        data = fx(4, 5)
        x = pt.matrix("x")
        for idx in [(1,), (1, 2), (slice(None), 2), (1, slice(1, 4)),
                    (slice(0, 3, 2), slice(None, None, -1)),
                    (Ellipsis, 2), (1, Ellipsis), (None, 1), (1, None, 2)]:
            got = run_both([x], x[idx], data)
            np.testing.assert_array_equal(got, data[idx])

    def test_0d_index_errors(self):
        x = pt.scalar("x")
        with pytest.raises(IndexError):
            x[0]

    def test_static_oob_rejected_at_build(self):
        x = pt.tensor("x", shape=(3, 4))
        with pytest.raises(IndexError):
            x[5]
        with pytest.raises(IndexError):
            x[-4]
        x[2]  # fine
        x[-3]  # fine

    def test_runtime_oob_raises_on_oracle(self):
        x = pt.vector("x")
        i = pt.scalar("i", dtype="int64")
        f = ptt.function([x, i], x[i], mode="FAST_COMPILE")
        assert f(np.arange(3, dtype=floatX), 1) == 1
        with pytest.raises(IndexError):
            f(np.arange(3, dtype=floatX), 10)

    def test_too_many_indices(self):
        x = pt.matrix("x")
        with pytest.raises(IndexError):
            x[0, 0, 0]

    def test_slice_with_symbolic_bounds(self):
        data = fx(6)
        x = pt.vector("x")
        lo = pt.scalar("lo", dtype="int64")
        hi = pt.scalar("hi", dtype="int64")
        f = ptt.function([x, lo, hi], x[lo:hi], mode="FAST_COMPILE")
        np.testing.assert_array_equal(np.asarray(f(data, 1, 4)), data[1:4])
        np.testing.assert_array_equal(np.asarray(f(data, 0, 6)), data[0:6])

    def test_slice_shape_computes_without_indexing(self):
        # shape-of-slice should not need the data values
        var = ptt.shared(np.zeros([3, 3], dtype=floatX))
        start, stop = pt.scalar("start", dtype="int64"), pt.scalar("stop", dtype="int64")
        f = ptt.function([start, stop], var[start:stop].shape[0],
                         mode="FAST_COMPILE")
        assert np.asarray(f(1, 3)) == 2
        f1 = ptt.function([start, stop], var[start:stop].shape[1], mode="FAST_RUN")
        assert not any(isinstance(n.op, (AdvancedSubtensor, Subtensor))
                       for n in f1.maker.fgraph.toposort())
        assert np.asarray(f1(1, 3)) == 3

    def test_grad_1d(self):
        data = fx(6).astype("float64")
        verify_grad(lambda x: x[2:4], [data], rng=rng)
        verify_grad(lambda x: x[::-1], [data], rng=rng)
        verify_grad(lambda x: x[1:5:2], [data], rng=rng)

    def test_grad_0d(self):
        data = fx(3, 2).astype("float64")
        verify_grad(lambda x: x[1, 0], [data], rng=rng)


# ---------------------------------------------------------------------------
# list/vector advanced indexing (reference test_ok_list etc.)
# ---------------------------------------------------------------------------

class TestAdvanced1:
    def test_list_index_values(self):
        for data, idx in [
            (fx(5), [0, 4, 1, 0]),
            (fx(4, 5), [2, 3, 0]),
            (fx(2, 3, 4), [1, 0, 1, 1]),
        ]:
            x = pt.tensor(dtype=floatX, shape=(None,) * data.ndim)
            got = run_both([x], x[idx], data)
            np.testing.assert_array_equal(got, data[idx])

    def test_noncontiguous_idx(self):
        data = fx(5)
        x = pt.vector("x")
        idx = pt.vector("idx", dtype="int64")
        got = run_both([x, idx], x[idx], data, np.array([4, 2, 0]))
        np.testing.assert_array_equal(got, data[[4, 2, 0]])

    def test_err_invalid_list_dtype(self):
        x = pt.vector("x")
        with pytest.raises(TypeError):
            x[pt.vector("f", dtype=floatX)]

    def test_cant_adv_idx_into_scalar(self):
        s = pt.scalar("s")
        with pytest.raises(IndexError):
            s[pt.vector("i", dtype="int64")]

    def test_index_into_vec_w_vec_type(self):
        v = pt.vector("v", dtype="float32")
        q = pt.vector("q", dtype="int64")
        assert v[q].type.dtype == "float32"
        assert v[q].type.ndim == 1

    def test_index_into_vec_w_matrix(self):
        v = pt.vector("v")
        ix2 = pt.matrix("i", dtype="int64")
        a = v[ix2]
        assert a.dtype == v.dtype
        assert a.type.ndim == 2

    def test_grad_list(self):
        data = fx(5).astype("float64")
        verify_grad(lambda x: x[[0, 3, 1]], [data], rng=rng)
        data2 = fx(4, 3).astype("float64")
        verify_grad(lambda x: x[[1, 1, 2]], [data2], rng=rng)


# ---------------------------------------------------------------------------
# IncSubtensor (reference TestIncSubtensor)
# ---------------------------------------------------------------------------

class TestIncSubtensor:
    @pytest.mark.parametrize("do_set", [False, True])
    def test_simple_2d(self, do_set):
        a = pt.matrix("a", dtype="float64")
        increment = pt.scalar("inc", dtype="float64")
        sl2_end = pt.scalar("end", dtype="int64")
        base = a[:, :sl2_end]
        result = set_subtensor(base, increment) if do_set else inc_subtensor(base, increment)
        f = ptt.function([a, increment, sl2_end], result, mode="FAST_COMPILE")
        val_a = np.ones((5, 5))
        out = np.asarray(f(val_a, 2.3, 2))
        expected = val_a.copy()
        if do_set:
            expected[:, :2] = 2.3
        else:
            expected[:, :2] += 2.3
        np.testing.assert_allclose(out, expected)

    def test_set_full_slice_broadcast_zero(self):
        X = ptt.shared(np.ones((9, 9), dtype=floatX))
        y = set_subtensor(X[1:, 1:], 0)
        out = np.asarray(ptt.function([], y)())
        expected = np.ones((9, 9))
        expected[1:, 1:] = 0
        np.testing.assert_allclose(out, expected)

    def test_wrong_dims_raises(self):
        a = pt.matrix("a")
        increment = pt.matrix("i")
        with pytest.raises(TypeError):
            set_subtensor(a[0], increment)
        with pytest.raises(TypeError):
            inc_subtensor(a[0], increment)

    @pytest.mark.parametrize("method", [set_subtensor, inc_subtensor])
    def test_simple_3d(self, method):
        a = pt.tensor3("a", dtype="float64")
        increment = pt.scalar("inc", dtype="float64")
        end = pt.scalar("end", dtype="int64")
        val_a = np.ones((5, 3, 4))
        result = method(a[:, 2, :end], increment)
        out = np.asarray(
            ptt.function([a, increment, end], result, mode="FAST_COMPILE")(
                val_a, 2.3, 2))
        expected = val_a.copy()
        if method is set_subtensor:
            expected[:, 2, :2] = 2.3
        else:
            expected[:, 2, :2] += 2.3
        np.testing.assert_allclose(out, expected)

    @pytest.mark.parametrize("f_slice", ["inc", "set"])
    @pytest.mark.parametrize(
        "s,shapes",
        [
            ((slice(2, 4),), ((6,), (2,))),
            ((slice(1, 2), slice(None)), ((3, 2), (1, 2))),
            ((2, 1), ((3, 2), ())),
            ((2,), ((3, 2), ())),
            ((slice(None), slice(1, 3)), ((1, 6), (2,))),
        ],
    )
    def test_grad_inc_set(self, f_slice, s, shapes):
        def op(a, b):
            base = a[s]
            return (inc_subtensor(base, b) if f_slice == "inc"
                    else set_subtensor(base, b))

        a_val = rng.random(shapes[0])
        b_val = rng.random(shapes[1]) + 9
        verify_grad(op, [a_val, b_val], rng=rng)

    def test_grad_broadcastable_specialization(self):
        # x[1:].set(exp(x[1:])) then specify_shape: gradient must not fail
        from pytensor_tpu.tensor.shape import specify_shape

        x = pt.vector("x", dtype="float64")
        out = x.zeros_like()
        out = out[1:].set(pt.exp(x[1:]))
        out = specify_shape(out, 2)
        gx = grad(out.sum(), x)
        np.testing.assert_allclose(
            run([x], gx, np.array([1.0, 1.0])), [0, np.e])


# ---------------------------------------------------------------------------
# AdvancedIncSubtensor1 (reference TestAdvancedIncSubtensor1)
# ---------------------------------------------------------------------------

class TestAdvancedIncSubtensor1:
    def test_1d_set_selection(self):
        v = pt.vector("v", dtype="float64")
        q = pt.vector("q", dtype="int64")
        a = set_subtensor(v[q], v[q])
        out = run_both([v, q], a, np.array([0.4, 0.9, 0.1]), np.array([1, 2]))
        np.testing.assert_allclose(out, [0.4, 0.9, 0.1])

    def test_1d_inc_selection(self):
        v = pt.vector("v", dtype="float64")
        q = pt.vector("q", dtype="int64")
        a = inc_subtensor(v[q], v[q])
        out = run_both([v, q], a, np.array([0.4, 0.9, 0.1]), np.array([1, 2]))
        np.testing.assert_allclose(out, [0.4, 1.8, 0.2])

    def test_1d_inc_broadcast_scalar(self):
        v = pt.vector("v", dtype="float64")
        q = pt.vector("q", dtype="int64")
        a = inc_subtensor(v[q], 3.0)
        out = run_both([v, q], a, np.array([0.4, 0.9, 0.1]), np.array([1, 2]))
        np.testing.assert_allclose(out, [0.4, 3.9, 3.1])

    def test_duplicates_accumulate(self):
        v = pt.vector("v", dtype="float64")
        q = pt.vector("q", dtype="int64")
        a = inc_subtensor(v[q], 1.0)
        out = run_both([v, q], a, np.zeros(3), np.array([0, 0, 2, 0]))
        np.testing.assert_allclose(out, [3.0, 0.0, 1.0])

    def test_ignore_duplicates(self):
        v = pt.vector("v", dtype="float64")
        q = pt.vector("q", dtype="int64")
        a = inc_subtensor(v[q], 1.0, ignore_duplicates=True)
        assert a.owner.op.ignore_duplicates
        out = run_both([v, q], a, np.zeros(3), np.array([0, 0, 2, 0]))
        # buffered semantics: one write wins per duplicate index
        np.testing.assert_allclose(out, [1.0, 0.0, 1.0])

    def test_matrix_idx_accumulates(self):
        m = pt.matrix("m", dtype="float64")
        idx = pt.matrix("i", dtype="int64")
        a = m[idx]
        a2 = inc_subtensor(a, a)
        mval = rng.random((4, 10))
        idxval = np.array([[1, 2], [3, 2]])
        a2val = run_both([m, idx], a2, mval, idxval)
        np.testing.assert_allclose(a2val[0], mval[0])
        np.testing.assert_allclose(a2val[1], mval[1] * 2)
        np.testing.assert_allclose(a2val[2], mval[2] * 3)
        np.testing.assert_allclose(a2val[3], mval[3] * 2)

    def test_inc_bcastable_idx(self):
        m = pt.matrix("m", dtype="float64")
        idx = constant(np.array([0], dtype="int64"))
        c_inc = pt.tensor("c", shape=(None, 1), dtype="float64")
        m_inc = pt.matrix("mi", dtype="float64")
        out1 = inc_subtensor(m[:, idx], c_inc)
        out2 = inc_subtensor(m[:, idx], m_inc)
        mval = rng.random((10, 5))
        incval = rng.random((10, 1))
        o1 = run_both([m, c_inc], out1, mval, incval)
        o2 = run_both([m, m_inc], out2, mval, incval)
        np.testing.assert_allclose(o1, o2)

    def test_empty_index(self):
        x = pt.vector("x", dtype="float32")
        idx = constant(np.array([], dtype="int64"))
        y = idx.astype("float32")
        out = inc_subtensor(x[idx], y)
        test_x = np.array([1, 2, 3], dtype="float32")
        np.testing.assert_array_equal(run([x], out, test_x), test_x)

    def test_grad(self):
        data = rng.random((5, 5))
        verify_grad(lambda m: m[[1, 3], [2, 4]], [data], rng=rng)
        verify_grad(
            lambda x, y: inc_subtensor(x[[1, 3]], y),
            [data, rng.random((2, 5))], rng=rng)
        verify_grad(
            lambda x, y: set_subtensor(x[[1, 3]], y),
            [data, rng.random((2, 5))], rng=rng)


# ---------------------------------------------------------------------------
# AdvancedSubtensor / AdvancedIncSubtensor (reference TestAdvancedSubtensor)
# ---------------------------------------------------------------------------

class TestAdvancedSubtensor:
    def test_static_shape(self):
        from pytensor_tpu.tensor.shape import specify_shape

        x = pt.tensor("x", shape=(None, None))
        y = pt.tensor("y", shape=(4, 5, 6))
        idx1 = pt.tensor("idx1", shape=(10,), dtype="int64")
        idx2 = pt.tensor("idx2", shape=(3, None), dtype="int64")

        assert x[idx1].type.shape == (10, None)
        assert x[:, idx1].type.shape == (None, 10)
        assert x[None, :, idx1].type.shape == (1, None, 10)
        assert x[idx2, :5].type.shape == (3, None, None)
        assert specify_shape(x, (None, 7))[idx2, :5].type.shape == (3, None, 5)
        assert specify_shape(x, (None, 3))[idx2, :5].type.shape == (3, None, 3)
        assert x[idx1, idx2].type.shape == (3, 10)
        assert x[idx2, idx1].type.shape == (3, 10)
        assert x[None, idx1, idx2].type.shape == (1, 3, 10)
        assert x[idx1, None, idx2].type.shape == (3, 10, 1)
        assert x[idx1, idx2, None].type.shape == (3, 10, 1)
        assert y[idx1, idx2, ::-1].type.shape == (3, 10, 6)
        assert y[idx1, ::-1, idx2].type.shape == (3, 10, 5)
        assert y[::-1, idx1, idx2].type.shape == (4, 3, 10)
        assert y[::-1, idx1, None, idx2].type.shape == (3, 10, 4, 1)
        with pytest.raises(IndexError, match="could not be broadcast"):
            x[idx1, idx1[1:]]

    def test_static_shape_boolean(self):
        y = pt.tensor("y", shape=(4, 5, 6))
        idx1 = pt.tensor("idx1", shape=(4,), dtype="int64")
        idx2 = pt.tensor("idx2", shape=(3, None), dtype="int64")
        bool_idx1 = pt.tensor("b1", shape=(4,), dtype="bool")
        bool_idx2 = pt.tensor("b2", shape=(None, 5), dtype="bool")

        assert y[bool_idx1].type.shape == (None, 5, 6)
        assert y[bool_idx1, idx2].type.shape == (3, None, 6)
        assert y[bool_idx1, idx1, :].type.shape == (4, 6)
        assert y[bool_idx1, :, idx1].type.shape == (4, 5)
        assert y[bool_idx1, idx1, idx2].type.shape == (3, 4)
        assert y[None, bool_idx1, None, idx2, None, idx1].type.shape == (3, 4, 1, 1, 1)
        assert y[bool_idx2, :].type.shape == (None, 6)
        assert y[bool_idx2, idx1].type.shape == (4,)
        assert y[bool_idx2, idx2].type.shape == (3, None)
        with pytest.raises(IndexError, match="too many indices"):
            y[bool_idx2, bool_idx2]

    def test_static_shape_constant_boolean(self):
        y = pt.tensor("y", shape=(None, None, None))
        idx1 = pt.tensor("idx1", shape=(3,), dtype="int64")
        idx2 = pt.tensor("idx2", shape=(4, None), dtype="int64")
        bool_idx1 = constant(np.array([True, False, True, True]))
        bool_idx2 = constant(
            np.array([[True, False, True, True], [True, False, False, True]]))

        assert y[bool_idx1].type.shape == (3, None, None)
        assert y[bool_idx1, :, idx1].type.shape == (3, None)
        assert y[bool_idx1, :, idx2].type.shape == (4, 3, None)
        assert y[bool_idx2].type.shape == (5, None)
        assert y[bool_idx1, idx2].type.shape == (4, 3, None)

    def test_mixed_bool_runs_on_oracle(self):
        m = pt.matrix("m", dtype="float64")
        bm = pt.tensor("bm", shape=(None,), dtype="bool")
        mv = np.arange(12.0).reshape(3, 4)
        mask = np.array([True, False, True])
        np.testing.assert_array_equal(
            run([m, bm], m[bm, 0], mv, mask), mv[mask, 0])
        np.testing.assert_array_equal(
            run([m, bm], m[bm, 1:3], mv, mask), mv[mask, 1:3])

    @pytest.mark.parametrize(
        "key",
        ["int_mat", "none_mat", "slice_mat", "mat_int", "mat_none"],
    )
    def test_mixed_combos_4d(self, key):
        ft4 = pt.tensor("t", shape=(None,) * 4, dtype="float64")
        ix2 = pt.matrix("ix", dtype="int64")
        ft4v = rng.random((2, 3, 4, 5))
        ix2v = np.asarray([[0, 1], [1, 0]])
        exprs = {
            "int_mat": (ft4[0, :, ix2, :], ft4v[0, :, ix2v, :]),
            "none_mat": (ft4[:, None, :, ix2, :], ft4v[:, None, :, ix2v, :]),
            "slice_mat": (ft4[:, 0:1, ix2, :], ft4v[:, 0:1, ix2v, :]),
            "mat_int": (ft4[:, :, ix2, 0], ft4v[:, :, ix2v, 0]),
            "mat_none": (ft4[:, :, ix2, None, :], ft4v[:, :, ix2v, None, :]),
        }
        sym, expected = exprs[key]
        np.testing.assert_allclose(run_both([ft4, ix2], sym, ft4v, ix2v), expected)

    @pytest.mark.parametrize("ignore_duplicates", [True, False])
    def test_inc_w_2vec(self, ignore_duplicates):
        m = pt.matrix("m", dtype="float64")
        ix1 = pt.vector("i1", dtype="int64")
        ix12 = pt.vector("i2", dtype="int64")
        subt = m[ix1, ix12]
        a = inc_subtensor(subt, subt, ignore_duplicates=ignore_duplicates)
        m_val = np.array([[0.4, 0.9, 0.1], [5, 6, 7], [0.5, 0.3, 0.15]])
        ix1_val = np.array([1, 2, 1])
        ix2_val = np.array([0, 1, 0])
        exp = m_val.copy()
        if ignore_duplicates:
            exp[ix1_val, ix2_val] += exp[ix1_val, ix2_val]
        else:
            np.add.at(exp, (ix1_val, ix2_val), exp[ix1_val, ix2_val])
        out = run([m, ix1, ix12], a, m_val, ix1_val, ix2_val)
        np.testing.assert_allclose(out, exp)

    @pytest.mark.parametrize("ignore_duplicates", [True, False])
    def test_inc_with_scalar_broadcast_and_grad(self, ignore_duplicates):
        m = pt.matrix("m", dtype="float64")
        ix1 = pt.vector("i1", dtype="int64")
        ix12 = pt.vector("i2", dtype="int64")
        inc = pt.scalar("inc", dtype="float64")
        a = inc_subtensor(m[ix1, ix12], inc, ignore_duplicates=ignore_duplicates)
        g_inc = grad(a.sum(), inc)
        m_val = np.array([[0.4, 0.9, 0.1], [5, 6, 7], [0.5, 0.3, 0.15]])
        ix1_val = np.array([1, 2, 1])
        ix2_val = np.array([0, 1, 0])
        exp = m_val.copy()
        if ignore_duplicates:
            exp[ix1_val, ix2_val] += 2.1
        else:
            np.add.at(exp, (ix1_val, ix2_val), 2.1)
        f = ptt.function([m, ix1, ix12, inc], [a, g_inc], mode="FAST_COMPILE")
        aval, gval = f(m_val, ix1_val, ix2_val, 2.1)
        np.testing.assert_allclose(np.asarray(aval), exp)
        np.testing.assert_allclose(np.asarray(gval), 3.0)

    @pytest.mark.parametrize("ignore_duplicates", [True, False])
    def test_inc_adv1_with_scalar_broadcast_and_grad(self, ignore_duplicates):
        m = pt.matrix("m", dtype="float64")
        ix1 = pt.vector("i1", dtype="int64")
        inc = pt.scalar("inc", dtype="float64")
        a = inc_subtensor(m[ix1], inc, ignore_duplicates=ignore_duplicates)
        g_inc = grad(a.sum(), inc)
        m_val = np.array([[0.4, 0.9, 0.1], [5, 6, 7], [0.5, 0.3, 0.15]])
        ix1_val = np.array([0, 1, 0])
        exp = m_val.copy()
        if ignore_duplicates:
            exp[ix1_val] += 2.1
        else:
            np.add.at(exp, ix1_val, 2.1)
        f = ptt.function([m, ix1, inc], [a, g_inc], mode="FAST_COMPILE")
        aval, gval = f(m_val, ix1_val, 2.1)
        np.testing.assert_allclose(np.asarray(aval), exp)
        np.testing.assert_allclose(np.asarray(gval), 9.0)

    def test_inc_with_index_broadcasting(self):
        m = pt.matrix("m", dtype="float64")
        ix1 = pt.vector("i1", dtype="int64")
        ix2 = pt.matrix("i2", dtype="int64")
        a = inc_subtensor(m[ix1, ix2], 2.1)
        m_val = np.array([[0.4, 0.9, 0.1], [5, 6, 7], [0.5, 0.3, 0.15]])
        ix1_val = np.array([0, 2, 0])
        ix2_val = np.array([[0, 1, 0], [2, 2, 2]])
        exp = m_val.copy()
        np.add.at(exp, (ix1_val, ix2_val), 2.1)
        out = run([m, ix1, ix2], a, m_val, ix1_val, ix2_val)
        np.testing.assert_allclose(out, exp)

    def test_adv_sub_3d_cross_index(self):
        X = pt.tensor3("X", dtype="float64")
        xx = np.zeros((3, 2, 2))
        for i in range(3):
            for j in range(2):
                for k in range(2):
                    xx[i, j, k] = 100 * i + 10 * j + k
        b_idx = np.zeros((2, 2), "int32")
        b_idx[0, 1] = 1
        b_idx[1, 1] = 2
        r_idx = np.arange(2)[:, np.newaxis]
        c_idx = np.arange(2)[np.newaxis, :]
        out = run_both([X], X[b_idx, r_idx, c_idx], xx)
        np.testing.assert_allclose(out, xx[b_idx, r_idx, c_idx])

    def test_adv_grouped(self):
        var_v = rng.random((3, 63, 4))
        var = ptt.shared(var_v)
        idx1_v = rng.integers(0, 61, size=(5, 4)).astype("int64")
        idx1 = ptt.shared(idx1_v)
        idx2 = pt.arange(4)
        out = var[:, idx1, idx2]
        out_v = np.asarray(ptt.function([], out, mode="FAST_COMPILE")())
        assert out_v.shape == (3, 5, 4)
        np.testing.assert_allclose(out_v, var_v[:, idx1_v, np.arange(4)])

    def test_2d_3d_tensors_with_scalar_indices(self):
        a = rng.uniform(size=(3, 3))
        b = ptt.shared(a)
        i = pt.scalar("i", dtype="int64")
        j = pt.scalar("j", dtype="int64")
        z = b[pt.stack([i, j]), :]
        out = run([i, j], z, 0, 1)
        np.testing.assert_allclose(out, a[[0, 1], :])

    def test_grad_advanced_inc(self):
        def fun(x, y):
            return inc_subtensor(x[[1, 3], [2, 4]], y)

        verify_grad(fun, [rng.random((5, 5)), rng.random(2)], rng=rng)

        def fun2(x, y):
            return set_subtensor(x[[1, 3], [2, 4]], y)

        verify_grad(fun2, [rng.random((5, 5)), rng.random(2)], rng=rng)


# ---------------------------------------------------------------------------
# take (reference test_take_basic / test_take_cases)
# ---------------------------------------------------------------------------

class TestTake:
    def test_basic(self):
        x = pt.matrix("x", dtype="float64")
        data = fx(3, 4).astype("float64")
        idx = np.array([1, 0, 2])
        np.testing.assert_array_equal(
            run_both([x], take(x, idx, axis=0), data), np.take(data, idx, axis=0))
        np.testing.assert_array_equal(
            run_both([x], take(x, idx, axis=1), data), np.take(data, idx, axis=1))
        np.testing.assert_array_equal(
            run_both([x], take(x, idx), data), np.take(data, idx))

    @pytest.mark.parametrize("axis", [0, 1, -1, None])
    def test_matrix_index(self, axis):
        x = pt.matrix("x", dtype="float64")
        data = fx(3, 4).astype("float64")
        idx = np.array([[0, 1], [2, 0]])
        np.testing.assert_array_equal(
            run_both([x], take(x, idx, axis=axis), data),
            np.take(data, idx, axis=axis))

    @pytest.mark.parametrize("mode", ["clip", "wrap"])
    def test_modes(self, mode):
        x = pt.vector("x", dtype="float64")
        data = fx(4).astype("float64")
        idx = np.array([-6, 2, 7])
        np.testing.assert_array_equal(
            run_both([x], take(x, idx, mode=mode), data),
            np.take(data, idx, mode=mode))


# ---------------------------------------------------------------------------
# op identity (reference test_subtensor_hash_and_eq)
# ---------------------------------------------------------------------------

def test_subtensor_ops_hash_and_eq():
    assert Subtensor((("slice", 1, 3, None),)) == Subtensor((("slice", 1, 3, None),))
    assert hash(Subtensor((("slice", 1, 3, None),))) == hash(
        Subtensor((("slice", 1, 3, None),)))
    assert Subtensor((0,)) != Subtensor((1,))
    assert AdvancedIncSubtensor1(set_instead_of_inc=True) == AdvancedIncSubtensor1(
        set_instead_of_inc=True)
    assert AdvancedIncSubtensor1(ignore_duplicates=True) != AdvancedIncSubtensor1(
        ignore_duplicates=False)


def test_set_inc_methods_on_views():
    x = pt.vector("x", dtype="float64")
    data = np.array([1.0, 2.0, 3.0])
    np.testing.assert_array_equal(
        run([x], x[1:].set(0.0), data), [1.0, 0.0, 0.0])
    np.testing.assert_array_equal(
        run([x], x[1:].inc(10.0), data), [1.0, 12.0, 13.0])
