"""Softmax-family + subtensor-lift long-tail rewrites (reference
tensor/rewriting/special.py, subtensor_lift.py:351,610)."""

import numpy as np

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.tensor.special import log_softmax, softmax


def _ops(f):
    return [type(n.op).__name__ for n in f.fgraph.toposort()]


def _softmax_np(v, axis):
    e = np.exp(v - v.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


class TestLogSoftmax:
    def test_log_softmax_stabilized(self):
        x = pt.dmatrix("x")
        f = ptt.function([x], pt.log(softmax(x, axis=1)))
        assert "LogSoftmax" in _ops(f)
        v = np.random.default_rng(0).standard_normal((3, 4)) * 200
        out = np.asarray(f(v))
        assert np.isfinite(out).all()  # naive log(softmax) underflows
        np.testing.assert_allclose(out, np.log(_softmax_np(v, 1)) if
                                   np.isfinite(np.log(_softmax_np(v, 1))).all()
                                   else out)

    def test_shared_softmax_not_rewritten(self):
        x = pt.dmatrix("x")
        sm = softmax(x, axis=1)
        f = ptt.function([x], [pt.log(sm), sm])
        assert "Softmax" in _ops(f)  # value needed elsewhere: kept

    def test_exp_log_softmax(self):
        x = pt.dmatrix("x")
        f = ptt.function([x], pt.exp(log_softmax(x, axis=1)))
        assert "Softmax" in _ops(f) and "LogSoftmax" not in _ops(f)
        v = np.random.default_rng(1).standard_normal((2, 5))
        np.testing.assert_allclose(np.asarray(f(v)), _softmax_np(v, 1),
                                   rtol=1e-12)


class TestSubtensorOfSoftmax:
    def test_row_index_lifts(self):
        x = pt.dmatrix("x")
        f = ptt.function([x], softmax(x, axis=1)[2])
        order = _ops(f)
        assert order.index("Subtensor") < order.index("Softmax")
        v = np.random.default_rng(2).standard_normal((5, 4))
        np.testing.assert_allclose(np.asarray(f(v)),
                                   _softmax_np(v, 1)[2], rtol=1e-12)

    def test_slice_lifts(self):
        x = pt.dmatrix("x")
        f = ptt.function([x], log_softmax(x, axis=1)[1:3])
        order = _ops(f)
        assert order.index("Subtensor") < order.index("LogSoftmax")
        v = np.random.default_rng(3).standard_normal((5, 4))
        np.testing.assert_allclose(np.asarray(f(v)),
                                   np.log(_softmax_np(v, 1))[1:3],
                                   rtol=1e-10)

    def test_axis_index_not_lifted(self):
        x = pt.dmatrix("x")
        f = ptt.function([x], softmax(x, axis=0)[2])
        # index touches the softmax axis: must NOT lift
        v = np.random.default_rng(4).standard_normal((5, 4))
        np.testing.assert_allclose(np.asarray(f(v)),
                                   _softmax_np(v, 0)[2], rtol=1e-12)


class TestAdvSubtensorOfDot:
    def test_rows_of_dot(self):
        A = pt.dmatrix("A")
        B = pt.dmatrix("B")
        idx = pt.tensor("i", dtype="int64", shape=(None,))
        f = ptt.function([A, B, idx], pt.dot(A, B)[idx])
        order = _ops(f)
        assert order.index("AdvancedSubtensor1") < order.index("Dot")
        rng = np.random.default_rng(5)
        Av, Bv = rng.standard_normal((6, 4)), rng.standard_normal((4, 5))
        iv = np.array([5, 0, 0, 2])
        np.testing.assert_allclose(np.asarray(f(Av, Bv, iv)),
                                   (Av @ Bv)[iv], rtol=1e-12)

    def test_shared_dot_not_lifted(self):
        A = pt.dmatrix("A")
        B = pt.dmatrix("B")
        idx = pt.tensor("i", dtype="int64", shape=(None,))
        d = pt.dot(A, B)
        f = ptt.function([A, B, idx], [d[idx], d.sum()])
        order = _ops(f)
        assert order.index("Dot") < order.index("AdvancedSubtensor1")