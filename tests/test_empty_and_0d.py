"""Empty-array and 0-d contract sweep.

Reference analog: the empty/0-d cases threaded through
tests/tensor/utils.py grids.  Degenerate shapes are where lowering
assumptions break (bartlett(1) div-by-zero was caught by exactly such a
case); this sweeps the major families over (0,)-, (0, k)- and 0-d
operands against numpy.
"""

from __future__ import annotations

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from tests.utils import compare_xla_and_py

E1 = np.zeros((0,))
E2 = np.zeros((0, 3))


class TestEmptyElemwise:
    @pytest.mark.parametrize("op,npf", [
        (pt.exp, np.exp), (pt.log1p, np.log1p), (pt.tanh, np.tanh),
        (pt.sqrt, np.sqrt), (pt.sigmoid, lambda v: 1 / (1 + np.exp(-v))),
    ])
    def test_unary_empty(self, op, npf):
        x = pt.tensor("x", dtype="float64", shape=(0,))
        res = compare_xla_and_py([x], op(x), [E1])
        assert np.asarray(res[0]).shape == (0,)

    def test_binary_empty_broadcast(self):
        a = pt.tensor("a", dtype="float64", shape=(0, 3))
        b = pt.tensor("b", dtype="float64", shape=(3,))
        res = compare_xla_and_py([a, b], a + b, [E2, np.ones(3)])
        assert np.asarray(res[0]).shape == (0, 3)


class TestEmptyReductions:
    def test_sum_prod_empty(self):
        x = pt.tensor("x", dtype="float64", shape=(0,))
        res = compare_xla_and_py([x], [pt.sum(x), pt.prod(x)], [E1])
        assert float(np.asarray(res[0])) == 0.0
        assert float(np.asarray(res[1])) == 1.0

    def test_sum_axis_of_empty_2d(self):
        x = pt.tensor("x", dtype="float64", shape=(0, 3))
        res = compare_xla_and_py([x], pt.sum(x, axis=0), [E2])
        np.testing.assert_array_equal(np.asarray(res[0]), np.zeros(3))
        y = pt.tensor("y", dtype="float64", shape=(0, 3))
        res = compare_xla_and_py([y], pt.sum(y, axis=1), [E2])
        assert np.asarray(res[0]).shape == (0,)

    def test_mean_empty_is_nan(self):
        x = pt.tensor("x", dtype="float64", shape=(0,))
        f = ptt.function([x], pt.mean(x))
        assert np.isnan(float(np.asarray(f(E1))))


class TestEmptyStructural:
    def test_concat_with_empty(self):
        a = pt.tensor("a", dtype="float64", shape=(0,))
        b = pt.tensor("b", dtype="float64", shape=(4,))
        bv = np.arange(4.0)
        res = compare_xla_and_py([a, b], pt.concatenate([a, b]), [E1, bv])
        np.testing.assert_array_equal(np.asarray(res[0]), bv)

    def test_reshape_empty(self):
        x = pt.tensor("x", dtype="float64", shape=(0, 3))
        res = compare_xla_and_py([x], x.reshape((3, 0)), [E2])
        assert np.asarray(res[0]).shape == (3, 0)

    def test_transpose_empty(self):
        x = pt.tensor("x", dtype="float64", shape=(0, 3))
        res = compare_xla_and_py([x], x.T, [E2])
        assert np.asarray(res[0]).shape == (3, 0)

    def test_subtensor_of_empty(self):
        x = pt.tensor("x", dtype="float64", shape=(0,))
        res = compare_xla_and_py([x], x[0:0], [E1])
        assert np.asarray(res[0]).shape == (0,)

    def test_join_empty_parts_only(self):
        a = pt.tensor("a", dtype="float64", shape=(0,))
        b = pt.tensor("b", dtype="float64", shape=(0,))
        res = compare_xla_and_py([a, b], pt.concatenate([a, b]), [E1, E1])
        assert np.asarray(res[0]).shape == (0,)

    def test_sort_argsort_empty(self):
        x = pt.tensor("x", dtype="float64", shape=(0,))
        res = compare_xla_and_py([x], [pt.sort(x), pt.argsort(x)], [E1])
        assert np.asarray(res[0]).shape == (0,)
        assert np.asarray(res[1]).shape == (0,)


class TestEmptyLinalgAndDot:
    def test_dot_zero_inner(self):
        a = pt.tensor("a", dtype="float64", shape=(3, 0))
        b = pt.tensor("b", dtype="float64", shape=(0, 4))
        res = compare_xla_and_py([a, b], pt.dot(a, b),
                                 [np.zeros((3, 0)), np.zeros((0, 4))])
        np.testing.assert_array_equal(np.asarray(res[0]), np.zeros((3, 4)))

    def test_dot_zero_outer(self):
        a = pt.tensor("a", dtype="float64", shape=(0, 3))
        b = pt.tensor("b", dtype="float64", shape=(3, 4))
        res = compare_xla_and_py([a, b], pt.dot(a, b),
                                 [np.zeros((0, 3)), np.ones((3, 4))])
        assert np.asarray(res[0]).shape == (0, 4)

    def test_matmul_batched_empty_batch(self):
        a = pt.tensor("a", dtype="float64", shape=(0, 3, 4))
        b = pt.tensor("b", dtype="float64", shape=(0, 4, 2))
        res = compare_xla_and_py([a, b], pt.matmul(a, b),
                                 [np.zeros((0, 3, 4)), np.zeros((0, 4, 2))])
        assert np.asarray(res[0]).shape == (0, 3, 2)


class TestZeroD:
    def test_0d_elemwise_and_grad(self):
        x = pt.dscalar("x")
        out = pt.tanh(pt.exp(x) * 0.5)
        g = ptt.grad(out, x)
        f = ptt.function([x], [out, g])
        ov, gv = (float(np.asarray(r)) for r in f(0.3))
        e = np.exp(0.3) * 0.5
        assert ov == pytest.approx(np.tanh(e))
        assert gv == pytest.approx((1 - np.tanh(e) ** 2) * e)

    def test_0d_reduction_identity(self):
        x = pt.dscalar("x")
        f = ptt.function([x], pt.sum(x))
        assert float(np.asarray(f(4.5))) == 4.5

    def test_0d_stack_to_vector(self):
        a, b = pt.dscalar("a"), pt.dscalar("b")
        res = compare_xla_and_py([a, b], pt.stack([a, b]),
                                 [np.float64(1.0), np.float64(2.0)])
        np.testing.assert_array_equal(np.asarray(res[0]), [1.0, 2.0])

    def test_0d_switch(self):
        c = pt.tensor("c", dtype="bool", shape=())
        a, b = pt.dscalar("a"), pt.dscalar("b")
        f = ptt.function([c, a, b], pt.switch(c, a, b))
        assert float(np.asarray(f(np.True_, 1.0, 2.0))) == 1.0
        assert float(np.asarray(f(np.False_, 1.0, 2.0))) == 2.0


class TestEmptyGrads:
    def test_grad_through_empty_sum(self):
        x = pt.tensor("x", dtype="float64", shape=(0,))
        g = ptt.grad(pt.sum(x ** 2), x)
        f = ptt.function([x], g)
        assert np.asarray(f(E1)).shape == (0,)

    def test_grad_with_empty_branch(self):
        # a graph where one concat branch is empty
        x = pt.tensor("x", dtype="float64", shape=(3,))
        e = pt.tensor("e", dtype="float64", shape=(0,))
        out = pt.sum(pt.concatenate([e, x]) ** 2)
        g = ptt.grad(out, x)
        f = ptt.function([x, e], g, on_unused_input="ignore")
        v = np.arange(3.0)
        np.testing.assert_allclose(np.asarray(f(v, E1)), 2 * v)
