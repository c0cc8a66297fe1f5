"""Round-4 subtensor rewrite long tail (reference
tensor/rewriting/subtensor.py:516,1048,1156,1376,1460,1577,1898,1923,
1945,1980,2330,2507).

Each rewrite gets a structure test (the pattern is eliminated /
transformed) and a value test (numeric equality against the unrewritten
oracle result).
"""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.graph.rewriting.utils import rewrite_graph
from pytensor_tpu.tensor.subtensor import (
    AdvancedIncSubtensor,
    AdvancedIncSubtensor1,
    AdvancedSubtensor,
    AdvancedSubtensor1,
    IncSubtensor,
    Subtensor,
)

rng = np.random.default_rng(42)


def _ops(var):
    from pytensor_tpu.graph.traversal import ancestors

    return [v.owner.op for v in ancestors([var]) if v.owner is not None]


def _opnames(var):
    return [type(op).__name__ for op in _ops(var)]


def opt(expr, include=("fast_run",)):
    return rewrite_graph(expr, include=include)


class TestSetToInc:
    def test_basic(self):
        x = pt.dvector("x")
        y = pt.dvector("y")
        expr = pt.set_subtensor(x[1:3], x[1:3] + y)
        res = opt(expr)
        assert res.owner is not None and isinstance(res.owner.op, IncSubtensor)
        assert not res.owner.op.set_instead_of_inc
        f = ptt.function([x, y], res)
        xv, yv = rng.standard_normal(5), rng.standard_normal(2)
        exp = xv.copy()
        exp[1:3] += yv
        np.testing.assert_allclose(f(xv, yv), exp)

    def test_advanced1_constant_unique(self):
        x = pt.dvector("x")
        y = pt.dvector("y")
        idx = pt.as_tensor_variable(np.array([0, 2, 3]))
        expr = pt.set_subtensor(x[idx], x[idx] + y)
        res = opt(expr)
        assert any(isinstance(op, AdvancedIncSubtensor1)
                   and not op.set_instead_of_inc for op in _ops(res))

    def test_advanced_symbolic_not_rewritten(self):
        # symbolic indices may repeat: set is last-wins, inc accumulates
        x = pt.dvector("x")
        y = pt.dvector("y")
        idx = pt.lvector("idx")
        expr = pt.set_subtensor(x[idx], x[idx] + y)
        res = opt(expr)
        writes = [op for op in _ops(res)
                  if isinstance(op, (AdvancedIncSubtensor1,
                                     AdvancedIncSubtensor))]
        assert all(op.set_instead_of_inc for op in writes)


class TestIncOfZeros:
    def test_zero_update_removed(self):
        x = pt.dvector("x")
        expr = pt.inc_subtensor(x[1:3], pt.zeros((2,)))
        res = opt(expr)
        assert res is x or not any(
            isinstance(op, IncSubtensor) for op in _ops(res))

    def test_zero_base_becomes_set(self):
        y = pt.dvector("y")
        expr = pt.inc_subtensor(pt.zeros((5,))[1:3], y)
        res = opt(expr)
        writes = [op for op in _ops(res) if isinstance(op, IncSubtensor)]
        assert writes and all(op.set_instead_of_inc for op in writes)
        f = ptt.function([y], res)
        yv = rng.standard_normal(2)
        exp = np.zeros(5)
        exp[1:3] = yv
        np.testing.assert_allclose(f(yv), exp)

    def test_zero_base_duplicate_indices_stays_inc(self):
        # duplicate constant indices: must NOT become a set (the onehot
        # matmul form the scatter-add rewrite picks also accumulates)
        y = pt.dvector("y")
        idx = pt.as_tensor_variable(np.array([0, 0, 1]))
        expr = pt.inc_subtensor(pt.zeros((3,))[idx], y)
        res = opt(expr)
        writes = [op for op in _ops(res)
                  if isinstance(op, AdvancedIncSubtensor1)]
        assert all(not op.set_instead_of_inc for op in writes)
        f = ptt.function([y], res)
        yv = np.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(f(yv), np.array([3.0, 3.0, 0.0]))


class TestSetOfSameConstant:
    def test_same_fill_removed(self):
        expr = pt.set_subtensor(pt.zeros((4,))[1:2], pt.zeros((1,)))
        res = opt(expr)
        assert not any(isinstance(op, IncSubtensor) for op in _ops(res))

    def test_different_fill_kept(self):
        expr = pt.set_subtensor(pt.zeros((4,))[1:2], pt.ones((1,)))
        res = opt(expr)
        f = ptt.function([], res)
        np.testing.assert_allclose(f(), np.array([0.0, 1.0, 0.0, 0.0]))


class TestReadOfWrite:
    def test_set_then_read(self):
        x = pt.dvector("x")
        v = pt.dvector("v")
        expr = pt.set_subtensor(x[1:3], v)[1:3]
        res = opt(expr)
        assert res is v or not any(
            isinstance(op, (IncSubtensor, Subtensor)) for op in _ops(res))

    def test_inc_then_read(self):
        x = pt.dvector("x")
        v = pt.dvector("v")
        expr = pt.inc_subtensor(x[1:3], v)[1:3]
        res = opt(expr)
        assert not any(isinstance(op, IncSubtensor) for op in _ops(res))
        f = ptt.function([x, v], res)
        xv, vv = rng.standard_normal(5), rng.standard_normal(2)
        np.testing.assert_allclose(f(xv, vv), xv[1:3] + vv)

    def test_set_broadcast_update_read(self):
        x = pt.dvector("x")
        expr = pt.set_subtensor(x[1:4], 0.0)[1:4]
        res = opt(expr)
        f = ptt.function([x], res)
        np.testing.assert_allclose(f(rng.standard_normal(6)), np.zeros(3))

    def test_advanced1_set_then_read_constant_unique(self):
        x = pt.dvector("x")
        v = pt.dvector("v")
        idx = pt.as_tensor_variable(np.array([0, 2]))
        expr = pt.set_subtensor(x[idx], v)[idx]
        res = opt(expr)
        assert not any(isinstance(op, AdvancedIncSubtensor1)
                       for op in _ops(res))

    def test_advanced1_symbolic_index_not_rewritten(self):
        x = pt.dvector("x")
        v = pt.dvector("v")
        idx = pt.lvector("idx")
        expr = pt.set_subtensor(x[idx], v)[idx]
        res = opt(expr)
        assert any(isinstance(op, AdvancedIncSubtensor1) for op in _ops(res))

    def test_different_indices_not_rewritten(self):
        x = pt.dvector("x")
        v = pt.dvector("v")
        expr = pt.set_subtensor(x[1:3], v)[2:4]
        res = opt(expr)
        f = ptt.function([x, v], res)
        xv, vv = rng.standard_normal(5), rng.standard_normal(2)
        exp = xv.copy()
        exp[1:3] = vv
        np.testing.assert_allclose(f(xv, vv), exp[2:4])


class TestWriteOfWrite:
    def test_set_shadows_set(self):
        x = pt.dvector("x")
        a = pt.dvector("a")
        b = pt.dvector("b")
        expr = pt.set_subtensor(pt.set_subtensor(x[1:3], a)[1:3], b)
        res = opt(expr)
        writes = [op for op in _ops(res) if isinstance(op, IncSubtensor)]
        assert len(writes) == 1
        f = ptt.function([x, a, b], res, on_unused_input="ignore")
        xv = rng.standard_normal(5)
        av, bv = rng.standard_normal(2), rng.standard_normal(2)
        exp = xv.copy()
        exp[1:3] = bv
        np.testing.assert_allclose(f(xv, av, bv), exp)

    def test_inc_merges_inc(self):
        x = pt.dvector("x")
        a = pt.dvector("a")
        b = pt.dvector("b")
        expr = pt.inc_subtensor(pt.inc_subtensor(x[1:3], a)[1:3], b)
        res = opt(expr)
        writes = [op for op in _ops(res) if isinstance(op, IncSubtensor)]
        assert len(writes) == 1 and not writes[0].set_instead_of_inc
        f = ptt.function([x, a, b], res)
        xv = rng.standard_normal(5)
        av, bv = rng.standard_normal(2), rng.standard_normal(2)
        exp = xv.copy()
        exp[1:3] += av + bv
        np.testing.assert_allclose(f(xv, av, bv), exp)

    def test_inc_of_set_merges(self):
        x = pt.dvector("x")
        a = pt.dvector("a")
        b = pt.dvector("b")
        expr = pt.inc_subtensor(pt.set_subtensor(x[1:3], a)[1:3], b)
        res = opt(expr)
        writes = [op for op in _ops(res) if isinstance(op, IncSubtensor)]
        assert len(writes) == 1 and writes[0].set_instead_of_inc
        f = ptt.function([x, a, b], res)
        xv = rng.standard_normal(5)
        av, bv = rng.standard_normal(2), rng.standard_normal(2)
        exp = xv.copy()
        exp[1:3] = av + bv
        np.testing.assert_allclose(f(xv, av, bv), exp)

    def test_inner_write_with_other_client_kept(self):
        x = pt.dvector("x")
        a = pt.dvector("a")
        b = pt.dvector("b")
        inner = pt.set_subtensor(x[1:3], a)
        expr = pt.set_subtensor(inner[1:3], b) + inner.sum()
        res = opt(expr)
        f = ptt.function([x, a, b], res)
        xv = rng.standard_normal(5)
        av, bv = rng.standard_normal(2), rng.standard_normal(2)
        e1 = xv.copy()
        e1[1:3] = av
        e2 = xv.copy()
        e2[1:3] = bv
        np.testing.assert_allclose(f(xv, av, bv), e2 + e1.sum())


class TestIndexCanonicalization:
    def test_negative_index_normalized(self):
        x = pt.tensor("x", dtype="float64", shape=(7,))
        res = opt(x[-2])
        assert isinstance(res.owner.op, Subtensor)
        assert res.owner.op.idx_list == (5,)

    def test_negative_slice_normalized(self):
        x = pt.tensor("x", dtype="float64", shape=(7,))
        res = opt(x[-5:-1])
        f = ptt.function([x], res)
        v = rng.standard_normal(7)
        np.testing.assert_allclose(f(v), v[-5:-1])

    def test_useless_slice_parts(self):
        x = pt.tensor("x", dtype="float64", shape=(4, 5))
        res = opt(x[0:4:1])
        assert res.owner is None or not isinstance(res.owner.op, Subtensor)

    def test_broadcastable_index_to_dimshuffle(self):
        x = pt.tensor("x", dtype="float64", shape=(3, 1, 4))
        res = opt(x[:, 0])
        assert not any(isinstance(op, Subtensor) for op in _ops(res))
        f = ptt.function([x], res)
        v = rng.standard_normal((3, 1, 4))
        np.testing.assert_allclose(f(v), v[:, 0])


class TestGatherToSlice:
    def test_arange_index_to_slice(self):
        x = pt.tensor("x", dtype="float64", shape=(8,))
        idx = pt.as_tensor_variable(np.arange(2, 6))
        res = opt(x[idx])
        assert not any(isinstance(op, (AdvancedSubtensor1,
                                       AdvancedSubtensor))
                       for op in _ops(res))
        f = ptt.function([x], res)
        v = rng.standard_normal(8)
        np.testing.assert_allclose(f(v), v[2:6])

    def test_non_contiguous_not_rewritten(self):
        x = pt.tensor("x", dtype="float64", shape=(8,))
        idx = pt.as_tensor_variable(np.array([0, 2, 4]))
        res = opt(x[idx])
        f = ptt.function([x], res)
        v = rng.standard_normal(8)
        np.testing.assert_allclose(f(v), v[[0, 2, 4]])

    def test_arange_pair_to_diagonal(self):
        x = pt.tensor("x", dtype="float64", shape=(4, 4))
        ar = pt.as_tensor_variable(np.arange(4))
        res = opt(x[ar, ar])
        assert not any(isinstance(op, AdvancedSubtensor)
                       for op in _ops(res))
        f = ptt.function([x], res)
        v = rng.standard_normal((4, 4))
        np.testing.assert_allclose(f(v), np.diagonal(v))

    def test_offset_diagonal(self):
        x = pt.tensor("x", dtype="float64", shape=(5, 5))
        r = pt.as_tensor_variable(np.arange(3))
        c = pt.as_tensor_variable(np.arange(2, 5))
        res = opt(x[r, c])
        f = ptt.function([x], res)
        v = rng.standard_normal((5, 5))
        np.testing.assert_allclose(f(v), np.diagonal(v, offset=2))

    def test_partial_diagonal_not_rewritten(self):
        x = pt.tensor("x", dtype="float64", shape=(5, 5))
        r = pt.as_tensor_variable(np.arange(2))
        res = opt(x[r, r])
        f = ptt.function([x], res)
        v = rng.standard_normal((5, 5))
        np.testing.assert_allclose(f(v), v[np.arange(2), np.arange(2)])

    def test_batched_diagonal(self):
        x = pt.tensor("x", dtype="float64", shape=(2, 3, 3))
        ar = pt.as_tensor_variable(np.arange(3))
        res = opt(x[:, ar, ar])
        f = ptt.function([x], res)
        v = rng.standard_normal((2, 3, 3))
        np.testing.assert_allclose(
            f(v), np.diagonal(v, axis1=1, axis2=2).swapaxes(-1, -1))


class TestJoinSubtensors:
    def test_split_join_roundtrip(self):
        x = pt.tensor("x", dtype="float64", shape=(6,))
        res = opt(pt.join(0, x[:3], x[3:]))
        assert res is x or not any(
            type(op).__name__ == "Join" for op in _ops(res))

    def test_adjacent_slices_merge(self):
        x = pt.tensor("x", dtype="float64", shape=(8,))
        res = opt(pt.join(0, x[1:3], x[3:6]))
        assert not any(type(op).__name__ == "Join" for op in _ops(res))
        f = ptt.function([x], res)
        v = rng.standard_normal(8)
        np.testing.assert_allclose(f(v), v[1:6])

    def test_non_adjacent_kept(self):
        x = pt.tensor("x", dtype="float64", shape=(8,))
        res = opt(pt.join(0, x[0:2], x[3:5]))
        f = ptt.function([x], res)
        v = rng.standard_normal(8)
        np.testing.assert_allclose(f(v), np.concatenate([v[0:2], v[3:5]]))

    def test_axis1_merge(self):
        x = pt.tensor("x", dtype="float64", shape=(2, 8))
        res = opt(pt.join(1, x[:, 0:4], x[:, 4:]))
        assert res is x or not any(
            type(op).__name__ == "Join" for op in _ops(res))
