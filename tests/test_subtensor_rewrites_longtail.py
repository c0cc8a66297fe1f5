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

    def test_advanced1_symbolic_set_rewritten_inc_not(self):
        """set read-of-write needs no uniqueness (last-wins values are
        what the read returns; reference fires it under shape_unsafe),
        while inc with a possibly-duplicated symbolic index must stay."""
        x = pt.dvector("x")
        v = pt.dvector("v")
        idx = pt.lvector("idx")
        expr = pt.set_subtensor(x[idx], v)[idx]
        res = opt(expr)
        assert not any(isinstance(op, AdvancedIncSubtensor1)
                       for op in _ops(res))
        expr_inc = pt.inc_subtensor(x[idx], v)[idx]
        res_inc = opt(expr_inc)
        assert any(isinstance(op, AdvancedIncSubtensor1)
                   for op in _ops(res_inc))

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


class TestExtractDiagOfDot:
    @pytest.mark.parametrize("k", [0, 2, -1])
    def test_offsets(self, k):
        A = pt.tensor("A", dtype="float64", shape=(5, 7))
        B = pt.tensor("B", dtype="float64", shape=(7, 6))
        res = opt(pt.diagonal(pt.dot(A, B), offset=k))
        assert "Dot" not in _opnames(res)
        f = ptt.function([A, B], res)
        av = rng.standard_normal((5, 7))
        bv = rng.standard_normal((7, 6))
        np.testing.assert_allclose(f(av, bv),
                                   np.diagonal(av @ bv, offset=k),
                                   rtol=1e-12)

    def test_batched(self):
        A = pt.tensor("A", dtype="float64", shape=(3, 5, 7))
        B = pt.tensor("B", dtype="float64", shape=(3, 7, 5))
        res = opt(pt.diagonal(pt.matmul(A, B), axis1=-2, axis2=-1))
        assert "Blockwise" not in _opnames(res)
        f = ptt.function([A, B], res)
        av = rng.standard_normal((3, 5, 7))
        bv = rng.standard_normal((3, 7, 5))
        np.testing.assert_allclose(
            f(av, bv), np.diagonal(av @ bv, axis1=-2, axis2=-1),
            rtol=1e-12)

    def test_reversed_axes(self):
        A = pt.tensor("A", dtype="float64", shape=(5, 7))
        B = pt.tensor("B", dtype="float64", shape=(7, 5))
        res = opt(pt.diagonal(pt.dot(A, B), offset=1, axis1=1, axis2=0))
        assert "Dot" not in _opnames(res)
        f = ptt.function([A, B], res)
        av = rng.standard_normal((5, 7))
        bv = rng.standard_normal((7, 5))
        np.testing.assert_allclose(
            f(av, bv), np.diagonal(av @ bv, offset=1, axis1=1, axis2=0),
            rtol=1e-12)


class TestConstantReadOfWrite:
    def _setup(self):
        x = pt.tensor("x", dtype="float64", shape=(10,))
        v = pt.tensor("v", dtype="float64", shape=(3,))
        w = pt.as_tensor_variable(np.array([1, 3, 5]))
        xv = np.arange(10.0)
        vv = np.array([10.0, 20.0, 30.0])
        return x, v, w, xv, vv

    def test_set_full_coverage_drops_base(self):
        x, v, w, xv, vv = self._setup()
        res = opt(pt.set_subtensor(x[w], v)[
            pt.as_tensor_variable(np.array([3, 5, 1]))])
        assert "AdvancedIncSubtensor1" not in _opnames(res)
        f = ptt.function([x, v], res, on_unused_input="ignore")
        exp = xv.copy()
        exp[[1, 3, 5]] = vv
        np.testing.assert_allclose(f(xv, vv), exp[[3, 5, 1]])

    def test_set_no_coverage_drops_write(self):
        x, v, w, xv, vv = self._setup()
        res = opt(pt.set_subtensor(x[w], v)[
            pt.as_tensor_variable(np.array([0, 2]))])
        assert "AdvancedIncSubtensor1" not in _opnames(res)
        f = ptt.function([x, v], res, on_unused_input="ignore")
        np.testing.assert_allclose(f(xv, vv), xv[[0, 2]])

    @pytest.mark.parametrize("mode", ["set", "inc"])
    def test_partial_coverage(self, mode):
        x, v, w, xv, vv = self._setup()
        fn = pt.set_subtensor if mode == "set" else pt.inc_subtensor
        res = opt(fn(x[w], v)[pt.as_tensor_variable(np.array([0, 3]))])
        f = ptt.function([x, v], res)
        exp = xv.copy()
        if mode == "set":
            exp[[1, 3, 5]] = vv
        else:
            exp[[1, 3, 5]] += vv
        np.testing.assert_allclose(f(xv, vv), exp[[0, 3]])

    def test_inc_duplicate_writes_not_rewritten(self):
        x = pt.tensor("x", dtype="float64", shape=(10,))
        v = pt.tensor("v", dtype="float64", shape=(3,))
        w = pt.as_tensor_variable(np.array([1, 1, 5]))
        res = opt(pt.inc_subtensor(x[w], v)[
            pt.as_tensor_variable(np.array([1]))])
        f = ptt.function([x, v], res)
        xv, vv = np.arange(10.0), np.array([10.0, 20.0, 30.0])
        exp = xv.copy()
        np.add.at(exp, [1, 1, 5], vv)
        np.testing.assert_allclose(f(xv, vv), exp[[1]])

    def test_scalar_value_broadcast(self):
        x = pt.tensor("x", dtype="float64", shape=(10,))
        w = pt.as_tensor_variable(np.array([1, 3, 5]))
        res = opt(pt.set_subtensor(x[w], 9.0)[
            pt.as_tensor_variable(np.array([5, 3]))])
        f = ptt.function([x], res, on_unused_input="ignore")
        np.testing.assert_allclose(f(np.arange(10.0)), [9.0, 9.0])


class TestUselessIncSubtensorAlloc:
    def test_scalar_alloc_elided(self):
        from pytensor_tpu.tensor.basic import Alloc

        x = pt.tensor("x", dtype="float64", shape=(10,))
        y = pt.tensor("y", dtype="float64", shape=())
        res = opt(pt.inc_subtensor(x[2:5], pt.alloc(y, 3)))
        assert Alloc not in [type(op) for op in _ops(res)]
        f = ptt.function([x, y], res)
        exp = np.arange(10.0)
        exp[2:5] += 7.0
        np.testing.assert_allclose(f(np.arange(10.0), 7.0), exp)

    def test_row_alloc_elided_advanced(self):
        from pytensor_tpu.tensor.basic import Alloc

        x = pt.tensor("x", dtype="float64", shape=(5, 4))
        y = pt.tensor("y", dtype="float64", shape=(4,))
        idx = pt.as_tensor_variable(np.array([0, 2]))
        res = opt(pt.set_subtensor(x[idx], pt.alloc(y, 2, 4)))
        assert Alloc not in [type(op) for op in _ops(res)]
        f = ptt.function([x, y], res)
        xv = rng.standard_normal((5, 4))
        yv = rng.standard_normal(4)
        exp = xv.copy()
        exp[[0, 2]] = yv
        np.testing.assert_allclose(f(xv, yv), exp)

    def test_mismatched_shape_not_elided(self):
        from pytensor_tpu.tensor.basic import Alloc

        x = pt.tensor("x", dtype="float64", shape=(10,))
        y = pt.tensor("y", dtype="float64", shape=(3,))
        n = pt.tensor("n", dtype="int64", shape=())
        # dynamic extent: static proof unavailable -> keep the alloc
        expr = pt.inc_subtensor(x[2:5], pt.alloc(y[0], n))
        res = opt(expr)
        assert Alloc in [type(op) for op in _ops(res)]


class TestSubtensorOfBatchDims:
    def test_matmul_batch_index(self):
        A = pt.tensor("A", dtype="float64", shape=(3, 5, 7))
        B = pt.tensor("B", dtype="float64", shape=(3, 7, 5))
        res = opt(pt.matmul(A, B)[1])
        names = _opnames(res)
        assert "Blockwise" not in names
        f = ptt.function([A, B], res)
        av = rng.standard_normal((3, 5, 7))
        bv = rng.standard_normal((3, 7, 5))
        np.testing.assert_allclose(f(av, bv), av[1] @ bv[1], rtol=1e-12)

    def test_broadcast_operand(self):
        A = pt.tensor("A", dtype="float64", shape=(1, 5, 7))
        B = pt.tensor("B", dtype="float64", shape=(3, 7, 5))
        res = opt(pt.matmul(A, B)[2])
        f = ptt.function([A, B], res)
        av = rng.standard_normal((1, 5, 7))
        bv = rng.standard_normal((3, 7, 5))
        np.testing.assert_allclose(f(av, bv), (av @ bv)[2], rtol=1e-10)

    def test_core_dim_index_not_lifted(self):
        A = pt.tensor("A", dtype="float64", shape=(3, 5, 7))
        B = pt.tensor("B", dtype="float64", shape=(3, 7, 5))
        # indexing into a core dim must keep the blockwise
        res = opt(pt.matmul(A, B)[:, 1])
        f = ptt.function([A, B], res)
        av = rng.standard_normal((3, 5, 7))
        bv = rng.standard_normal((3, 7, 5))
        np.testing.assert_allclose(f(av, bv), (av @ bv)[:, 1], rtol=1e-12)
