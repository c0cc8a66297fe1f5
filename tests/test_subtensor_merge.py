"""Generalized ``local_subtensor_merge`` (reference
tensor/rewriting/subtensor.py:925 ``_local_subtensor_merge_rewrite``,
:652 shape-free table, :823 scalar merge, :1606 merge_two_slices).

Three strategy layers are exercised: exact range arithmetic on static
shapes (any steps/signs), the shape-free constant table (steps +-1, no
shape needed), and symbolic step-1 merges via canonical-bound switch
trees.  Every merged graph is checked numerically against numpy on the
unmerged semantics.
"""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.graph.rewriting.utils import rewrite_graph
from pytensor_tpu.tensor.subtensor import Subtensor

rng = np.random.default_rng(7)


def _subtensor_count(var):
    from pytensor_tpu.graph.traversal import ancestors

    return sum(
        1
        for v in ancestors([var])
        if v.owner is not None and isinstance(v.owner.op, Subtensor)
    )


def opt(expr):
    return rewrite_graph(expr, include=("fast_run",))


SLICES = [
    slice(None),
    slice(1, None),
    slice(None, 5),
    slice(2, 6),
    slice(1, -1),
    slice(-4, None),
    slice(None, -2),
    slice(-6, -1),
    slice(None, None, -1),
    slice(6, 1, -1),
    slice(-2, None, -1),
    slice(None, None, 2),
    slice(1, 7, 2),
    slice(7, None, -2),
]


class TestStaticShapeMerge:
    """Static dim length: every constant pair merges exactly (range
    arithmetic), whatever the steps and signs."""

    @pytest.mark.parametrize("s1", SLICES)
    @pytest.mark.parametrize("s2", SLICES)
    def test_slice_slice(self, s1, s2):
        x = pt.tensor("x", dtype="float64", shape=(8,))
        v = rng.standard_normal(8)
        res = opt(x[s1][s2])
        assert _subtensor_count(res) <= 1
        f = ptt.function([x], res)
        np.testing.assert_array_equal(np.asarray(f(v)), v[s1][s2])

    @pytest.mark.parametrize("s1", [slice(2, 7), slice(1, -1),
                                    slice(None, None, -1), slice(6, 0, -2)])
    @pytest.mark.parametrize("k", [0, 1, -1, -2])
    def test_slice_scalar(self, s1, k):
        x = pt.tensor("x", dtype="float64", shape=(8,))
        v = rng.standard_normal(8)
        expect = v[s1][k]
        res = opt(x[s1][k])
        assert _subtensor_count(res) <= 1
        f = ptt.function([x], res)
        np.testing.assert_array_equal(np.asarray(f(v)), expect)

    def test_multidim_pairing(self):
        x = pt.tensor("x", dtype="float64", shape=(6, 7, 8))
        v = rng.standard_normal((6, 7, 8))
        expr = x[1:5, :, 2:][1:3, 2:-1]
        res = opt(expr)
        assert _subtensor_count(res) == 1
        f = ptt.function([x], res)
        np.testing.assert_array_equal(np.asarray(f(v)),
                                      v[1:5, :, 2:][1:3, 2:-1])

    def test_inner_scalar_consumes_dim(self):
        x = pt.tensor("x", dtype="float64", shape=(6, 7, 8))
        v = rng.standard_normal((6, 7, 8))
        expr = x[2, 1:6][2:4, :5]
        res = opt(expr)
        assert _subtensor_count(res) == 1
        f = ptt.function([x], res)
        np.testing.assert_array_equal(np.asarray(f(v)), v[2, 1:6][2:4, :5])

    def test_outer_longer_than_inner(self):
        x = pt.tensor("x", dtype="float64", shape=(6, 7))
        v = rng.standard_normal((6, 7))
        expr = x[1:5][2:3, 4:]
        res = opt(expr)
        assert _subtensor_count(res) == 1
        f = ptt.function([x], res)
        np.testing.assert_array_equal(np.asarray(f(v)), v[1:5][2:3, 4:])


class TestShapeFreeMerge:
    """Unknown dim length: the constant-bound +-1-step table."""

    CASES = [
        (slice(1, -1), slice(1, -1)),
        (slice(2, None), slice(3, 8)),
        (slice(2, None), slice(3, -2)),
        (slice(None, -2), slice(None, -3)),
        (slice(1, 8), slice(2, 5)),
        (slice(-5, None), slice(-3, None)),
        (slice(2, 6), slice(None, None, -1)),
        (slice(None, None, -1), slice(1, 4)),
        (slice(None, None, -1), slice(None, None, -1)),
        (slice(None, None, -1), slice(1, 4, -1)),
        (slice(2, 6, -1), slice(None, None, -1)),
    ]

    @pytest.mark.parametrize("s1,s2", CASES)
    def test_table(self, s1, s2):
        # lengths respect the in-bounds static-slice contract (bounds in
        # the cases reach 8)
        x = pt.dvector("x")
        res = opt(x[s1][s2])
        assert _subtensor_count(res) <= 1
        f = ptt.function([x], res)
        for nlen in (9, 12):
            v = rng.standard_normal(nlen)
            np.testing.assert_array_equal(np.asarray(f(v)), v[s1][s2])

    def test_sign_flip_declines(self):
        # [a1:b1][a2:-b2] with b1>0, b2<0 needs the shape: stays two ops
        # but still computes correctly
        x = pt.dvector("x")
        res = opt(x[1:6][2:-1])
        f = ptt.function([x], res)
        for nlen in (8, 10):
            v = rng.standard_normal(nlen)
            np.testing.assert_array_equal(np.asarray(f(v)), v[1:6][2:-1])


class TestSymbolicMerge:
    """Symbolic bounds/indices: step-1 canonical-bound switch trees."""

    def test_symbolic_slice_bounds_one_gather(self):
        x = pt.dvector("x")
        a, b, c, d = (pt.lscalar(n) for n in "abcd")
        res = opt(x[a:b][c:d])
        assert _subtensor_count(res) == 1
        f = ptt.function([x, a, b, c, d], res)
        v = rng.standard_normal(11)
        for bounds in [(1, 9, 2, 5), (0, 11, 0, 11), (3, -1, 1, -2),
                       (-8, -2, 1, 4), (2, 100, 1, 50), (5, 3, 0, 4)]:
            av, bv, cv, dv = bounds
            np.testing.assert_array_equal(
                np.asarray(f(v, av, bv, cv, dv)), v[av:bv][cv:dv])

    def test_static_slice_symbolic_scalar(self):
        x = pt.dvector("x")
        k = pt.lscalar("k")
        res = opt(x[2:-1][k])
        assert _subtensor_count(res) == 1
        f = ptt.function([x, k], res)
        v = rng.standard_normal(9)
        for kv in (0, 3, 5, -1, -3):
            np.testing.assert_array_equal(np.asarray(f(v, kv)),
                                          v[2:-1][kv])

    def test_symbolic_slice_static_scalar(self):
        x = pt.dvector("x")
        a = pt.lscalar("a")
        res = opt(x[a:][3])
        assert _subtensor_count(res) == 1
        f = ptt.function([x, a], res)
        v = rng.standard_normal(10)
        for av in (0, 2, 5, -7):
            np.testing.assert_array_equal(np.asarray(f(v, av)), v[av:][3])

    def test_negative_step_symbolic_declines_safely(self):
        # symbolic bounds with step -1 are out of the merge's scope:
        # result stays correct with two ops
        x = pt.dvector("x")
        a = pt.lscalar("a")
        expr = x[::-1][a:]
        f = ptt.function([x, a], opt(expr))
        v = rng.standard_normal(7)
        for av in (0, 2, -3):
            np.testing.assert_array_equal(np.asarray(f(v, av)), v[::-1][av:])


class TestMergeInteractions:
    def test_grad_through_merged(self):
        x = pt.tensor("x", dtype="float64", shape=(8,))
        y = (x[1:7][2:5] ** 2).sum()
        g = ptt.grad(y, x)
        f = ptt.function([x], g)
        v = rng.standard_normal(8)
        expect = np.zeros(8)
        expect[3:6] = 2 * v[3:6]
        np.testing.assert_allclose(np.asarray(f(v)), expect)

    def test_three_chained(self):
        x = pt.tensor("x", dtype="float64", shape=(16,))
        v = rng.standard_normal(16)
        res = opt(x[1:14][2:10][1:-1])
        assert _subtensor_count(res) == 1
        f = ptt.function([x], res)
        np.testing.assert_array_equal(np.asarray(f(v)), v[1:14][2:10][1:-1])

    def test_multiple_clients_not_merged(self):
        # inner result feeds two consumers: merging would duplicate the
        # gather, so the rewrite declines — both outputs stay correct
        x = pt.tensor("x", dtype="float64", shape=(10,))
        inner = x[1:9]
        res1, res2 = opt(inner[2:5] + 0), opt(inner[::2] + 0)
        f = ptt.function([x], [res1, res2])
        v = rng.standard_normal(10)
        r1, r2 = f(v)
        np.testing.assert_array_equal(np.asarray(r1), v[1:9][2:5])
        np.testing.assert_array_equal(np.asarray(r2), v[1:9][::2])
