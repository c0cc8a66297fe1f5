"""extra_ops / sort / constructor contract grids.

Extends the op-grid suite (reference tests/tensor/test_extra_ops.py,
test_sort.py, test_basic.py constructor tests) with dtype x shape x
parameter sweeps for the families the earlier grid files do not cover:
cum ops, diff, repeat, searchsorted, bincount, unravel/ravel index,
bartlett, fill_diagonal, sort/argsort/topk, arange/eye/tri, tile/roll/
flip/broadcast_to, split/stack, and the dynamic-shape ops on the
oracle.  Every case runs through ``compare_xla_and_py`` (XLA vs numpy
oracle, dtype+shape+value equality) unless the op is oracle-only.
"""

from __future__ import annotations

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from tests.utils import compare_xla_and_py

rng = np.random.default_rng(7)


# ---------------------------------------------------------------------------
# cumulative ops: op x dtype x shape x axis
# ---------------------------------------------------------------------------

CUM_SHAPES = [((6,), [None, 0, -1]), ((3, 4), [None, 0, 1, -1]),
              ((2, 3, 2), [None, 0, 1, 2])]


@pytest.mark.parametrize("dtype", ["float32", "float64", "int64"])
@pytest.mark.parametrize("shape,axes", CUM_SHAPES, ids=[str(s) for s, _ in CUM_SHAPES])
@pytest.mark.parametrize("name,op,npf", [
    ("cumsum", pt.cumsum, np.cumsum),
    ("cumprod", pt.cumprod, np.cumprod),
])
def test_cum_grid(name, op, npf, shape, axes, dtype):
    x = pt.tensor("x", dtype=dtype, shape=shape)
    v = (rng.integers(1, 4, size=shape) if dtype.startswith("int")
         else rng.standard_normal(shape)).astype(dtype)
    for axis in axes:
        res = compare_xla_and_py([x], op(x, axis=axis), [v])
        np.testing.assert_allclose(np.asarray(res[0]), npf(v, axis=axis),
                                   rtol=1e-6)


def test_cum_empty():
    x = pt.tensor("x", dtype="float64", shape=(0,))
    v = np.zeros((0,))
    res = compare_xla_and_py([x], pt.cumsum(x), [v])
    assert np.asarray(res[0]).shape == (0,)


@pytest.mark.parametrize("axis", [0, 1, -1])
def test_cum_grad_fd(axis):
    x = pt.dmatrix("x")
    v = rng.standard_normal((3, 4))
    g = ptt.grad(pt.sum(pt.cumsum(x, axis=axis) ** 2), x)
    f = ptt.function([x], g)
    eps = 1e-6
    num = np.zeros_like(v)
    def loss(a):
        return (np.cumsum(a, axis=axis) ** 2).sum()
    for i in np.ndindex(v.shape):
        vp = v.copy(); vp[i] += eps
        vm = v.copy(); vm[i] -= eps
        num[i] = (loss(vp) - loss(vm)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(f(v)), num, rtol=1e-4, atol=1e-7)


# ---------------------------------------------------------------------------
# diff: n x axis x dtype
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dtype", ["float64", "int32"])
@pytest.mark.parametrize("n", [1, 2, 3])
@pytest.mark.parametrize("axis", [0, 1, -1])
def test_diff_grid(n, axis, dtype):
    x = pt.tensor("x", dtype=dtype, shape=(4, 5))
    v = (rng.integers(-4, 9, size=(4, 5)) if dtype.startswith("int")
         else rng.standard_normal((4, 5))).astype(dtype)
    res = compare_xla_and_py([x], pt.diff(x, n=n, axis=axis), [v])
    np.testing.assert_allclose(np.asarray(res[0]), np.diff(v, n=n, axis=axis))


def test_diff_n_zero_and_too_large():
    x = pt.dvector("x")
    v = rng.standard_normal(4)
    res = compare_xla_and_py([x], pt.diff(x, n=0), [v])
    np.testing.assert_allclose(np.asarray(res[0]), v)
    # n >= len collapses to empty, like numpy
    y = pt.dvector("y")
    res = compare_xla_and_py([y], pt.diff(y, n=4), [v])
    assert np.asarray(res[0]).shape == (0,)


# ---------------------------------------------------------------------------
# repeat: scalar + constant-vector repeats x axis
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("repeats,axis", [
    (2, None), (3, 0), (2, 1), (1, 0),
    ([1, 2, 3], 0), ([2, 0, 1, 3], 1),
])
def test_repeat_grid(repeats, axis):
    x = pt.dmatrix("x")
    v = rng.standard_normal((3, 4))
    res = compare_xla_and_py([x], pt.repeat(x, repeats, axis=axis), [v])
    np.testing.assert_allclose(np.asarray(res[0]),
                               np.repeat(v, repeats, axis=axis))


def test_repeat_grad_fd():
    x = pt.dvector("x")
    v = rng.standard_normal(4)
    g = ptt.grad(pt.sum(pt.repeat(x, 3) ** 2), x)
    f = ptt.function([x], g)
    np.testing.assert_allclose(np.asarray(f(v)), 6 * v, rtol=1e-10)


# ---------------------------------------------------------------------------
# searchsorted: side x dtype
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("side", ["left", "right"])
@pytest.mark.parametrize("dtype", ["float64", "int64"])
def test_searchsorted_grid(side, dtype):
    a = pt.tensor("a", dtype=dtype, shape=(8,))
    q = pt.tensor("q", dtype=dtype, shape=(5,))
    av = np.sort((rng.integers(0, 20, 8) if dtype.startswith("int")
                  else rng.standard_normal(8)).astype(dtype))
    qv = np.concatenate([av[[1, 4]], np.asarray([av[0], av[-1], av[3]])]).astype(dtype)
    res = compare_xla_and_py([a, q], pt.searchsorted(a, q, side=side),
                             [av, qv])
    np.testing.assert_array_equal(np.asarray(res[0]),
                                  np.searchsorted(av, qv, side=side))


# ---------------------------------------------------------------------------
# bincount (static minlength) x weights
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("weights", [False, True])
def test_bincount_grid(weights):
    x = pt.tensor("x", dtype="int64", shape=(10,))
    xv = rng.integers(0, 6, 10)
    if weights:
        w = pt.dvector("w")
        wv = rng.standard_normal(10)
        res = compare_xla_and_py([x, w], pt.bincount(x, weights=w, minlength=8),
                                 [xv, wv])
        np.testing.assert_allclose(np.asarray(res[0]),
                                   np.bincount(xv, weights=wv, minlength=8))
    else:
        res = compare_xla_and_py([x], pt.bincount(x, minlength=8), [xv])
        np.testing.assert_array_equal(np.asarray(res[0]),
                                      np.bincount(xv, minlength=8))


# ---------------------------------------------------------------------------
# unravel_index / ravel_multi_index roundtrip grid
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dims", [(6,), (3, 4), (2, 3, 4)])
def test_unravel_ravel_grid(dims):
    n = int(np.prod(dims))
    i = pt.tensor("i", dtype="int64", shape=(5,))
    iv = rng.integers(0, n, 5)
    coords = pt.unravel_index(i, dims)
    coords = [coords] if not isinstance(coords, (list, tuple)) else list(coords)
    res = compare_xla_and_py([i], coords, [iv])
    exp = np.unravel_index(iv, dims)
    for r, e in zip(res, exp):
        np.testing.assert_array_equal(np.asarray(r), e)
    back = pt.ravel_multi_index(tuple(coords), dims)
    res2 = compare_xla_and_py([i], back, [iv])
    np.testing.assert_array_equal(np.asarray(res2[0]), iv)


# ---------------------------------------------------------------------------
# bartlett / fill_diagonal
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("m", [0, 1, 2, 7])
def test_bartlett_grid(m):
    res = ptt.function([], pt.bartlett(m))()
    np.testing.assert_allclose(np.asarray(res), np.bartlett(m), atol=1e-12)


@pytest.mark.parametrize("shape", [(4, 4), (3, 5), (5, 3)])
def test_fill_diagonal_grid(shape):
    x = pt.dmatrix("x")
    v = rng.standard_normal(shape)
    res = compare_xla_and_py([x], pt.fill_diagonal(x, 9.0), [v])
    exp = v.copy()
    np.fill_diagonal(exp, 9.0)
    np.testing.assert_allclose(np.asarray(res[0]), exp)


@pytest.mark.parametrize("offset", [0, 1, 2])
def test_fill_diagonal_offset_grid(offset):
    x = pt.dmatrix("x")
    v = rng.standard_normal((4, 6))
    res = compare_xla_and_py([x], pt.fill_diagonal_offset(x, 7.0, offset), [v])
    exp = v.copy()
    n = min(4, 6 - offset)
    exp[np.arange(n), np.arange(n) + offset] = 7.0
    np.testing.assert_allclose(np.asarray(res[0]), exp)


# ---------------------------------------------------------------------------
# sort / argsort / topk: axis x dtype (+ stability on ties for argsort)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dtype", ["float32", "float64", "int64"])
@pytest.mark.parametrize("axis", [0, 1, -1])
@pytest.mark.parametrize("name,op,npf", [
    ("sort", pt.sort, np.sort),
    # int draws can tie and argsort order on ties is only defined for
    # kind="stable" (XLA's sort is always stable; numpy's default isn't)
    ("argsort",
     lambda x, axis: pt.argsort(x, axis=axis, kind="stable"),
     lambda v, axis: np.argsort(v, axis=axis, kind="stable")),
])
def test_sort_grid(name, op, npf, axis, dtype):
    x = pt.tensor("x", dtype=dtype, shape=(4, 5))
    v = (rng.integers(0, 30, (4, 5)) if dtype.startswith("int")
         else rng.standard_normal((4, 5))).astype(dtype)
    res = compare_xla_and_py([x], op(x, axis=axis), [v])
    np.testing.assert_array_equal(np.asarray(res[0]), npf(v, axis=axis))


def test_sort_empty_and_single():
    for shape in [(0,), (1,)]:
        x = pt.tensor("x", dtype="float64", shape=shape)
        v = np.zeros(shape)
        res = compare_xla_and_py([x], pt.sort(x), [v])
        np.testing.assert_array_equal(np.asarray(res[0]), np.sort(v))


@pytest.mark.parametrize("k", [1, 3, 5])
def test_topk_grid(k):
    x = pt.dvector("x")
    v = rng.standard_normal(8)
    out = pt.topk(x, k)
    outs = list(out) if isinstance(out, (list, tuple)) else [out]
    f = ptt.function([x], outs)
    vals = np.asarray(f(v)[0])
    np.testing.assert_allclose(np.sort(vals), np.sort(v)[-k:], rtol=1e-12)


def test_sort_grad_fd():
    x = pt.dvector("x")
    v = rng.standard_normal(6)
    g = ptt.grad(pt.sum(pt.sort(x) * np.arange(6.0)), x)
    f = ptt.function([x], g)
    order = np.argsort(v)
    exp = np.zeros(6)
    exp[order] = np.arange(6.0)
    np.testing.assert_allclose(np.asarray(f(v)), exp)


# ---------------------------------------------------------------------------
# constructors: arange / eye / tri grids
# ---------------------------------------------------------------------------

ARANGE_CASES = [
    (0, 7, 1), (3, 11, 2), (10, 2, -1), (5, 5, 1), (0, 10, 3), (-4, 4, 2),
    (8, -2, -3),
]


@pytest.mark.parametrize("start,stop,step", ARANGE_CASES)
@pytest.mark.parametrize("dtype", ["int64", "float64"])
def test_arange_grid(start, stop, step, dtype):
    f = ptt.function([], pt.arange(start, stop, step, dtype=dtype))
    got = np.asarray(f())
    exp = np.arange(start, stop, step, dtype=dtype)
    assert got.dtype == exp.dtype
    np.testing.assert_array_equal(got, exp)


@pytest.mark.parametrize("n,m,k", [(4, None, 0), (4, 6, 0), (6, 4, 0),
                                   (4, 4, 1), (4, 4, -2), (3, 5, 2),
                                   (1, 1, 0), (4, 4, 5)])
def test_eye_grid(n, m, k):
    f = ptt.function([], pt.eye(n, m, k, dtype="float64"))
    np.testing.assert_array_equal(np.asarray(f()), np.eye(n, m, k))


@pytest.mark.parametrize("k", [-2, -1, 0, 1, 2])
@pytest.mark.parametrize("which,npf", [("tril", np.tril), ("triu", np.triu)])
def test_tril_triu_grid(which, npf, k):
    x = pt.dmatrix("x")
    v = rng.standard_normal((4, 5))
    op = getattr(pt, which)
    res = compare_xla_and_py([x], op(x, k), [v])
    np.testing.assert_array_equal(np.asarray(res[0]), npf(v, k))


@pytest.mark.parametrize("n,m,k", [(4, 4, 0), (3, 5, 1), (5, 3, -1)])
def test_tri_grid(n, m, k):
    f = ptt.function([], pt.tri(n, m, k, dtype="float64"))
    np.testing.assert_array_equal(np.asarray(f()), np.tri(n, m, k))


# ---------------------------------------------------------------------------
# tile / roll / flip / broadcast_to
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("reps", [(2,), (2, 3), (1, 2, 2)])
def test_tile_grid(reps):
    x = pt.dmatrix("x")
    v = rng.standard_normal((2, 3))
    res = compare_xla_and_py([x], pt.tile(x, reps), [v])
    np.testing.assert_array_equal(np.asarray(res[0]), np.tile(v, reps))


@pytest.mark.parametrize("shift,axis", [(1, 0), (-2, 1), (3, None), (0, 0),
                                        (7, 1)])
def test_roll_grid(shift, axis):
    x = pt.dmatrix("x")
    v = rng.standard_normal((3, 4))
    res = compare_xla_and_py([x], pt.roll(x, shift, axis=axis), [v])
    np.testing.assert_array_equal(np.asarray(res[0]),
                                  np.roll(v, shift, axis=axis))


@pytest.mark.parametrize("axis", [None, 0, 1, (0, 1)])
def test_flip_grid(axis):
    x = pt.dmatrix("x")
    v = rng.standard_normal((3, 4))
    res = compare_xla_and_py([x], pt.flip(x, axis), [v])
    np.testing.assert_array_equal(np.asarray(res[0]), np.flip(v, axis))


@pytest.mark.parametrize("src,dst", [((3,), (2, 3)), ((1, 4), (5, 4)),
                                     ((2, 1), (2, 6)), ((), (3, 2))])
def test_broadcast_to_grid(src, dst):
    x = pt.tensor("x", dtype="float64", shape=src)
    v = rng.standard_normal(src)
    res = compare_xla_and_py([x], pt.broadcast_to(x, dst), [v])
    np.testing.assert_array_equal(np.asarray(res[0]), np.broadcast_to(v, dst))


# ---------------------------------------------------------------------------
# split / stack / concatenate grids
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sizes,axis", [([2, 3], 0), ([1, 1, 3], 0),
                                        ([2, 2], 1), ([4, 0], 1)])
def test_split_grid(sizes, axis):
    x = pt.dmatrix("x")
    v = rng.standard_normal((5, 4)) if axis == 0 else rng.standard_normal((3, 4))
    parts = pt.split(x, sizes, len(sizes), axis=axis)
    res = compare_xla_and_py([x], list(parts), [v])
    exp = np.split(v, np.cumsum(sizes)[:-1], axis=axis)
    for r, e in zip(res, exp):
        np.testing.assert_array_equal(np.asarray(r), e)


@pytest.mark.parametrize("axis", [0, 1, 2, -1])
def test_stack_grid(axis):
    xs = [pt.dmatrix(f"x{i}") for i in range(3)]
    vs = [rng.standard_normal((2, 3)) for _ in range(3)]
    res = compare_xla_and_py(xs, pt.stack(xs, axis=axis), vs)
    np.testing.assert_array_equal(np.asarray(res[0]), np.stack(vs, axis=axis))


def test_concatenate_empty_part():
    a = pt.tensor("a", dtype="float64", shape=(0, 3))
    b = pt.tensor("b", dtype="float64", shape=(2, 3))
    va, vb = np.zeros((0, 3)), rng.standard_normal((2, 3))
    res = compare_xla_and_py([a, b], pt.concatenate([a, b], axis=0), [va, vb])
    np.testing.assert_array_equal(np.asarray(res[0]), vb)


# ---------------------------------------------------------------------------
# dynamic-shape ops on the oracle (unique / compress / nonzero)
# ---------------------------------------------------------------------------

class TestDynamicOpsOracle:
    @pytest.mark.parametrize("kwargs", [
        {}, {"return_index": True}, {"return_inverse": True},
        {"return_counts": True},
        {"return_index": True, "return_inverse": True, "return_counts": True},
    ])
    def test_unique_grid(self, kwargs):
        x = pt.tensor("x", dtype="int64", shape=(10,))
        xv = rng.integers(0, 5, 10)
        out = pt.unique(x, **kwargs)
        outs = list(out) if isinstance(out, (list, tuple)) else [out]
        f = ptt.function([x], outs, mode="FAST_COMPILE")
        got = [np.asarray(r) for r in f(xv)]
        exp = np.unique(xv, **{k.replace("return_", "return_"): v
                               for k, v in kwargs.items()})
        exp = list(exp) if isinstance(exp, tuple) else [exp]
        for g, e in zip(got, exp):
            np.testing.assert_array_equal(g, e)

    def test_compress(self):
        x = pt.dvector("x")
        c = pt.vector("c", dtype="bool")
        f = ptt.function([c, x], pt.compress(c, x), mode="FAST_COMPILE")
        v = rng.standard_normal(5)
        cv = np.array([True, False, True, True, False])
        np.testing.assert_array_equal(np.asarray(f(cv, v)), np.compress(cv, v))

    def test_nonzero(self):
        x = pt.dmatrix("x")
        f = ptt.function([x], list(pt.nonzero(x)), mode="FAST_COMPILE")
        v = np.array([[1.0, 0.0], [0.0, 2.0]])
        got = f(v)
        exp = np.nonzero(v)
        for g, e in zip(got, exp):
            np.testing.assert_array_equal(np.asarray(g), e)
