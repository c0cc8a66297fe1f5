"""Structural-op contract grids: diagonal family, axis manipulation,
dims join/split, meshgrid family, choose/permute_row_elements,
tensordot axes sweeps.

Reference analogs: tests/tensor/test_basic.py (ExtractDiag/AllocDiag
offset grids, Choose, PermuteRowElements), test_shape.py, test_math.py
tensordot axes grid.  All via compare_xla_and_py with numpy as the
expectation.
"""

from __future__ import annotations

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from tests.utils import compare_xla_and_py

rng = np.random.default_rng(13)


# ---------------------------------------------------------------------------
# diagonal / diag / alloc_diag: offset x shape
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(4, 4), (3, 5), (5, 3)])
@pytest.mark.parametrize("offset", [-2, -1, 0, 1, 2])
def test_diagonal_offset_grid(shape, offset):
    x = pt.dmatrix("x")
    v = rng.standard_normal(shape)
    res = compare_xla_and_py([x], pt.diagonal(x, offset), [v])
    np.testing.assert_array_equal(np.asarray(res[0]), np.diagonal(v, offset))


@pytest.mark.parametrize("axes", [(0, 1), (0, 2), (1, 2)])
def test_diagonal_3d_axes(axes):
    x = pt.dtensor3("x")
    v = rng.standard_normal((3, 4, 5))
    res = compare_xla_and_py([x], pt.diagonal(x, 0, *axes), [v])
    np.testing.assert_array_equal(np.asarray(res[0]),
                                  np.diagonal(v, 0, *axes))


@pytest.mark.parametrize("offset", [-1, 0, 2])
def test_diag_vector_to_matrix(offset):
    v = pt.dvector("v")
    val = rng.standard_normal(4)
    res = compare_xla_and_py([v], pt.diag(v, offset), [val])
    np.testing.assert_array_equal(np.asarray(res[0]), np.diag(val, offset))


def test_diag_roundtrip_grad():
    v = pt.dvector("v")
    val = rng.standard_normal(4)
    g = ptt.grad(pt.sum(pt.diag(v) ** 2), v)
    f = ptt.function([v], g)
    np.testing.assert_allclose(np.asarray(f(val)), 2 * val)


# ---------------------------------------------------------------------------
# axis manipulation: moveaxis/swapaxes/expand_dims/squeeze/flatten grids
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("src,dst", [(0, 2), (2, 0), (1, 1), (-1, 0),
                                     (0, -1)])
def test_moveaxis_grid(src, dst):
    x = pt.dtensor3("x")
    v = rng.standard_normal((2, 3, 4))
    res = compare_xla_and_py([x], pt.moveaxis(x, src, dst), [v])
    np.testing.assert_array_equal(np.asarray(res[0]),
                                  np.moveaxis(v, src, dst))


@pytest.mark.parametrize("a1,a2", [(0, 1), (0, 2), (1, 2), (-1, -3)])
def test_swapaxes_grid(a1, a2):
    x = pt.dtensor3("x")
    v = rng.standard_normal((2, 3, 4))
    res = compare_xla_and_py([x], pt.swapaxes(x, a1, a2), [v])
    np.testing.assert_array_equal(np.asarray(res[0]), np.swapaxes(v, a1, a2))


@pytest.mark.parametrize("axis", [0, 1, 2, -1, (0, 2)])
def test_expand_dims_grid(axis):
    x = pt.dmatrix("x")
    v = rng.standard_normal((3, 4))
    res = compare_xla_and_py([x], pt.expand_dims(x, axis), [v])
    np.testing.assert_array_equal(np.asarray(res[0]), np.expand_dims(v, axis))


@pytest.mark.parametrize("shape,axis", [((1, 3, 1), None), ((1, 3, 1), 0),
                                        ((1, 3, 1), 2), ((2, 1, 2), 1)])
def test_squeeze_grid(shape, axis):
    x = pt.tensor("x", dtype="float64", shape=shape)
    v = rng.standard_normal(shape)
    res = compare_xla_and_py([x], pt.squeeze(x, axis), [v])
    np.testing.assert_array_equal(np.asarray(res[0]), np.squeeze(v, axis))


@pytest.mark.parametrize("ndim", [1, 2])
def test_flatten_grid(ndim):
    x = pt.dtensor3("x")
    v = rng.standard_normal((2, 3, 4))
    res = compare_xla_and_py([x], pt.flatten(x, ndim=ndim), [v])
    np.testing.assert_array_equal(np.asarray(res[0]),
                                  v.reshape(v.shape[:ndim - 1] + (-1,)))


@pytest.mark.parametrize("fn,n", [(pt.atleast_1d, 1), (pt.atleast_2d, 2)])
def test_atleast_nd(fn, n):
    x = pt.dscalar("x")
    res = compare_xla_and_py([x], fn(x), [np.float64(3.0)])
    assert np.asarray(res[0]).ndim == n


# ---------------------------------------------------------------------------
# join_dims / split_dims
# ---------------------------------------------------------------------------

def test_join_dims_grid():
    x = pt.dtensor3("x")
    v = rng.standard_normal((2, 3, 4))
    for start in (0, 1, -2):
        res = compare_xla_and_py([x], pt.join_dims(x, start_axis=start), [v])
        s = start % 3
        exp = v.reshape(v.shape[:s] + (-1,))
        np.testing.assert_array_equal(np.asarray(res[0]), exp)


def test_split_dims_grid():
    x = pt.dmatrix("x")
    v = rng.standard_normal((6, 4))
    res = compare_xla_and_py([x], pt.split_dims(x, 0, (2, 3)), [v])
    np.testing.assert_array_equal(np.asarray(res[0]), v.reshape(2, 3, 4))


# ---------------------------------------------------------------------------
# meshgrid / mgrid / ogrid
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("indexing", ["xy", "ij"])
def test_meshgrid_grid(indexing):
    a = pt.dvector("a")
    b = pt.dvector("b")
    av, bv = rng.standard_normal(3), rng.standard_normal(4)
    outs = pt.meshgrid(a, b, indexing=indexing)
    res = compare_xla_and_py([a, b], list(outs), [av, bv])
    exp = np.meshgrid(av, bv, indexing=indexing)
    for r, e in zip(res, exp):
        np.testing.assert_array_equal(np.asarray(r), e)


def test_mgrid_ogrid():
    got = ptt.function([], list(pt.mgrid[0:4, 0:3]))()
    exp = np.mgrid[0:4, 0:3]
    for g, e in zip(got, exp):
        np.testing.assert_array_equal(np.asarray(g), e)
    got = ptt.function([], list(pt.ogrid[0:4, 0:3]))()
    exp = np.ogrid[0:4, 0:3]
    for g, e in zip(got, exp):
        np.testing.assert_array_equal(np.asarray(g), e)


# ---------------------------------------------------------------------------
# choose / permute_row_elements
# ---------------------------------------------------------------------------

def test_choose_grid():
    idx = pt.tensor("idx", dtype="int64", shape=(5,))
    a = pt.dvector("a")
    b = pt.dvector("b")
    iv = rng.integers(0, 2, 5)
    av, bv = rng.standard_normal(5), rng.standard_normal(5)
    res = compare_xla_and_py([idx, a, b], pt.choose(idx, [a, b]),
                             [iv, av, bv])
    np.testing.assert_array_equal(np.asarray(res[0]), np.choose(iv, [av, bv]))


def test_permute_row_elements_matrix():
    x = pt.dmatrix("x")
    p = pt.tensor("p", dtype="int64", shape=(4,))
    v = rng.standard_normal((3, 4))
    pv = rng.permutation(4)
    res = compare_xla_and_py([x, p], pt.permute_row_elements(x, p), [v, pv])
    np.testing.assert_array_equal(np.asarray(res[0]), v[:, pv])


# ---------------------------------------------------------------------------
# tensordot: axes sweep
# ---------------------------------------------------------------------------

TDOT_CASES = [
    (1, (3, 4), (4, 5)),
    (2, (3, 4, 5), (4, 5, 2)),
    (((1,), (0,)), (3, 4), (4, 5)),
    (((0, 2), (1, 0)), (3, 4, 5), (5, 3)),
    (0, (3,), (4,)),
]


@pytest.mark.parametrize("axes,sa,sb", TDOT_CASES,
                         ids=[str(c[0]) for c in TDOT_CASES])
def test_tensordot_axes_grid(axes, sa, sb):
    a = pt.tensor("a", dtype="float64", shape=sa)
    b = pt.tensor("b", dtype="float64", shape=sb)
    av, bv = rng.standard_normal(sa), rng.standard_normal(sb)
    res = compare_xla_and_py([a, b], pt.tensordot(a, b, axes=axes), [av, bv])
    np.testing.assert_allclose(np.asarray(res[0]),
                               np.tensordot(av, bv, axes=axes), rtol=1e-10)


def test_tensordot_grad_fd():
    a = pt.tensor("a", dtype="float64", shape=(2, 3))
    b = pt.tensor("b", dtype="float64", shape=(3, 2))
    av, bv = rng.standard_normal((2, 3)), rng.standard_normal((3, 2))
    loss = pt.sum(pt.tensordot(a, b, axes=1) ** 2)
    ga, gb = ptt.grad(loss, [a, b])
    f = ptt.function([a, b], [ga, gb])
    got = [np.asarray(r) for r in f(av, bv)]
    eps = 1e-6
    def np_loss(x, y):
        return (np.tensordot(x, y, axes=1) ** 2).sum()
    for k, (vk, other) in enumerate([(av, bv), (bv, av)]):
        num = np.zeros_like(vk)
        for i in np.ndindex(vk.shape):
            vp = vk.copy(); vp[i] += eps
            vm = vk.copy(); vm[i] -= eps
            args_p = (vp, other) if k == 0 else (other, vp)
            args_m = (vm, other) if k == 0 else (other, vm)
            num[i] = (np_loss(*args_p) - np_loss(*args_m)) / (2 * eps)
        np.testing.assert_allclose(got[k], num, rtol=1e-4, atol=1e-7)


# ---------------------------------------------------------------------------
# matvec / vecmat / vecdot (numpy 2 additions the reference exposes)
# ---------------------------------------------------------------------------

def test_matvec_family():
    A = pt.dmatrix("A")
    x = pt.dvector("x")
    Av = rng.standard_normal((3, 4))
    xv = rng.standard_normal(4)
    res = compare_xla_and_py([A, x], pt.matvec(A, x), [Av, xv])
    np.testing.assert_allclose(np.asarray(res[0]), Av @ xv)
    y = pt.dvector("y")
    yv = rng.standard_normal(3)
    res = compare_xla_and_py([y, A], pt.vecmat(y, A), [yv, Av])
    np.testing.assert_allclose(np.asarray(res[0]), yv @ Av)
    res = compare_xla_and_py([x, x.type("x2")], pt.vecdot(x, x), [xv, xv])
    np.testing.assert_allclose(np.asarray(res[0]), xv @ xv)
