"""Indexing tests (modeled on reference tests/tensor/test_subtensor.py)."""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from tests.utils import compare_xla_and_py

X = np.arange(24.0).reshape(4, 6)


@pytest.mark.parametrize("idx", [
    (slice(1, 3),),
    (slice(None, None, 2),),
    (slice(None, None, -1),),
    (2,),
    (slice(1, None), slice(None, 4)),
    (0, slice(None)),
    (slice(None), 3),
    (-1, -2),
])
def test_basic_indexing(idx):
    x = pt.dmatrix("x")
    out = x[idx if len(idx) > 1 else idx[0]]
    res = compare_xla_and_py([x], out, [X])
    np.testing.assert_allclose(np.asarray(res[0]), X[idx if len(idx) > 1 else idx[0]])


def test_symbolic_scalar_index():
    x = pt.dvector("x")
    i = pt.lscalar("i")
    out = x[i]
    f = ptt.function([x, i], out, mode="FAST_COMPILE")
    assert float(np.asarray(f(np.arange(5.0), 3))) == 3.0


def test_symbolic_slice_bounds():
    x = pt.dvector("x")
    n = pt.lscalar("n")
    out = x[:n]
    f = ptt.function([x, n], out.sum(), mode="FAST_COMPILE")
    assert float(np.asarray(f(np.arange(5.0), 2))) == 1.0


def test_newaxis():
    x = pt.dvector("x")
    out = x[None, :, None]
    res = compare_xla_and_py([x], out, [np.arange(3.0)])
    assert np.asarray(res[0]).shape == (1, 3, 1)


def test_ellipsis():
    x = pt.tensor3("x", dtype="float64")
    out = x[..., 0]
    V = np.arange(24.0).reshape(2, 3, 4)
    res = compare_xla_and_py([x], out, [V])
    np.testing.assert_allclose(np.asarray(res[0]), V[..., 0])


def test_integer_vector_indexing():
    x = pt.dmatrix("x")
    i = pt.lvector("i")
    out = x[i]
    f = ptt.function([x, i], out)
    np.testing.assert_allclose(np.asarray(f(X, np.array([2, 0, 2]))), X[[2, 0, 2]])


def test_advanced_mixed():
    x = pt.dmatrix("x")
    i = pt.lvector("i")
    out = x[i, 1:4]
    f = ptt.function([x, i], out, mode="FAST_COMPILE")
    np.testing.assert_allclose(np.asarray(f(X, np.array([1, 3]))), X[[1, 3], 1:4])


def test_set_subtensor():
    x = pt.dmatrix("x")
    v = pt.dvector("v")
    out = pt.set_subtensor(x[1], v)
    res = compare_xla_and_py([x, v], out, [X, np.zeros(6)])
    expected = X.copy()
    expected[1] = 0
    np.testing.assert_allclose(np.asarray(res[0]), expected)


def test_inc_subtensor_duplicates():
    x = pt.dvector("x")
    i = pt.lvector("i")
    v = pt.dvector("v")
    out = pt.inc_subtensor(x[i], v)
    f = ptt.function([x, i, v], out)
    res = np.asarray(f(np.zeros(3), np.array([0, 0, 1]), np.ones(3)))
    np.testing.assert_allclose(res, [2.0, 1.0, 0.0])


def test_grad_through_indexing():
    ptt.verify_grad(lambda x: x[::2].sum(), [np.arange(6.0)],
                    rng=np.random.default_rng(0))
    ptt.verify_grad(lambda x: x[1:4].sum() * 2, [np.arange(6.0)],
                    rng=np.random.default_rng(0))


def test_grad_advanced_indexing():
    idx = np.array([0, 2, 2])

    def fn(x):
        return x[idx].sum()

    ptt.verify_grad(fn, [np.arange(4.0)], rng=np.random.default_rng(0))


def test_take_along_axis():
    x = pt.dmatrix("x")
    i = pt.lmatrix("i")
    out = pt.take_along_axis(x, i, axis=1)
    I = np.array([[0, 1], [2, 3], [1, 0], [5, 5]])
    f = ptt.function([x, i], out, mode="FAST_COMPILE")
    np.testing.assert_allclose(np.asarray(f(X, I)), np.take_along_axis(X, I, axis=1))


def test_flip():
    x = pt.dmatrix("x")
    res = compare_xla_and_py([x], pt.flip(x, 0), [X])
    np.testing.assert_allclose(np.asarray(res[0]), X[::-1])


class TestStaticBoolMask:
    """Boolean masks known at graph time lower to integer indexing
    (data-dependent masks are rejected with guidance — dynamic output
    shapes cannot exist in a TPU executable)."""

    def test_1d_mask_value_and_grad(self):
        x = pt.dvector("x")
        mask = np.array([True, False, True, True, False])
        y = x[mask]
        v = np.arange(5.0)
        for mode in ("FAST_COMPILE", None):
            np.testing.assert_allclose(
                np.asarray(ptt.function([x], y, mode=mode)(v)), v[mask])
        g = ptt.grad((y ** 2).sum(), x)
        gv = np.asarray(ptt.function([x], g, mode="FAST_COMPILE")(v))
        exp = np.zeros(5)
        exp[mask] = 2 * v[mask]
        np.testing.assert_allclose(gv, exp)

    def test_2d_mask(self):
        m2 = pt.dmatrix("m")
        mask2 = np.array([[True, False], [False, True]])
        r = np.asarray(ptt.function([m2], m2[mask2], mode="FAST_COMPILE")(
            np.arange(4.0).reshape(2, 2)))
        np.testing.assert_allclose(r, np.arange(4.0).reshape(2, 2)[mask2])

    def test_symbolic_mask_builds_dynamic_graph(self):
        # symbolic masks are graph-legal as of round 3 (dynamic nnz dim);
        # XLA-lowerability is governed by the where rewrites
        # (tests/test_bool_mask.py)
        x = pt.dvector("x")
        bm = pt.tensor("bm", dtype="bool", shape=(5,))
        assert x[bm].type.shape == (None,)


def test_bool_list_mask_lowers():
    # a Python list of bools must lower like a bool ndarray (graph-time
    # constant -> integer indices), not hit the advanced-index rejection
    x = pt.dmatrix("x")
    out = x[[True, False, True, False]]
    res = compare_xla_and_py([x], out, [X])
    np.testing.assert_allclose(np.asarray(res[0]), X[[True, False, True, False]])


def test_bool_mask_wrong_length_raises():
    x = pt.tensor("x", dtype="float64", shape=(4, 6))
    with pytest.raises(IndexError, match="boolean index did not match"):
        x[np.array([True, False, True])]
    with pytest.raises(IndexError, match="axis 1"):
        x[:, np.array([True] * 5)]


def test_scalar_bool_index_rejected():
    x = pt.dmatrix("x")
    with pytest.raises(NotImplementedError):
        x[True]
    with pytest.raises(NotImplementedError):
        x[np.bool_(False)]


def test_bool_mask_after_ellipsis():
    x = pt.tensor("x", dtype="float64", shape=(4, 6))
    out = x[..., np.array([True, False] * 3)]
    res = compare_xla_and_py([x], out, [X])
    np.testing.assert_allclose(np.asarray(res[0]), X[..., np.array([True, False] * 3)])
