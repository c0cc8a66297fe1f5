"""Extended xtensor surface: generated math wrappers, stack/unstack,
broadcast/full_like, slice/array isel, index_update, linalg, grads.
(Reference xtensor/math.py, shape.py, indexing.py, linalg.py.)"""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.xtensor as px
from pytensor_tpu.xtensor import math as pxm

rng = np.random.default_rng(3)


def _x():
    x = px.xtensor("x", dims=("a", "b"), shape=(3, 4), dtype="float64")
    return x, np.arange(12.0).reshape(3, 4)


class TestXMath:
    def test_generated_wrappers(self):
        x, xv = _x()
        y = pxm.exp(x) + pxm.log(x + 1.0) - pxm.sqrt(x)
        r = np.asarray(ptt.function([x], y.values)(xv))
        np.testing.assert_allclose(r, np.exp(xv) + np.log(xv + 1) - np.sqrt(xv),
                                   rtol=1e-12)

    def test_dim_name_broadcasting(self):
        a = px.xtensor("aa", dims=("i",), shape=(2,), dtype="float64")
        b = px.xtensor("bb", dims=("j",), shape=(3,), dtype="float64")
        y = pxm.add(a, b)
        assert set(y.type.dims) == {"i", "j"}
        av, bv = np.arange(2.0), np.arange(3.0)
        r = np.asarray(ptt.function([a, b], y.values)(av, bv))
        np.testing.assert_allclose(r, av[:, None] + bv[None, :])

    def test_softmax_named_dim(self):
        x, xv = _x()
        sm = pxm.softmax(x, "b")
        r = np.asarray(ptt.function([x], sm.values)(xv))
        np.testing.assert_allclose(
            r, np.exp(xv) / np.exp(xv).sum(1, keepdims=True), rtol=1e-10)

    def test_comparisons_and_astype(self):
        x, xv = _x()
        m = (x > 5.0).astype("float64")
        r = np.asarray(ptt.function([x], m.values)(xv))
        np.testing.assert_allclose(r, (xv > 5).astype(float))


class TestXShape:
    def test_stack_unstack_roundtrip(self):
        x, xv = _x()
        st = px.stack(x, z=("a", "b"))
        assert st.type.dims == ("z",) and st.type.shape == (12,)
        us = px.unstack(st, z={"a": 3, "b": 4})
        assert us.type.dims == ("a", "b")
        np.testing.assert_allclose(np.asarray(ptt.function([x], us.values)(xv)),
                                   xv)

    def test_broadcast_and_like(self):
        a = px.xtensor("aa", dims=("i",), shape=(2,), dtype="float64")
        b = px.xtensor("bb", dims=("j",), shape=(3,), dtype="float64")
        ba, bb = px.broadcast(a, b)
        assert set(ba.type.dims) == {"i", "j"} == set(bb.type.dims)
        x, xv = _x()
        fl = px.full_like(x, 7.0)
        np.testing.assert_allclose(
            np.asarray(ptt.function([x], fl.values)(xv)), 7.0)
        z = px.zeros_like(x)
        np.testing.assert_allclose(
            np.asarray(ptt.function([x], z.values)(xv)), 0.0)

    def test_reduce_cumsum(self):
        x, xv = _x()
        assert np.allclose(np.asarray(ptt.function([x], x.prod("b").values)(xv)),
                           xv.prod(1))
        assert np.allclose(
            np.asarray(ptt.function([x], x.var("a", ddof=1).values)(xv)),
            xv.var(0, ddof=1))
        assert np.allclose(
            np.asarray(ptt.function([x], x.cumsum("b").values)(xv)),
            xv.cumsum(1))


class TestXIndexing:
    def test_isel_slice_and_array(self):
        x, xv = _x()
        s1 = px.isel(x, a=slice(1, None), b=[0, 2, 3])
        assert s1.type.dims == ("a", "b")
        np.testing.assert_allclose(
            np.asarray(ptt.function([x], s1.values)(xv)), xv[1:][:, [0, 2, 3]])

    def test_isel_xtensor_indexer_renames(self):
        x, xv = _x()
        idx = px.as_xtensor(np.array([2, 0]), dims=("sel",))
        s2 = x.isel(a=idx)
        assert s2.type.dims == ("sel", "b")
        np.testing.assert_allclose(
            np.asarray(ptt.function([x], s2.values)(xv)), xv[[2, 0]])

    def test_index_set_and_inc(self):
        x, xv = _x()
        u = px.index_set(x, dict(a=1), px.as_xtensor(np.float64(9.0)))
        r = np.asarray(ptt.function([x], u.values)(xv))
        assert (r[1] == 9.0).all() and (r[0] == xv[0]).all()
        val = px.as_xtensor(np.ones((2, 2)), dims=("a", "b"))
        u2 = px.index_inc(x, dict(a=slice(0, 2), b=[1, 3]), val)
        r2 = np.asarray(ptt.function([x], u2.values)(xv))
        exp = xv.copy()
        exp[np.ix_([0, 1], [1, 3])] += 1
        np.testing.assert_allclose(r2, exp)

    def test_value_dims_validated(self):
        x, _ = _x()
        bad = px.as_xtensor(np.ones(5), dims=("nope",))
        with pytest.raises(ValueError):
            px.index_set(x, dict(a=1), bad)


class TestXLinalg:
    def test_cholesky_solve(self):
        m = px.xtensor("m", dims=("r", "c"), shape=(3, 3), dtype="float64")
        A = rng.random((3, 3))
        A = A @ A.T + 3 * np.eye(3)
        L = px.linalg.cholesky(m, dims=("r", "c"))
        np.testing.assert_allclose(
            np.asarray(ptt.function([m], L.values)(A)),
            np.linalg.cholesky(A), rtol=1e-10)
        rhs = px.xtensor("rhs", dims=("r",), shape=(3,), dtype="float64")
        sol = px.linalg.solve(m, rhs, dims=("r", "c"))
        bv = np.arange(3.0)
        np.testing.assert_allclose(
            np.asarray(ptt.function([m, rhs], sol.values)(A, bv)),
            np.linalg.solve(A, bv), rtol=1e-10)


class TestXGrad:
    def test_grad_keeps_dims(self):
        x, xv = _x()
        g = ptt.grad(pxm.exp(x).sum().values, x)
        assert g.type.dims == ("a", "b")
        np.testing.assert_allclose(
            np.asarray(ptt.function([x], g.values)(xv)), np.exp(xv), rtol=1e-12)

    def test_grad_through_isel(self):
        x, xv = _x()
        y = (x.isel(a=1) ** 2).sum().values
        g = ptt.grad(y, x)
        gv = np.asarray(ptt.function([x], g.values)(xv))
        exp = np.zeros_like(xv)
        exp[1] = 2 * xv[1]
        np.testing.assert_allclose(gv, exp)


class TestXRandom:
    def test_dims_and_param_alignment(self):
        from pytensor_tpu.tensor.random.utils import RandomStream
        from pytensor_tpu.xtensor import random as pxr

        srng = RandomStream(seed=0)
        d = pxr.normal(srng, 0.0, 1.0, dims={"chain": 8, "param": 3})
        assert d.type.dims == ("chain", "param") and d.type.shape == (8, 3)
        mu = px.as_xtensor(np.arange(3.0), dims=("param",))
        d2 = pxr.normal(srng, mu, 0.001, dims={"chain": 200, "param": 3})
        v2 = np.asarray(ptt.function([], d2.values)())
        np.testing.assert_allclose(v2.mean(0), [0, 1, 2], atol=0.01)

    def test_bad_param_dim_rejected(self):
        from pytensor_tpu.tensor.random.utils import RandomStream
        from pytensor_tpu.xtensor import random as pxr

        srng = RandomStream(seed=0)
        mu = px.as_xtensor(np.arange(3.0), dims=("other",))
        with pytest.raises(ValueError):
            pxr.normal(srng, mu, 1.0, dims={"chain": 4})


class TestXIndexGeneral:
    """Full xarray indexing semantics (reference xtensor/indexing.py
    Index:113, rewriting/indexing.py _lower_index:39)."""

    def _x3(self):
        x = px.xtensor("x", dims=("a", "b", "c"), shape=(3, 4, 5),
                       dtype="float64")
        return x, np.arange(60.0).reshape(3, 4, 5)

    def _run(self, x, out, xv):
        return np.asarray(ptt.function([x], out.values)(xv))

    def test_orthogonal_distinct_dims(self):
        x, xv = self._x3()
        i = px.as_xtensor(np.array([0, 2]), dims=("i",))
        j = px.as_xtensor(np.array([1, 3, 0]), dims=("j",))
        out = px.isel(x, a=i, b=j)
        assert out.type.dims == ("i", "j", "c")
        exp = xv[np.ix_([0, 2], [1, 3, 0], range(5))]
        np.testing.assert_allclose(self._run(x, out, xv), exp)

    def test_vectorized_shared_dim(self):
        x, xv = self._x3()
        i = px.as_xtensor(np.array([0, 2, 1]), dims=("k",))
        j = px.as_xtensor(np.array([1, 3, 0]), dims=("k",))
        out = px.isel(x, a=i, b=j)
        assert out.type.dims == ("k", "c")
        np.testing.assert_allclose(self._run(x, out, xv),
                                   xv[[0, 2, 1], [1, 3, 0], :])

    def test_diagonal_with_kept_dim(self):
        # indexer labeled with a dim that x keeps -> pointwise (diagonal)
        x, xv = self._x3()
        i = px.as_xtensor(np.array([0, 2, 1, 0]), dims=("b",))
        out = px.isel(x, a=i)
        assert out.type.dims == ("b", "c")
        np.testing.assert_allclose(self._run(x, out, xv),
                                   xv[[0, 2, 1, 0], np.arange(4), :])

    def test_multidim_labeled_indexer(self):
        x, xv = self._x3()
        m = px.as_xtensor(np.array([[0, 1], [2, 0], [1, 1]]),
                          dims=("p", "q"))
        out = px.isel(x, b=m)
        assert out.type.dims == ("a", "p", "q", "c")
        np.testing.assert_allclose(self._run(x, out, xv),
                                   xv[:, [[0, 1], [2, 0], [1, 1]], :])

    def test_constant_bool_mask(self):
        x, xv = self._x3()
        mask = np.array([True, False, True, True])
        out = px.isel(x, b=mask)
        assert out.type.shape == (3, 3, 5)
        np.testing.assert_allclose(self._run(x, out, xv), xv[:, mask, :])

    def test_symbolic_bool_mask_rejected(self):
        x, _ = self._x3()
        m = px.xtensor("m", dims=("a",), shape=(3,), dtype="bool")
        with pytest.raises(NotImplementedError, match="graph-time-constant"):
            px.isel(x, a=m)

    def test_getitem_positional_ellipsis(self):
        x, xv = self._x3()
        out = x[1, ..., 2]
        assert out.type.dims == ("b",)
        np.testing.assert_allclose(self._run(x, out, xv), xv[1, :, 2])

    def test_getitem_newaxis_rejected(self):
        x, _ = self._x3()
        with pytest.raises(TypeError, match="expand_dims"):
            x[None]

    def test_unlabeled_multidim_rejected(self):
        x, _ = self._x3()
        with pytest.raises(IndexError, match="Unlabeled"):
            px.isel(x, a=np.array([[0, 1], [1, 0]]))

    def test_nonconsecutive_restores_xarray_order(self):
        x, xv = self._x3()
        i = px.as_xtensor(np.array([0, 2]), dims=("i",))
        j = px.as_xtensor(np.array([1, 3, 0]), dims=("j",))
        out = px.isel(x, a=i, c=j)
        assert out.type.dims == ("i", "b", "j")
        exp = xv[np.ix_([0, 2], range(4), [1, 3, 0])]
        np.testing.assert_allclose(self._run(x, out, xv), exp)

    def test_dim_tuple_indexer(self):
        x, xv = self._x3()
        out = x[("z", np.array([0, 1, 1])),]
        assert out.type.dims == ("z", "b", "c")
        np.testing.assert_allclose(self._run(x, out, xv), xv[[0, 1, 1]])

    def test_scalar_symbolic_indexer(self):
        x, xv = self._x3()
        s = px.as_xtensor(np.int64(2))
        out = px.isel(x, a=s)
        assert out.type.dims == ("b", "c")
        np.testing.assert_allclose(self._run(x, out, xv), xv[2])

    def test_index_update_array_region_value_transposed(self):
        x, xv = self._x3()
        i = px.as_xtensor(np.array([0, 2]), dims=("i",))
        j = px.as_xtensor(np.array([1, 3, 0]), dims=("j",))
        val = px.as_xtensor(np.arange(6.0).reshape(3, 2), dims=("j", "i"))
        out = px.index_set(x, dict(a=i, c=j), val)
        r = self._run(x, out, xv)
        exp = xv.copy()
        exp[np.ix_([0, 2], range(4), [1, 3, 0])] = \
            np.arange(6.0).reshape(3, 2).T[:, None, :]
        np.testing.assert_allclose(r, exp)

    def test_index_inc_duplicate_indices_accumulate(self):
        x, xv = self._x3()
        idup = px.as_xtensor(np.array([1, 1, 0]), dims=("i",))
        v = px.as_xtensor(np.ones(3), dims=("i",))
        out = px.index_inc(x, dict(a=idup, b=0, c=0), v)
        r = self._run(x, out, xv)
        exp = xv.copy()
        np.add.at(exp, ([1, 1, 0], 0, 0), 1.0)
        np.testing.assert_allclose(r, exp)

    def test_indexer_shape_mismatch_raises(self):
        x, _ = self._x3()
        i = px.as_xtensor(np.array([0, 2]), dims=("k",))
        j = px.as_xtensor(np.array([1, 3, 0]), dims=("k",))
        with pytest.raises(IndexError, match="mismatch"):
            px.isel(x, a=i, b=j)

    def test_grad_through_vectorized_index(self):
        x, xv = self._x3()
        i = px.as_xtensor(np.array([0, 2, 1]), dims=("k",))
        j = px.as_xtensor(np.array([1, 3, 0]), dims=("k",))
        y = px.isel(x, a=i, b=j).sum().values
        g = ptt.grad(y, x)
        gv = np.asarray(ptt.function([x], g.values)(xv))
        exp = np.zeros_like(xv)
        np.add.at(exp, ([0, 2, 1], [1, 3, 0]), 1.0)
        np.testing.assert_allclose(gv, exp)


class TestXReductionsAndSignal:
    """all/any/cumprod reductions, where/logsumexp/cast math, convolve1d
    (reference xtensor/reduction.py, math.py:533, signal.py:13)."""

    def test_bool_reductions_and_cumprod(self):
        x = px.xtensor("x", dims=("a", "b"), shape=(2, 5), dtype="float64")
        xv = np.array([[1.0, 2, 3, 4, 5], [0, 1, 0, 2, 0]])
        assert list(np.asarray(
            ptt.function([x], (x > 0).all("b").values)(xv))) == [True, False]
        assert list(np.asarray(
            ptt.function([x], (x > 0).any("b").values)(xv))) == [True, True]
        np.testing.assert_allclose(
            np.asarray(ptt.function([x], x.cumprod("b").values)(xv)),
            np.cumprod(xv, 1))

    def test_where_logsumexp(self):
        x = px.xtensor("x", dims=("a", "b"), shape=(2, 5), dtype="float64")
        xv = np.arange(10.0).reshape(2, 5)
        np.testing.assert_allclose(
            np.asarray(ptt.function(
                [x], pxm.where(x > 2, x, -x).values)(xv)),
            np.where(xv > 2, xv, -xv))
        np.testing.assert_allclose(
            np.asarray(ptt.function([x], pxm.logsumexp(x, "b").values)(xv)),
            np.log(np.exp(xv).sum(1)))

    @pytest.mark.parametrize("mode", ["full", "valid", "same"])
    def test_convolve1d_batched(self, mode):
        x = px.xtensor("x", dims=("a", "b"), shape=(2, 5), dtype="float64")
        xv = np.arange(10.0).reshape(2, 5)
        k = px.as_xtensor(np.array([1.0, 0.0, -1.0]), dims=("t",))
        out = px.convolve1d(x, k, mode=mode, dims=("b", "t"))
        assert out.type.dims == ("a", "b")
        r = np.asarray(ptt.function([x], out.values)(xv))
        exp = np.stack([np.convolve(row, [1, 0, -1], mode) for row in xv])
        np.testing.assert_allclose(r, exp)

    def test_convolve1d_dim_errors(self):
        x = px.xtensor("x", dims=("a", "b"), shape=(2, 5), dtype="float64")
        k = px.as_xtensor(np.ones(3), dims=("b",))
        with pytest.raises(ValueError, match="distinct"):
            px.convolve1d(x, k, dims=("b", "b"))


class TestXRandomBreadth:
    """Distribution breadth + core-dim multivariates (reference
    xtensor/random/basic.py:56 as_xrv, :152 multivariate_normal)."""

    def _srng(self):
        from pytensor_tpu.tensor.random.utils import RandomStream

        return RandomStream(seed=0)

    def test_scalar_dist_breadth(self):
        from pytensor_tpu.xtensor import random as pxr

        srng = self._srng()
        for name in ("weibull", "pareto", "gumbel", "rayleigh", "vonmises",
                     "chisquare", "standard_normal", "halfcauchy", "wald",
                     "nbinom"):
            assert hasattr(pxr, name), name
        d = pxr.weibull(srng, 2.0, dims={"chain": 50})
        v = np.asarray(ptt.function([], d.values)())
        assert d.type.dims == ("chain",) and v.shape == (50,) and (v > 0).all()

    def test_multivariate_normal_core_dims(self):
        from pytensor_tpu.xtensor import random as pxr

        srng = self._srng()
        mu = px.as_xtensor(np.array([[0.0, 10.0], [5.0, -5.0]]),
                           dims=("g", "p"))
        cov = px.as_xtensor(np.eye(2) * 0.01, dims=("p", "p2"))
        d = pxr.multivariate_normal(srng, mu, cov, core_dims=("p", "p2"),
                                    dims={"chain": 400, "g": 2})
        assert d.type.dims == ("chain", "g", "p")
        v = np.asarray(ptt.function([], d.values)())
        np.testing.assert_allclose(v.mean(0), [[0, 10], [5, -5]], atol=0.05)
        # reversed core_dims resolve via mean's dims
        d2 = pxr.multivariate_normal(srng, mu, cov, core_dims=("p2", "p"),
                                     dims={"chain": 4, "g": 2})
        assert d2.type.dims == ("chain", "g", "p")

    def test_dirichlet_and_multinomial(self):
        from pytensor_tpu.xtensor import random as pxr

        srng = self._srng()
        al = px.as_xtensor(np.array([2.0, 3.0, 5.0]), dims=("k",))
        d = pxr.dirichlet(srng, al, core_dims="k", dims={"chain": 300})
        v = np.asarray(ptt.function([], d.values)())
        assert d.type.dims == ("chain", "k")
        np.testing.assert_allclose(v.sum(-1), 1.0)
        np.testing.assert_allclose(v.mean(0), [0.2, 0.3, 0.5], atol=0.06)
        p = px.as_xtensor(np.array([0.2, 0.3, 0.5]), dims=("k",))
        m = pxr.multinomial(srng, 10, p, core_dims="k", dims={"chain": 100})
        mv = np.asarray(ptt.function([], m.values)())
        assert (mv.sum(-1) == 10).all()


def test_grad_through_convolve1d():
    """Generic XOp pullback flows through the new signal op (verified
    against central finite differences)."""
    x = px.xtensor("x", dims=("a", "b"), shape=(2, 6), dtype="float64")
    k = px.as_xtensor(np.array([1.0, 2.0, 1.0]), dims=("t",))
    y = px.convolve1d(x, k, mode="valid", dims=("b", "t")).sum().values
    g = ptt.grad(y, x)
    f = ptt.function([x], g.values)
    xv = np.random.default_rng(0).standard_normal((2, 6))
    r = np.asarray(f(xv))
    eps = 1e-6
    fd = np.zeros_like(xv)

    def val(xx):
        return sum(np.convolve(row, [1, 2, 1], "valid").sum() for row in xx)

    for i in range(2):
        for j in range(6):
            d = np.zeros_like(xv)
            d[i, j] = eps
            fd[i, j] = (val(xv + d) - val(xv - d)) / (2 * eps)
    np.testing.assert_allclose(r, fd, atol=1e-6)
