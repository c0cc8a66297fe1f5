"""Long-tail parity components: schur/qz/tridiagonal/lstsq/ARE solvers,
mgrid/ogrid/meshgrid, join_dims/split_dims, FrozenFunctionGraph,
Dot22Scalar, misc utils."""

import numpy as np
import pytest
import scipy.linalg as sla

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.tensor import linalg as ptl

rng = np.random.default_rng(7)


class TestLinalgLongtail:
    def test_schur(self):
        A = pt.dmatrix("A")
        Av = rng.random((5, 5))
        T, Z = ptl.schur(A)
        Tv, Zv = (np.asarray(v) for v in ptt.function([A], [T, Z])(Av))
        np.testing.assert_allclose(Zv @ Tv @ Zv.T, Av, atol=1e-10)
        # quasi-triangular: strictly-lower part below the first subdiagonal is 0
        assert np.allclose(np.tril(Tv, -2), 0.0)

    def test_qz(self):
        A, B = pt.dmatrix("A"), pt.dmatrix("B")
        Av = rng.random((4, 4))
        Bv = rng.random((4, 4)) + 4 * np.eye(4)
        AA, BB, Q, Z = ptl.qz(A, B)
        aa, bb, q, z = (np.asarray(v)
                        for v in ptt.function([A, B], [AA, BB, Q, Z])(Av, Bv))
        np.testing.assert_allclose(q @ aa @ z.T, Av, atol=1e-9)
        np.testing.assert_allclose(q @ bb @ z.T, Bv, atol=1e-9)

    def test_tridiagonal_solve_and_grad(self):
        from pytensor_tpu.gradient import verify_grad

        n = 6
        dl = np.r_[0.0, rng.random(n - 1)]
        d = 4 + rng.random(n)
        du = np.r_[rng.random(n - 1), 0.0]
        bv = rng.random(n)
        M = np.diag(d) + np.diag(dl[1:], -1) + np.diag(du[:-1], 1)
        args = [pt.as_tensor_variable(v) for v in (dl, d, du, bv)]
        x = ptl.tridiagonal_solve(*args)
        for mode in (None, "FAST_COMPILE"):
            xv = np.asarray(ptt.function([], x, mode=mode)())
            np.testing.assert_allclose(xv, np.linalg.solve(M, bv), rtol=1e-10)
        verify_grad(lambda a, b, c, e: ptl.tridiagonal_solve(a, b, c, e).sum(),
                    [dl, d, du, bv], rng=rng)

    def test_tridiagonal_solve_2d_rhs(self):
        n = 5
        dl = np.r_[0.0, rng.random(n - 1)]
        d = 4 + rng.random(n)
        du = np.r_[rng.random(n - 1), 0.0]
        bv = rng.random((n, 3))
        M = np.diag(d) + np.diag(dl[1:], -1) + np.diag(du[:-1], 1)
        x = ptl.tridiagonal_solve(*[pt.as_tensor_variable(v)
                                    for v in (dl, d, du, bv)])
        np.testing.assert_allclose(np.asarray(ptt.function([], x)()),
                                   np.linalg.solve(M, bv), rtol=1e-10)

    def test_lstsq(self):
        Am = rng.random((6, 4))
        bm = rng.random(6)
        a_, b_ = pt.dmatrix("a"), pt.dvector("b")
        x_, res_, rank_, s_ = ptl.lstsq(a_, b_)
        xs, rs, rk, sv = (np.asarray(v) for v in
                          ptt.function([a_, b_], [x_, res_, rank_, s_])(Am, bm))
        xe, re_, rke, se = np.linalg.lstsq(Am, bm, rcond=None)
        np.testing.assert_allclose(xs, xe, rtol=1e-8)
        assert int(rk) == rke
        np.testing.assert_allclose(sv, se, rtol=1e-10)
        np.testing.assert_allclose(rs, re_, rtol=1e-8)

    def test_discrete_are_and_ift_grads(self):
        Av = np.array([[0.9, 0.1], [0.0, 0.8]])
        Bv = np.array([[0.0], [1.0]])
        Qv = np.eye(2)
        Rv = np.array([[1.0]])
        a, b, q, r = (pt.dmatrix("a"), pt.dmatrix("b"),
                      pt.dmatrix("q"), pt.dmatrix("r"))
        X = ptl.solve_discrete_are(a, b, q, r)
        Xv = np.asarray(ptt.function([a, b, q, r], X)(Av, Bv, Qv, Rv))
        np.testing.assert_allclose(Xv, sla.solve_discrete_are(Av, Bv, Qv, Rv),
                                   rtol=1e-9)
        grads = [ptt.grad(X.sum(), v) for v in (a, b, q, r)]
        G = [np.asarray(v) for v in
             ptt.function([a, b, q, r], grads, mode="FAST_COMPILE")(Av, Bv, Qv, Rv)]

        def dare_sum(A, B, Q, R):
            return sla.solve_discrete_are(A, B, Q, R).sum()

        eps = 1e-6
        # directional FD with admissible (symmetric where required) directions
        Ea = rng.standard_normal((2, 2))
        num = (dare_sum(Av + eps * Ea, Bv, Qv, Rv)
               - dare_sum(Av - eps * Ea, Bv, Qv, Rv)) / (2 * eps)
        np.testing.assert_allclose((G[0] * Ea).sum(), num, rtol=1e-5)
        Eq = rng.standard_normal((2, 2))
        Eq = Eq + Eq.T
        num = (dare_sum(Av, Bv, Qv + eps * Eq, Rv)
               - dare_sum(Av, Bv, Qv - eps * Eq, Rv)) / (2 * eps)
        np.testing.assert_allclose((G[2] * Eq).sum(), num, rtol=1e-5)

    def test_continuous_are(self):
        Av = np.array([[0.9, 0.1], [0.0, 0.8]])
        Bv = np.array([[0.0], [1.0]])
        Qv = np.eye(2)
        Rv = np.array([[1.0]])
        a, b, q, r = (pt.dmatrix("a"), pt.dmatrix("b"),
                      pt.dmatrix("q"), pt.dmatrix("r"))
        X = ptl.solve_continuous_are(a, b, q, r)
        Xv = np.asarray(ptt.function([a, b, q, r], X)(Av, Bv, Qv, Rv))
        np.testing.assert_allclose(Xv,
                                   sla.solve_continuous_are(Av, Bv, Qv, Rv),
                                   rtol=1e-9)


class TestGridsAndReshape:
    def test_mgrid_ogrid(self):
        g = pt.mgrid[0:4, 0:3]
        np.testing.assert_array_equal(np.asarray(g.eval()), np.mgrid[0:4, 0:3])
        for a, b in zip(pt.ogrid[0:4, 0:3], np.ogrid[0:4, 0:3]):
            np.testing.assert_array_equal(np.asarray(a.eval()), b)

    def test_meshgrid(self):
        xs, ys = np.arange(3.0), np.arange(4.0)
        for ind in ("xy", "ij"):
            outs = pt.meshgrid(pt.as_tensor_variable(xs),
                               pt.as_tensor_variable(ys), indexing=ind)
            for a, b in zip(outs, np.meshgrid(xs, ys, indexing=ind)):
                np.testing.assert_array_equal(np.asarray(a.eval()), b)

    def test_join_split_dims(self):
        x = pt.tensor("x", dtype="float64", shape=(2, 3, 4))
        v = np.arange(24.0).reshape(2, 3, 4)
        j = pt.join_dims(x, 0, 2)
        np.testing.assert_array_equal(
            np.asarray(ptt.function([x], j)(v)), v.reshape(6, 4))
        sp = pt.split_dims(j, 0, [2, 3])
        np.testing.assert_array_equal(np.asarray(ptt.function([x], sp)(v)), v)
        with pytest.raises(ValueError):
            pt.join_dims(x, 2, 2)


class TestDot22Scalar:
    def test_rewrite_and_grad(self):
        from pytensor_tpu.tensor.blas import Dot22Scalar

        x, y, a = pt.dmatrix("x"), pt.dmatrix("y"), pt.dscalar("a")
        out = a * pt.dot(x, y)
        f = ptt.function([x, y, a], out)
        assert any(isinstance(n.op, Dot22Scalar) for n in f.fgraph.apply_nodes)
        X, Y = rng.random((3, 4)), rng.random((4, 2))
        np.testing.assert_allclose(np.asarray(f(X, Y, 2.5)), 2.5 * (X @ Y),
                                   rtol=1e-12)
        ga = np.asarray(ptt.function([x, y, a],
                                     ptt.grad(out.sum(), a))(X, Y, 2.5))
        np.testing.assert_allclose(ga, (X @ Y).sum(), rtol=1e-12)


class TestFrozenFunctionGraph:
    def test_structural_eq_hash_bind(self):
        from pytensor_tpu.graph.fg import FrozenFunctionGraph, equal_computations

        x, y = pt.dvector("x"), pt.dvector("y")
        f1 = FrozenFunctionGraph([x], [pt.exp(x) + 1])
        f2 = FrozenFunctionGraph([y], [pt.exp(y) + 1])
        f3 = FrozenFunctionGraph([y], [pt.exp(y) * 2])
        assert f1 == f2 and hash(f1) == hash(f2)
        assert f1 != f3
        with pytest.raises(TypeError):
            f1.replace(f1.outputs[0], f1.inputs[0])
        m = f1.unfreeze()
        m.replace(m.outputs[0], m.inputs[0])  # mutable clone works
        (out,) = f1.bind(pt.as_tensor_variable(np.arange(3.0)))
        np.testing.assert_allclose(np.asarray(out.eval()),
                                   np.exp(np.arange(3.0)) + 1)
        assert equal_computations([pt.exp(x)], [pt.exp(y)], [x], [y])
        assert not equal_computations([pt.exp(x)], [pt.log(y)], [x], [y])


class TestMiscUtils:
    def test_may_share_memory(self):
        from pytensor_tpu.utils import may_share_memory

        a = np.arange(5.0)
        assert may_share_memory(a, a[1:])
        assert not may_share_memory(a, np.arange(5.0))
        with pytest.raises(TypeError):
            may_share_memory(a, "nope")
        assert not may_share_memory(a, "nope", raise_other_type=False)

    def test_frozendict_ordered_set(self):
        from pytensor_tpu.utils import OrderedSet, frozendict

        fd = frozendict(x=1)
        with pytest.raises(TypeError):
            fd["y"] = 2
        assert hash(fd) == hash(frozendict(x=1))
        s = OrderedSet([3, 1, 2])
        s.add(1)
        assert list(s) == [3, 1, 2]
        assert list(s - [1]) == [3, 2]

    def test_check_blas_probe(self):
        from pytensor_tpu.misc.check_blas import execute

        assert execute(N=64, iters=2, verbose=False) > 0

    def test_scan_profile_stats(self):
        from pytensor_tpu.scan.utils import ScanProfileStats

        s = ScanProfileStats("loop")
        s.record(10, 0.25)
        s.record(10, 0.25)
        assert s.callcount == 2 and s.nbsteps == 20


class TestLongtailSpecials:
    """owens_t / ndtri_exp / chi2sf / kv (reference scalar/math.py
    Owens_t:307, NdtriExp, chdtrc, Bessel K)."""

    def _dir_check(self, cost_fn, np_cost, args, h=1e-6, rtol=1e-5):
        import pytensor_tpu.tensor as pt2

        rng2 = np.random.default_rng(1)
        sym = [pt2.dvector(f"v{i}") for i in range(len(args))]
        cost = cost_fn(*sym)
        grads = ptt.grad(cost, sym)
        f = ptt.function(sym, [cost] + list(grads), mode="FAST_COMPILE")
        out = [np.asarray(v) for v in f(*args)]
        gv = out[1:]
        for k in range(len(args)):
            E = rng2.standard_normal(args[k].shape)
            pert_p = [a + (h * E if i == k else 0) for i, a in enumerate(args)]
            pert_m = [a - (h * E if i == k else 0) for i, a in enumerate(args)]
            num = (np_cost(*pert_p) - np_cost(*pert_m)) / (2 * h)
            np.testing.assert_allclose((gv[k] * E).sum(), num, rtol=rtol)

    def test_owens_t(self):
        import scipy.special as sps

        import pytensor_tpu.scalar.math as psm
        from pytensor_tpu.tensor.elemwise import Elemwise

        rng2 = np.random.default_rng(0)
        hv, av = rng2.random(5), rng2.random(5)
        h, a = pt.dvector("h"), pt.dvector("a")
        f = ptt.function([h, a], Elemwise(psm.owens_t)(h, a))
        np.testing.assert_allclose(np.asarray(f(hv, av)),
                                   sps.owens_t(hv, av), rtol=1e-10)
        self._dir_check(
            lambda x, y: Elemwise(psm.owens_t)(x, y).sum(),
            lambda x, y: sps.owens_t(x, y).sum(), [hv, av])

    def test_ndtri_exp(self):
        import scipy.special as sps

        import pytensor_tpu.scalar.math as psm
        from pytensor_tpu.tensor.elemwise import Elemwise

        xv = -np.random.default_rng(0).random(5) * 2 - 0.2
        x = pt.dvector("x")
        f = ptt.function([x], Elemwise(psm.ndtri_exp)(x))
        np.testing.assert_allclose(np.asarray(f(xv)),
                                   sps.ndtri(np.exp(xv)), rtol=1e-10)
        self._dir_check(
            lambda z: Elemwise(psm.ndtri_exp)(z).sum(),
            lambda z: sps.ndtri(np.exp(z)).sum(), [xv], rtol=1e-4)

    def test_chi2sf_and_kv(self):
        import scipy.special as sps

        import pytensor_tpu.scalar.math as psm
        from pytensor_tpu.tensor.elemwise import Elemwise

        xv = np.random.default_rng(0).random(5) * 5 + 0.5
        dfv = np.full(5, 3.0)
        x = pt.dvector("x")
        c = Elemwise(psm.chi2sf)(x, pt.as_tensor_variable(dfv))
        np.testing.assert_allclose(np.asarray(ptt.function([x], c)(xv)),
                                   sps.chdtrc(3.0, xv), rtol=1e-10)
        self._dir_check(
            lambda z: Elemwise(psm.chi2sf)(
                z, pt.as_tensor_variable(dfv)).sum(),
            lambda z: sps.chdtrc(3.0, z).sum(), [xv])
        kvv = Elemwise(psm.kv)(pt.as_tensor_variable(np.full(5, 1.5)), x)
        np.testing.assert_allclose(np.asarray(ptt.function([x], kvv)(xv)),
                                   sps.kv(1.5, xv), rtol=1e-8)
        self._dir_check(
            lambda z: Elemwise(psm.kv)(
                pt.as_tensor_variable(np.full(5, 1.5)), z).sum(),
            lambda z: sps.kv(1.5, z).sum(), [xv])


class TestFunctionalBatch:
    def test_nan_to_num_isfinite(self):
        x = pt.dvector("x")
        v = np.array([3.0, -np.inf, np.nan, 7.0, np.inf])
        f = ptt.function([x], [pt.nan_to_num(x), pt.isfinite(x),
                               pt.isposinf(x), pt.isneginf(x)])
        a, fi, pi_, ni_ = (np.asarray(r) for r in f(v))
        np.testing.assert_allclose(a, np.nan_to_num(v))
        np.testing.assert_array_equal(fi, np.isfinite(v))
        np.testing.assert_array_equal(pi_, np.isposinf(v))
        np.testing.assert_array_equal(ni_, np.isneginf(v))

    def test_median_roll(self):
        m = pt.dmatrix("m")
        mv = rng.random((4, 5))
        np.testing.assert_allclose(
            np.asarray(ptt.function([m], pt.median(m, axis=1))(mv)),
            np.median(mv, 1))
        np.testing.assert_allclose(
            np.asarray(ptt.function([m], pt.median(m, axis=0))(mv)),
            np.median(mv, 0))
        np.testing.assert_allclose(
            float(np.asarray(ptt.function([m], pt.median(m))(mv))),
            np.median(mv))
        np.testing.assert_allclose(
            np.asarray(ptt.function([m], pt.roll(m, 2, axis=1))(mv)),
            np.roll(mv, 2, 1))
        np.testing.assert_allclose(
            np.asarray(ptt.function([m], pt.roll(m, -1, axis=0))(mv)),
            np.roll(mv, -1, 0))

    def test_vectorize(self):
        mv = rng.random((3, 5))
        vec = pt.vectorize(lambda a, b: a * b.sum(), signature="(),(k)->()")
        r = vec(pt.as_tensor_variable(np.arange(3.0)),
                pt.as_tensor_variable(mv))
        np.testing.assert_allclose(np.asarray(r.eval()),
                                   np.arange(3.0) * mv.sum(1))

    def test_indices_and_misc(self):
        r_, c_ = pt.tril_indices(4, -1)
        np.testing.assert_array_equal(np.asarray(r_.eval()),
                                      np.tril_indices(4, -1)[0])
        assert pt.get_vector_length(pt.as_tensor_variable(np.arange(5.0))) == 5
        np.testing.assert_allclose(
            np.asarray(pt.inverse_permutation(
                pt.as_tensor_variable(np.array([2, 0, 1]))).eval()),
            [1, 2, 0])
        x = pt.dvector("x")
        st = pt.stacklists([[x[0], x[1]], [x[2], x[3]]])
        np.testing.assert_allclose(
            np.asarray(ptt.function([x], st)(np.arange(5.0))),
            [[0, 1], [2, 3]])
        assert pt.atleast_3d(x).type.ndim == 3
        np.testing.assert_allclose(
            np.asarray(ptt.function([x], pt.interp(
                x, np.array([0.0, 1.0, 2.0]),
                np.array([0.0, 10.0, 20.0])))(np.array([0.5, 1.5]))),
            [5.0, 15.0])

    def test_ctor_grid(self):
        import pytensor_tpu.tensor.type as tt

        assert tt.btensor5("x").type.dtype == "int8"
        assert tt.btensor5("x").type.ndim == 5
        assert tt.zcol("z").type.shape == (None, 1)
        a, b = tt.dscalars("a", "b")
        assert a.type.ndim == 0 and len(tt.ftensor7s("p", "q")) == 2
        assert pt.pi == np.pi and pt.newaxis is None


class TestLinalgBatch2:
    """block_diag / eigvalsh / lu_factor+lu_solve / ordqz /
    continuous-lyapunov / tensorsolve / tensorinv (reference
    tensor/linalg/ remaining surface)."""

    def test_block_diag_eigvalsh(self):
        import scipy.linalg as sla

        A, B = pt.dmatrix("A"), pt.dmatrix("B")
        Av, Bv = rng.random((3, 3)), rng.random((2, 2))
        np.testing.assert_allclose(
            np.asarray(ptt.function([A, B], ptl.block_diag(A, B))(Av, Bv)),
            sla.block_diag(Av, Bv))
        S = Av @ Av.T + np.eye(3)
        np.testing.assert_allclose(
            np.asarray(ptt.function([A], ptl.eigvalsh(A))(S)),
            np.linalg.eigvalsh(S), rtol=1e-10)
        C = pt.dmatrix("C")
        Cv = rng.random((3, 3))
        M = Cv @ Cv.T + np.eye(3)
        np.testing.assert_allclose(
            np.asarray(ptt.function([A, C], ptl.eigvalsh(A, C))(S, M)),
            sla.eigh(S, M, eigvals_only=True), rtol=1e-9)

    def test_lu_factor_solve(self):
        A, b = pt.dmatrix("A"), pt.dvector("b")
        Av = rng.random((3, 3)) + 3 * np.eye(3)
        bv = rng.random(3)
        x = ptl.lu_solve(ptl.lu_factor(A), b)
        np.testing.assert_allclose(
            np.asarray(ptt.function([A, b], x)(Av, bv)),
            np.linalg.solve(Av, bv), rtol=1e-9)

    def test_continuous_lyapunov(self):
        A, Q = pt.dmatrix("A"), pt.dmatrix("Q")
        Av = rng.random((3, 3)) - 3 * np.eye(3)
        Qv = -(rng.random((3, 3)) @ np.eye(3) + 4 * np.eye(3))
        X = np.asarray(ptt.function(
            [A, Q], ptl.solve_continuous_lyapunov(A, Q),
            mode="FAST_COMPILE")(Av, Qv))
        np.testing.assert_allclose(Av @ X + X @ Av.T, Qv, atol=1e-8)

    def test_tensorsolve_tensorinv(self):
        a4 = pt.tensor("a4", dtype="float64", shape=(2, 3, 6))
        b2 = pt.tensor("b2", dtype="float64", shape=(2, 3))
        av4, bv2 = rng.random((2, 3, 6)), rng.random((2, 3))
        np.testing.assert_allclose(
            np.asarray(ptt.function([a4, b2],
                                    ptl.tensorsolve(a4, b2))(av4, bv2)),
            np.linalg.tensorsolve(av4, bv2), rtol=1e-8)
        a6 = pt.tensor("a6", dtype="float64", shape=(6, 2, 3))
        av6 = rng.random((6, 2, 3)) + np.eye(6).reshape(6, 2, 3)
        np.testing.assert_allclose(
            np.asarray(ptt.function([a6], ptl.tensorinv(a6, ind=1))(av6)),
            np.linalg.tensorinv(av6, ind=1), rtol=1e-7)

    def test_ordqz(self):
        import scipy.linalg as sla

        A, C = pt.dmatrix("A"), pt.dmatrix("C")
        Av, Cv = rng.random((3, 3)), rng.random((3, 3)) + 3 * np.eye(3)
        outs = [np.asarray(v) for v in
                ptt.function([A, C], list(ptl.ordqz(A, C)))(Av, Cv)]
        for o, r in zip(outs, sla.ordqz(Av, Cv, sort="lhp")):
            np.testing.assert_allclose(o, r, atol=1e-9)
