"""Tests for sparse, xtensor, ifelse, special, debug modes, einsum, etc."""

import numpy as np
import pytest
import scipy.sparse as sp

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt


rng = np.random.default_rng(0)


class TestSparse:
    Sv = sp.random(6, 5, density=0.4, format="csr", random_state=0) * 1.0
    Bv = rng.random((5, 3))

    def test_structured_dot(self):
        import pytensor_tpu.sparse as psp

        S = psp.matrix("csr", "S", dtype="float64")
        B = pt.dmatrix("B")
        out = psp.structured_dot(S, B)
        for mode in ("FAST_RUN", "FAST_COMPILE"):
            f = ptt.function([S, B], out, mode=mode)
            np.testing.assert_allclose(np.asarray(f(self.Sv, self.Bv)),
                                       self.Sv @ self.Bv)

    def test_grad_dense_side(self):
        import pytensor_tpu.sparse as psp

        S = psp.matrix("csr", "S", dtype="float64")
        B = pt.dmatrix("B")
        g = ptt.grad(psp.structured_dot(S, B).sum(), B)
        f = ptt.function([S, B], g, mode="FAST_COMPILE")
        np.testing.assert_allclose(np.asarray(f(self.Sv, self.Bv)),
                                   self.Sv.T @ np.ones((6, 3)))

    def test_conversions_and_sum(self):
        import pytensor_tpu.sparse as psp

        S = psp.matrix("csr", "S", dtype="float64")
        f = ptt.function([S], [psp.dense_from_sparse(S), psp.sp_sum(S)],
                         mode="FAST_COMPILE")
        d, s = f(self.Sv)
        np.testing.assert_allclose(np.asarray(d), self.Sv.todense())
        np.testing.assert_allclose(float(np.asarray(s)), self.Sv.sum())


class TestXTensor:
    def test_align_and_reduce(self):
        from pytensor_tpu.xtensor import xtensor

        x = xtensor("x", dims=("a", "b"), dtype="float64")
        v = xtensor("v", dims=("b",), dtype="float64")
        out = (x + v).sum(dim="a")
        f = ptt.function([x, v], out.values)
        X, V = rng.random((2, 3)), rng.random(3)
        np.testing.assert_allclose(np.asarray(f(X, V)), (X + V).sum(axis=0))

    def test_xdot(self):
        from pytensor_tpu.xtensor import xtensor
        from pytensor_tpu.xtensor.ops import xdot

        x = xtensor("x", dims=("a", "b"), dtype="float64")
        y = xtensor("y", dims=("b", "c"), dtype="float64")
        f = ptt.function([x, y], xdot(x, y).values, mode="FAST_COMPILE")
        X, Y = rng.random((2, 3)), rng.random((3, 4))
        np.testing.assert_allclose(np.asarray(f(X, Y)), X @ Y)

    def test_transpose_rename_isel(self):
        from pytensor_tpu.xtensor import xtensor

        x = xtensor("x", dims=("a", "b"), dtype="float64")
        out = x.transpose("b", "a").rename({"b": "r"}).isel(r=1)
        assert out.type.dims == ("a",)
        f = ptt.function([x], out.values, mode="FAST_COMPILE")
        X = rng.random((2, 3))
        np.testing.assert_allclose(np.asarray(f(X)), X.T[1])


class TestIfElse:
    def test_values_and_grad(self):
        c = pt.lscalar("c")
        x = pt.dvector("x")
        out = ptt.ifelse(pt.gt(c, 0), x * 2, x - 1)
        f = ptt.function([c, x], out)
        v = np.arange(3.0)
        np.testing.assert_allclose(np.asarray(f(1, v)), v * 2)
        np.testing.assert_allclose(np.asarray(f(0, v)), v - 1)
        g = ptt.grad(out.sum(), x)
        fg = ptt.function([c, x], g, mode="FAST_COMPILE")
        np.testing.assert_allclose(np.asarray(fg(1, v)), [2, 2, 2])
        np.testing.assert_allclose(np.asarray(fg(0, v)), [1, 1, 1])


class TestSpecial:
    def test_softmax(self):
        import scipy.special as sps
        from pytensor_tpu.tensor.special import log_softmax, softmax

        m = pt.dmatrix("m")
        M = rng.random((3, 4))
        f = ptt.function([m], [softmax(m, axis=-1), log_softmax(m, axis=-1)])
        s, ls = f(M)
        np.testing.assert_allclose(np.asarray(s), sps.softmax(M, axis=-1), rtol=1e-8)
        np.testing.assert_allclose(np.asarray(ls), sps.log_softmax(M, axis=-1),
                                   rtol=1e-8)

    def test_softmax_grad(self):
        from pytensor_tpu.tensor.special import softmax

        ptt.verify_grad(lambda m: (softmax(m, axis=-1) ** 2).sum(),
                        [rng.random((3, 4))], rng=np.random.default_rng(3))


class TestEinsum:
    def test_values(self):
        a = pt.dmatrix("a")
        b = pt.dmatrix("b")
        A, B = rng.random((3, 4)), rng.random((4, 2))
        f = ptt.function([a, b], [pt.einsum("ij,jk->ik", a, b),
                                  pt.einsum("ij->j", a)])
        r1, r2 = f(A, B)
        np.testing.assert_allclose(np.asarray(r1), A @ B)
        np.testing.assert_allclose(np.asarray(r2), A.sum(axis=0))

    def test_grad(self):
        ptt.verify_grad(lambda a, b: pt.einsum("ij,jk->ik", a, b).sum(),
                        [rng.random((3, 4)), rng.random((4, 2))],
                        rng=np.random.default_rng(3))


class TestDebugModes:
    def test_debugmode_passes_on_good_graph(self):
        from pytensor_tpu.compile.debug import DebugMode

        x = pt.dvector("x")
        f = ptt.function([x], pt.exp(x).sum(), mode=DebugMode())
        assert np.isfinite(float(np.asarray(f(np.arange(3.0)))))

    def test_nanguard_catches_nan(self):
        from pytensor_tpu.compile.debug import NanGuardMode

        x = pt.dvector("x")
        f = ptt.function([x], pt.log(x), mode=NanGuardMode())
        with pytest.raises(AssertionError, match="NanGuard"):
            f(np.array([-1.0]))

    def test_monitormode_callback(self):
        from pytensor_tpu.compile.debug import MonitorMode

        seen = []
        mode = MonitorMode(post_func=lambda node, thunk: seen.append(node.op))
        x = pt.dvector("x")
        f = ptt.function([x], pt.exp(x) + 1, mode=mode)
        f(np.arange(3.0))
        assert len(seen) >= 1


class TestAssertPad:
    def test_assert_raises(self):
        from pytensor_tpu.raise_op import assert_op

        x = pt.dvector("x")
        out = assert_op(x, pt.all(x > 0))
        f = ptt.function([x], out.sum(), mode="FAST_COMPILE")
        assert float(np.asarray(f(np.ones(3)))) == 3.0
        with pytest.raises(AssertionError):
            f(np.array([-1.0, 1.0]))

    def test_pad_modes(self):
        x = pt.dvector("x")
        v = np.arange(4.0)
        for mode_name in ("constant", "reflect", "symmetric", "edge", "wrap"):
            out = pt.pad(x, (2, 1), mode=mode_name)
            f = ptt.function([x], out, mode="FAST_COMPILE")
            np.testing.assert_allclose(np.asarray(f(v)), np.pad(v, (2, 1),
                                                                mode=mode_name))


class TestConvFFT:
    def test_convolve1d_modes(self):
        x = pt.dvector("x")
        k = pt.as_tensor_variable(np.array([1.0, 2.0, 1.0]))
        v = rng.random(6)
        for m in ("full", "valid", "same"):
            f = ptt.function([x], pt.convolve1d(x, k, mode=m))
            np.testing.assert_allclose(np.asarray(f(v)), np.convolve(v, [1, 2, 1],
                                                                     mode=m))

    def test_fft_roundtrip(self):
        from pytensor_tpu.tensor.fft import irfft, rfft

        x = pt.dvector("x")
        v = rng.random(8)
        f = ptt.function([x], irfft(rfft(x)))
        np.testing.assert_allclose(np.asarray(f(v)), v, atol=1e-8)


class TestIfElseRewrites:
    """cond-merge + useless-ifelse (reference ifelse.py:424-691)."""

    def test_merge_same_condition(self):
        from pytensor_tpu.ifelse import IfElse, ifelse

        cv = pt.dscalar("cv")
        c = cv > 0
        x, y = pt.dvector("x"), pt.dvector("y")
        a = ifelse(c, x * 2, y + 1)
        b = ifelse(c, x - y, y * 3)
        f = ptt.function([cv, x, y], [a, b])
        assert sum(isinstance(n.op, IfElse) for n in f.fgraph.apply_nodes) == 1
        xv, yv = np.arange(3.0), np.ones(3)
        av, bv = (np.asarray(v) for v in f(1.0, xv, yv))
        np.testing.assert_allclose(av, xv * 2)
        np.testing.assert_allclose(bv, xv - yv)
        av, bv = (np.asarray(v) for v in f(-1.0, xv, yv))
        np.testing.assert_allclose(av, yv + 1)
        np.testing.assert_allclose(bv, yv * 3)

    def test_constant_condition_folds(self):
        from pytensor_tpu.ifelse import IfElse, ifelse

        x, y = pt.dvector("x"), pt.dvector("y")
        f = ptt.function([x, y], ifelse(pt.constant(np.bool_(True)), x, y))
        assert not any(isinstance(n.op, IfElse) for n in f.fgraph.apply_nodes)
        xv, yv = np.arange(3.0), np.ones(3)
        np.testing.assert_allclose(np.asarray(f(xv, yv)), xv)

    def test_same_branches_fold(self):
        from pytensor_tpu.ifelse import IfElse, ifelse

        cv = pt.dscalar("cv")
        x = pt.dvector("x")
        z = x * 2
        f = ptt.function([cv, x], ifelse(cv > 0, z, z))
        assert not any(isinstance(n.op, IfElse) for n in f.fgraph.apply_nodes)
        np.testing.assert_allclose(np.asarray(f(1.0, np.arange(3.0))),
                                   np.arange(3.0) * 2)


class TestIfElseLift:
    """ifelse_lift_single_if_through_acceptable_ops (reference
    ifelse.py:424): single-client post-ops sink into the branches so
    lax.cond executes them only on the taken path."""

    def test_elemwise_sinks_into_branches(self):
        from pytensor_tpu.ifelse import IfElse, ifelse

        c = pt.scalar("c", dtype="bool")
        x, y = pt.dvector("x"), pt.dvector("y")
        out = pt.exp(ifelse(c, x + 1, y * 2)).sum()
        f = ptt.function([c, x, y], out)
        order = f.fgraph.toposort()
        # the conditional must be the LAST node: everything sank inside
        assert isinstance(order[-1].op, IfElse)
        xv, yv = np.ones(4), 2 * np.ones(4)
        np.testing.assert_allclose(float(f(True, xv, yv)),
                                   np.exp(xv + 1).sum())
        np.testing.assert_allclose(float(f(False, xv, yv)),
                                   np.exp(yv * 2).sum())

    def test_no_lift_with_second_client(self):
        from pytensor_tpu.ifelse import IfElse, ifelse

        c = pt.scalar("c", dtype="bool")
        x, y = pt.dvector("x"), pt.dvector("y")
        z = ifelse(c, x + 1, y * 2)
        # z has TWO clients -> sinking exp would duplicate z's compute
        f = ptt.function([c, x, y], [pt.exp(z).sum(), z * 3])
        order = f.fgraph.toposort()
        assert not isinstance(order[-1].op, IfElse)
        xv, yv = np.ones(4), 2 * np.ones(4)
        s, z3 = f(True, xv, yv)
        np.testing.assert_allclose(float(s), np.exp(xv + 1).sum())
        np.testing.assert_allclose(np.asarray(z3), (xv + 1) * 3)

    def test_reference_name_surface(self):
        # NB `import pytensor_tpu.ifelse as ife` binds the top-level
        # *function* (same shadowing as the reference, __init__.py:32);
        # the module path works through `from` imports.
        import importlib

        ife = importlib.import_module("pytensor_tpu.ifelse")
        for n in ("CondMerge", "cond_remove_identical",
                  "cond_merge_ifs_true", "cond_merge_ifs_false",
                  "ifelse_lift_single_if_through_acceptable_ops",
                  "apply_depends_on"):
            assert hasattr(ife, n), n


class TestAssumptionsExtended:
    def test_transpose_flips_triangularity(self):
        from pytensor_tpu.assumptions import FactState, holds
        from pytensor_tpu.tensor import linalg as ptl

        A = pt.dmatrix("A")
        L = ptl.cholesky(A)
        assert holds(pt.transpose(L), "upper_triangular") == FactState.TRUE
        assert holds(pt.transpose(L), "lower_triangular") != FactState.TRUE

    def test_solve_upper_transpose_specializes(self):
        from pytensor_tpu.tensor import linalg as ptl
        from pytensor_tpu.tensor.linalg import SolveTriangular

        A, b = pt.dmatrix("A"), pt.dvector("b")
        x = ptl.solve(pt.transpose(ptl.cholesky(A)), b, b_ndim=1)
        f = ptt.function([A, b], x)
        assert any(isinstance(n.op, SolveTriangular) and not n.op.lower
                   for n in f.fgraph.apply_nodes)

    def test_pd_solve_goes_cholesky(self):
        from pytensor_tpu.assumptions import assume
        from pytensor_tpu.tensor import linalg as ptl
        from pytensor_tpu.tensor.linalg import Solve

        A, b = pt.dmatrix("A"), pt.dvector("b")
        assume(A, "positive_definite")
        f = ptt.function([A, b], ptl.solve(A, b, b_ndim=1))
        assert any(isinstance(n.op, Solve) and n.op.assume_a == "pos"
                   for n in f.fgraph.apply_nodes)
        rng2 = np.random.default_rng(0)
        Av = rng2.random((3, 3))
        Av = Av @ Av.T + 3 * np.eye(3)
        bv = np.arange(3.0)
        np.testing.assert_allclose(np.asarray(f(Av, bv)),
                                   np.linalg.solve(Av, bv), rtol=1e-9)

    def test_inverse_preserves_pd(self):
        from pytensor_tpu.assumptions import FactState, assume, holds
        from pytensor_tpu.tensor import linalg as ptl

        A = pt.dmatrix("A")
        assume(A, "positive_definite")
        assert holds(ptl.inv(A), "positive_definite") == FactState.TRUE


class TestSparseCompat:
    """Sparse functional surface (reference sparse/basic.py exports)."""

    def _x(self):
        import scipy.sparse as ssp

        import pytensor_tpu.sparse as sp

        Xv = ssp.random(6, 5, density=0.4, format="csr", random_state=3,
                        dtype="float64")
        return sp, sp.csr_matrix("x", dtype="float64"), Xv

    def test_structured_unary_data_only(self):
        sp, x, Xv = self._x()
        f = ptt.function([x], sp.structured_exp(x), mode="FAST_COMPILE")
        exp = Xv.copy()
        exp.data = np.exp(exp.data)
        np.testing.assert_allclose(f(Xv).toarray(), exp.toarray())

    def test_row_col_scale(self):
        sp, x, Xv = self._x()
        rng2 = np.random.default_rng(0)
        v, w = rng2.random(5), rng2.random(6)
        rc = ptt.function([x], sp.col_scale(
            x, pt.as_tensor_variable(v)), mode="FAST_COMPILE")(Xv)
        np.testing.assert_allclose(rc.toarray(),
                                   Xv.multiply(v[None, :]).toarray())
        rr = ptt.function([x], sp.row_scale(
            x, pt.as_tensor_variable(w)), mode="FAST_COMPILE")(Xv)
        np.testing.assert_allclose(rr.toarray(),
                                   Xv.multiply(w[:, None]).toarray())

    def test_comparisons_densify(self):
        sp, x, Xv = self._x()
        r = np.asarray(ptt.function([x], sp.ge(x, 0.5),
                                    mode="FAST_COMPILE")(Xv))
        np.testing.assert_array_equal(r, Xv.toarray() >= 0.5)

    def test_structured_add_s_v_and_cleanups(self):
        sp, x, Xv = self._x()
        v = np.random.default_rng(0).random(5)
        sav = ptt.function([x], sp.structured_add_s_v(
            x, pt.as_tensor_variable(v)), mode="FAST_COMPILE")(Xv)
        exp = Xv.copy()
        exp.data = exp.data + v[Xv.indices]
        np.testing.assert_allclose(sav.toarray(), exp.toarray())
        cl = ptt.function([x], sp.clean(x), mode="FAST_COMPILE")(Xv)
        np.testing.assert_allclose(cl.toarray(), Xv.toarray())

    def test_diag_square_diagonal_getitem(self):
        import scipy.sparse as ssp

        sp, x, Xv = self._x()
        sq = ssp.random(5, 5, density=0.5, format="csr", random_state=1)
        dg = np.asarray(ptt.function([x], sp.diag(x),
                                     mode="FAST_COMPILE")(sq.tocsr()))
        np.testing.assert_allclose(dg, sq.toarray().diagonal())
        v = np.random.default_rng(0).random(5)
        sd = ptt.function([], sp.square_diagonal(
            pt.as_tensor_variable(v)), mode="FAST_COMPILE")()
        np.testing.assert_allclose(sd.toarray(), np.diag(v))
        gl = ptt.function([x], sp.get_item_list(
            x, np.array([0, 2])), mode="FAST_COMPILE")(Xv)
        np.testing.assert_allclose(gl.toarray(), Xv.toarray()[[0, 2]])

    def test_sub_casts_ones_like(self):
        sp, x, Xv = self._x()
        sb = ptt.function([x], sp.sub(x, x), mode="FAST_COMPILE")(Xv)
        assert np.abs(sb.toarray()).max() == 0
        ol = ptt.function([x], sp.sp_ones_like(x), mode="FAST_COMPILE")(Xv)
        assert set(np.unique(ol.toarray())) <= {0.0, 1.0}
        fc = ptt.function([x], sp.fcast(x), mode="FAST_COMPILE")(Xv)
        assert fc.dtype == np.float32


class TestSparseStructuredGrads:
    def test_structured_exp_grad_both_backends(self):
        import scipy.sparse as ssp

        import pytensor_tpu.sparse as sp

        Xv = ssp.random(6, 5, density=0.4, format="csr", random_state=3,
                        dtype="float64")
        x = sp.csr_matrix("x", dtype="float64")
        cost = sp.sp_sum(sp.structured_exp(x))
        g = ptt.grad(cost, x)
        exp = Xv.copy()
        exp.data = np.exp(exp.data)
        for mode in ("FAST_COMPILE", None):
            gv = ptt.function([x], g, mode=mode)(Xv)
            arr = (np.asarray(gv.todense()) if hasattr(gv, "todense")
                   else gv.toarray())
            np.testing.assert_allclose(arr, exp.toarray())


class TestSparseStructuredOps:
    """Round-2 structured sparse kernels (reference sparse/basic.py
    GetItemList:?, GetItem2Lists:?, Diag:?, ConstructSparseFromList) —
    no densification on either backend."""

    def _x(self):
        import scipy.sparse as ssp

        import pytensor_tpu.sparse as sp

        Xv = ssp.random(6, 5, density=0.5, format="csr", random_state=3,
                        dtype="float64")
        return sp, sp.csr_matrix("x", dtype="float64"), Xv

    @staticmethod
    def _arr(v):
        return v.toarray() if hasattr(v, "toarray") else np.asarray(v.todense())

    def test_get_item_list_with_repeats_both_backends(self):
        sp, x, Xv = self._x()
        idx = np.array([1, 1, 4, 0], dtype="int64")
        out = sp.get_item_list(x, idx)
        for mode in ("FAST_COMPILE", None):
            r = ptt.function([x], out, mode=mode)(Xv)
            np.testing.assert_allclose(self._arr(r), Xv.toarray()[idx])

    def test_get_item_list_grad(self):
        sp, x, Xv = self._x()
        idx = np.array([1, 1, 4, 0], dtype="int64")
        cost = sp.sp_sum(sp.mul(sp.get_item_list(x, idx),
                                sp.get_item_list(x, idx)))
        g = ptt.grad(cost, x)
        expected = np.zeros_like(Xv.toarray())
        sel = Xv.toarray()[idx]
        for k, i in enumerate(idx):
            expected[i] += 2 * sel[k] * (Xv.toarray()[i] != 0)
        for mode in ("FAST_COMPILE", None):
            gv = ptt.function([x], g, mode=mode)(Xv)
            np.testing.assert_allclose(self._arr(gv), expected)

    def test_get_item_2lists_and_grad(self):
        sp, x, Xv = self._x()
        rows = np.array([0, 2, 5], dtype="int64")
        cols = np.array([1, 4, 0], dtype="int64")
        out = sp.get_item_2lists(x, rows, cols)
        for mode in ("FAST_COMPILE", None):
            r = np.asarray(ptt.function([x], out, mode=mode)(Xv))
            np.testing.assert_allclose(r, Xv.toarray()[rows, cols])
        g = ptt.grad((out ** 2).sum(), x)
        expected = np.zeros_like(Xv.toarray())
        for r_, c_ in zip(rows, cols):
            expected[r_, c_] = 2 * Xv.toarray()[r_, c_]
        for mode in ("FAST_COMPILE", None):
            gv = ptt.function([x], g, mode=mode)(Xv)
            np.testing.assert_allclose(self._arr(gv), expected)

    def test_diag_both_backends_and_grad(self):
        import scipy.sparse as ssp

        sp, x, _ = self._x()
        sq = ssp.random(5, 5, density=0.6, format="csr",
                        random_state=1, dtype="float64").tocsr()
        x5 = sp.csr_matrix("x5", dtype="float64")
        d = sp.diag(x5)
        for mode in ("FAST_COMPILE", None):
            r = np.asarray(ptt.function([x5], d, mode=mode)(sq))
            np.testing.assert_allclose(r, sq.toarray().diagonal())
        g = ptt.grad((d ** 2).sum(), x5)
        gv = ptt.function([x5], g, mode="FAST_COMPILE")(sq)
        np.testing.assert_allclose(self._arr(gv),
                                   np.diag(2 * sq.toarray().diagonal()))

    def test_construct_sparse_from_list(self):
        sp, x, Xv = self._x()
        vals = pt.as_tensor_variable(
            np.arange(10, dtype="float64").reshape(2, 5))
        ilist = np.array([1, 1], dtype="int64")
        out = sp.construct_sparse_from_list(x, vals, ilist)
        for mode in ("FAST_COMPILE", None):
            r = ptt.function([x], out, mode=mode)(Xv)
            expected = np.zeros((6, 5))
            expected[1] = np.arange(5) + (np.arange(5) + 5)  # repeats sum
            np.testing.assert_allclose(self._arr(r), expected)

    def test_block_diag(self):
        import scipy.sparse as ssp

        import pytensor_tpu.sparse as sp

        a = pt.dmatrix("a")
        b = pt.dmatrix("b")
        out = sp.block_diag(a, b)
        av = np.arange(4.0).reshape(2, 2)
        bv = np.arange(9.0).reshape(3, 3) + 10
        for mode in ("FAST_COMPILE", None):
            r = ptt.function([a, b], out, mode=mode)(av, bv)
            np.testing.assert_allclose(self._arr(r),
                                       ssp.block_diag([av, bv]).toarray())
        g = ptt.grad(sp.sp_sum(sp.mul(out, out)), a)
        gv = np.asarray(ptt.function([a, b], g, mode="FAST_COMPILE")(av, bv))
        np.testing.assert_allclose(gv, 2 * av)

    def test_csm_properties_of_csm_cancels(self):
        import pytensor_tpu.sparse.basic as spb

        sp, x, Xv = self._x()
        data, indices, indptr, shape = spb.CSMProperties()(x)
        rebuilt = spb.CSM("csr")(data * 2.0, indices, indptr, shape)
        d2, i2, p2, s2 = spb.CSMProperties()(rebuilt)
        f = ptt.function([x], d2)
        # after the cancel rewrite no CSM/CSMProperties pair survives
        ops = [type(n.op).__name__ for n in f.fgraph.apply_nodes]
        assert "CSM" not in ops, ops
        np.testing.assert_allclose(np.asarray(f(Xv)), Xv.data * 2.0)

    def test_dense_from_sparse_round_trip_cancels(self):
        sp, x, Xv = self._x()
        d = pt.dmatrix("d")
        out = sp.dense_from_sparse(sp.csr_from_dense(d)) + 1.0
        f = ptt.function([d], out)
        ops = [type(n.op).__name__ for n in f.fgraph.apply_nodes]
        assert "SparseFromDense" not in ops and "DenseFromSparse" not in ops, ops
        dv = np.arange(6.0).reshape(2, 3)
        np.testing.assert_allclose(np.asarray(f(dv)), dv + 1.0)


class TestCSMGradAndFormats:
    """CSM gradient fidelity + csc layout (reference sparse/basic.py:508
    CSMGrad; csc compresses COLUMNS)."""

    @pytest.mark.parametrize("fmt", ["csr", "csc"])
    def test_csm_dense_roundtrip_and_grad(self, fmt):
        import scipy.sparse as ssp

        import pytensor_tpu.sparse as sparse

        x_pat = getattr(ssp, fmt + "_matrix")(
            np.array([[1.0, 0, 2], [0, 3, 0], [4, 5, 6], [0, 0, 7]]))
        data = pt.tensor("d", dtype="float64", shape=(x_pat.nnz,))
        xs = sparse.CSM(fmt)(data, x_pat.indices, x_pat.indptr,
                             np.array(x_pat.shape))
        dense = sparse.dense_from_sparse(xs)
        dv = np.arange(1.0, x_pat.nnz + 1)
        fw = np.asarray(ptt.function([data], dense)(dv))
        exp = getattr(ssp, fmt + "_matrix")(
            (dv, x_pat.indices, x_pat.indptr), shape=x_pat.shape).toarray()
        np.testing.assert_allclose(fw, exp)
        g = ptt.grad((dense ** 3).sum(), data)
        gv = np.asarray(ptt.function([data], g)(dv))
        np.testing.assert_allclose(gv, 3 * dv ** 2)

    def test_csm_grad_pattern_mismatch_oracle(self):
        """gz sparser than x and permuted: zeros restored in x's order."""
        import pytensor_tpu.sparse as sparse

        xd = np.array([1.0, 2, 3])
        out = sparse.CSMGrad()(
            pt.as_tensor_variable(xd), np.array([0, 2, 1]),
            np.array([0, 2, 3]), np.array([2, 3]),
            pt.as_tensor_variable(np.array([7.0])), np.array([2]),
            np.array([0, 1, 1]), np.array([2, 3]))
        r = np.asarray(ptt.function([], out, mode="FAST_COMPILE")())
        np.testing.assert_allclose(r, [0.0, 7.0, 0.0])

    def test_surface_aliases(self):
        import pytensor_tpu.sparse as sparse

        m = sparse.bsr_matrix("m", dtype="float64")
        assert m.type.format == "bsr"
        s = sparse.csr_matrix("s", dtype="float64")
        assert sparse.csm_data(s).type.ndim == 1
        assert sparse.csm_indices(s).type.ndim == 1
        assert sparse.csm_indptr(s).type.ndim == 1
        assert sparse.csm_shape(s).type.ndim == 1
        t = sparse.as_sparse_or_tensor_variable(np.eye(3))
        assert hasattr(t, "type")
