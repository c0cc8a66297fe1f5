"""Round-3 linalg rewrite long tail (reference tensor/rewriting/linalg/
{inverse,solvers,summary,decomposition}.py) — structure + numerics."""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.assumptions import assume
from pytensor_tpu.tensor import linalg as ptl


def _ops(f):
    return [type(n.op).__name__ for n in f.fgraph.toposort()]


def _spd(n, rng):
    a = rng.standard_normal((n, n))
    return a @ a.T + n * np.eye(n)


class TestInverseRules:
    def test_transpose_of_inv(self):
        A = pt.dmatrix("A")
        y = pt.matrix_transpose(ptl.inv(A))
        f = ptt.function([A], y)
        # canonical form: transpose feeds the inverse, then inv lowers;
        # numerics are what matter
        rng = np.random.default_rng(0)
        Av = _spd(5, rng)
        np.testing.assert_allclose(np.asarray(f(Av)),
                                   np.linalg.inv(Av).T, rtol=1e-9)

    def test_det_of_inv(self):
        A = pt.dmatrix("A")
        f = ptt.function([A], ptl.det(ptl.inv(A)))
        assert "MatrixInverse" not in _ops(f)
        rng = np.random.default_rng(1)
        Av = _spd(4, rng)
        np.testing.assert_allclose(float(np.asarray(f(Av))),
                                   1.0 / np.linalg.det(Av), rtol=1e-8)

    def test_inv_of_diag_to_reciprocal(self):
        A = pt.dmatrix("A")
        assume(A, "diagonal")
        f = ptt.function([A], ptl.inv(A))
        assert "MatrixInverse" not in _ops(f)
        d = np.diag(np.array([2.0, 4.0, 8.0]))
        np.testing.assert_allclose(np.asarray(f(d)), np.linalg.inv(d))


class TestSolveRules:
    def test_scalar_solve_to_division(self):
        A = pt.tensor("A", dtype="float64", shape=(1, 1))
        b = pt.tensor("b", dtype="float64", shape=(1,))
        f = ptt.function([A, b], ptl.solve(A, b, b_ndim=1))
        assert "Solve" not in _ops(f)
        np.testing.assert_allclose(
            np.asarray(f(np.array([[4.0]]), np.array([8.0]))), [2.0])

    def test_solve_of_inv_to_matmul(self):
        A = pt.dmatrix("A")
        b = pt.dvector("b")
        f = ptt.function([A, b], ptl.solve(ptl.inv(A), b, b_ndim=1))
        ops = _ops(f)
        assert "MatrixInverse" not in ops and "Solve" not in ops
        rng = np.random.default_rng(2)
        Av = _spd(4, rng)
        bv = rng.standard_normal(4)
        np.testing.assert_allclose(np.asarray(f(Av, bv)), Av @ bv,
                                   rtol=1e-9)

    def test_paired_triangular_solves_to_cho_solve(self):
        A = pt.dmatrix("A")
        b = pt.dvector("b")
        L = ptl.cholesky(A)
        x = ptl.solve_triangular(
            pt.matrix_transpose(L),
            ptl.solve_triangular(L, b, lower=True), lower=False)
        f = ptt.function([A, b], x)
        ops = _ops(f)
        assert "CholeskySolve" in ops
        assert ops.count("SolveTriangular") == 0
        rng = np.random.default_rng(3)
        Av = _spd(5, rng)
        bv = rng.standard_normal(5)
        np.testing.assert_allclose(np.asarray(f(Av, bv)),
                                   np.linalg.solve(Av, bv), rtol=1e-8)

    def test_orthogonal_solve(self):
        Q = pt.dmatrix("Q")
        assume(Q, "orthogonal")
        b = pt.dvector("b")
        f = ptt.function([Q, b], ptl.solve(Q, b, b_ndim=1))
        assert "Solve" not in _ops(f)
        rng = np.random.default_rng(4)
        Qv, _ = np.linalg.qr(rng.standard_normal((4, 4)))
        bv = rng.standard_normal(4)
        np.testing.assert_allclose(np.asarray(f(Qv, bv)),
                                   np.linalg.solve(Qv, bv), rtol=1e-9)


class TestDecompositionRules:
    def test_cholesky_of_gram_of_cholesky(self):
        A = pt.dmatrix("A")
        L = ptl.cholesky(A)
        again = ptl.cholesky(pt.dot(L, pt.matrix_transpose(L)))
        f = ptt.function([A], again)
        assert _ops(f).count("Cholesky") == 1
        rng = np.random.default_rng(5)
        Av = _spd(4, rng)
        np.testing.assert_allclose(np.asarray(f(Av)),
                                   np.linalg.cholesky(Av), rtol=1e-8)

    def test_svd_uv_merge(self):
        A = pt.dmatrix("A")
        U, s, V = ptl.svd(A, compute_uv=True, full_matrices=False)
        s_only = ptl.svd(A, compute_uv=False, full_matrices=False)
        f = ptt.function([A], [s_only, U])
        svds = [n for n in f.fgraph.toposort()
                if type(n.op).__name__ == "SVD"]
        assert len(svds) == 1
        rng = np.random.default_rng(6)
        Av = rng.standard_normal((5, 3))
        sv = np.asarray(f(Av)[0])
        np.testing.assert_allclose(sv, np.linalg.svd(Av, compute_uv=False),
                                   rtol=1e-9)


class TestSummaryRules:
    def test_log_prod_to_sum_log(self):
        x = pt.dvector("x")
        assume(x, "positive")
        f = ptt.function([x], pt.log(pt.prod(x)))
        names = [getattr(getattr(n.op, "scalar_op", None), "name", "")
                 for n in f.fgraph.toposort()]
        assert "mul" not in names or "add" in names
        v = np.array([1e200, 1e200, 1e-150])
        # the naive prod overflows; sum-of-logs does not
        np.testing.assert_allclose(float(np.asarray(f(v))),
                                   np.sum(np.log(v)), rtol=1e-12)