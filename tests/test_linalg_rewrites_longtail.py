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

class TestDiagonalClosedForms:
    """Round-3 batch 2: diag-operand closed forms (reference
    decomposition.py svd/eigh/eigvalsh/lu/lu_factor/qr/schur/qz _of_diag,
    products.py expm_of_diag / det_of_permutation)."""

    def _dmat(self, name="A"):
        A = pt.dmatrix(name)
        assume(A, "diagonal")
        return A

    def test_eigh_of_diag(self):
        A = self._dmat()
        w, v = ptl.eigh(A)
        f = ptt.function([A], [w, v])
        assert "Eigh" not in _ops(f)
        D = np.diag(np.array([3.0, -1.0, 2.0]))
        wv, vv = (np.asarray(r) for r in f(D))
        np.testing.assert_allclose(wv, np.array([-1.0, 2.0, 3.0]))
        # columns are an orthonormal eigenbasis: D v_k = w_k v_k
        np.testing.assert_allclose(vv.T @ vv, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(D @ vv, vv @ np.diag(wv), atol=1e-12)

    def test_generalized_eigvalsh_of_diag(self):
        A = self._dmat("A")
        B = self._dmat("B")
        f = ptt.function([A, B], ptl.eigvalsh(A, B))
        assert "GeneralizedEigvalsh" not in _ops(f)
        Av = np.diag(np.array([6.0, -2.0, 3.0]))
        Bv = np.diag(np.array([2.0, 1.0, 3.0]))
        import scipy.linalg as sla
        np.testing.assert_allclose(
            np.asarray(f(Av, Bv)),
            sla.eigh(Av, Bv, eigvals_only=True), atol=1e-12)

    @pytest.mark.parametrize("compute_uv", [False, True])
    def test_svd_of_diag(self, compute_uv):
        A = self._dmat()
        outs = ptl.svd(A, compute_uv=compute_uv)
        f = ptt.function([A], outs if compute_uv else [outs])
        assert "SVD" not in _ops(f)
        D = np.diag(np.array([-3.0, 1.0, 2.0]))
        if compute_uv:
            U, s, Vh = (np.asarray(r) for r in f(D))
            np.testing.assert_allclose(s, np.array([3.0, 2.0, 1.0]))
            np.testing.assert_allclose(U @ np.diag(s) @ Vh, D, atol=1e-12)
            np.testing.assert_allclose(U.T @ U, np.eye(3), atol=1e-12)
            np.testing.assert_allclose(Vh @ Vh.T, np.eye(3), atol=1e-12)
        else:
            np.testing.assert_allclose(np.asarray(f(D)[0]),
                                       np.array([3.0, 2.0, 1.0]))

    @pytest.mark.parametrize("permute_l", [False, True])
    def test_lu_of_diag(self, permute_l):
        A = self._dmat()
        outs = ptl.lu(A, permute_l=permute_l)
        f = ptt.function([A], list(outs))
        assert "Lu" not in _ops(f)
        D = np.diag(np.array([2.0, 5.0, -1.0]))
        res = [np.asarray(r) for r in f(D)]
        if permute_l:
            PL, U = res
            np.testing.assert_allclose(PL @ U, D, atol=1e-12)
            np.testing.assert_allclose(PL, np.eye(3))
        else:
            P, L, U = res
            np.testing.assert_allclose(P @ L @ U, D, atol=1e-12)
            np.testing.assert_allclose(L, np.eye(3))

    def test_lu_factor_of_diag(self):
        A = self._dmat()
        lu_, piv = ptl.lu_factor(A)
        f = ptt.function([A], [lu_, piv])
        assert "LUFactor" not in _ops(f)
        D = np.diag(np.array([2.0, 5.0, -1.0]))
        import scipy.linalg as sla
        ref_lu, ref_piv = sla.lu_factor(D)
        got_lu, got_piv = (np.asarray(r) for r in f(D))
        np.testing.assert_allclose(got_lu, ref_lu, atol=1e-12)
        np.testing.assert_array_equal(got_piv, ref_piv)

    @pytest.mark.parametrize("mode", ["reduced", "r", "complete"])
    def test_qr_of_diag(self, mode):
        A = self._dmat()
        outs = ptl.qr(A, mode=mode)
        f = ptt.function([A], list(outs) if mode != "r" else [outs])
        assert "QR" not in _ops(f)
        D = np.diag(np.array([-4.0, 9.0, 1.0]))
        res = [np.asarray(r) for r in f(D)]
        if mode == "r":
            (R,) = res
            np.testing.assert_allclose(np.abs(np.diag(R)),
                                       np.abs(np.diag(D)), atol=1e-12)
            np.testing.assert_allclose(R, np.triu(R))
        else:
            Q, R = res
            np.testing.assert_allclose(Q @ R, D, atol=1e-12)
            np.testing.assert_allclose(Q.T @ Q, np.eye(3), atol=1e-12)
            np.testing.assert_allclose(R, np.triu(R))

    def test_schur_of_diag(self):
        A = self._dmat()
        T, Z = ptl.schur(A)
        f = ptt.function([A], [T, Z])
        assert "Schur" not in _ops(f)
        D = np.diag(np.array([1.0, -2.0, 3.0]))
        Tv, Zv = (np.asarray(r) for r in f(D))
        np.testing.assert_allclose(Zv @ Tv @ Zv.T, D, atol=1e-12)

    def test_qz_of_diag(self):
        A = self._dmat("A")
        B = self._dmat("B")
        AA, BB, Q, Z = ptl.qz(A, B)
        f = ptt.function([A, B], [AA, BB, Q, Z])
        assert "QZ" not in _ops(f)
        Av = np.diag(np.array([1.0, -2.0, 3.0]))
        Bv = np.diag(np.array([2.0, 1.0, 5.0]))
        AAv, BBv, Qv, Zv = (np.asarray(r) for r in f(Av, Bv))
        np.testing.assert_allclose(Qv @ AAv @ Zv.T, Av, atol=1e-12)
        np.testing.assert_allclose(Qv @ BBv @ Zv.T, Bv, atol=1e-12)

    def test_expm_of_diag(self):
        A = self._dmat()
        f = ptt.function([A], ptl.expm(A))
        assert "Expm" not in _ops(f)
        D = np.diag(np.array([0.0, 1.0, -2.0]))
        import scipy.linalg as sla
        np.testing.assert_allclose(np.asarray(f(D)), sla.expm(D),
                                   rtol=1e-12, atol=1e-12)

    def test_det_of_permutation_constant(self):
        # odd permutation as a graph constant: sign inferred, no Det
        P = np.eye(4)[[1, 0, 2, 3]]
        x = pt.dscalar("x")
        f = ptt.function([x], x * ptl.det(pt.as_tensor_variable(P)))
        assert "Det" not in _ops(f)
        assert float(np.asarray(f(1.0))) == -1.0

    def test_det_of_permutation_assumed(self):
        P = pt.dmatrix("P")
        assume(P, "permutation")
        f = ptt.function([P], ptl.det(P))
        assert "Det" not in _ops(f)
        rng = np.random.default_rng(3)
        for _ in range(4):
            perm = rng.permutation(5)
            Pv = np.eye(5)[perm]
            np.testing.assert_allclose(float(np.asarray(f(Pv))),
                                       np.linalg.det(Pv), atol=1e-12)

    def test_permutation_inferred_from_eye_rows(self):
        # eye(n)[const_perm] is recognized structurally -> det folds
        idx = pt.as_tensor_variable(np.array([2, 0, 1]))
        P = pt.eye(3)[idx]
        x = pt.dscalar("x")
        f = ptt.function([x], x * ptl.det(P))
        assert "Det" not in _ops(f)
        np.testing.assert_allclose(float(np.asarray(f(1.0))),
                                   np.linalg.det(np.eye(3)[[2, 0, 1]]))

    def test_orthogonal_gram_to_eye(self):
        Q = pt.dmatrix("Q")
        assume(Q, "orthogonal")
        f = ptt.function([Q], pt.dot(Q, pt.matrix_transpose(Q)))
        assert "Dot" not in _ops(f) and "Dot22" not in _ops(f)
        rng = np.random.default_rng(4)
        Qv, _ = np.linalg.qr(rng.standard_normal((4, 4)))
        np.testing.assert_allclose(np.asarray(f(Qv)), np.eye(4), atol=1e-12)

    def test_permutation_implies_orthogonal(self):
        from pytensor_tpu.assumptions import FactState, holds
        P = pt.dmatrix("P")
        assume(P, "permutation")
        assert holds(P, "orthogonal") == FactState.TRUE
        # inv(P) -> P^T via the orthogonal rule
        f = ptt.function([P], ptl.inv(P))
        assert "MatrixInverse" not in _ops(f)
        Pv = np.eye(4)[[3, 1, 0, 2]]
        np.testing.assert_allclose(np.asarray(f(Pv)), np.linalg.inv(Pv))
