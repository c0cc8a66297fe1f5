"""Assumption-engine scenarios mirroring /root/reference/tests/assumptions/
(test_triangular, test_orthogonal, test_positive_definite, test_dot,
test_elemwise, test_dimshuffle, test_blockwise, test_subtensor,
test_permutation analogs), plus the rewrites the facts feed:
cholesky-solve selection, assert removal, symmetric-eig dispatch."""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.assumptions import (
    AssumptionFeature,
    FactState,
    assume,
    holds,
    holds_in,
)
from pytensor_tpu.tensor import linalg as ptl

T, F, U = FactState.TRUE, FactState.FALSE, FactState.UNKNOWN


class TestTriangular:
    def test_cholesky_triangularity(self):
        A = pt.dmatrix("A")
        L = ptl.cholesky(A)
        assert holds(L, "lower_triangular") == T
        assert holds(L, "upper_triangular") == F
        assert holds(pt.matrix_transpose(L), "upper_triangular") == T

    def test_inv_propagates_triangular(self):
        A = pt.dmatrix("A")
        assume(A, "lower_triangular")
        assert holds(ptl.inv(A), "lower_triangular") == T

    def test_qr_r_is_upper_triangular(self):
        A = pt.dmatrix("A")
        Q, R = ptl.qr(A)
        assert holds(R, "upper_triangular") == T

    def test_lu_factors(self):
        A = pt.dmatrix("A")
        p, lo, up = ptl.lu(A)
        assert holds(lo, "lower_triangular") == T
        assert holds(up, "upper_triangular") == T

    def test_product_of_triangulars(self):
        A = pt.dmatrix("A")
        B = pt.dmatrix("B")
        assume(A, "lower_triangular")
        assume(B, "lower_triangular")
        assert holds(pt.dot(A, B), "lower_triangular") == T
        assert holds(pt.dot(A, B), "upper_triangular") == U


class TestOrthogonal:
    def test_square_qr_q_is_orthogonal(self):
        A = pt.tensor("A", dtype="float64", shape=(4, 4))
        Q, R = ptl.qr(A)
        assert holds(Q, "orthogonal") == T

    def test_rectangular_qr_q_not_claimed(self):
        A = pt.tensor("A", dtype="float64", shape=(6, 4))
        Q, R = ptl.qr(A)
        assert holds(Q, "orthogonal") == U

    def test_svd_square_uv_orthogonal(self):
        A = pt.tensor("A", dtype="float64", shape=(4, 4))
        Uo, s, V = ptl.svd(A)
        assert holds(Uo, "orthogonal") == T
        assert holds(s, "non_negative") == T

    def test_permutation_rows_of_eye(self):
        E = pt.eye(4, 4, 0, dtype="float64")
        P = E[pt.constant(np.array([2, 0, 3, 1]))]
        assert holds(P, "orthogonal") == T
        # not a permutation: repeated row
        P2 = E[pt.constant(np.array([2, 2, 3, 1]))]
        assert holds(P2, "orthogonal") == U

    def test_product_of_orthogonals(self):
        Q1 = pt.dmatrix("Q1")
        Q2 = pt.dmatrix("Q2")
        assume(Q1, "orthogonal")
        assume(Q2, "orthogonal")
        assert holds(pt.dot(Q1, Q2), "orthogonal") == T


class TestPositiveDefinite:
    def test_gram_of_cholesky(self):
        A = pt.dmatrix("A")
        L = ptl.cholesky(A)
        G = pt.dot(L, pt.matrix_transpose(L))
        assert holds(G, "symmetric") == T
        assert holds(G, "positive_definite") == T

    def test_eigh_of_pd_has_positive_eigs(self):
        A = pt.dmatrix("A")
        assume(A, "positive_definite")
        w, v = ptl.eigh(A)
        assert holds(w, "positive") == T
        assert holds(v, "orthogonal") == T


class TestElemwiseAndValueFacts:
    def test_exp_positive(self):
        x = pt.dvector("x")
        assert holds(pt.exp(x), "positive") == T
        assert holds(pt.exp(x) + pt.sigmoid(x), "positive") == T

    def test_value_facts_pass_shape_ops(self):
        x = pt.dvector("x")
        assume(x, "positive")
        assert holds(x[1:3], "positive") == T
        assert holds(pt.reshape(x, (x.shape[0], 1)), "positive") == T
        assert holds(pt.specify_shape(x, (5,)), "positive") == T
        assert holds(pt.join(0, x, x), "positive") == T

    def test_symmetric_closed_under_elemwise(self):
        A = pt.dmatrix("A")
        assume(A, "symmetric")
        assert holds(pt.exp(A) * 2 + A, "symmetric") == T


class TestBlockwise:
    def test_blockwise_cholesky_lower_triangular(self):
        from pytensor_tpu.tensor.blockwise import Blockwise
        from pytensor_tpu.tensor.linalg import Cholesky

        A = pt.tensor("A", dtype="float64", shape=(5, 3, 3))
        L = Blockwise(Cholesky(lower=True), signature="(n,n)->(n,n)")(A)
        assert holds(L, "lower_triangular") == T
        assert holds(L, "upper_triangular") == F


class TestFeatureCache:
    def test_feature_caches_and_invalidates(self):
        from pytensor_tpu.graph.fg import FunctionGraph

        A = pt.dmatrix("A")
        L = ptl.cholesky(A)
        fg = FunctionGraph([A], [L], clone=False)
        feat = AssumptionFeature()
        fg.attach_feature(feat)
        assert holds_in(fg, L, "lower_triangular") == T
        assert (L, "lower_triangular") in feat._cache
        feat.on_import(fg, L.owner, "test")
        assert not feat._cache

    def test_feature_attached_by_default_pipeline(self):
        x = pt.dvector("x")
        f = ptt.function([x], pt.exp(x) + 1)
        # AssumeOpt (optdb 0.11) attached the feature; it stays on the
        # compiled fgraph (no UnAssume pass — caches clear on mutation)
        assert hasattr(f.fgraph, "assumption_feature")


class TestAssumptionDrivenRewrites:
    def test_cholesky_solve_selection(self):
        A = pt.dmatrix("A")
        b = pt.dvector("b")
        assume(A, "positive_definite")
        f = ptt.function([A, b], ptl.solve(A, b, b_ndim=1))
        solves = [n.op for n in f.fgraph.toposort()
                  if type(n.op).__name__ in ("Solve", "CholeskySolve")]
        assert solves and all(
            type(o).__name__ == "CholeskySolve"
            or getattr(o, "assume_a", "gen") == "pos" for o in solves)
        rng = np.random.default_rng(0)
        M = rng.standard_normal((4, 4))
        Av = M @ M.T + 4 * np.eye(4)
        bv = rng.standard_normal(4)
        np.testing.assert_allclose(np.asarray(f(Av, bv)),
                                   np.linalg.solve(Av, bv), rtol=1e-8)

    def test_assert_removal(self):
        from pytensor_tpu.raise_op import Assert

        x = pt.dvector("x")
        checked = Assert("positive")(pt.exp(x).sum(), pt.exp(x).sum())
        f = ptt.function([x], checked)
        assert "Assert" not in "".join(
            type(n.op).__name__ for n in f.fgraph.toposort())

    def test_symmetric_eig_dispatch(self):
        A = pt.dmatrix("A")
        assume(A, "symmetric")
        w, v = ptl.eig(A)
        f = ptt.function([A], [w, v])
        ops = [type(n.op).__name__ for n in f.fgraph.toposort()]
        assert "Eigh" in ops and "Eig" not in ops, ops
        rng = np.random.default_rng(1)
        M = rng.standard_normal((4, 4))
        Av = M + M.T
        wv = np.asarray(f(Av)[0])
        np.testing.assert_allclose(np.sort(wv.real),
                                   np.sort(np.linalg.eigvalsh(Av)),
                                   rtol=1e-9)