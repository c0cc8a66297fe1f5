"""Assumption-inference scenario grid (reference tests/assumptions/
{triangular,diagonal,dot,symmetric,orthogonal,permutation,
positive_definite,core}.py analogs): fact propagation correctness
through constants, constructors, factorizations, products, transposes,
and elementwise ops."""

from __future__ import annotations

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
import pytensor_tpu.tensor.linalg as ptl
from pytensor_tpu.assumptions import FactState, assume, holds

T, F, U = FactState.TRUE, FactState.FALSE, FactState.UNKNOWN


class TestConstants:
    def test_identity_is_everything(self):
        I = pt.as_tensor_variable(np.eye(4))
        for fact in ("diagonal", "symmetric", "lower_triangular",
                     "upper_triangular", "permutation"):
            assert holds(I, fact) == T, fact

    def test_dense_constant_is_false_not_unknown(self):
        A = pt.as_tensor_variable(np.arange(16.0).reshape(4, 4) + 1)
        for fact in ("diagonal", "symmetric", "lower_triangular",
                     "upper_triangular", "permutation"):
            assert holds(A, fact) == F, fact

    def test_constant_triangular_detection(self):
        L = pt.as_tensor_variable(np.tril(np.ones((4, 4))))
        assert holds(L, "lower_triangular") == T
        assert holds(L, "upper_triangular") == F

    def test_constant_value_facts(self):
        pos = pt.as_tensor_variable(np.array([1.0, 2.0]))
        assert holds(pos, "positive") == T
        assert holds(pos, "non_negative") == T
        neg = pt.as_tensor_variable(np.array([-1.0, 2.0]))
        assert holds(neg, "positive") == F
        z = pt.as_tensor_variable(np.zeros(3))
        assert holds(z, "zero") == T


class TestConstructors:
    def test_eye_facts(self):
        I = pt.eye(5)
        for fact in ("diagonal", "symmetric", "orthogonal", "permutation",
                     "positive_definite"):
            assert holds(I, fact) == T, fact

    def test_eye_offset_not_permutation(self):
        K = pt.eye(5, 5, 1)
        assert holds(K, "permutation") != T

    @pytest.mark.parametrize("offset,lower,upper,diag", [
        (0, T, T, T),
        (1, U, T, U),   # strictly upper shifted diag: not lower, is upper
        (-1, T, U, U),
    ])
    def test_diag_offset_triangularity(self, offset, lower, upper, diag):
        v = pt.dvector("v")
        D = pt.alloc_diag(v, offset=offset)
        # sound engine: TRUE claims must hold; non-true may be F or U
        if lower == T:
            assert holds(D, "lower_triangular") == T
        else:
            assert holds(D, "lower_triangular") != T
        if upper == T:
            assert holds(D, "upper_triangular") == T
        else:
            assert holds(D, "upper_triangular") != T
        if diag == T:
            assert holds(D, "diagonal") == T
        else:
            assert holds(D, "diagonal") != T

    def test_zeros_matrix_facts(self):
        Z = pt.zeros((4, 4))
        assert holds(Z, "zero") == T
        assert holds(Z, "diagonal") == T
        assert holds(Z, "symmetric") == T


class TestFactorizations:
    def test_cholesky_triangularity(self):
        A = pt.dmatrix("A")
        assert holds(ptl.cholesky(A, lower=True), "lower_triangular") == T
        assert holds(ptl.cholesky(A, lower=True), "upper_triangular") == F
        assert holds(ptl.cholesky(A, lower=False), "upper_triangular") == T

    def test_qr_outputs(self):
        A = pt.tensor("A", dtype="float64", shape=(4, 4))
        Q, R = ptl.qr(A)
        assert holds(Q, "orthogonal") == T
        assert holds(R, "upper_triangular") == T

    def test_qr_rectangular_q_not_orthogonal(self):
        A = pt.tensor("A", dtype="float64", shape=(6, 3))
        Q, R = ptl.qr(A)
        assert holds(Q, "orthogonal") != T  # column-orthonormal only

    def test_eigh_outputs(self):
        A = pt.dmatrix("A")
        assume(A, "positive_definite")
        w, V = ptl.eigh(A)
        assert holds(V, "orthogonal") == T
        assert holds(w, "positive") == T

    def test_lu_outputs(self):
        A = pt.tensor("A", dtype="float64", shape=(4, 4))
        P, L, Uu = ptl.lu(A)
        assert holds(L, "lower_triangular") == T
        assert holds(Uu, "upper_triangular") == T

    def test_svd_singular_values_nonneg(self):
        A = pt.tensor("A", dtype="float64", shape=(4, 4))
        s = ptl.svd(A, compute_uv=False)
        assert holds(s, "non_negative") == T


class TestProductsAndTranspose:
    def test_gram_is_symmetric(self):
        A = pt.dmatrix("A")
        G = pt.dot(A, pt.matrix_transpose(A))
        assert holds(G, "symmetric") == T

    def test_cholesky_gram_is_pd(self):
        A = pt.dmatrix("A")
        L = ptl.cholesky(A)
        G = pt.dot(L, pt.matrix_transpose(L))
        assert holds(G, "positive_definite") == T

    def test_dot_triangular_closure(self):
        A = pt.dmatrix("A")
        B = pt.dmatrix("B")
        assume(A, "lower_triangular")
        assume(B, "lower_triangular")
        assert holds(pt.dot(A, B), "lower_triangular") == T
        C = pt.dmatrix("C")
        assert holds(pt.dot(A, C), "lower_triangular") == U

    def test_dot_diagonal_closure(self):
        A = pt.dmatrix("A")
        B = pt.dmatrix("B")
        assume(A, "diagonal")
        assume(B, "diagonal")
        assert holds(pt.dot(A, B), "diagonal") == T

    def test_dot_permutation_closure(self):
        P1 = pt.dmatrix("P1")
        P2 = pt.dmatrix("P2")
        assume(P1, "permutation")
        assume(P2, "permutation")
        assert holds(pt.dot(P1, P2), "permutation") == T
        assert holds(pt.dot(P1, P2), "orthogonal") == T  # implication

    def test_transpose_swaps_triangularity(self):
        A = pt.dmatrix("A")
        assume(A, "lower_triangular")
        At = pt.matrix_transpose(A)
        assert holds(At, "upper_triangular") == T
        assert holds(At, "lower_triangular") == U

    def test_transpose_preserves(self):
        A = pt.dmatrix("A")
        for fact in ("diagonal", "symmetric", "orthogonal", "permutation"):
            B = pt.dmatrix(f"B_{fact}")
            assume(B, fact)
            assert holds(pt.matrix_transpose(B), fact) == T, fact

    def test_inverse_preserves_structure(self):
        for fact in ("diagonal", "lower_triangular", "upper_triangular",
                     "orthogonal", "positive_definite", "symmetric"):
            A = pt.dmatrix(f"A_{fact}")
            assume(A, fact)
            assert holds(ptl.inv(A), fact) == T, fact


class TestElemwise:
    def test_mul_by_diagonal_mask(self):
        A = pt.dmatrix("A")
        D = pt.dmatrix("D")
        assume(D, "diagonal")
        assert holds(A * D, "diagonal") == T

    def test_add_of_triangulars(self):
        A = pt.dmatrix("A")
        B = pt.dmatrix("B")
        assume(A, "upper_triangular")
        assume(B, "upper_triangular")
        assert holds(A + B, "upper_triangular") == T
        assert holds(A + B, "lower_triangular") == U

    def test_exp_positive(self):
        x = pt.dvector("x")
        assert holds(pt.exp(x), "positive") == T
        assert holds(pt.sqr(x), "non_negative") == T

    def test_sum_of_positives(self):
        x = pt.dvector("x")
        assume(x, "positive")
        assert holds(pt.sum(x), "positive") == T

    def test_symmetric_under_elemwise(self):
        A = pt.dmatrix("A")
        assume(A, "symmetric")
        assert holds(pt.tanh(A) * 2.0, "symmetric") == T


class TestImplications:
    def test_diagonal_implies_triangular_and_symmetric(self):
        A = pt.dmatrix("A")
        assume(A, "diagonal")
        assert holds(A, "symmetric") == T
        assert holds(A, "lower_triangular") == T
        assert holds(A, "upper_triangular") == T

    def test_permutation_implies_orthogonal_nonneg(self):
        P = pt.dmatrix("P")
        assume(P, "permutation")
        assert holds(P, "orthogonal") == T
        assert holds(P, "non_negative") == T

    def test_unknown_stays_unknown(self):
        A = pt.dmatrix("A")
        for fact in ("diagonal", "symmetric", "orthogonal", "permutation",
                     "positive_definite"):
            assert holds(A, fact) == U, fact
