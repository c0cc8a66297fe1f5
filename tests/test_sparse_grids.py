"""Sparse-op contract grids: format x op x grad sweeps vs scipy.

Reference analog: tests/sparse/test_basic.py (3.7k LoC format/op/grad
matrix).  Each case runs through the compiled default mode (BCOO on
XLA) and compares against scipy.sparse / dense numpy expectations;
gradient cases check structured (pattern-preserving) semantics.
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.sparse as ssp

import pytensor_tpu as ptt
import pytensor_tpu.sparse as sp
import pytensor_tpu.tensor as pt

rng = np.random.default_rng(37)


def _rand_sp(m, n, density=0.3, fmt="csr", dtype="float64", seed=None):
    r = np.random.default_rng(seed if seed is not None else 0)
    M = ssp.random(m, n, density=density, format=fmt, dtype=dtype,
                   random_state=np.random.RandomState(3))
    M.sort_indices()
    return M


FMTS = ["csr", "csc"]


class TestStructuredDot:
    @pytest.mark.parametrize("fmt", FMTS)
    @pytest.mark.parametrize("bshape", [(6,), (6, 4)])
    def test_values(self, fmt, bshape):
        A = _rand_sp(5, 6, fmt=fmt)
        S = sp.matrix(fmt, name="S", dtype="float64")
        b = pt.tensor("b", dtype="float64", shape=bshape)
        bv = rng.standard_normal(bshape)
        f = ptt.function([S, b], sp.structured_dot(S, b))
        got = np.asarray(f(A, bv))
        np.testing.assert_allclose(got, A @ bv, rtol=1e-10)

    @pytest.mark.parametrize("fmt", FMTS)
    def test_grad_wrt_dense(self, fmt):
        A = _rand_sp(4, 5, fmt=fmt)
        S = sp.matrix(fmt, name="S", dtype="float64")
        b = pt.dvector("b")
        bv = rng.standard_normal(5)
        loss = pt.sum(sp.structured_dot(S, b) ** 2)
        g = ptt.grad(loss, b)
        f = ptt.function([S, b], g)
        got = np.asarray(f(A, bv))
        Ad = A.toarray()
        exp = 2 * Ad.T @ (Ad @ bv)
        np.testing.assert_allclose(got, exp, rtol=1e-9)

    @pytest.mark.parametrize("fmt", FMTS)
    def test_grad_wrt_sparse_is_structured(self, fmt):
        # d/dS sum(S @ b): dense grad masked to S's sparsity pattern
        A = _rand_sp(4, 5, fmt=fmt)
        S = sp.matrix(fmt, name="S", dtype="float64")
        b = pt.dvector("b")
        bv = rng.standard_normal(5)
        loss = pt.sum(sp.structured_dot(S, b))
        gS = ptt.grad(loss, S)
        f = ptt.function([S, b], sp.dense_from_sparse(gS))
        got = np.asarray(f(A, bv))
        mask = (A.toarray() != 0)
        exp = np.broadcast_to(bv, (4, 5)) * mask
        np.testing.assert_allclose(got, exp, rtol=1e-10)


class TestElementwiseAndArith:
    @pytest.mark.parametrize("fmt", FMTS)
    def test_add_ss(self, fmt):
        A = _rand_sp(4, 5, fmt=fmt, seed=1)
        B = _rand_sp(4, 5, fmt=fmt, seed=2)
        Sa = sp.matrix(fmt, name="a", dtype="float64")
        Sb = sp.matrix(fmt, name="b", dtype="float64")
        f = ptt.function([Sa, Sb], sp.dense_from_sparse(sp.add(Sa, Sb)))
        np.testing.assert_allclose(np.asarray(f(A, B)),
                                   (A + B).toarray(), rtol=1e-12)

    @pytest.mark.parametrize("fmt", FMTS)
    def test_add_sd_dense_result(self, fmt):
        A = _rand_sp(4, 5, fmt=fmt)
        S = sp.matrix(fmt, name="S", dtype="float64")
        d = pt.dmatrix("d")
        dv = rng.standard_normal((4, 5))
        f = ptt.function([S, d], sp.add(S, d))
        np.testing.assert_allclose(np.asarray(f(A, dv)),
                                   A.toarray() + dv, rtol=1e-12)

    @pytest.mark.parametrize("fmt", FMTS)
    def test_mul_ss_intersection(self, fmt):
        A = _rand_sp(4, 5, fmt=fmt, seed=1)
        B = _rand_sp(4, 5, fmt=fmt, seed=2)
        Sa = sp.matrix(fmt, name="a", dtype="float64")
        Sb = sp.matrix(fmt, name="b", dtype="float64")
        f = ptt.function([Sa, Sb], sp.dense_from_sparse(sp.mul(Sa, Sb)))
        np.testing.assert_allclose(np.asarray(f(A, B)),
                                   A.multiply(B).toarray(), rtol=1e-12)

    @pytest.mark.parametrize("fmt", FMTS)
    def test_neg_transpose_roundtrip(self, fmt):
        A = _rand_sp(4, 5, fmt=fmt)
        S = sp.matrix(fmt, name="S", dtype="float64")
        f = ptt.function([S], sp.dense_from_sparse(sp.transpose(sp.neg(S))))
        np.testing.assert_allclose(np.asarray(f(A)), -A.toarray().T,
                                   rtol=1e-12)

    @pytest.mark.parametrize("name,npf", [
        ("sin", np.sin), ("tanh", np.tanh), ("sqr", np.square),
        ("expm1", np.expm1), ("log1p", np.log1p), ("sqrt", np.sqrt),
    ])
    def test_structured_unary(self, name, npf):
        # structured elemwise applies only to stored values (0 -> 0 ops)
        A = abs(_rand_sp(4, 5, fmt="csr"))
        S = sp.matrix("csr", name="S", dtype="float64")
        f = ptt.function([S], sp.dense_from_sparse(getattr(sp, name)(S)))
        exp = A.copy()
        exp.data = npf(exp.data)
        np.testing.assert_allclose(np.asarray(f(A)), exp.toarray(),
                                   rtol=1e-12)


class TestComparisons:
    @pytest.mark.parametrize("fmt", ["csr"])
    def test_lt_ss(self, fmt):
        A = _rand_sp(4, 5, fmt=fmt, seed=1)
        B = _rand_sp(4, 5, fmt=fmt, seed=2)
        Sa = sp.matrix(fmt, name="a", dtype="float64")
        Sb = sp.matrix(fmt, name="b", dtype="float64")
        # comparisons densify by design here (value-parity with scipy)
        f = ptt.function([Sa, Sb], sp.lt(Sa, Sb))
        got = np.asarray(f(A, B)).astype(bool)
        np.testing.assert_array_equal(got, A.toarray() < B.toarray())


class TestStructuralOps:
    def test_csm_properties_roundtrip(self):
        A = _rand_sp(4, 5, fmt="csr")
        S = sp.matrix("csr", name="S", dtype="float64")
        data, indices, indptr, shape = sp.csm_properties(S)
        rebuilt = sp.CSM("csr")(data, indices, indptr, shape)
        f = ptt.function([S], sp.dense_from_sparse(rebuilt))
        np.testing.assert_allclose(np.asarray(f(A)), A.toarray())

    def test_sp_sum_axes(self):
        A = _rand_sp(4, 5, fmt="csr")
        S = sp.matrix("csr", name="S", dtype="float64")
        for axis in (None, 0, 1):
            f = ptt.function([S], sp.sp_sum(S, axis=axis))
            got = np.asarray(f(A))
            exp = np.asarray(A.sum(axis=axis)).squeeze()
            np.testing.assert_allclose(got.squeeze(), exp, rtol=1e-12)

    def test_hstack_vstack(self):
        A = _rand_sp(3, 4, fmt="csr", seed=1)
        B = _rand_sp(3, 4, fmt="csr", seed=2)
        Sa = sp.matrix("csr", name="a", dtype="float64")
        Sb = sp.matrix("csr", name="b", dtype="float64")
        fh = ptt.function([Sa, Sb],
                          sp.dense_from_sparse(sp.hstack([Sa, Sb], format="csr")))
        np.testing.assert_allclose(np.asarray(fh(A, B)),
                                   ssp.hstack([A, B]).toarray())
        fv = ptt.function([Sa, Sb],
                          sp.dense_from_sparse(sp.vstack([Sa, Sb], format="csr")))
        np.testing.assert_allclose(np.asarray(fv(A, B)),
                                   ssp.vstack([A, B]).toarray())

    def test_row_col_scale(self):
        A = _rand_sp(4, 5, fmt="csc")
        S = sp.matrix("csc", name="S", dtype="float64")
        r = pt.dvector("r")
        c = pt.dvector("c")
        rv, cv = rng.standard_normal(4), rng.standard_normal(5)
        f = ptt.function([S, r], sp.dense_from_sparse(sp.row_scale(S, r)))
        np.testing.assert_allclose(np.asarray(f(A, rv)),
                                   A.toarray() * rv[:, None], rtol=1e-12)
        g = ptt.function([S, c], sp.dense_from_sparse(sp.col_scale(S, c)))
        np.testing.assert_allclose(np.asarray(g(A, cv)),
                                   A.toarray() * cv[None, :], rtol=1e-12)

    def test_remove0_and_clean(self):
        A = _rand_sp(4, 5, fmt="csr").tolil()
        A[0, 0] = 1.0
        A = A.tocsr()
        A.data[0] = 0.0  # explicit stored zero
        S = sp.matrix("csr", name="S", dtype="float64")
        f = ptt.function([S], sp.dense_from_sparse(sp.remove0(S)))
        np.testing.assert_allclose(np.asarray(f(A)), A.toarray())

    def test_diag_square_diagonal(self):
        d = pt.dvector("d")
        dv = rng.standard_normal(4)
        f = ptt.function([d], sp.dense_from_sparse(sp.square_diagonal(d)))
        np.testing.assert_allclose(np.asarray(f(dv)), np.diag(dv))

    def test_get_item_scalar_and_2d(self):
        A = _rand_sp(4, 5, fmt="csr")
        S = sp.matrix("csr", name="S", dtype="float64")
        f = ptt.function([S], sp.get_item_scalar(S, 1, 2))
        assert float(np.asarray(f(A))) == A[1, 2]


class TestUsmmSampling:
    def test_usmm(self):
        # alpha * (x @ y) + z  with sparse x
        A = _rand_sp(4, 5, fmt="csr")
        S = sp.matrix("csr", name="S", dtype="float64")
        y = pt.dmatrix("y")
        z = pt.dmatrix("z")
        yv = rng.standard_normal((5, 3))
        zv = rng.standard_normal((4, 3))
        out = sp.usmm(np.float64(2.0), S, y, z)
        f = ptt.function([S, y, z], out)
        np.testing.assert_allclose(np.asarray(f(A, yv, zv)),
                                   2.0 * (A @ yv) + zv, rtol=1e-10)

    def test_sampling_dot(self):
        # (x @ y^T) * pattern(p): dense dot sampled at p's nonzeros
        x = pt.dmatrix("x")
        y = pt.dmatrix("y")
        P = _rand_sp(4, 3, fmt="csr")
        Sp = sp.matrix("csr", name="p", dtype="float64")
        xv = rng.standard_normal((4, 5))
        yv = rng.standard_normal((3, 5))
        f = ptt.function([x, y, Sp],
                         sp.dense_from_sparse(sp.sampling_dot(x, y, Sp)))
        exp = (xv @ yv.T) * (P.toarray() != 0)
        np.testing.assert_allclose(np.asarray(f(xv, yv, P)), exp, rtol=1e-10)


class TestDtypesAndCasts:
    @pytest.mark.parametrize("dst", ["float32", "float64", "int32"])
    def test_cast(self, dst):
        A = _rand_sp(3, 4, fmt="csr")
        S = sp.matrix("csr", name="S", dtype="float64")
        f = ptt.function([S], sp.dense_from_sparse(sp.cast(S, dst)))
        got = np.asarray(f(A))
        assert str(got.dtype) == dst

    def test_sp_ones_zeros_like(self):
        A = _rand_sp(3, 4, fmt="csr")
        S = sp.matrix("csr", name="S", dtype="float64")
        f = ptt.function([S], sp.dense_from_sparse(sp.sp_ones_like(S)))
        np.testing.assert_allclose(np.asarray(f(A)),
                                   (A.toarray() != 0).astype(float))
        g = ptt.function([S], sp.dense_from_sparse(sp.sp_zeros_like(S)))
        np.testing.assert_allclose(np.asarray(g(A)), np.zeros((3, 4)))

    def test_dense_roundtrip(self):
        d = pt.dmatrix("d")
        dv = rng.standard_normal((3, 4)) * (rng.random((3, 4)) > 0.5)
        f = ptt.function([d], sp.dense_from_sparse(sp.csr_from_dense(d)))
        np.testing.assert_allclose(np.asarray(f(dv)), dv)
