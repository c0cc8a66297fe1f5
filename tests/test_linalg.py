"""Linalg tests (modeled on reference tests/tensor/linalg strategy)."""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.tensor import linalg as ptl
from tests.utils import compare_xla_and_py

rng = np.random.default_rng(0)
A_ = rng.random((4, 4))
A_ = A_ @ A_.T + 4 * np.eye(4)
B_ = rng.random((4, 2))
L_ = np.linalg.cholesky(A_)


def test_cholesky_values():
    A = pt.dmatrix("A")
    res = compare_xla_and_py([A], ptl.cholesky(A), [A_])
    np.testing.assert_allclose(np.asarray(res[0]), np.linalg.cholesky(A_), rtol=1e-10)


def test_cholesky_upper():
    A = pt.dmatrix("A")
    res = compare_xla_and_py([A], ptl.cholesky(A, lower=False), [A_])
    np.testing.assert_allclose(np.asarray(res[0]), np.linalg.cholesky(A_).T, rtol=1e-10)


def test_solve_matches_numpy():
    A, B = pt.dmatrix("A"), pt.dmatrix("B")
    res = compare_xla_and_py([A, B], ptl.solve(A, B), [A_, B_])
    np.testing.assert_allclose(np.asarray(res[0]), np.linalg.solve(A_, B_), rtol=1e-9)


def test_solve_triangular():
    A, B = pt.dmatrix("A"), pt.dmatrix("B")
    res = compare_xla_and_py([A, B], ptl.solve_triangular(A, B, lower=True), [L_, B_])
    import scipy.linalg as sla

    np.testing.assert_allclose(np.asarray(res[0]),
                               sla.solve_triangular(L_, B_, lower=True), rtol=1e-9)


def test_cho_solve():
    A, B = pt.dmatrix("A"), pt.dmatrix("B")
    out = ptl.cho_solve((ptl.cholesky(A), True), B)
    res = compare_xla_and_py([A, B], out, [A_, B_])
    np.testing.assert_allclose(np.asarray(res[0]), np.linalg.solve(A_, B_), rtol=1e-9)


def test_det_slogdet_inv():
    A = pt.dmatrix("A")
    res = compare_xla_and_py(
        [A], [ptl.det(A), ptl.slogdet(A)[1], ptl.inv(A)], [A_], rtol=1e-8
    )
    np.testing.assert_allclose(float(np.asarray(res[0])), np.linalg.det(A_), rtol=1e-8)
    np.testing.assert_allclose(float(np.asarray(res[1])),
                               np.linalg.slogdet(A_)[1], rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res[2]), np.linalg.inv(A_), rtol=1e-8)


def test_eigh():
    A = pt.dmatrix("A")
    w, v = ptl.eigh(A)
    res = compare_xla_and_py([A], [w], [A_], rtol=1e-8)
    np.testing.assert_allclose(np.asarray(res[0]), np.linalg.eigh(A_)[0], rtol=1e-8)


def test_qr_svd_lu_expm_run():
    A = pt.dmatrix("A")
    q, r = ptl.qr(A, mode="reduced")
    s = ptl.svd(A, compute_uv=False)
    f = ptt.function([A], [q, r, s])
    qv, rv, sv = (np.asarray(x) for x in f(A_))
    np.testing.assert_allclose(qv @ rv, A_, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.sort(sv), np.sort(np.linalg.svd(A_, compute_uv=False)),
                               rtol=1e-8)
    e = ptt.function([A], ptl.expm(A))
    import scipy.linalg as sla

    np.testing.assert_allclose(np.asarray(e(A_ / 10)), sla.expm(A_ / 10), rtol=1e-6)


def test_kron_matrix_power():
    A = pt.dmatrix("A")
    B = pt.dmatrix("B")
    res = compare_xla_and_py([A, B], ptl.kron(A, B),
                             [A_[:2, :2], B_[:2, :2].T @ B_[:2, :2] + np.eye(2)])
    np.testing.assert_allclose(
        np.asarray(res[0]),
        np.kron(A_[:2, :2], B_[:2, :2].T @ B_[:2, :2] + np.eye(2)), rtol=1e-10,
    )
    p = ptt.function([A], ptl.matrix_power(A, 3))
    np.testing.assert_allclose(np.asarray(p(A_)), np.linalg.matrix_power(A_, 3),
                               rtol=1e-9)


def test_batched_cholesky_blockwise():
    Ab = pt.tensor3("Ab", dtype="float64")
    Abv = np.stack([A_, 2.0 * A_])
    res = compare_xla_and_py([Ab], ptl.cholesky(Ab), [Abv])
    np.testing.assert_allclose(np.asarray(res[0]), np.linalg.cholesky(Abv), rtol=1e-9)


@pytest.mark.parametrize("builder,args", [
    (lambda A: ptl.cholesky(A).sum(), [A_]),
    (lambda A, B: ptl.solve(A, B).sum(), [A_, B_]),
    (lambda L, B: ptl.solve_triangular(L, B, lower=True).sum(), [L_, B_]),
    (lambda A: ptl.det(A), [A_]),
    (lambda A: ptl.slogdet(A)[1], [A_]),
    (lambda A: ptl.inv(A).sum(), [A_]),
    (lambda A: ptl.eigh(A)[0].sum(), [A_]),
    (lambda L, B: ptl.cho_solve((L, True), B).sum(), [L_, B_]),
])
def test_linalg_grads(builder, args):
    ptt.verify_grad(builder, args, rng=np.random.default_rng(5))


def test_gp_marginal_likelihood_pipeline():
    """The GP config from BASELINE.md: chol + solve_triangular + logdet."""
    X = pt.dmatrix("X")
    y = pt.dvector("y")
    ls = pt.dscalar("ls")

    def build(X_, y_, ls_):
        d = ((X_[:, None, :] - X_[None, :, :]) ** 2).sum(axis=-1)
        K = pt.exp(-d / (2 * ls_ ** 2)) + 1e-6 * pt.eye(X_.shape[0], X_.shape[0], 0,
                                                        dtype="float64")
        L = ptl.cholesky(K)
        alpha = ptl.solve_triangular(L, y_, lower=True)
        logdet = 2.0 * pt.sum(pt.log(pt.diagonal(L)))
        return -0.5 * pt.sum(alpha ** 2) - 0.5 * logdet

    Xv = rng.random((6, 2))
    yv = rng.random(6)
    ptt.verify_grad(lambda ls_: build(pt.as_tensor_variable(Xv),
                                      pt.as_tensor_variable(yv), ls_),
                    [np.array(1.3)], rng=np.random.default_rng(5))
    # parity between backends
    ml = build(X, y, ls)
    f_x = ptt.function([X, y, ls], [ml, ptt.grad(ml, ls)])
    f_p = ptt.function([X, y, ls], [ml, ptt.grad(ml, ls)], mode="FAST_COMPILE")
    rx = [np.asarray(v) for v in f_x(Xv, yv, 1.3)]
    rp = [np.asarray(v) for v in f_p(Xv, yv, 1.3)]
    np.testing.assert_allclose(rx[0], rp[0], rtol=1e-9)
    np.testing.assert_allclose(rx[1], rp[1], rtol=1e-8)


class TestQRGradModes:
    """QR pullback across modes reduced / r / complete, tall and wide
    (reference decomposition/qr.py:230-319; Townsend 2016 + Liao et al.
    2019 for the wide case).  Checked by directional finite differences
    — entrywise FD trips over QR curvature at default eps."""

    def _check(self, shape, mode, with_q=True):
        from pytensor_tpu.tensor import linalg as ptl

        rng = np.random.default_rng(0)
        A = rng.random(shape)
        x = pt.tensor("x", dtype="float64", shape=shape)
        res = ptl.qr(x, mode=mode)
        if mode == "r":
            cost = (res ** 2).sum()
        else:
            q, r = res
            cost = (r ** 2).sum() + ((q * 0.3).sum() if with_q else 0.0)
        g = ptt.grad(cost, x)
        f = ptt.function([x], [cost, g], mode="FAST_COMPILE")
        c0, gv = (np.asarray(v) for v in f(A))
        h = 1e-6
        for _ in range(3):
            E = rng.standard_normal(shape)
            num = (float(np.asarray(f(A + h * E)[0]))
                   - float(np.asarray(f(A - h * E)[0]))) / (2 * h)
            np.testing.assert_allclose((gv * E).sum(), num, rtol=1e-6)

    def test_tall_reduced(self):
        self._check((5, 3), "reduced")

    def test_wide_reduced(self):
        self._check((3, 5), "reduced")

    def test_r_mode(self):
        self._check((5, 3), "r")
        self._check((3, 5), "r")

    def test_complete_square_and_wide(self):
        self._check((4, 4), "complete")
        self._check((3, 5), "complete")

    def test_complete_tall_not_implemented(self):
        from pytensor_tpu.gradient import NullTypeGradError
        from pytensor_tpu.tensor import linalg as ptl

        x = pt.tensor("x", dtype="float64", shape=(5, 3))
        q, r = ptl.qr(x, mode="complete")
        with pytest.raises(NullTypeGradError):
            ptt.grad((q ** 2).sum(), x)


def test_lu_and_expm_grads_fd():
    """LU pullback (P L^{-T}(tril(L^T Lbar,-1)+triu(Ubar U^T))U^{-T}) and
    expm pullback (augmented-matrix Frechet adjoint)."""
    from pytensor_tpu.tensor import linalg as ptl

    rng2 = np.random.default_rng(0)
    Av = rng2.random((4, 4)) * 0.5 + np.eye(4)
    A = pt.dmatrix("A")
    W = rng2.random((4, 4))
    for name, expr_fn in [
        ("expm", lambda a: (ptl.expm(a) * W).sum()),
        ("lu", lambda a: sum((o ** 2).sum() * c
                             for o, c in zip(ptl.lu(a), [0.0, 1.0, 2.0]))),
    ]:
        cost = expr_fn(A)
        g = ptt.grad(cost, A)
        f = ptt.function([A], [cost, g], mode="FAST_COMPILE")
        c0, gv = (np.asarray(v) for v in f(Av))
        eps = 1e-6
        E = rng2.standard_normal((4, 4))
        fd = (float(np.asarray(f(Av + eps * E)[0]))
              - float(np.asarray(f(Av - eps * E)[0]))) / (2 * eps)
        np.testing.assert_allclose((gv * E).sum(), fd, rtol=1e-5,
                                   err_msg=name)
