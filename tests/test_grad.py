"""Autodiff tests (modeled on reference tests using verify_grad)."""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.gradient import (
    DisconnectedInputError,
    disconnected_grad,
    grad_clip,
    grad_scale,
    zero_grad,
)

rng = np.random.default_rng(7)


@pytest.mark.parametrize("fn,pt_args", [
    (lambda x: pt.exp(x).sum(), [rng.random(4)]),
    (lambda x: pt.log(x).sum(), [rng.random(4) + 0.5]),
    (lambda x: pt.tanh(x).sum(), [rng.random(4)]),
    (lambda x: pt.sigmoid(x).sum(), [rng.random(4)]),
    (lambda x: pt.sqrt(x).sum(), [rng.random(4) + 0.5]),
    (lambda x: (x ** 3).sum(), [rng.random(4)]),
    (lambda x: pt.math.erf(x).sum(), [rng.random(4)]),
    (lambda x: pt.math.gammaln(x).sum(), [rng.random(4) + 1.0]),
    (lambda x: pt.sum(pt.sqr(x), axis=0).sum(), [rng.random((3, 2))]),
    (lambda x: pt.max(x, axis=1).sum(), [rng.random((3, 4))]),
    (lambda x: x.T.sum(), [rng.random((3, 4))]),
    (lambda x: x[1:3].sum(), [rng.random(5)]),
    (lambda x: x.reshape((6,)).sum() * 2, [rng.random((2, 3))]),
    (lambda x: pt.concatenate([x, x * 2], axis=0).sum(), [rng.random((2, 2))]),
])
def test_verify_grad_battery(fn, pt_args):
    ptt.verify_grad(fn, pt_args, rng=np.random.default_rng(99))


def test_grad_dot():
    ptt.verify_grad(lambda a, b: pt.dot(a, b).sum(),
                    [rng.random((3, 4)), rng.random((4, 2))],
                    rng=np.random.default_rng(99))


def test_grad_broadcast_sums_correctly():
    a = pt.dmatrix("a")
    b = pt.dvector("b")
    c = pt.sum(a * b)
    ga, gb = ptt.grad(c, [a, b])
    assert ga.type.ndim == 2
    assert gb.type.ndim == 1
    f = ptt.function([a, b], [ga, gb], mode="FAST_COMPILE")
    A = np.ones((2, 3))
    B = np.arange(3.0)
    ra, rb = f(A, B)
    np.testing.assert_allclose(np.asarray(ra), np.tile(B, (2, 1)))
    np.testing.assert_allclose(np.asarray(rb), [2.0, 2.0, 2.0])


def test_disconnected_raises_and_ignores():
    x = pt.dscalar("x")
    y = pt.dscalar("y")
    cost = x * 2
    with pytest.raises(DisconnectedInputError):
        ptt.grad(cost, y)
    g = ptt.grad(cost, y, disconnected_inputs="ignore")
    assert float(g.eval({y: 5.0})) == 0.0


def test_known_grads():
    x = pt.dvector("x")
    y = x * 3
    g = ptt.grad(None, x, known_grads={y: pt.ones_like(y)})
    np.testing.assert_allclose(np.asarray(g.eval({x: np.zeros(2)})), [3.0, 3.0])


def test_grad_manipulators():
    x = pt.dscalar("x")
    assert float(ptt.grad(zero_grad(x) * x, x).eval({x: 3.0})) == 3.0
    assert float(ptt.grad(disconnected_grad(x) * x, x).eval({x: 3.0})) == 3.0
    g = ptt.grad(grad_scale(x, 2.0) * x, x)
    assert float(g.eval({x: 3.0})) == 9.0  # 2*x (scaled path) + x
    # clip applies to the gradient flowing through that point in the chain
    gc = ptt.grad(pt.sqr(grad_clip(x, -0.1, 0.1)), x)
    np.testing.assert_allclose(float(gc.eval({x: 3.0})), 0.1, rtol=1e-6)


def test_jacobian_vector():
    x = pt.dvector("x")
    J = ptt.jacobian(pt.sin(x), x)
    val = np.array([0.0, np.pi / 2])
    res = np.asarray(ptt.function([x], J, mode="FAST_COMPILE")(val))
    np.testing.assert_allclose(res, np.diag(np.cos(val)), atol=1e-12)


def test_hessian():
    x = pt.dvector("x")
    H = ptt.hessian((x ** 3).sum(), x)
    res = np.asarray(ptt.function([x], H, mode="FAST_COMPILE")(np.array([1.0, 2.0])))
    np.testing.assert_allclose(res, np.diag([6.0, 12.0]))


def test_hvp():
    from pytensor_tpu.gradient import hessian_vector_product

    x = pt.dvector("x")
    p = pt.dvector("p")
    hvp = hessian_vector_product((x ** 3).sum(), x, p)
    f = ptt.function([x, p], hvp, mode="FAST_COMPILE")
    np.testing.assert_allclose(
        np.asarray(f(np.array([1.0, 2.0]), np.array([1.0, 1.0]))), [6.0, 12.0]
    )


def test_Rop_pushforward():
    x = pt.dvector("x")
    v = pt.dvector("v")
    y = (x ** 2).sum()
    jv = ptt.Rop(y, x, v)
    f = ptt.function([x, v], jv, mode="FAST_COMPILE")
    np.testing.assert_allclose(float(np.asarray(f(np.array([1.0, 2.0]),
                                                  np.array([1.0, 0.0])))), 2.0)


def test_second_order_through_grad():
    x = pt.dscalar("x")
    y = pt.exp(2 * x)
    g1 = ptt.grad(y, x)
    g2 = ptt.grad(g1, x)
    np.testing.assert_allclose(float(g2.eval({x: 0.5})), 4 * np.exp(1.0))


class TestGradLongTail:
    """FD sweep: blockwise-cholesky, strided slices, permute/choose,
    einsum repeated/summed-only labels, general diagonal scatter."""

    def _fd(self, cost_fn, xv, rtol=1e-4):
        rng2 = np.random.default_rng(5)
        x = pt.tensor("x", dtype="float64", shape=xv.shape)
        cost = cost_fn(x)
        g = ptt.grad(cost, x)
        f = ptt.function([x], [cost, g], mode="FAST_COMPILE")
        c0, gv = (np.asarray(v) for v in f(xv))
        eps = 1e-6
        E = rng2.standard_normal(xv.shape)
        fd = (float(np.asarray(f(xv + eps * E)[0]))
              - float(np.asarray(f(xv - eps * E)[0]))) / (2 * eps)
        np.testing.assert_allclose((gv * E).sum(), fd, rtol=rtol)

    def test_blockwise_cholesky(self):
        from pytensor_tpu.tensor import linalg as ptl

        rng2 = np.random.default_rng(5)
        A0 = rng2.random((3, 4, 4))
        A0 = A0 @ np.swapaxes(A0, -1, -2) + 4 * np.eye(4)
        self._fd(lambda a: (ptl.cholesky(a) ** 2).sum(), A0, rtol=1e-5)

    def test_strided_and_negative_slices(self):
        rng2 = np.random.default_rng(5)
        self._fd(lambda a: (a[::2, 1::3] ** 2).sum(), rng2.random((7, 9)))
        self._fd(lambda a: (a[::-1] * np.arange(1.0, 8.0)).sum(),
                 rng2.random(7))

    def test_permute_and_choose(self):
        from pytensor_tpu.tensor.math import choose, permute_row_elements

        rng2 = np.random.default_rng(5)
        perm = rng2.permutation(6).astype("int64")
        self._fd(lambda a: (permute_row_elements(
            a, pt.as_tensor_variable(perm)) * np.arange(6.0)).sum(),
            rng2.random(6))
        ch = rng2.integers(0, 3, size=8)
        self._fd(lambda a: choose(pt.as_tensor_variable(ch),
                                  [a, a * 2, a ** 2]).sum(), rng2.random(8))

    def test_einsum_repeated_and_summed_only(self):
        rng2 = np.random.default_rng(5)
        self._fd(lambda a: pt.einsum("ii->", a), rng2.random((5, 5)))
        self._fd(lambda a: (pt.einsum("iij->j", a) ** 2).sum(),
                 rng2.random((4, 4, 3)))
        self._fd(lambda a: (pt.einsum("ij->j", a) ** 2).sum(),
                 rng2.random((4, 3)))

    def test_diagonal_general_axes(self):
        rng2 = np.random.default_rng(5)
        self._fd(lambda a: (pt.diagonal(a, offset=1) ** 2).sum(),
                 rng2.random((5, 5)))
        self._fd(lambda a: (pt.diagonal(a, axis1=0, axis2=2) ** 2).sum(),
                 rng2.random((4, 3, 4)))

    def test_einsum_values_repeated_labels(self):
        rng2 = np.random.default_rng(5)
        mv = rng2.random((5, 5))
        m = pt.dmatrix("m")
        for subs in ("ii->", "ii->i", "ii"):
            r = np.asarray(ptt.function([m], pt.einsum(subs, m),
                                        mode="FAST_COMPILE")(mv))
            np.testing.assert_allclose(r, np.einsum(subs, mv), rtol=1e-12)


class TestGradSweepBatch3:
    def _fd(self, cost_fn, *xvs, rtol=1e-4):
        rng2 = np.random.default_rng(11)
        xs = [pt.tensor(f"x{i}", dtype="float64", shape=v.shape)
              for i, v in enumerate(xvs)]
        cost = cost_fn(*xs)
        gs = ptt.grad(cost, xs)
        f = ptt.function(xs, [cost] + list(gs), mode="FAST_COMPILE")
        out = [np.asarray(v) for v in f(*xvs)]
        eps = 1e-6
        for k in range(len(xvs)):
            E = rng2.standard_normal(xvs[k].shape)
            p = [v + (eps * E if i == k else 0) for i, v in enumerate(xvs)]
            m = [v - (eps * E if i == k else 0) for i, v in enumerate(xvs)]
            num = (float(np.asarray(f(*p)[0]))
                   - float(np.asarray(f(*m)[0]))) / (2 * eps)
            np.testing.assert_allclose((out[1 + k] * E).sum(), num, rtol=rtol)

    def test_tensordot_outer_batched_dot(self):
        from pytensor_tpu.tensor.blas import batched_dot

        rng2 = np.random.default_rng(11)
        self._fd(lambda a, b: (pt.math.tensordot(a, b, axes=2) ** 2).sum(),
                 rng2.random((3, 4, 5)), rng2.random((4, 5, 2)))
        self._fd(lambda a, b: (pt.math.tensordot(
            a, b, axes=[[0, 2], [1, 0]]) ** 2).sum(),
            rng2.random((3, 4, 5)), rng2.random((5, 3, 2)))
        self._fd(lambda a, b: (batched_dot(a, b) ** 2).sum(),
                 rng2.random((3, 4, 5)), rng2.random((3, 5, 2)))

    def test_kron_power_norm_solve(self):
        from pytensor_tpu.tensor import linalg as ptl

        rng2 = np.random.default_rng(11)
        self._fd(lambda a, b: (ptl.kron(a, b) ** 2).sum(),
                 rng2.random((2, 3)), rng2.random((3, 2)))
        self._fd(lambda a: (ptl.matrix_power(a, 3) ** 2).sum(),
                 rng2.random((3, 3)) * 0.5)
        self._fd(lambda a: ptl.norm(a), rng2.random((4, 5)))
        self._fd(lambda a, b: (ptl.solve(a + 3 * np.eye(4), b,
                                         b_ndim=2) ** 2).sum(),
                 rng2.random((4, 4)), rng2.random((4, 2)))
