"""Blockwise (batched core-op) contract grids.

Reference analog: tests/tensor/test_blockwise.py + the batched linalg
benchmark (tests/benchmarks/test_blockwise.py blockwise batched
Cholesky).  Sweeps batch shapes x core ops, checks values against a
numpy loop over the batch, gradients by finite differences, and
broadcast of batch dims between operands.
"""

from __future__ import annotations

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
import pytensor_tpu.tensor.linalg as ptl

rng = np.random.default_rng(17)


def _spd_batch(batch, n):
    a = rng.standard_normal(batch + (n, n))
    return a @ np.swapaxes(a, -1, -2) + n * np.eye(n)


BATCHES = [(3,), (2, 2)]


@pytest.mark.parametrize("batch", BATCHES, ids=[str(b) for b in BATCHES])
def test_batched_cholesky(batch):
    x = pt.tensor("x", dtype="float64", shape=batch + (4, 4))
    v = _spd_batch(batch, 4)
    f = ptt.function([x], ptl.cholesky(x))
    got = np.asarray(f(v))
    exp = np.linalg.cholesky(v)
    np.testing.assert_allclose(got, exp, rtol=1e-9)


@pytest.mark.parametrize("batch", BATCHES, ids=[str(b) for b in BATCHES])
def test_batched_solve(batch):
    A = pt.tensor("A", dtype="float64", shape=batch + (4, 4))
    b = pt.tensor("b", dtype="float64", shape=batch + (4,))
    Av = _spd_batch(batch, 4)
    bv = rng.standard_normal(batch + (4,))
    f = ptt.function([A, b], ptl.solve(A, b, b_ndim=1))
    got = np.asarray(f(Av, bv))
    exp = np.linalg.solve(Av, bv[..., None])[..., 0]
    np.testing.assert_allclose(got, exp, rtol=1e-8)


def test_batched_solve_broadcast_b():
    # batch dims broadcast between A (3,n,n) and b (n,)
    A = pt.tensor("A", dtype="float64", shape=(3, 4, 4))
    b = pt.tensor("b", dtype="float64", shape=(4,))
    Av = _spd_batch((3,), 4)
    bv = rng.standard_normal(4)
    f = ptt.function([A, b], ptl.solve(A, b, b_ndim=1))
    got = np.asarray(f(Av, bv))
    exp = np.stack([np.linalg.solve(Av[i], bv) for i in range(3)])
    np.testing.assert_allclose(got, exp, rtol=1e-8)


@pytest.mark.parametrize("op,npf", [
    (ptl.det, np.linalg.det),
    (ptl.inv, np.linalg.inv),
])
def test_batched_det_inv(op, npf):
    x = pt.tensor("x", dtype="float64", shape=(3, 4, 4))
    v = _spd_batch((3,), 4)
    f = ptt.function([x], op(x))
    np.testing.assert_allclose(np.asarray(f(v)), npf(v), rtol=1e-8)


def test_batched_svd_values():
    x = pt.tensor("x", dtype="float64", shape=(3, 4, 4))
    v = rng.standard_normal((3, 4, 4))
    s = ptl.svd(x, compute_uv=False)
    f = ptt.function([x], s)
    np.testing.assert_allclose(np.asarray(f(v)),
                               np.linalg.svd(v, compute_uv=False), rtol=1e-9)


def test_batched_qr_reconstruction():
    x = pt.tensor("x", dtype="float64", shape=(3, 5, 4))
    v = rng.standard_normal((3, 5, 4))
    Q, R = ptl.qr(x, mode="reduced")
    f = ptt.function([x], [Q, R])
    Qv, Rv = (np.asarray(r) for r in f(v))
    np.testing.assert_allclose(Qv @ Rv, v, atol=1e-10)
    eye = np.broadcast_to(np.eye(4), (3, 4, 4))
    np.testing.assert_allclose(np.swapaxes(Qv, -1, -2) @ Qv, eye, atol=1e-10)


def test_batched_eigh():
    x = pt.tensor("x", dtype="float64", shape=(3, 4, 4))
    v = _spd_batch((3,), 4)
    w, vec = ptl.eigh(x)
    f = ptt.function([x], [w, vec])
    wv, vv = (np.asarray(r) for r in f(v))
    ew, _ = np.linalg.eigh(v)
    np.testing.assert_allclose(wv, ew, rtol=1e-8)
    # eigen-equation per batch element
    np.testing.assert_allclose(v @ vv, vv * wv[..., None, :], atol=1e-8)


def test_batched_cholesky_grad_fd():
    x = pt.tensor("x", dtype="float64", shape=(2, 3, 3))
    v = _spd_batch((2,), 3)
    loss = pt.sum(ptl.cholesky(x) ** 2)
    g = ptt.grad(loss, x)
    f = ptt.function([x], g)
    got = np.asarray(f(v))
    eps = 1e-6
    def np_loss(a):
        return (np.linalg.cholesky(a) ** 2).sum()
    num = np.zeros_like(v)
    for i in np.ndindex(v.shape):
        vp = v.copy(); vp[i] += eps
        vm = v.copy(); vm[i] -= eps
        num[i] = (np_loss(vp) - np_loss(vm)) / (2 * eps)
    np.testing.assert_allclose(got, num, rtol=2e-4, atol=1e-7)


def test_batched_solve_grad_fd():
    A = pt.tensor("A", dtype="float64", shape=(2, 3, 3))
    b = pt.tensor("b", dtype="float64", shape=(2, 3))
    Av = _spd_batch((2,), 3)
    bv = rng.standard_normal((2, 3))
    loss = pt.sum(ptl.solve(A, b, b_ndim=1) ** 2)
    gA, gb = ptt.grad(loss, [A, b])
    f = ptt.function([A, b], [gA, gb])
    gotA, gotb = (np.asarray(r) for r in f(Av, bv))
    eps = 1e-6
    def np_loss(a, c):
        return (np.linalg.solve(a, c[..., None])[..., 0] ** 2).sum()
    for tgt, got in [(0, gotA), (1, gotb)]:
        base = [Av, bv]
        num = np.zeros_like(base[tgt])
        for i in np.ndindex(base[tgt].shape):
            p = [Av.copy(), bv.copy()]; p[tgt][i] += eps
            m = [Av.copy(), bv.copy()]; m[tgt][i] -= eps
            num[i] = (np_loss(*p) - np_loss(*m)) / (2 * eps)
        np.testing.assert_allclose(got, num, rtol=5e-4, atol=1e-7)


def test_blockwise_matmul_chain_batch_broadcast():
    # (5,1,3,4) @ (2,4,2): batch dims broadcast to (5,2)
    a = pt.tensor("a", dtype="float64", shape=(5, 1, 3, 4))
    b = pt.tensor("b", dtype="float64", shape=(2, 4, 2))
    av = rng.standard_normal((5, 1, 3, 4))
    bv = rng.standard_normal((2, 4, 2))
    f = ptt.function([a, b], pt.matmul(a, b))
    np.testing.assert_allclose(np.asarray(f(av, bv)), av @ bv, rtol=1e-10)


def test_batched_lu_solve_pipeline():
    A = pt.tensor("A", dtype="float64", shape=(3, 4, 4))
    Av = _spd_batch((3,), 4)
    P, L, U = ptl.lu(A)
    f = ptt.function([A], [P, L, U])
    Pv, Lv, Uv = (np.asarray(r) for r in f(Av))
    np.testing.assert_allclose(Pv @ Lv @ Uv, Av, atol=1e-9)
