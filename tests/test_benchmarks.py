"""Benchmark workloads mirroring reference tests/benchmarks/ (SURVEY §6).

Each case compiles the reference suite's workload on both backends and
checks parity; with --runslow it also reports timings.  Absolute numbers
live in bench.py (run on real TPU by the driver).
"""

import time

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.tensor import linalg as ptl

rng = np.random.default_rng(0)


def _time(fn, *args, n=20):
    import jax

    fn(*args)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def test_fused_elemwise_logp_grad():
    """reference test_elemwise.py:31-45: logp=-(x-mu)^2/2 + grad, n=100k."""
    x = pt.dvector("x")
    mu = pt.dscalar("mu")
    logp = (-((x - mu) ** 2) / 2.0).sum()
    g = ptt.grad(logp, x)
    f = ptt.function([x, mu], [logp, g])
    fp = ptt.function([x, mu], [logp, g], mode="FAST_COMPILE")
    v = rng.random(100_000)
    rx = [np.asarray(r) for r in f(v, 1.0)]
    rp = [np.asarray(r) for r in fp(v, 1.0)]
    np.testing.assert_allclose(rx[0], rp[0], rtol=1e-10)
    np.testing.assert_allclose(rx[1], rp[1], rtol=1e-10)


def test_simple_elemwise_exp2xy():
    """reference test_elemwise.py:7-28: exp(2xy+y), 200x500."""
    x = pt.dmatrix("x")
    y = pt.dmatrix("y")
    out = pt.exp(2 * x * y + y)
    f = ptt.function([x, y], out)
    X, Y = rng.random((200, 500)), rng.random((200, 500))
    np.testing.assert_allclose(np.asarray(f(X, Y)), np.exp(2 * X * Y + Y),
                               rtol=1e-10)


def test_gemv_ger_paths():
    """reference test_blas.py: 512x512 dot; alpha*outer(x,y)+A."""
    A = pt.dmatrix("A")
    x = pt.dvector("x")
    y = pt.dvector("y")
    gemv = pt.dot(A, x)
    ger = 0.5 * pt.outer(x, y) + A
    f = ptt.function([A, x, y], [gemv, ger])
    Av = rng.random((128, 128))
    xv, yv = rng.random(128), rng.random(128)
    r1, r2 = (np.asarray(v) for v in f(Av, xv, yv))
    np.testing.assert_allclose(r1, Av @ xv, rtol=1e-9)
    np.testing.assert_allclose(r2, 0.5 * np.outer(xv, yv) + Av, rtol=1e-9)


def test_blockwise_batched_cholesky():
    """reference test_blockwise.py:9-24: cholesky((5,3,3))."""
    Ab = pt.tensor3("Ab", dtype="float64")
    f = ptt.function([Ab], ptl.cholesky(Ab))
    base = rng.random((3, 3))
    Abv = np.stack([base @ base.T + (k + 2) * np.eye(3) for k in range(5)])
    np.testing.assert_allclose(np.asarray(f(Abv)), np.linalg.cholesky(Abv),
                               rtol=1e-9)


def test_careduce():
    x = pt.dmatrix("x")
    f = ptt.function([x], [x.sum(), x.sum(axis=0), x.max(axis=1)])
    X = rng.random((300, 300))
    rs = [np.asarray(v) for v in f(X)]
    np.testing.assert_allclose(rs[0], X.sum(), rtol=1e-9)
    np.testing.assert_allclose(rs[1], X.sum(axis=0), rtol=1e-9)
    np.testing.assert_allclose(rs[2], X.max(axis=1), rtol=1e-12)


def test_scan_grad_benchmark_graph():
    """reference test_scan.py: recurrence + grad through scan."""
    x = pt.dvector("x")
    out, _ = ptt.scan(lambda xt, acc: 0.9 * acc + 0.1 * xt, sequences=[x],
                      outputs_info=[pt.constant(0.0, dtype="float64")])
    g = ptt.grad(out.sum(), x)
    f = ptt.function([x], [out[-1], g])
    fp = ptt.function([x], [out[-1], g], mode="FAST_COMPILE")
    v = rng.random(64)
    rx = [np.asarray(r) for r in f(v)]
    rp = [np.asarray(r) for r in fp(v)]
    np.testing.assert_allclose(rx[0], rp[0], rtol=1e-10)
    np.testing.assert_allclose(rx[1], rp[1], rtol=1e-10)


def test_linalg_pipeline():
    """reference test_linalg.py: solve/cholesky pipelines."""
    A = pt.dmatrix("A")
    B = pt.dmatrix("B")
    L = ptl.cholesky(A)
    out = ptl.solve_triangular(L, B, lower=True)
    f = ptt.function([A, B], out)
    Av = rng.random((32, 32))
    Av = Av @ Av.T + 32 * np.eye(32)
    Bv = rng.random((32, 4))
    import scipy.linalg as sla

    np.testing.assert_allclose(np.asarray(f(Av, Bv)),
                               sla.solve_triangular(np.linalg.cholesky(Av), Bv,
                                                    lower=True), rtol=1e-8)


def test_random_sampling_graph():
    from pytensor_tpu.tensor.random import RandomStream

    srng = RandomStream(seed=5)
    x = srng.normal(0.0, 1.0, size=(4096,))
    f = ptt.function([], x.sum())
    vals = [float(np.asarray(f())) for _ in range(3)]
    assert len(set(vals)) == 3


def test_subtensor_join_dimshuffle():
    x = pt.dmatrix("x")
    out = pt.concatenate([x[::2].T, x[1::2].T], axis=1).sum(axis=0)
    f = ptt.function([x], out)
    X = rng.random((10, 7))
    np.testing.assert_allclose(
        np.asarray(f(X)),
        np.concatenate([X[::2].T, X[1::2].T], axis=1).sum(axis=0), rtol=1e-10,
    )


def test_logsumexp_and_jacobian():
    x = pt.dvector("x")
    lse = pt.math.logsumexp(x)
    J = ptt.jacobian(pt.sin(x), x)
    f = ptt.function([x], [lse, J])
    v = rng.random(32)
    r1, r2 = (np.asarray(v_) for v_ in f(v))
    np.testing.assert_allclose(r1, np.log(np.exp(v).sum()), rtol=1e-10)
    np.testing.assert_allclose(r2, np.diag(np.cos(v)), atol=1e-12)


def test_compile_latency_budget():
    """reference test_compilation.py: compile latency stays sane."""
    t0 = time.perf_counter()
    x = pt.dvector("x")
    expr = x
    for _ in range(30):
        expr = pt.exp(expr) * 0.5 + expr
    f = ptt.function([x], expr.sum())
    dt = time.perf_counter() - t0
    assert dt < 30.0, f"compile took {dt:.1f}s"
    f(rng.random(8))


def test_rewrite_throughput():
    """reference test_rewriting.py: full rewrite pipeline wall time."""
    from pytensor_tpu.compile.mode import FAST_RUN
    from pytensor_tpu.graph.fg import FunctionGraph

    x = pt.dvector("x")
    expr = x
    for _ in range(120):
        expr = pt.exp(expr) * 1.0 + 0.0 + expr
    fg = FunctionGraph(outputs=[expr.sum()], clone=True)
    t0 = time.perf_counter()
    FAST_RUN.optimizer.rewrite(fg)
    dt = time.perf_counter() - t0
    assert dt < 30.0, f"rewrites took {dt:.1f}s"


def test_pallas_leapfrog_matches_graph_oracle():
    """Hand-fused Pallas radon leapfrog kernel (interpret mode on CPU)
    matches the autodiff graph integrator."""
    import jax

    from pytensor_tpu.graph.replace import graph_replace
    from pytensor_tpu.models.radon import make_radon_graphs
    from pytensor_tpu.models.radon_pallas import make_radon_leapfrog_pallas

    run, theta0, m0, n = make_radon_leapfrog_pallas(
        n_steps=8, n_obs=120, n_counties=11, interpret=True)
    tf, mf, lp = (np.asarray(jax.device_get(v)) for v in run(theta0, m0))

    inputs, (logp, dlogp), _ = make_radon_graphs(
        n_obs=120, n_counties=11, dtype="float64")
    (theta_in,) = inputs
    th0 = pt.tensor("t0", dtype="float64", shape=(n,))
    mm0 = pt.tensor("m0", dtype="float64", shape=(n,))
    EPS = 1e-3

    def step(theta, m):
        g = graph_replace(dlogp, {theta_in: theta})
        mh = m + (EPS / 2) * g
        tn = theta + EPS * mh
        gn = graph_replace(dlogp, {theta_in: tn})
        return tn, mh + (EPS / 2) * gn

    (ths, ms_), _ = ptt.scan(step, outputs_info=[th0, mm0], n_steps=8)
    lpf = graph_replace(logp, {theta_in: ths[-1]})
    f = ptt.function([th0, mm0], [ths[-1], ms_[-1], lpf], mode="FAST_COMPILE")
    rt, rm, rlp = (np.asarray(v)
                   for v in f(theta0.astype("float64"), m0.astype("float64")))
    np.testing.assert_allclose(tf, rt, rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(mf, rm, rtol=1e-2, atol=2e-3)
    np.testing.assert_allclose(float(lp), float(rlp), rtol=1e-4)
