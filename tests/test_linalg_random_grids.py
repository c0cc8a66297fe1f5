"""Linalg and random-variable contract grids.

Extends the op grids (tests/test_op_grids.py) to the linalg family
(reference tests/tensor/linalg/, incl. Blockwise batching) and the
random library (reference tests/tensor/random/test_basic.py moment
checks): each decomposition/solver runs unbatched AND batched through
Blockwise, gradients are FD-verified, and each distribution's sample
mean/variance is checked against its analytic moments on the XLA
backend.
"""

from __future__ import annotations

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.tensor import linalg as ptl
from tests.utils import compare_xla_and_py

rng = np.random.default_rng(7)


def _spd(n, batch=None):
    shape = (n, n) if batch is None else (batch, n, n)
    a = rng.standard_normal(shape)
    return (a @ np.swapaxes(a, -1, -2) + n * np.eye(n)).astype("float64")


def _gen(n, batch=None):
    shape = (n, n) if batch is None else (batch, n, n)
    return (rng.standard_normal(shape) + 4 * np.eye(n)).astype("float64")


# ---------------------------------------------------------------------------
# decompositions / solvers: unbatched and batched (Blockwise)
# ---------------------------------------------------------------------------

LINALG_UNARY = [
    ("cholesky", lambda A: ptl.cholesky(A), _spd,
     lambda A: np.linalg.cholesky(A)),
    ("inv", lambda A: ptl.inv(A), _gen, np.linalg.inv),
    ("pinv", lambda A: ptl.pinv(A), _gen, np.linalg.pinv),
    ("det", lambda A: ptl.det(A), _gen, np.linalg.det),
    ("expm", lambda A: ptl.expm(A), lambda n, batch=None: _gen(n, batch) * 0.1,
     None),
    ("matrix_power3", lambda A: ptl.matrix_power(A, 3), _gen,
     lambda A: np.linalg.matrix_power(A, 3) if A.ndim == 2
     else np.stack([np.linalg.matrix_power(a, 3) for a in A])),
]


@pytest.mark.parametrize("batch", [None, 3], ids=["plain", "batched"])
@pytest.mark.parametrize("name,build,make,expected", LINALG_UNARY,
                         ids=[c[0] for c in LINALG_UNARY])
def test_linalg_unary_grid(name, build, make, expected, batch):
    Av = make(4, batch)
    A = pt.tensor("A", dtype="float64", shape=Av.shape)
    res = compare_xla_and_py([A], build(A), [Av], rtol=1e-8, atol=1e-9)
    if expected is not None:
        np.testing.assert_allclose(np.asarray(res[0]), expected(Av),
                                   rtol=1e-7, atol=1e-8)


def test_slogdet_grid():
    Av = _gen(4)
    A = pt.tensor("A", dtype="float64", shape=Av.shape)
    sign, logdet = ptl.slogdet(A)
    res = compare_xla_and_py([A], [sign, logdet], [Av])
    es, el = np.linalg.slogdet(Av)
    np.testing.assert_allclose(np.asarray(res[0]), es)
    np.testing.assert_allclose(np.asarray(res[1]), el, rtol=1e-10)


DECOMPS = [
    ("qr", lambda A: list(ptl.qr(A, mode="reduced")),
     lambda q_r, Av: np.testing.assert_allclose(
         np.asarray(q_r[0]) @ np.asarray(q_r[1]), Av, atol=1e-8)),
    ("svd", lambda A: list(ptl.svd(A, full_matrices=False)),
     lambda usv, Av: np.testing.assert_allclose(
         np.asarray(usv[0]) * np.asarray(usv[1]) @ np.asarray(usv[2]), Av,
         atol=1e-8)),
    ("lu", lambda A: list(ptl.lu(A)),
     lambda plu, Av: np.testing.assert_allclose(
         np.asarray(plu[0]) @ np.asarray(plu[1]) @ np.asarray(plu[2]), Av,
         atol=1e-8)),
    ("eigh", lambda A: list(ptl.eigh(A)),
     lambda we, Av: np.testing.assert_allclose(
         np.asarray(we[1]) @ np.diag(np.asarray(we[0]))
         @ np.asarray(we[1]).T, Av, atol=1e-8)),
]


@pytest.mark.parametrize("name,build,check", DECOMPS,
                         ids=[c[0] for c in DECOMPS])
def test_linalg_decomp_grid(name, build, check):
    Av = _spd(4)
    A = pt.tensor("A", dtype="float64", shape=Av.shape)
    res = compare_xla_and_py([A], build(A), [Av], rtol=1e-7, atol=1e-8)
    check(res, Av)


SOLVERS = [
    ("solve", lambda A, b: ptl.solve(A, b, b_ndim=1), _gen),
    ("solve_spd", lambda A, b: ptl.solve(A, b, assume_a="pos", b_ndim=1),
     _spd),
    ("solve_triangular",
     lambda A, b: ptl.solve_triangular(ptl.cholesky(A), b, lower=True), _spd),
    ("cho_solve",
     lambda A, b: ptl.cho_solve((ptl.cholesky(A), True), b, b_ndim=1), _spd),
]


@pytest.mark.parametrize("name,build,make", SOLVERS,
                         ids=[c[0] for c in SOLVERS])
def test_linalg_solver_grid(name, build, make):
    Av = make(4)
    bv = rng.standard_normal(4)
    A = pt.tensor("A", dtype="float64", shape=(4, 4))
    b = pt.tensor("b", dtype="float64", shape=(4,))
    res = compare_xla_and_py([A, b], build(A, b), [Av, bv],
                             rtol=1e-8, atol=1e-9)
    x = np.asarray(res[0])
    if name == "solve_triangular":
        np.testing.assert_allclose(np.linalg.cholesky(Av) @ x, bv, atol=1e-8)
    else:
        np.testing.assert_allclose(Av @ x, bv, atol=1e-8)


LINALG_GRADS = [
    ("cholesky", lambda A: ptl.cholesky(A).sum(), _spd),
    ("inv", lambda A: ptl.inv(A).sum(), _gen),
    ("det", lambda A: ptl.det(A), _gen),
    ("slogdet", lambda A: ptl.slogdet(A)[1], _spd),
    ("solve", None, None),  # filled below
    ("expm", lambda A: ptl.expm(A * 0.1).sum(), _gen),
]


@pytest.mark.parametrize(
    "name", [c[0] for c in LINALG_GRADS if c[0] != "solve"])
def test_linalg_grad_fd(name):
    build, make = next((c[1], c[2]) for c in LINALG_GRADS if c[0] == name)
    Av = make(3)
    ptt.verify_grad(build, [Av], rng=np.random.default_rng(3),
                    abs_tol=1e-4, rel_tol=1e-4)


def test_solve_grad_fd():
    Av, bv = _spd(3), rng.standard_normal(3)
    ptt.verify_grad(lambda A, b: ptl.solve(A, b, b_ndim=1).sum(), [Av, bv],
                    rng=np.random.default_rng(3), abs_tol=1e-4, rel_tol=1e-4)


def test_kron_and_norm():
    Av, Bv = rng.standard_normal((2, 3)), rng.standard_normal((3, 2))
    A = pt.tensor("A", dtype="float64", shape=(2, 3))
    B = pt.tensor("B", dtype="float64", shape=(3, 2))
    res = compare_xla_and_py([A, B], ptl.kron(A, B), [Av, Bv])
    np.testing.assert_allclose(np.asarray(res[0]), np.kron(Av, Bv))
    for ordv in (None, 1, np.inf, "fro"):
        r = compare_xla_and_py([A], ptl.norm(A, ord=ordv), [Av])
        np.testing.assert_allclose(np.asarray(r[0]),
                                   np.linalg.norm(Av, ord=ordv), rtol=1e-10)


# ---------------------------------------------------------------------------
# random variables: sample-moment grid on the XLA backend
# ---------------------------------------------------------------------------

N_DRAWS = 40_000


def _draw(dist, *args, **kwargs):
    from pytensor_tpu.tensor.random import RandomStream

    srng = RandomStream(seed=1234)
    x = getattr(srng, dist)(*args, size=(N_DRAWS,), **kwargs)
    f = ptt.function([], x)
    return np.asarray(f())


# (dist, args, mean, var) — None disables that moment check
RV_MOMENTS = [
    ("normal", (1.5, 2.0), 1.5, 4.0),
    ("uniform", (0.0, 2.0), 1.0, 4.0 / 12),
    ("beta", (2.0, 3.0), 0.4, 2 * 3 / (25.0 * 6)),
    ("gamma", (3.0, 0.5), 6.0, 12.0),  # shape, rate convention
    ("exponential", (2.0,), 2.0, 4.0),
    ("poisson", (4.0,), 4.0, 4.0),
    ("binomial", (10, 0.3), 3.0, 2.1),
    ("bernoulli", (0.3,), 0.3, 0.21),
    ("lognormal", (0.0, 0.5), np.exp(0.125), None),
    ("halfnormal", (0.0, 1.0), np.sqrt(2 / np.pi), 1 - 2 / np.pi),
    ("laplace", (1.0, 2.0), 1.0, 8.0),
    ("logistic", (0.5, 1.0), 0.5, np.pi ** 2 / 3),
    ("geometric", (0.4,), 1 / 0.4, 0.6 / 0.16),
    ("chisquare", (5.0,), 5.0, 10.0),
    ("t", (5.0,), 0.0, 5.0 / 3.0),
    ("gumbel", (0.0, 1.0), np.euler_gamma, np.pi ** 2 / 6),
    ("weibull", (2.0,), 0.8862269254527579, None),
    ("pareto", (5.0,), 5.0 / 4.0, None),
    ("rayleigh", (1.0,), np.sqrt(np.pi / 2), (4 - np.pi) / 2),
    ("invgamma", (5.0, 1.0), 0.25, None),
    ("wald", (2.0, 4.0), 2.0, 2.0),
    ("triangular", (0.0, 1.0, 2.0), 1.0, None),
    ("vonmises", (0.0, 4.0), 0.0, None),
    ("cauchy", (0.0, 1.0), None, None),  # no moments: just runs + finite-ish
    ("halfcauchy", (0.0, 1.0), None, None),
    ("negative_binomial", (5, 0.5), 5.0, 10.0),
    ("truncated_normal", (0.0, 1.0, -1.0, 1.0), 0.0, None),
]


@pytest.mark.parametrize("dist,args,mean,var", RV_MOMENTS,
                         ids=[c[0] for c in RV_MOMENTS])
def test_rv_moments(dist, args, mean, var):
    draws = _draw(dist, *args)
    assert draws.shape == (N_DRAWS,)
    if mean is not None:
        se = np.std(draws) / np.sqrt(N_DRAWS) if np.std(draws) > 0 else 1e-3
        assert abs(np.mean(draws) - mean) < 6 * se + 1e-3, (
            f"{dist} mean {np.mean(draws)} vs {mean}")
    if var is not None:
        assert abs(np.var(draws) - var) / max(var, 1e-3) < 0.1, (
            f"{dist} var {np.var(draws)} vs {var}")


def test_rv_categorical_and_dirichlet():
    from pytensor_tpu.tensor.random import RandomStream

    srng = RandomStream(seed=99)
    p = np.array([0.2, 0.3, 0.5])
    c = srng.categorical(p, size=(N_DRAWS,))
    d = srng.dirichlet(np.array([2.0, 3.0, 5.0]), size=(2000,))
    f = ptt.function([], [c, d])
    cv, dv = (np.asarray(a) for a in f())
    freq = np.bincount(cv, minlength=3) / N_DRAWS
    np.testing.assert_allclose(freq, p, atol=0.02)
    np.testing.assert_allclose(dv.mean(axis=0), [0.2, 0.3, 0.5], atol=0.03)
    np.testing.assert_allclose(dv.sum(axis=1), 1.0, rtol=1e-6)


def test_rv_mvnormal_moments():
    from pytensor_tpu.tensor.random import RandomStream

    srng = RandomStream(seed=5)
    mu = np.array([1.0, -1.0])
    cov = np.array([[2.0, 0.5], [0.5, 1.0]])
    x = srng.multivariate_normal(mu, cov, size=(20000,))
    v = np.asarray(ptt.function([], x)())
    np.testing.assert_allclose(v.mean(axis=0), mu, atol=0.05)
    np.testing.assert_allclose(np.cov(v.T), cov, atol=0.08)


def test_rv_multinomial_and_integers():
    from pytensor_tpu.tensor.random import RandomStream

    srng = RandomStream(seed=11)
    m = srng.multinomial(20, np.array([0.5, 0.25, 0.25]), size=(5000,))
    i = srng.integers(0, 10, size=(N_DRAWS,))
    f = ptt.function([], [m, i])
    mv, iv = (np.asarray(a) for a in f())
    np.testing.assert_array_equal(mv.sum(axis=1), 20)
    np.testing.assert_allclose(mv.mean(axis=0), [10, 5, 5], atol=0.3)
    assert iv.min() >= 0 and iv.max() <= 9
    np.testing.assert_allclose(iv.mean(), 4.5, atol=0.1)


def test_rv_permutation_and_choice():
    from pytensor_tpu.tensor.random import RandomStream

    srng = RandomStream(seed=13)
    p = srng.permutation(8)
    ch = srng.choice(np.arange(5.0), size=(1000,))
    f = ptt.function([], [p, ch])
    pv, cv = (np.asarray(a) for a in f())
    assert sorted(pv.tolist()) == list(range(8))
    assert set(np.unique(cv)) <= set(np.arange(5.0))
