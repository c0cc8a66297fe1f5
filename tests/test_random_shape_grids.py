"""RandomVariable shape/dtype contract grids.

Reference analog: tests/tensor/random/test_op.py + test_basic.py's
size/parameter-broadcast grids: for each distribution, the draw's shape
must follow (size or broadcast(params)) x core-shape rules, dtypes must
be stable, and draws must be reproducible per seed.
"""

from __future__ import annotations

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.tensor.random import RandomStream

SCALAR_DISTS = [
    # (name, params) — all scalar-core distributions
    ("normal", (0.0, 1.0)),
    ("uniform", (0.0, 1.0)),
    ("beta", (2.0, 3.0)),
    ("gamma", (2.0, 1.5)),
    ("exponential", (1.0,)),
    ("poisson", (3.0,)),
    ("bernoulli", (0.4,)),
    ("binomial", (5, 0.3)),
    ("laplace", (0.0, 1.0)),
    ("logistic", (0.0, 1.0)),
    ("lognormal", (0.0, 1.0)),
    ("cauchy", (0.0, 1.0)),
    ("halfnormal", (0.0, 1.0)),
    ("negative_binomial", (5, 0.4)),
    ("geometric", (0.3,)),
]

SIZES = [None, (4,), (2, 3), (2, 1, 2)]


@pytest.mark.parametrize("size", SIZES, ids=[str(s) for s in SIZES])
@pytest.mark.parametrize("name,params", SCALAR_DISTS,
                         ids=[d[0] for d in SCALAR_DISTS])
def test_scalar_dist_size_grid(name, params, size):
    srng = RandomStream(seed=123)
    dist = getattr(srng, name)
    draw = dist(*params, size=size)
    f = ptt.function([], draw)
    val = np.asarray(f())
    exp_shape = () if size is None else tuple(size)
    assert val.shape == exp_shape, (name, size, val.shape)
    assert np.all(np.isfinite(val.astype("float64")))


@pytest.mark.parametrize("name,params", SCALAR_DISTS,
                         ids=[d[0] for d in SCALAR_DISTS])
def test_scalar_dist_param_broadcast(name, params):
    # vector first param (length 3) with scalar rest -> shape (3,)
    srng = RandomStream(seed=7)
    first = np.full(3, params[0], dtype="float64") if not isinstance(params[0], int) \
        else np.full(3, params[0], dtype="int64")
    draw = getattr(srng, name)(first, *params[1:])
    f = ptt.function([], draw)
    assert np.asarray(f()).shape == (3,)


@pytest.mark.parametrize("name,params", SCALAR_DISTS[:6],
                         ids=[d[0] for d in SCALAR_DISTS[:6]])
def test_size_broadcasts_params(name, params):
    # scalar params + size (4, 2): params broadcast up
    srng = RandomStream(seed=7)
    draw = getattr(srng, name)(*params, size=(4, 2))
    assert np.asarray(ptt.function([], draw)()).shape == (4, 2)


def test_seed_determinism_across_functions():
    a = np.asarray(ptt.function(
        [], RandomStream(seed=99).normal(0.0, 1.0, size=(5,)))())
    b = np.asarray(ptt.function(
        [], RandomStream(seed=99).normal(0.0, 1.0, size=(5,)))())
    np.testing.assert_array_equal(a, b)
    c = np.asarray(ptt.function(
        [], RandomStream(seed=100).normal(0.0, 1.0, size=(5,)))())
    assert not np.array_equal(a, c)


def test_draws_advance_within_function():
    srng = RandomStream(seed=5)
    x = srng.normal(0.0, 1.0, size=(3,))
    y = srng.normal(0.0, 1.0, size=(3,))
    f = ptt.function([], [x, y])
    xv, yv = (np.asarray(r) for r in f())
    assert not np.array_equal(xv, yv)


def test_integer_dists_dtypes():
    srng = RandomStream(seed=11)
    for name, params in [("poisson", (3.0,)), ("bernoulli", (0.5,)),
                         ("binomial", (4, 0.5)), ("geometric", (0.4,)),
                         ("randint", (0, 10))]:
        if not hasattr(srng, name):
            continue
        d = getattr(srng, name)(*params, size=(6,))
        val = np.asarray(ptt.function([], d)())
        assert val.dtype.kind in "iu", (name, val.dtype)


def test_multivariate_size_grid():
    srng = RandomStream(seed=21)
    mu = np.zeros(3)
    cov = np.eye(3)
    for size, exp in [(None, (3,)), ((4,), (4, 3)), ((2, 2), (2, 2, 3))]:
        d = srng.multivariate_normal(mu, cov, size=size)
        assert np.asarray(ptt.function([], d)()).shape == exp
    alpha = np.ones(4)
    for size, exp in [(None, (4,)), ((5,), (5, 4))]:
        d = srng.dirichlet(alpha, size=size)
        v = np.asarray(ptt.function([], d)())
        assert v.shape == exp
        np.testing.assert_allclose(v.sum(-1), np.ones(exp[:-1]), rtol=1e-6)


def test_multinomial_size_grid():
    srng = RandomStream(seed=31)
    n = 10
    p = np.array([0.2, 0.3, 0.5])
    for size, exp in [(None, (3,)), ((4,), (4, 3))]:
        d = srng.multinomial(n, p, size=size)
        v = np.asarray(ptt.function([], d)())
        assert v.shape == exp
        np.testing.assert_array_equal(v.sum(-1), np.full(exp[:-1], n))


def test_choice_and_permutation():
    srng = RandomStream(seed=41)
    perm = srng.permutation(6)
    v = np.asarray(ptt.function([], perm)())
    np.testing.assert_array_equal(np.sort(v), np.arange(6))
    ch = srng.choice(5, size=(8,))
    cv = np.asarray(ptt.function([], ch)())
    assert cv.shape == (8,) and cv.min() >= 0 and cv.max() < 5


def test_standard_normal_and_random_sugar():
    srng = RandomStream(seed=51)
    # keyword-only size, matching the reference ctor signatures
    for name, shape in [("standard_normal", (3, 2)), ("random", (4,))]:
        if not hasattr(srng, name):
            continue
        d = getattr(srng, name)(size=shape)
        assert np.asarray(ptt.function([], d)()).shape == shape


def test_symbolic_param_draw():
    # distribution parameter fed at call time
    srng = RandomStream(seed=61)
    mu = pt.dvector("mu")
    d = srng.normal(mu, 1e-8)
    f = ptt.function([mu], d)
    muv = np.array([10.0, -10.0, 0.0])
    np.testing.assert_allclose(np.asarray(f(muv)), muv, atol=1e-4)
