"""Statistical moment grid: every scalar distribution's sample mean and
variance must match the analytic values (6-sigma band on the mean, 20%
band on the variance at N=40k).  Catches wrong parameterizations — the
class of bug the round-1 gamma rate/scale audit found."""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor.random as ptr
from pytensor_tpu.tensor.random import RandomStream

N = 40_000

# (name, params, analytic mean, analytic var); var=None -> skip var check
CASES = [
    ("normal", (2.0, 3.0), 2.0, 9.0),
    ("uniform", (1.0, 5.0), 3.0, 16.0 / 12.0),
    ("exponential", (2.0,), 2.0, 4.0),  # scale parameterization
    ("gamma", (3.0, 2.0), 1.5, 0.75),  # (shape, rate): mean k/r, var k/r^2
    ("beta", (2.0, 5.0), 2.0 / 7.0, 2.0 * 5.0 / (49.0 * 8.0)),
    ("lognormal", (0.5, 0.4), np.exp(0.5 + 0.08),
     (np.exp(0.16) - 1) * np.exp(1.0 + 0.16)),
    ("halfnormal", (0.0, 2.0), 2.0 * np.sqrt(2 / np.pi),
     4.0 * (1 - 2 / np.pi)),
    ("poisson", (4.0,), 4.0, 4.0),
    ("bernoulli", (0.3,), 0.3, 0.21),
    ("binomial", (10, 0.4), 4.0, 2.4),
    ("geometric", (0.25,), 4.0, (1 - 0.25) / 0.25 ** 2),
    ("negative_binomial", (5, 0.4), 5 * 0.6 / 0.4, 5 * 0.6 / 0.16),
    ("laplace", (1.0, 2.0), 1.0, 8.0),
    ("logistic", (1.0, 2.0), 1.0, (np.pi * 2.0) ** 2 / 3.0),
    ("gumbel", (1.0, 2.0), 1.0 + 2.0 * np.euler_gamma,
     (np.pi * 2.0) ** 2 / 6.0),
    ("wald", (2.0, 3.0), 2.0, 8.0 / 3.0),
    ("invgamma", (4.0, 2.0), 2.0 / 3.0, 4.0 / (9.0 * 2.0)),
    ("chisquare", (5.0,), 5.0, 10.0),
    ("rayleigh", (2.0,), 2.0 * np.sqrt(np.pi / 2), (4 - np.pi) / 2 * 4.0),
    ("weibull", (2.0,), 0.8862269254527579, None),  # Gamma(1.5)
    ("pareto", (3.0,), 1.5, 0.75),  # lomax+1? numpy pareto: mean b/(b-1)
    ("t", (5.0,), 0.0, 5.0 / 3.0),
    ("triangular", (0.0, 1.0, 3.0), 4.0 / 3.0, None),
    ("vonmises", (1.0, 4.0), None, None),  # circular: checked separately
    ("truncexpon", (3.0, 0.0, 1.0), None, None),  # (b, loc, scale); vs scipy
    ("standard_normal", (), 0.0, 1.0),
    ("halfcauchy", (), None, None),  # no finite moments
    ("cauchy", (), None, None),
]


@pytest.mark.parametrize("name,params,mean,var",
                         CASES, ids=[c[0] for c in CASES])
def test_moments(name, params, mean, var):
    srng = RandomStream(seed=1234)
    draws = srng.gen(getattr(ptr, name), *params, size=(N,))
    v = np.asarray(ptt.function([], draws)()).astype("float64")
    assert v.shape == (N,)
    assert np.isfinite(v).all() or name in ("cauchy", "halfcauchy")
    if name == "vonmises":
        # circular mean: atan2 of resultant must be near mu=1.0
        ang = np.arctan2(np.sin(v).mean(), np.cos(v).mean())
        assert abs(ang - 1.0) < 0.05
        return
    if name == "truncexpon":
        import scipy.stats as st

        m = st.truncexpon(3.0).mean()
        assert abs(v.mean() - m) < 6 * v.std() / np.sqrt(N) + 1e-3
        return
    if mean is not None:
        band = 6 * v.std() / np.sqrt(N) + 1e-9
        assert abs(v.mean() - mean) < band, (v.mean(), mean, band)
    if var is not None:
        assert abs(v.var() - var) < 0.2 * var + 1e-9, (v.var(), var)


def test_multivariate_moments():
    srng = RandomStream(seed=0)
    mu = np.array([1.0, -2.0])
    cov = np.array([[2.0, 0.6], [0.6, 1.0]])
    d = srng.gen(ptr.multivariate_normal, mu, cov, size=(N,))
    v = np.asarray(ptt.function([], d)())
    np.testing.assert_allclose(v.mean(0), mu, atol=0.05)
    np.testing.assert_allclose(np.cov(v.T), cov, atol=0.08)

    al = np.array([2.0, 3.0, 5.0])
    d2 = srng.gen(ptr.dirichlet, al, size=(N,))
    v2 = np.asarray(ptt.function([], d2)())
    np.testing.assert_allclose(v2.mean(0), al / al.sum(), atol=0.01)

    d3 = srng.gen(ptr.multinomial, 20, np.array([0.2, 0.3, 0.5]),
                  size=(N,))
    v3 = np.asarray(ptt.function([], d3)())
    np.testing.assert_allclose(v3.mean(0), [4.0, 6.0, 10.0], atol=0.1)
