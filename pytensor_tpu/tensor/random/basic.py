"""Distribution library: ~35 RandomVariables.

Parallels /root/reference/pytensor/tensor/random/basic.py (:83-2075).
Every sampler is a jax.random (threefry) kernel running on device; the
numpy-Generator bit streams of the reference are NOT reproduced (same
situation as the reference's own JAX backend, link/jax/dispatch/random.py)
— tests validate statistics, not bit-exact draws.
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.tensor.random.op import RandomVariable


def _jr():
    import jax.random as jr

    return jr


def _jnp():
    import jax.numpy as jnp

    return jnp


def _full_shape(shape, *params):
    jnp = _jnp()
    if shape is not None:
        return tuple(int(s) for s in shape)
    return jnp.broadcast_shapes(*(jnp.shape(p) for p in params)) if params else ()


def _locscale(std_sampler):
    def sampler(key, shape, loc, scale):
        jnp = _jnp()
        shp = _full_shape(shape, loc, scale)
        z = std_sampler(key, shp)
        return loc + scale * z.astype(jnp.result_type(float))

    return sampler


# --- continuous ---------------------------------------------------------------

uniform = RandomVariable(
    "uniform", [0, 0], 0, "floatX",
    lambda key, shape, low, high: low + (high - low) * _jr().uniform(
        key, _full_shape(shape, low, high)),
    defaults=(0.0, 1.0),
)

normal = RandomVariable(
    "normal", [0, 0], 0, "floatX",
    _locscale(lambda key, shp: _jr().normal(key, shp)),
    defaults=(0.0, 1.0),
)

standard_normal = RandomVariable(
    "standard_normal", [], 0, "floatX",
    lambda key, shape: _jr().normal(key, _full_shape(shape)),
)

halfnormal = RandomVariable(
    "halfnormal", [0, 0], 0, "floatX",
    _locscale(lambda key, shp: _jnp().abs(_jr().normal(key, shp))),
    defaults=(0.0, 1.0),
)

lognormal = RandomVariable(
    "lognormal", [0, 0], 0, "floatX",
    lambda key, shape, mean, sigma: _jnp().exp(
        mean + sigma * _jr().normal(key, _full_shape(shape, mean, sigma))),
    defaults=(0.0, 1.0),
)

beta = RandomVariable(
    "beta", [0, 0], 0, "floatX",
    lambda key, shape, a, b: _jr().beta(key, a, b, _full_shape(shape, a, b)),
)

_gamma = RandomVariable(
    "gamma", [0, 0], 0, "floatX",
    lambda key, shape, shape_p, scale: _jr().gamma(
        key, shape_p, _full_shape(shape, shape_p, scale)) * scale,
)


def gamma(shape, rate=None, scale=None, **kwargs):
    """Gamma draws; positional second argument is the RATE (reference
    tensor/random/basic.py:469 convention), scale available by keyword."""
    if rate is not None and scale is not None:
        raise ValueError("gamma: pass rate or scale, not both")
    if rate is None and scale is None:
        raise ValueError("gamma: must specify rate or scale")
    if scale is None:
        scale = 1.0 / rate
    return _gamma(shape, scale, **kwargs)

chisquare = RandomVariable(
    "chisquare", [0], 0, "floatX",
    lambda key, shape, df: _jr().chisquare(key, df, shape=_full_shape(shape, df)),
)

exponential = RandomVariable(
    "exponential", [0], 0, "floatX",
    lambda key, shape, scale: _jr().exponential(key, _full_shape(shape, scale)) * scale,
    defaults=(1.0,),
)

weibull = RandomVariable(
    "weibull", [0], 0, "floatX",
    lambda key, shape, a: _jr().weibull_min(
        key, 1.0, a, shape=_full_shape(shape, a)),
)

logistic = RandomVariable(
    "logistic", [0, 0], 0, "floatX",
    _locscale(lambda key, shp: _jr().logistic(key, shp)),
    defaults=(0.0, 1.0),
)

vonmises = RandomVariable(
    "vonmises", [0, 0], 0, "floatX",
    lambda key, shape, mu, kappa: _vonmises(key, shape, mu, kappa),
)


def _vonmises(key, shape, mu, kappa):
    # Best-Fisher rejection-free wrapped-Cauchy approximation is involved;
    # use the standard Best & Fisher (1979) algorithm vectorized with a
    # fixed number of proposal rounds (acceptance prob > 0.66 per round).
    jr, jnp = _jr(), _jnp()
    shp = _full_shape(shape, mu, kappa)
    mu_b = jnp.broadcast_to(mu, shp)
    kappa_b = jnp.broadcast_to(kappa, shp)
    tau = 1 + jnp.sqrt(1 + 4 * kappa_b**2)
    rho = (tau - jnp.sqrt(2 * tau)) / (2 * kappa_b)
    r = (1 + rho**2) / (2 * rho)
    accepted = jnp.zeros(shp, dtype=bool)
    draw = jnp.zeros(shp)
    for i in range(24):
        key, k1, k2, k3 = jr.split(key, 4)
        u1 = jr.uniform(k1, shp)
        u2 = jr.uniform(k2, shp)
        u3 = jr.uniform(k3, shp)
        z = jnp.cos(jnp.pi * u1)
        f = (1 + r * z) / (r + z)
        c = kappa_b * (r - f)
        accept = (c * (2 - c) - u2 > 0) | (jnp.log(c / u2) + 1 - c >= 0)
        theta = jnp.sign(u3 - 0.5) * jnp.arccos(jnp.clip(f, -1, 1))
        draw = jnp.where(~accepted & accept, theta, draw)
        accepted = accepted | accept
    return mu_b + draw


invgamma = RandomVariable(
    "invgamma", [0, 0], 0, "floatX",
    lambda key, shape, a, scale: scale / _jr().gamma(
        key, a, _full_shape(shape, a, scale)),
)


def _truncexpon(key, shape, b, loc, scale):
    jnp = _jnp()
    shp = _full_shape(shape, b, loc, scale)
    u = _jr().uniform(key, shp)
    # inverse CDF of the exponential truncated to [0, b]
    return loc + scale * (-jnp.log1p(-u * (1.0 - jnp.exp(-b))))


truncexpon = RandomVariable(
    "truncexpon", [0, 0, 0], 0, "floatX", _truncexpon,
)


def _betabinom(key, shape, n, a, b):
    k1, k2 = _jr().split(key)
    shp = _full_shape(shape, n, a, b)
    p = _jr().beta(k1, a, b, shp)
    return _jr().binomial(k2, n, p, shape=shp).astype("int64")


betabinom = RandomVariable(
    "betabinom", [0, 0, 0], 0, "int64", _betabinom,
)


def _gengamma(key, shape, alpha, p, lambd):
    # scipy.stats.gengamma convention: X = lambd * G(alpha/p)**(1/p)
    jnp = _jnp()
    shp = _full_shape(shape, alpha, p, lambd)
    g = _jr().gamma(key, alpha / p, shp)
    return lambd * g ** (1.0 / jnp.asarray(p, g.dtype))


gengamma = RandomVariable(
    "gengamma", [0, 0, 0], 0, "floatX", _gengamma,
    defaults=(1.0, 1.0, 1.0),
)


def _hypergeometric(key, shape, ngood, nbad, nsample):
    # No dynamic-shape-free device algorithm exists (the support depends on
    # the parameter *values*); like the reference's numpy sampler this runs
    # on the host, seeded deterministically from the threefry key.
    import jax

    jnp = _jnp()
    shp = _full_shape(shape, ngood, nbad, nsample)
    kdata = _jr().key_data(key)

    def _host(kd, g, b, n):
        seed = int(np.asarray(kd).astype(np.uint64).sum())
        host_rng = np.random.default_rng(seed)
        return host_rng.hypergeometric(g, b, n, size=shp).astype(np.int64)

    out = jax.ShapeDtypeStruct(shp, np.int64)
    return jax.pure_callback(
        _host, out,
        kdata,
        jnp.broadcast_to(ngood, shp),
        jnp.broadcast_to(nbad, shp),
        jnp.broadcast_to(nsample, shp),
    )


hypergeometric = RandomVariable(
    "hypergeometric", [0, 0, 0], 0, "int64", _hypergeometric,
)


cauchy = RandomVariable(
    "cauchy", [0, 0], 0, "floatX",
    _locscale(lambda key, shp: _jr().cauchy(key, shp)),
    defaults=(0.0, 1.0),
)

halfcauchy = RandomVariable(
    "halfcauchy", [0, 0], 0, "floatX",
    _locscale(lambda key, shp: _jnp().abs(_jr().cauchy(key, shp))),
    defaults=(0.0, 1.0),
)

pareto = RandomVariable(
    "pareto", [0, 0], 0, "floatX",
    lambda key, shape, b, scale: _jr().pareto(
        key, b, shape=_full_shape(shape, b, scale)) * scale,
    defaults=(1.0,),
)

gumbel = RandomVariable(
    "gumbel", [0, 0], 0, "floatX",
    _locscale(lambda key, shp: _jr().gumbel(key, shp)),
    defaults=(0.0, 1.0),
)

laplace = RandomVariable(
    "laplace", [0, 0], 0, "floatX",
    _locscale(lambda key, shp: _jr().laplace(key, shp)),
    defaults=(0.0, 1.0),
)

wald = RandomVariable(
    "wald", [0, 0], 0, "floatX",
    lambda key, shape, mean, scale: _wald(key, shape, mean, scale),
    defaults=(1.0, 1.0),
)


def _wald(key, shape, mean, scale):
    # inverse-Gaussian via the Michael-Schucany-Haas transform
    jr, jnp = _jr(), _jnp()
    shp = _full_shape(shape, mean, scale)
    k1, k2 = jr.split(key)
    nu = jr.normal(k1, shp)
    y = nu * nu
    mu = jnp.broadcast_to(mean, shp)
    lam = jnp.broadcast_to(scale, shp)
    x = mu + (mu * mu * y) / (2 * lam) - (mu / (2 * lam)) * jnp.sqrt(
        4 * mu * lam * y + mu * mu * y * y
    )
    z = jr.uniform(k2, shp)
    return jnp.where(z <= mu / (mu + x), x, mu * mu / x)


t = RandomVariable(
    "t", [0, 0, 0], 0, "floatX",
    lambda key, shape, df, loc, scale: loc + scale * _jr().t(
        key, df, _full_shape(shape, df, loc, scale)),
    defaults=(0.0, 1.0),
)

triangular = RandomVariable(
    "triangular", [0, 0, 0], 0, "floatX",
    lambda key, shape, left, mode, right: _jr().triangular(
        key, left, mode, right, shape=_full_shape(shape, left, mode, right)),
)

rayleigh = RandomVariable(
    "rayleigh", [0], 0, "floatX",
    lambda key, shape, scale: _jr().rayleigh(
        key, scale, shape=_full_shape(shape, scale)),
    defaults=(1.0,),
)

truncated_normal = RandomVariable(
    "truncated_normal", [0, 0, 0, 0], 0, "floatX",
    lambda key, shape, loc, scale, lower, upper: loc + scale * _jr().truncated_normal(
        key, (lower - loc) / scale, (upper - loc) / scale,
        _full_shape(shape, loc, scale, lower, upper)),
)

# --- multivariate -------------------------------------------------------------

multivariate_normal = RandomVariable(
    "multivariate_normal", [1, 2], 1, "floatX",
    lambda key, shape, mean, cov: _jr().multivariate_normal(
        key, mean, cov,
        shape=None if shape is None else tuple(shape), method="cholesky"),
)
mvnormal = multivariate_normal

dirichlet = RandomVariable(
    "dirichlet", [1], 1, "floatX",
    lambda key, shape, alpha: _jr().dirichlet(
        key, alpha, shape=None if shape is None else tuple(shape)),
)

# --- discrete -----------------------------------------------------------------

poisson = RandomVariable(
    "poisson", [0], 0, "int64",
    lambda key, shape, lam: _jr().poisson(key, lam, shape=_full_shape(shape, lam)),
    defaults=(1.0,),
)

bernoulli = RandomVariable(
    "bernoulli", [0], 0, "int64",
    lambda key, shape, p: _jr().bernoulli(key, p, shape=_full_shape(shape, p)),
)

binomial = RandomVariable(
    "binomial", [0, 0], 0, "int64",
    lambda key, shape, n, p: _jr().binomial(
        key, n, p, shape=_full_shape(shape, n, p)),
)

negative_binomial = RandomVariable(
    "negative_binomial", [0, 0], 0, "int64",
    lambda key, shape, n, p: _negbinom(key, shape, n, p),
)
nbinom = negative_binomial


def _negbinom(key, shape, n, p):
    # gamma-poisson mixture
    jr = _jr()
    k1, k2 = jr.split(key)
    shp = _full_shape(shape, n, p)
    g = jr.gamma(k1, n, shp) * (1 - p) / p
    return jr.poisson(k2, g, shape=shp)


geometric = RandomVariable(
    "geometric", [0], 0, "int64",
    lambda key, shape, p: _jr().geometric(key, p, shape=_full_shape(shape, p)),
)

categorical = RandomVariable(
    "categorical", [1], 0, "int64",
    lambda key, shape, p: _jr().categorical(
        key, _jnp().log(p),
        shape=_full_shape(shape, p[..., 0]) if shape is not None or p.ndim > 1 else None),
)

multinomial = RandomVariable(
    "multinomial", [0, 1], 1, "int64",
    lambda key, shape, n, p: _multinomial(key, shape, n, p),
)


def _multinomial(key, shape, n, p):
    jr, jnp = _jr(), _jnp()
    if hasattr(jr, "multinomial"):
        batch = _full_shape(shape, n, p[..., 0])
        n_b = jnp.broadcast_to(n, batch).astype(p.dtype)
        p_b = jnp.broadcast_to(p, batch + p.shape[-1:])
        return jr.multinomial(key, n_b, p_b).astype("int64")
    raise NotImplementedError("jax.random.multinomial unavailable")


integers = RandomVariable(
    "integers", [0, 0], 0, "int64",
    lambda key, shape, low, high: _jr().randint(
        key, _full_shape(shape, low, high), low, high),
)


def randint(low, high=None, size=None, rng=None, **kwargs):
    if high is None:
        low, high = 0, low
    return integers(low, high, size=size, rng=rng, **kwargs)


class ChoiceRV(RandomVariable):
    def __init__(self):
        super().__init__(
            "choice", [1, 1], 0, "int64",
            lambda key, shape, a, p: _jr().choice(
                key, a, shape=_full_shape(shape), replace=False, p=p),
        )


choice_rv = RandomVariable(
    "choice", [1], 0, "floatX",
    lambda key, shape, a: _jr().choice(key, a, shape=() if shape is None else tuple(shape)),
)


def choice(a, size=None, replace=True, p=None, rng=None):
    from pytensor_tpu.tensor.basic import as_tensor_variable

    a = as_tensor_variable(a)

    def sampler(key, shape, a_val, p_val=None):
        return _jr().choice(
            key, a_val, shape=() if shape is None else tuple(int(s) for s in shape),
            replace=replace, p=p_val,
        )

    if p is not None:
        rv = RandomVariable("choice", [1, 1], 0, str(a.type.dtype), sampler)
        return rv(a, p, size=size, rng=rng)
    rv = RandomVariable("choice", [1], 0, str(a.type.dtype), sampler)
    return rv(a, size=size, rng=rng)


permutation_rv = RandomVariable(
    "permutation", [1], 1, "floatX",
    lambda key, shape, x: _jr().permutation(key, x),
)


def permutation(x, rng=None, **kwargs):
    from pytensor_tpu.tensor.basic import as_tensor_variable

    x = as_tensor_variable(x)
    if x.type.ndim == 0:
        # permutation(n) -> permuted arange
        def sampler(key, shape, n):
            return _jr().permutation(key, int(n))

        rv = RandomVariable("permutation", [0], 1, "int64", sampler)
        return rv(x, rng=rng, **kwargs)
    rv = RandomVariable("permutation", [x.type.ndim], x.type.ndim,
                        str(x.type.dtype),
                        lambda key, shape, xv: _jr().permutation(key, xv))
    return rv(x, rng=rng, **kwargs)


# --- reference class-name surface ------------------------------------------
# Every distribution above instantiates a generated per-name subclass
# (random/op.py _rv_class); export those classes under the reference's
# names (NormalRV, UniformRV, ...; tensor/random/basic.py:83-2075) so
# downstream isinstance dispatch works.
from pytensor_tpu.tensor.random.op import (  # noqa: E402,F401
    ScipyRandomVariable,
    _rv_classes as _generated_rv_classes,
)

globals().update(_generated_rv_classes)
# ours supports replace=True/False in one op; the reference's
# without-replacement class name maps to it
ChoiceWithoutReplacement = ChoiceRV
