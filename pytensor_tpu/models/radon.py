"""Hierarchical radon model logp + dlogp: the NUTS inner-loop workload.

The north-star benchmark (BASELINE.md): a PyMC-style varying-intercept
model with non-centered parameterization,

    a_raw ~ N(0, 1)            [n_counties]
    mu_a ~ N(0, 10); log_sigma_a, log_sigma_y ~ N(0, 2); b ~ N(0, 10)
    a = mu_a + sigma_a * a_raw
    y ~ N(a[county] + b * floor, sigma_y)

The compiled function maps the flat free-parameter vector to
(logp, dlogp) — exactly what a NUTS leapfrog step evaluates.
"""

from __future__ import annotations

import numpy as np

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt

LOG_2PI = float(np.log(2.0 * np.pi))


def radon_synthetic_data(n_obs=919, n_counties=85, seed=0, dtype="float64"):
    """Synthetic data with the dimensions of the classic radon dataset."""
    rng = np.random.default_rng(seed)
    county = rng.integers(0, n_counties, size=n_obs).astype("int64")
    floor = (rng.random(n_obs) < 0.35).astype(dtype)
    true_a = rng.normal(1.5, 0.35, size=n_counties)
    log_radon = (true_a[county] - 0.65 * floor
                 + rng.normal(0.0, 0.75, size=n_obs)).astype(dtype)
    return county, floor, log_radon


def _normal_logp(x, mu, sigma):
    return -0.5 * ((x - mu) / sigma) ** 2 - pt.log(sigma) - 0.5 * LOG_2PI


def make_radon_logp_grad(n_obs=919, n_counties=85, dtype="float64", seed=0,
                         mode=None):
    """Build and compile theta -> (logp, dlogp).

    Returns (compiled_function, theta0, n_params).
    """
    county_v, floor_v, y_v = radon_synthetic_data(n_obs, n_counties, seed, dtype)
    n_params = n_counties + 4

    theta = pt.tensor("theta", dtype=dtype, shape=(n_params,))
    county = pt.as_tensor_variable(county_v)
    floor = pt.as_tensor_variable(floor_v)
    y = pt.as_tensor_variable(y_v)

    a_raw = theta[:n_counties]
    mu_a = theta[n_counties]
    log_sigma_a = theta[n_counties + 1]
    b = theta[n_counties + 2]
    log_sigma_y = theta[n_counties + 3]

    sigma_a = pt.exp(log_sigma_a)
    sigma_y = pt.exp(log_sigma_y)

    a = mu_a + sigma_a * a_raw
    mu_y = a[county] + b * floor

    logp = (
        pt.sum(_normal_logp(y, mu_y, sigma_y))
        + pt.sum(_normal_logp(a_raw, 0.0, 1.0))
        + pt.sum(_normal_logp(mu_a, 0.0, 10.0))
        + pt.sum(_normal_logp(b, 0.0, 10.0))
        + pt.sum(_normal_logp(log_sigma_a, 0.0, 2.0))
        + pt.sum(_normal_logp(log_sigma_y, 0.0, 2.0))
        + log_sigma_a + log_sigma_y  # jacobian of the log transforms
    )
    dlogp = ptt.grad(logp, theta)

    f = ptt.function([theta], [logp, dlogp], mode=mode, name="radon_logp_grad")
    f.trust_input = True
    theta0 = np.zeros(n_params, dtype=dtype)
    theta0[n_counties + 1] = -0.3
    theta0[n_counties + 3] = -0.3
    return f, theta0, n_params


def make_radon_graphs(n_obs=919, n_counties=85, dtype="float64", seed=0):
    """Return (inputs, [logp, dlogp]) uncompiled, for custom linking."""
    county_v, floor_v, y_v = radon_synthetic_data(n_obs, n_counties, seed, dtype)
    n_params = n_counties + 4
    theta = pt.tensor("theta", dtype=dtype, shape=(n_params,))
    county = pt.as_tensor_variable(county_v)
    floor = pt.as_tensor_variable(floor_v)
    y = pt.as_tensor_variable(y_v)
    a_raw = theta[:n_counties]
    mu_a = theta[n_counties]
    log_sigma_a = theta[n_counties + 1]
    b = theta[n_counties + 2]
    log_sigma_y = theta[n_counties + 3]
    sigma_a = pt.exp(log_sigma_a)
    sigma_y = pt.exp(log_sigma_y)
    a = mu_a + sigma_a * a_raw
    mu_y = a[county] + b * floor
    logp = (
        pt.sum(_normal_logp(y, mu_y, sigma_y))
        + pt.sum(_normal_logp(a_raw, 0.0, 1.0))
        + pt.sum(_normal_logp(mu_a, 0.0, 10.0))
        + pt.sum(_normal_logp(b, 0.0, 10.0))
        + pt.sum(_normal_logp(log_sigma_a, 0.0, 2.0))
        + pt.sum(_normal_logp(log_sigma_y, 0.0, 2.0))
        + log_sigma_a + log_sigma_y
    )
    dlogp = ptt.grad(logp, theta)
    return [theta], [logp, dlogp], n_params


def make_radon_logp_batched(n_obs=919, n_counties=85, dtype="float64", seed=0):
    """Multi-chain variant: theta has shape (chains, n_params), logp is
    per-chain (chains,).  NUTS-style samplers run many chains in parallel;
    on TPU the whole batch rides one executable."""
    county_v, floor_v, y_v = radon_synthetic_data(n_obs, n_counties, seed, dtype)
    n_params = n_counties + 4
    theta = pt.tensor("theta", dtype=dtype, shape=(None, n_params))
    county = pt.as_tensor_variable(county_v)
    floor = pt.as_tensor_variable(floor_v)
    y = pt.as_tensor_variable(y_v)

    a_raw = theta[:, :n_counties]                       # (chains, n_c)
    mu_a = theta[:, n_counties]                         # (chains,)
    log_sigma_a = theta[:, n_counties + 1]
    b = theta[:, n_counties + 2]
    log_sigma_y = theta[:, n_counties + 3]
    sigma_a = pt.exp(log_sigma_a)
    sigma_y = pt.exp(log_sigma_y)
    a = mu_a[:, None] + sigma_a[:, None] * a_raw        # (chains, n_c)
    mu_y = a[:, county] + b[:, None] * floor[None, :]   # (chains, n_obs)

    logp = (
        pt.sum(_normal_logp(y[None, :], mu_y, sigma_y[:, None]), axis=1)
        + pt.sum(_normal_logp(a_raw, 0.0, 1.0), axis=1)
        + _normal_logp(mu_a, 0.0, 10.0)
        + _normal_logp(b, 0.0, 10.0)
        + _normal_logp(log_sigma_a, 0.0, 2.0)
        + _normal_logp(log_sigma_y, 0.0, 2.0)
        + log_sigma_a + log_sigma_y
    )
    dlogp = ptt.grad(logp.sum(), theta)  # chains decouple: per-chain grads
    return theta, logp, dlogp, n_params
