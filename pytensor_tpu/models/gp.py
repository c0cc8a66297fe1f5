"""GP marginal likelihood: Cholesky + solve_triangular + logdet + grads
(the slinalg hot path from BASELINE.md)."""

from __future__ import annotations

import numpy as np

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.tensor import linalg as ptl

LOG_2PI = float(np.log(2.0 * np.pi))


def make_gp_marginal_likelihood(n=256, d=3, dtype="float64", seed=0, mode=None):
    """Compiled (lengthscale, amplitude, noise) -> (-mll, grads)."""
    rng = np.random.default_rng(seed)
    Xv = rng.random((n, d)).astype(dtype)
    yv = np.sin(Xv.sum(axis=1)).astype(dtype) + 0.1 * rng.standard_normal(n).astype(dtype)

    X = pt.as_tensor_variable(Xv)
    y = pt.as_tensor_variable(yv)
    log_ls = pt.tensor("log_ls", dtype=dtype, shape=())
    log_amp = pt.tensor("log_amp", dtype=dtype, shape=())
    log_noise = pt.tensor("log_noise", dtype=dtype, shape=())

    ls = pt.exp(log_ls)
    amp = pt.exp(log_amp)
    noise = pt.exp(log_noise)

    sq = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=-1)
    K = amp ** 2 * pt.exp(-sq / (2 * ls ** 2)) + (noise ** 2 + 1e-8) * pt.eye(
        n, n, 0, dtype=dtype
    )
    L = ptl.cholesky(K)
    alpha = ptl.solve_triangular(L, y, lower=True)
    logdet = 2.0 * pt.sum(pt.log(pt.diagonal(L)))
    mll = -0.5 * pt.sum(alpha ** 2) - 0.5 * logdet - 0.5 * n * LOG_2PI
    nmll = -mll
    grads = ptt.grad(nmll, [log_ls, log_amp, log_noise])
    f = ptt.function([log_ls, log_amp, log_noise], [nmll, *grads], mode=mode,
                     name="gp_mll")
    f.trust_input = True
    theta0 = tuple(np.zeros((), dtype) for _ in range(3))
    return f, theta0


def make_gp_sgd_step(n=256, d=3, dtype="float64", seed=0, lr=1e-3, mode=None,
                     n_steps_per_call=1):
    """One compiled SGD step on the GP hyperparameters: shared params,
    gradient update INSIDE the function (the deployment pattern — a
    device round-trip per parameter per step would dominate at this
    problem size)."""
    import pytensor_tpu.tensor.sharedvar  # noqa: F401
    from pytensor_tpu.compile.sharedvalue import shared

    rng = np.random.default_rng(seed)
    Xv = rng.random((n, d)).astype(dtype)
    yv = np.sin(Xv.sum(axis=1)).astype(dtype)         + 0.1 * rng.standard_normal(n).astype(dtype)

    X = pt.as_tensor_variable(Xv)
    y = pt.as_tensor_variable(yv)
    params = [shared(np.zeros((), dtype), name=nm)
              for nm in ("log_ls", "log_amp", "log_noise")]
    log_ls, log_amp, log_noise = params

    ls, amp, noise = pt.exp(log_ls), pt.exp(log_amp), pt.exp(log_noise)
    sq = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=-1)
    K = amp ** 2 * pt.exp(-sq / (2 * ls ** 2))         + (noise ** 2 + 1e-8) * pt.eye(n, n, 0, dtype=dtype)
    L = ptl.cholesky(K)
    alpha = ptl.solve_triangular(L, y, lower=True)
    logdet = 2.0 * pt.sum(pt.log(pt.diagonal(L)))
    nmll = 0.5 * pt.sum(alpha ** 2) + 0.5 * logdet + 0.5 * n * LOG_2PI
    grads = ptt.grad(nmll, params)
    updates = [(p, p - np.asarray(lr, dtype) * g)
               for p, g in zip(params, grads)]
    if n_steps_per_call > 1:
        f = ptt.train_loop([], nmll, updates, n_steps=n_steps_per_call,
                           mode=mode, name="gp_sgd_loop")
    else:
        f = ptt.function([], nmll, updates=updates, mode=mode,
                         name="gp_sgd")
    f.trust_input = True
    return f, params
