"""Consolidated verify_grad sweep: run the framework's own
finite-difference gradient checker (reference gradient.py:1786 pattern,
used pervasively in the reference op tests) over one representative
graph per op family."""

from __future__ import annotations

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
import pytensor_tpu.tensor.linalg as ptl
from pytensor_tpu.gradient import verify_grad

rng = np.random.default_rng(47)


def _spd(n):
    a = rng.standard_normal((n, n))
    return a @ a.T + n * np.eye(n)


CASES = [
    ("exp_sum", lambda x: pt.sum(pt.exp(x)), [rng.standard_normal(5)]),
    ("tanh_prod", lambda x: pt.prod(pt.tanh(x)), [rng.standard_normal(4) * 0.5]),
    ("softplus", lambda x: pt.sum(pt.softplus(x)), [rng.standard_normal(5)]),
    ("sigmoid_mean", lambda x: pt.mean(pt.sigmoid(x)), [rng.standard_normal(6)]),
    ("dot", lambda a, b: pt.sum(pt.dot(a, b) ** 2),
     [rng.standard_normal((3, 4)), rng.standard_normal((4, 2))]),
    ("matmul_batched", lambda a, b: pt.sum(pt.matmul(a, b)),
     [rng.standard_normal((2, 3, 4)), rng.standard_normal((2, 4, 2))]),
    ("outer", lambda a, b: pt.sum(pt.outer(a, b) ** 2),
     [rng.standard_normal(3), rng.standard_normal(4)]),
    ("cumsum", lambda x: pt.sum(pt.cumsum(x, axis=0) ** 2),
     [rng.standard_normal((3, 2))]),
    ("cumprod", lambda x: pt.sum(pt.cumprod(x, axis=0)),
     [rng.standard_normal((3, 2)) * 0.5 + 1.5]),
    ("max_axis", lambda x: pt.sum(pt.max(x, axis=1)),
     [rng.standard_normal((3, 5))]),
    ("softmax", lambda x: pt.sum(pt.softmax(x, axis=-1) ** 2),
     [rng.standard_normal((3, 4))]),
    ("logsumexp", lambda x: pt.sum(pt.logsumexp(x, axis=1)),
     [rng.standard_normal((3, 4))]),
    ("subtensor", lambda x: pt.sum(x[1:3, ::2] ** 2),
     [rng.standard_normal((4, 6))]),
    ("inc_subtensor", lambda x: pt.sum(pt.inc_subtensor(x[1:], 2.0) ** 2),
     [rng.standard_normal(5)]),
    ("take_gather", lambda x: pt.sum(x[np.array([2, 0, 1])] ** 2),
     [rng.standard_normal((4, 3))]),
    ("transpose_reshape",
     lambda x: pt.sum(x.T.reshape((2, 6)) ** 2),
     [rng.standard_normal((4, 3))]),
    ("concat", lambda a, b: pt.sum(pt.concatenate([a, b]) ** 2),
     [rng.standard_normal(3), rng.standard_normal(4)]),
    ("tile", lambda x: pt.sum(pt.tile(x, (2, 2)) ** 2),
     [rng.standard_normal((2, 3))]),
    ("pad_edge", lambda x: pt.sum(pt.pad(x, 1, mode="edge") ** 2),
     [rng.standard_normal((3, 3))]),
    ("diag_extract", lambda x: pt.sum(pt.diagonal(x) ** 2),
     [rng.standard_normal((4, 4))]),
    ("diag_build", lambda v: pt.sum(pt.diag(v) ** 2),
     [rng.standard_normal(4)]),
    ("tril", lambda x: pt.sum(pt.tril(x) ** 2),
     [rng.standard_normal((4, 4))]),
    ("clip", lambda x: pt.sum(pt.clip(x, -0.5, 0.5) ** 2),
     [rng.standard_normal(6)]),
    ("switch", lambda x: pt.sum(pt.switch(x > 0, x * 2.0, x * 3.0)),
     [rng.standard_normal(6) + 0.1]),
    ("erf_gamma", lambda x: pt.sum(pt.erf(x) + pt.gammaln(x + 3.0)),
     [rng.standard_normal(5) * 0.5]),
    ("betainc", lambda x: pt.sum(pt.betainc(np.float64(2.0), np.float64(3.0), x)),
     [rng.uniform(0.1, 0.9, 5)]),
    ("cholesky", lambda x: pt.sum(ptl.cholesky(x) ** 2), [_spd(4)]),
    ("solve", lambda a, b: pt.sum(ptl.solve(a, b, b_ndim=1) ** 2),
     [_spd(3), rng.standard_normal(3)]),
    ("solve_triangular",
     lambda a, b: pt.sum(ptl.solve_triangular(a, b, lower=True) ** 2),
     [np.tril(_spd(3)) + np.eye(3), rng.standard_normal(3)]),
    ("det_logdet", lambda x: ptl.logdet(x), [_spd(3)]),
    ("inv", lambda x: pt.sum(ptl.inv(x) ** 2), [_spd(3)]),
    ("eigh_vals", lambda x: pt.sum(ptl.eigh(0.5 * (x + x.T))[0] ** 2),
     [_spd(3)]),
    ("einsum", lambda a, b: pt.sum(pt.einsum("ij,jk->ik", a, b) ** 2),
     [rng.standard_normal((2, 3)), rng.standard_normal((3, 2))]),
    ("conv1d", lambda a, b: pt.sum(__import__(
        "pytensor_tpu.tensor.signal.conv", fromlist=["convolve1d"]
     ).convolve1d(a, b, mode="full") ** 2),
     [rng.standard_normal(6), rng.standard_normal(3)]),
    ("interp_like", lambda x: pt.sum(pt.maximum(x, 0.3 * x) ** 2),
     [rng.standard_normal(6)]),
    ("bincount_weights",
     lambda w: pt.sum(pt.bincount(
         pt.as_tensor_variable(np.array([0, 1, 1, 2])), weights=w,
         minlength=4) ** 2),
     [rng.standard_normal(4)]),
    ("repeat", lambda x: pt.sum(pt.repeat(x, 3) ** 2),
     [rng.standard_normal(4)]),
    ("roll", lambda x: pt.sum(pt.roll(x, 2) * np.arange(5.0)),
     [rng.standard_normal(5)]),
    ("var_std", lambda x: pt.var(x) + pt.std(x + 1.0),
     [rng.standard_normal(6)]),
]


@pytest.mark.parametrize("name,fn,pts", CASES, ids=[c[0] for c in CASES])
def test_verify_grad_sweep(name, fn, pts):
    # default FD eps is coarse; at 1e-6 the f64 truncation+roundoff
    # error sits well under the tolerance for every family here
    verify_grad(fn, pts, rng=np.random.default_rng(5), eps=1e-6,
                abs_tol=1e-6, rel_tol=1e-5)
