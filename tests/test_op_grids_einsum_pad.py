"""einsum spec grid + pad mode x width grid.

Reference analogs: tests/tensor/test_einsum.py (spec sweep incl.
reductions, traces, broadcast contractions) and tests/tensor/test_pad.py
(mode x pad_width grid).  Numpy is the expectation; every case also
cross-checks XLA vs the oracle via compare_xla_and_py, and a subset
sweeps gradients by finite differences.
"""

from __future__ import annotations

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from tests.utils import compare_xla_and_py

rng = np.random.default_rng(5)


# ---------------------------------------------------------------------------
# einsum: spec x operand shapes
# ---------------------------------------------------------------------------

EINSUM_CASES = [
    # (spec, shapes)
    ("ij,jk->ik", [(3, 4), (4, 5)]),                  # matmul
    ("ij,ij->", [(3, 4), (3, 4)]),                    # frobenius inner
    ("ij->ji", [(3, 4)]),                             # transpose
    ("ii->", [(4, 4)]),                               # trace
    ("ii->i", [(4, 4)]),                              # diagonal
    ("ij->i", [(3, 4)]),                              # row sums
    ("ij->", [(3, 4)]),                               # total
    ("i,j->ij", [(3,), (4,)]),                        # outer
    ("bij,bjk->bik", [(2, 3, 4), (2, 4, 5)]),         # batched matmul
    ("bij,bij->b", [(2, 3, 4), (2, 3, 4)]),           # per-batch inner
    ("ijk,jkl->il", [(2, 3, 4), (3, 4, 5)]),          # double contraction
    ("ij,jk,kl->il", [(2, 3), (3, 4), (4, 2)]),       # three operands
    ("i,i->", [(5,), (5,)]),                          # dot
    ("ijk->kji", [(2, 3, 4)]),                        # permute
    ("ijk->j", [(2, 3, 4)]),                          # partial reduce
    ("ij,kj->ik", [(3, 4), (5, 4)]),                  # gram-style
    ("aij,ajk,akl->ail", [(2, 2, 3), (2, 3, 2), (2, 2, 4)]),
]


@pytest.mark.parametrize("spec,shapes", EINSUM_CASES,
                         ids=[c[0] for c in EINSUM_CASES])
def test_einsum_spec_grid(spec, shapes):
    xs = [pt.tensor(f"x{i}", dtype="float64", shape=s)
          for i, s in enumerate(shapes)]
    vs = [rng.standard_normal(s) for s in shapes]
    res = compare_xla_and_py(xs, pt.einsum(spec, *xs), vs)
    np.testing.assert_allclose(np.asarray(res[0]), np.einsum(spec, *vs),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("spec,shapes", [
    ("ij,jk->ik", [(3, 4), (4, 5)]),
    ("bij,bjk->bik", [(2, 3, 4), (2, 4, 5)]),
    ("ij,ij->", [(3, 4), (3, 4)]),
])
def test_einsum_grad_fd(spec, shapes):
    xs = [pt.tensor(f"x{i}", dtype="float64", shape=s)
          for i, s in enumerate(shapes)]
    vs = [rng.standard_normal(s) for s in shapes]
    loss = pt.sum(pt.einsum(spec, *xs) ** 2)
    grads = ptt.grad(loss, xs)
    f = ptt.function(xs, list(grads))
    got = [np.asarray(g) for g in f(*vs)]
    eps = 1e-6
    def np_loss(*arrs):
        return (np.einsum(spec, *arrs) ** 2).sum()
    for k, v in enumerate(vs):
        num = np.zeros_like(v)
        for i in np.ndindex(v.shape):
            vp = [a.copy() for a in vs]; vp[k][i] += eps
            vm = [a.copy() for a in vs]; vm[k][i] -= eps
            num[i] = (np_loss(*vp) - np_loss(*vm)) / (2 * eps)
        np.testing.assert_allclose(got[k], num, rtol=1e-4, atol=1e-6)


def test_einsum_ellipsis():
    x = pt.tensor("x", dtype="float64", shape=(2, 3, 4))
    y = pt.tensor("y", dtype="float64", shape=(4, 5))
    xv, yv = rng.standard_normal((2, 3, 4)), rng.standard_normal((4, 5))
    res = compare_xla_and_py([x, y], pt.einsum("...j,jk->...k", x, y),
                             [xv, yv])
    np.testing.assert_allclose(np.asarray(res[0]),
                               np.einsum("...j,jk->...k", xv, yv), rtol=1e-10)


# ---------------------------------------------------------------------------
# pad: mode x width grid
# ---------------------------------------------------------------------------

PAD_MODES = ["constant", "edge", "reflect", "symmetric", "wrap",
             "maximum", "minimum", "mean", "linear_ramp"]
PAD_WIDTHS = [1, 2, (1, 2), ((1, 2), (2, 1))]


@pytest.mark.parametrize("width", PAD_WIDTHS,
                         ids=[str(w) for w in PAD_WIDTHS])
@pytest.mark.parametrize("mode", PAD_MODES)
def test_pad_grid(mode, width):
    x = pt.dmatrix("x")
    v = rng.standard_normal((3, 4))
    kwargs = {"constant_values": 1.5} if mode == "constant" else {}
    try:
        out = pt.pad(x, width, mode=mode, **kwargs)
    except NotImplementedError:
        pytest.skip(f"pad mode {mode} unsupported")
    res = compare_xla_and_py([x], out, [v])
    np.testing.assert_allclose(np.asarray(res[0]),
                               np.pad(v, width, mode=mode, **kwargs),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("mode", ["constant", "edge", "reflect", "wrap"])
def test_pad_1d_grid(mode):
    x = pt.dvector("x")
    v = rng.standard_normal(5)
    res = compare_xla_and_py([x], pt.pad(x, 3, mode=mode), [v])
    np.testing.assert_allclose(np.asarray(res[0]), np.pad(v, 3, mode=mode))


@pytest.mark.parametrize("mode", ["constant", "edge"])
def test_pad_grad_fd(mode):
    x = pt.dvector("x")
    v = rng.standard_normal(4)
    loss = pt.sum(pt.pad(x, 2, mode=mode) ** 2)
    g = ptt.grad(loss, x)
    f = ptt.function([x], g)
    eps = 1e-6
    num = np.zeros_like(v)
    def np_loss(a):
        return (np.pad(a, 2, mode=mode) ** 2).sum()
    for i in range(4):
        vp = v.copy(); vp[i] += eps
        vm = v.copy(); vm[i] -= eps
        num[i] = (np_loss(vp) - np_loss(vm)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(f(v)), num, rtol=1e-5, atol=1e-8)


def test_pad_zero_width():
    x = pt.dvector("x")
    v = rng.standard_normal(4)
    res = compare_xla_and_py([x], pt.pad(x, 0, mode="constant"), [v])
    np.testing.assert_array_equal(np.asarray(res[0]), v)
