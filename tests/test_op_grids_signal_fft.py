"""Signal / FFT / interpolate contract grids.

Reference analogs: tests/tensor/signal/test_conv.py (mode x shape
grids), tests/tensor/test_fft.py (roundtrip + numpy parity),
tensor/interpolate tests.  All vs numpy/scipy expectations through
compare_xla_and_py.
"""

from __future__ import annotations

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from tests.utils import compare_xla_and_py

rng = np.random.default_rng(23)


# ---------------------------------------------------------------------------
# convolve1d: mode x length combinations (incl. kernel longer than signal)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("na,nb", [(8, 3), (3, 8), (5, 5), (8, 1)])
@pytest.mark.parametrize("mode", ["full", "valid"])
def test_convolve1d_grid(mode, na, nb):
    from pytensor_tpu.tensor.signal.conv import convolve1d

    a = pt.dvector("a")
    b = pt.dvector("b")
    av, bv = rng.standard_normal(na), rng.standard_normal(nb)
    res = compare_xla_and_py([a, b], convolve1d(a, b, mode=mode), [av, bv])
    np.testing.assert_allclose(np.asarray(res[0]), np.convolve(av, bv, mode),
                               rtol=1e-10)


def test_convolve1d_grad_fd():
    from pytensor_tpu.tensor.signal.conv import convolve1d

    a = pt.dvector("a")
    b = pt.dvector("b")
    av, bv = rng.standard_normal(6), rng.standard_normal(3)
    loss = pt.sum(convolve1d(a, b, mode="full") ** 2)
    ga, gb = ptt.grad(loss, [a, b])
    f = ptt.function([a, b], [ga, gb])
    gotA, gotB = (np.asarray(r) for r in f(av, bv))
    eps = 1e-6
    def np_loss(x, y):
        return (np.convolve(x, y, "full") ** 2).sum()
    for tgt, got in [(0, gotA), (1, gotB)]:
        base = [av, bv]
        num = np.zeros_like(base[tgt])
        for i in range(len(base[tgt])):
            p = [av.copy(), bv.copy()]; p[tgt][i] += eps
            m = [av.copy(), bv.copy()]; m[tgt][i] -= eps
            num[i] = (np_loss(*p) - np_loss(*m)) / (2 * eps)
        np.testing.assert_allclose(got, num, rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("mode", ["full", "valid"])
def test_convolve2d_grid(mode):
    from scipy.signal import convolve2d as sp_conv2d

    from pytensor_tpu.tensor.signal.conv import convolve2d

    a = pt.dmatrix("a")
    b = pt.dmatrix("b")
    av, bv = rng.standard_normal((6, 5)), rng.standard_normal((3, 2))
    res = compare_xla_and_py([a, b], convolve2d(a, b, mode=mode), [av, bv])
    np.testing.assert_allclose(np.asarray(res[0]),
                               sp_conv2d(av, bv, mode=mode), rtol=1e-10)


# ---------------------------------------------------------------------------
# fft: rfft/irfft grids + roundtrips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [4, 7, 16])
def test_rfft_matches_numpy(n):
    x = pt.tensor("x", dtype="float64", shape=(n,))
    v = rng.standard_normal(n)
    out = pt.fft.rfft(x)
    outs = list(out) if isinstance(out, (list, tuple)) else [out]
    f = ptt.function([x], outs)
    got = f(v)
    exp = np.fft.rfft(v)
    if len(got) == 2:  # (real, imag) packed
        np.testing.assert_allclose(np.asarray(got[0]), exp.real, atol=1e-10)
        np.testing.assert_allclose(np.asarray(got[1]), exp.imag, atol=1e-10)
    else:
        g = np.asarray(got[0])
        if g.ndim == 2 and g.shape[-1] == 2:
            np.testing.assert_allclose(g[..., 0], exp.real, atol=1e-10)
            np.testing.assert_allclose(g[..., 1], exp.imag, atol=1e-10)
        else:
            np.testing.assert_allclose(g, exp, atol=1e-10)


@pytest.mark.parametrize("n", [4, 8, 10])
def test_rfft_irfft_roundtrip(n):
    x = pt.tensor("x", dtype="float64", shape=(n,))
    v = rng.standard_normal(n)
    out = pt.fft.irfft(pt.fft.rfft(x), n=n) if "n" in \
        pt.fft.irfft.__code__.co_varnames else pt.fft.irfft(pt.fft.rfft(x))
    f = ptt.function([x], out)
    np.testing.assert_allclose(np.asarray(f(v)), v, atol=1e-10)


# ---------------------------------------------------------------------------
# interpolate: linear interp vs numpy.interp
# ---------------------------------------------------------------------------

def test_interp_grid():
    from pytensor_tpu.tensor.interpolate import interp

    xq = pt.dvector("xq")
    xp_ = np.array([0.0, 1.0, 2.0, 4.0])
    fp_ = np.array([1.0, 3.0, 2.0, 0.0])
    qv = np.array([-1.0, 0.0, 0.5, 1.5, 3.0, 4.0, 5.0])
    res = compare_xla_and_py(
        [xq], interp(xq, pt.as_tensor_variable(xp_),
                     pt.as_tensor_variable(fp_)), [qv])
    np.testing.assert_allclose(np.asarray(res[0]), np.interp(qv, xp_, fp_),
                               rtol=1e-12)


# ---------------------------------------------------------------------------
# fourier: DFT matrix consistency
# ---------------------------------------------------------------------------

def test_fourier_dft_consistency():
    from pytensor_tpu.tensor.fourier import fourier

    n = 8
    x = pt.tensor("x", dtype="float64", shape=(n,))
    v = rng.standard_normal(n)
    re, im = fourier(x)
    f = ptt.function([x], [re, im])
    rev, imv = (np.asarray(r) for r in f(v))
    exp = np.fft.fft(v)
    np.testing.assert_allclose(rev, exp.real, atol=1e-10)
    np.testing.assert_allclose(imv, exp.imag, atol=1e-10)
