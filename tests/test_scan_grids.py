"""Scan contract grids: tap depth x sequences x go_backwards x
truncate_gradient x n_steps sweeps, each checked against a hand-rolled
numpy loop (value) and finite differences (gradient).

Reference analog: tests/scan/test_basic.py's recurrence matrix.  The
earlier test_scan.py covers targeted behaviors; this file sweeps the
classification grid (sit-sot / mit-sot depth 2-3 / nit-sot / sequences
/ non-sequences combinations) systematically.
"""

from __future__ import annotations

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.scan import scan

rng = np.random.default_rng(3)


def _fd_grad(np_loss, v, eps=1e-6, rtol=1e-4, got=None):
    num = np.zeros_like(v)
    for i in np.ndindex(v.shape):
        vp = v.copy(); vp[i] += eps
        vm = v.copy(); vm[i] -= eps
        num[i] = (np_loss(vp) - np_loss(vm)) / (2 * eps)
    np.testing.assert_allclose(got, num, rtol=rtol, atol=1e-7)


# ---------------------------------------------------------------------------
# sit-sot x sequences x non-sequences x go_backwards
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("backwards", [False, True])
@pytest.mark.parametrize("with_nonseq", [False, True])
def test_sitsot_seq_grid(backwards, with_nonseq):
    xs = pt.dvector("xs")
    a = pt.dscalar("a")
    v = rng.standard_normal(6)
    av = 0.7

    if with_nonseq:
        out, _ = scan(lambda x_t, s, aa: s * aa + x_t, sequences=[xs],
                      outputs_info=[pt.constant(0.0, dtype="float64")],
                      non_sequences=[a], go_backwards=backwards)
        f = ptt.function([xs, a], out)
        got = np.asarray(f(v, av))
    else:
        out, _ = scan(lambda x_t, s: s * 0.5 + x_t, sequences=[xs],
                      outputs_info=[pt.constant(0.0, dtype="float64")],
                      go_backwards=backwards)
        f = ptt.function([xs], out)
        got = np.asarray(f(v))

    seq = v[::-1] if backwards else v
    mult = av if with_nonseq else 0.5
    s, trace = 0.0, []
    for x_t in seq:
        s = s * mult + x_t
        trace.append(s)
    np.testing.assert_allclose(got, np.array(trace), rtol=1e-12)


@pytest.mark.parametrize("taps", [[-1], [-2, -1], [-3, -1]])
def test_mitsot_tap_grid(taps):
    depth = -min(taps)
    xs = pt.dvector("xs")
    v = rng.standard_normal(7)
    # taps=[-1] is sit-sot: initial has the state's own (scalar) shape;
    # deeper taps are mit-sot: initial carries a leading depth dim
    init = pt.as_tensor_variable(np.float64(1.0) if depth == 1
                                 else np.arange(1.0, depth + 1.0))

    def step(x_t, *prev):
        r = x_t
        for k, p in enumerate(prev):
            r = r + p * (0.25 + 0.25 * k)
        return r

    out, _ = scan(step, sequences=[xs],
                  outputs_info=[dict(initial=init, taps=taps)])
    f = ptt.function([xs], out)
    got = np.asarray(f(v))

    buf = list(np.arange(1.0, depth + 1.0))
    trace = []
    for x_t in v:
        prev = [buf[len(buf) + t] for t in taps]
        r = x_t
        for k, p in enumerate(prev):
            r = r + p * (0.25 + 0.25 * k)
        buf.append(r)
        trace.append(r)
    np.testing.assert_allclose(got, np.array(trace), rtol=1e-12)


def test_multiple_outputs_mixed_kinds():
    # sit-sot + nit-sot together, driven by a sequence
    xs = pt.dvector("xs")
    v = rng.standard_normal(5)

    def step(x_t, s):
        s2 = s + x_t
        return s2, s2 ** 2  # recurrent, and a pure trace output

    (acc, sq), _ = scan(step, sequences=[xs],
                        outputs_info=[pt.constant(0.0, dtype="float64"),
                                      None])
    f = ptt.function([xs], [acc, sq])
    accv, sqv = (np.asarray(r) for r in f(v))
    exp = np.cumsum(v)
    np.testing.assert_allclose(accv, exp, rtol=1e-12)
    np.testing.assert_allclose(sqv, exp ** 2, rtol=1e-12)


# ---------------------------------------------------------------------------
# gradients: BPTT through the tap grid + truncate_gradient
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("taps", [[-1], [-2, -1]])
def test_scan_grad_tap_grid(taps):
    depth = -min(taps)
    xs = pt.dvector("xs")
    v = rng.standard_normal(6) * 0.5
    init = pt.as_tensor_variable(np.zeros(depth))

    def step(x_t, *prev):
        r = pt.tanh(x_t + sum(0.5 * p for p in prev))
        return r

    out, _ = scan(step, sequences=[xs],
                  outputs_info=[dict(initial=init, taps=taps)])
    loss = pt.sum(out ** 2)
    g = ptt.grad(loss, xs)
    f = ptt.function([xs], g)
    got = np.asarray(f(v))

    def np_loss(vv):
        buf = list(np.zeros(depth))
        tot = 0.0
        for x_t in vv:
            prev = [buf[len(buf) + t] for t in taps]
            r = np.tanh(x_t + sum(0.5 * p for p in prev))
            buf.append(r)
            tot += r ** 2
        return tot

    _fd_grad(np_loss, v, got=got)


def test_scan_grad_nonseq():
    xs = pt.dvector("xs")
    w = pt.dscalar("w")
    v = rng.standard_normal(5) * 0.3
    wv = np.float64(0.8)

    out, _ = scan(lambda x_t, s, ww: pt.tanh(s * ww + x_t),
                  sequences=[xs],
                  outputs_info=[pt.constant(0.0, dtype="float64")],
                  non_sequences=[w])
    g = ptt.grad(pt.sum(out), w)
    f = ptt.function([xs, w], g)
    got = float(np.asarray(f(v, wv)))

    def np_loss(wval):
        s, tot = 0.0, 0.0
        for x_t in v:
            s = np.tanh(s * wval + x_t)
            tot += s
        return tot

    eps = 1e-6
    num = (np_loss(wv + eps) - np_loss(wv - eps)) / (2 * eps)
    np.testing.assert_allclose(got, num, rtol=1e-5)


@pytest.mark.parametrize("n_steps", [1, 2, 8])
def test_scan_nsteps_grid(n_steps):
    out, _ = scan(lambda s: s + 1.0,
                  outputs_info=[pt.constant(0.0, dtype="float64")],
                  n_steps=n_steps)
    f = ptt.function([], out)
    np.testing.assert_allclose(np.asarray(f()),
                               np.arange(1.0, n_steps + 1.0))


def test_scan_matrix_state():
    # non-scalar recurrent state: (2,2) matrix power accumulation
    A = pt.dmatrix("A")
    Av = rng.standard_normal((2, 2)) * 0.5

    out, _ = scan(lambda s, a: pt.dot(s, a),
                  outputs_info=[pt.eye(2, dtype="float64")],
                  non_sequences=[A], n_steps=4)
    f = ptt.function([A], out[-1])
    np.testing.assert_allclose(np.asarray(f(Av)),
                               np.linalg.matrix_power(Av, 4), rtol=1e-10)


def test_scan_two_sequences_zip():
    a = pt.dvector("a")
    b = pt.dvector("b")
    av, bv = rng.standard_normal(5), rng.standard_normal(5)
    out, _ = scan(lambda x, y, s: s + x * y, sequences=[a, b],
                  outputs_info=[pt.constant(0.0, dtype="float64")])
    f = ptt.function([a, b], out[-1])
    np.testing.assert_allclose(float(np.asarray(f(av, bv))),
                               np.sum(av * bv), rtol=1e-12)


def test_scan_second_order_grad():
    # d2/dw2 of a scan loss (grad-of-grad builds a scan of the reverse scan)
    w = pt.dscalar("w")
    wv = np.float64(0.6)
    out, _ = scan(lambda s, ww: s * ww,
                  outputs_info=[pt.constant(1.0, dtype="float64")],
                  non_sequences=[w], n_steps=4)
    loss = out[-1]  # w^4
    g1 = ptt.grad(loss, w)       # 4 w^3
    g2 = ptt.grad(g1, w)         # 12 w^2
    f = ptt.function([w], [g1, g2])
    g1v, g2v = (float(np.asarray(r)) for r in f(wv))
    np.testing.assert_allclose(g1v, 4 * wv ** 3, rtol=1e-10)
    np.testing.assert_allclose(g2v, 12 * wv ** 2, rtol=1e-10)


@pytest.mark.parametrize("trunc", [-1, 2])
def test_truncate_gradient_runs(trunc):
    xs = pt.dvector("xs")
    v = rng.standard_normal(6) * 0.2
    out, _ = scan(lambda x_t, s: pt.tanh(s + x_t), sequences=[xs],
                  outputs_info=[pt.constant(0.0, dtype="float64")],
                  truncate_gradient=trunc)
    g = ptt.grad(pt.sum(out), xs)
    f = ptt.function([xs], g)
    got = np.asarray(f(v))
    assert got.shape == v.shape
    if trunc == -1:
        def np_loss(vv):
            s, tot = 0.0, 0.0
            for x_t in vv:
                s = np.tanh(s + x_t)
                tot += s
            return tot
        _fd_grad(np_loss, v, got=got)


def test_truncate_gradient_numeric_semantics():
    """Linear recurrence s_t = a s_{t-1} + x_t, loss = s_T: full grad
    wrt x_t is a^(T-1-t); with truncate_gradient=k only the last k
    reverse steps run, so earlier sensitivities are exactly zero."""
    T, k, a = 6, 2, 0.5
    xs = pt.dvector("xs")
    out, _ = scan(lambda x_t, s: a * s + x_t, sequences=[xs],
                  outputs_info=[pt.constant(0.0, dtype="float64")],
                  truncate_gradient=k)
    g = ptt.grad(out[-1], xs)
    f = ptt.function([xs], g)
    got = np.asarray(f(np.ones(T)))
    full = np.array([a ** (T - 1 - t) for t in range(T)])
    trunc = full.copy()
    trunc[: T - k] = 0.0
    np.testing.assert_allclose(got, trunc, rtol=1e-12)
    assert not np.allclose(got, full)
