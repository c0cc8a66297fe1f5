"""HLO-level evidence for the scan rewrite-delegation claims (VERDICT r3
item 5) plus structural tests for the round-4 save-mem/push-out ports.

Each test compiles a representative graph and inspects the OPTIMIZED HLO
(`vm.lower(...).compile().as_text()`) on the CPU backend:

- XLA DCEs an unused ys trace out of the while carry (reference
  remove-unused delegation CONFIRMED);
- XLA hoists loop-invariant computation out of the while body (reference
  push-out-non-seqs delegation CONFIRMED);
- XLA does NOT truncate a trace read only through a tail window — that
  is covered by the graph-level `scan_truncate_trace_window` port;
- a pure accumulator state collapses to batched elemwise + reduction via
  `scan_push_out_add` (+ the existing seq push-outs), removing the loop.
"""

from __future__ import annotations

import re

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.gradient import grad
from pytensor_tpu.scan import scan
from pytensor_tpu.scan.op import Scan

rng = np.random.default_rng(31)


def opt_hlo(f, *args):
    return f.vm.lower(*args).compile().as_text()


def while_carry(hlo):
    """The tuple type carried by the (single) while loop, or None."""
    for line in hlo.splitlines():
        m = re.search(r"= (\(.*?\)) while\(", line)
        if m:
            return m.group(1)
    return None


def _rnn(seq, x, W):
    hs, _ = scan(lambda s_t, h, W: pt.tanh(W.dot(h) + s_t),
                 sequences=[seq], outputs_info=[x], non_sequences=[W])
    return hs


@pytest.fixture
def vals():
    return (rng.standard_normal((50, 4)), rng.standard_normal(4),
            rng.standard_normal((4, 4)) * 0.1)


def test_xla_dces_unused_trace(vals):
    # even with the graph pass excluded, the unused second ys buffer is
    # absent from the optimized while carry (only the INPUT sequence's
    # f64[50,4] remains)
    sv, xv, Wv = vals
    seq = pt.tensor("s", shape=(50, 4), dtype="float64")
    x = pt.vector("x", dtype="float64")
    W = pt.matrix("W", dtype="float64")

    def body(s_t, h, W):
        h2 = pt.tanh(W.dot(h) + s_t)
        return h2, h2 * 2.0  # second trace unused

    (hs, extra), _ = scan(body, sequences=[seq], outputs_info=[x, None],
                          non_sequences=[W])
    mode = ptt.compile.mode.FAST_RUN.excluding("scan_remove_unused_outputs")
    f = ptt.function([seq, x, W], hs[-1].sum(), mode=mode)
    carry = while_carry(opt_hlo(f, sv, xv, Wv))
    assert carry is not None
    assert carry.count("f64[50,4]") == 1, carry


def test_xla_hoists_loop_invariant(vals):
    # exp(W) must be computed outside the while even with the graph-level
    # push-out excluded (XLA LICM)
    sv, xv, Wv = vals
    seq = pt.tensor("s", shape=(50, 4), dtype="float64")
    x = pt.vector("x", dtype="float64")
    W = pt.matrix("W", dtype="float64")
    hs, _ = scan(lambda s_t, h, W: pt.tanh(pt.exp(W).dot(h) + s_t),
                 sequences=[seq], outputs_info=[x], non_sequences=[W])
    mode = ptt.compile.mode.FAST_RUN.excluding("scan_push_out_non_seqs")
    f = ptt.function([seq, x, W], hs[-1].sum(), mode=mode)
    hlo = opt_hlo(f, sv, xv, Wv)
    # the exponential fusion feeds the while INIT tuple (computed once)
    feeds_init = any(
        "exponential" in line and "fusion" in line
        for line in hlo.splitlines())
    assert feeds_init
    carry = while_carry(hlo)
    assert carry is not None


def test_window_truncation_needs_graph_pass(vals):
    # ys[-3:]: XLA keeps the full (50,4) trace buffer without the graph
    # pass; with it the carry holds only the (3,4) rolling window
    sv, xv, Wv = vals
    seq = pt.tensor("s", shape=(50, 4), dtype="float64")
    x = pt.vector("x", dtype="float64")
    W = pt.matrix("W", dtype="float64")
    hs = _rnn(seq, x, W)
    out = hs[-3:].sum() + hs[-2].sum()

    mode_off = ptt.compile.mode.FAST_RUN.excluding("scan_truncate_trace_window")
    f_off = ptt.function([seq, x, W], out, mode=mode_off)
    carry_off = while_carry(opt_hlo(f_off, sv, xv, Wv))
    assert carry_off.count("f64[50,4]") == 2, carry_off  # seq + trace

    f_on = ptt.function([seq, x, W], out, mode="FAST_RUN")
    carry_on = while_carry(opt_hlo(f_on, sv, xv, Wv))
    assert carry_on.count("f64[50,4]") == 1, carry_on  # seq only
    assert "f64[3,4]" in carry_on, carry_on

    a = np.asarray(ptt.function([seq, x, W], out, mode="FAST_COMPILE")(sv, xv, Wv))
    b = np.asarray(f_on(sv, xv, Wv))
    np.testing.assert_allclose(a, b, rtol=1e-10)


def test_window_truncation_values_and_grad(vals):
    sv, xv, Wv = vals
    seq = pt.tensor("s", shape=(50, 4), dtype="float64")
    x = pt.vector("x", dtype="float64")
    W = pt.matrix("W", dtype="float64")
    hs = _rnn(seq, x, W)
    for expr in [hs[-3:], hs[-2], hs[-5:].sum(axis=0)]:
        a = np.asarray(ptt.function([seq, x, W], expr, mode="FAST_COMPILE")(sv, xv, Wv))
        b = np.asarray(ptt.function([seq, x, W], expr, mode="FAST_RUN")(sv, xv, Wv))
        np.testing.assert_allclose(a, b, rtol=1e-9)
    g = grad(hs[-3:].sum(), W)
    a = np.asarray(ptt.function([seq, x, W], g, mode="FAST_COMPILE")(sv, xv, Wv))
    b = np.asarray(ptt.function([seq, x, W], g, mode="FAST_RUN")(sv, xv, Wv))
    np.testing.assert_allclose(a, b, rtol=1e-8)


def test_window_truncation_skips_symbolic_nsteps():
    # unknown sequence length: the rewrite must not fire (n could be < w)
    seq = pt.matrix("s", dtype="float64")
    x = pt.vector("x", dtype="float64")
    W = pt.matrix("W", dtype="float64")
    hs = _rnn(seq, x, W)
    f = ptt.function([seq, x, W], hs[-3:].sum(), mode="FAST_RUN")
    sv = rng.standard_normal((2, 4))  # n < w: numpy tail semantics
    xv, Wv = rng.standard_normal(4), rng.standard_normal((4, 4)) * 0.1
    a = np.asarray(ptt.function([seq, x, W], hs[-3:].sum(), mode="FAST_COMPILE")(sv, xv, Wv))
    np.testing.assert_allclose(np.asarray(f(sv, xv, Wv)), a, rtol=1e-10)


def test_push_out_add_removes_loop():
    # acc' = acc + f(seq_t), only acc[-1] read: the loop disappears into
    # batched elemwise + sum (push_out_add + seq push-outs)
    seq = pt.tensor("s", shape=(50, 4), dtype="float64")
    x0 = pt.matrix("x0", dtype="float64")
    acc, _ = scan(lambda s_t, a: a + s_t[:, None] * s_t[None, :],
                  sequences=[seq], outputs_info=[x0])
    f = ptt.function([seq, x0], acc[-1], mode="FAST_RUN")
    assert sum(isinstance(n.op, Scan)
               for n in f.maker.fgraph.toposort()) == 0
    sv = rng.standard_normal((50, 4))
    x0v = rng.standard_normal((4, 4))
    np.testing.assert_allclose(
        np.asarray(f(sv, x0v)),
        x0v + sum(np.outer(r, r) for r in sv), rtol=1e-9)
    g = grad(acc[-1].sum(), seq)
    a = np.asarray(ptt.function([seq, x0], g, mode="FAST_COMPILE")(sv, x0v))
    b = np.asarray(ptt.function([seq, x0], g, mode="FAST_RUN")(sv, x0v))
    np.testing.assert_allclose(a, b, rtol=1e-9)


def test_push_out_add_keeps_genuine_recurrence():
    seq = pt.tensor("s", shape=(50, 4), dtype="float64")
    x0 = pt.matrix("x0", dtype="float64")
    h0 = pt.vector("h0", dtype="float64")
    (accs, hs), _ = scan(
        lambda s_t, a, h: (a + s_t[:, None] * s_t[None, :], pt.tanh(h + s_t)),
        sequences=[seq], outputs_info=[x0, h0])
    f = ptt.function([seq, x0, h0], [accs[-1], hs[-1]], mode="FAST_RUN")
    sv = rng.standard_normal((50, 4))
    x0v = rng.standard_normal((4, 4))
    h0v = rng.standard_normal(4)
    ra, rh = f(sv, x0v, h0v)
    h = h0v.copy()
    for r in sv:
        h = np.tanh(h + r)
    np.testing.assert_allclose(
        np.asarray(ra), x0v + sum(np.outer(r, r) for r in sv), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(rh), h, rtol=1e-9)


def test_per_step_dot_trace_becomes_batched_matmul():
    # ys_t = W @ s_t with no recurrence: no scan survives (the reference's
    # push_out_dot1 user-visible case)
    seq = pt.tensor("s", shape=(50, 4), dtype="float64")
    W = pt.matrix("W", dtype="float64")
    ys, _ = scan(lambda s_t, W: W.dot(s_t), sequences=[seq], non_sequences=[W])
    f = ptt.function([seq, W], ys, mode="FAST_RUN")
    assert sum(isinstance(n.op, Scan)
               for n in f.maker.fgraph.toposort()) == 0
    sv = rng.standard_normal((50, 4))
    Wv = rng.standard_normal((4, 4))
    np.testing.assert_allclose(np.asarray(f(sv, Wv)), sv @ Wv.T, rtol=1e-9)
