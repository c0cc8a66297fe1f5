"""compile.function pipeline tests (modeled on reference tests/compile/)."""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.compile.maker import UnusedInputError


def test_basic_function():
    x = pt.dscalar("x")
    y = pt.dscalar("y")
    f = ptt.function([x, y], x + y)
    assert float(np.asarray(f(2.0, 3.0))) == 5.0


def test_multiple_outputs():
    x = pt.dvector("x")
    f = ptt.function([x], [x.sum(), x.max()])
    s, m = f(np.array([1.0, 5.0, 2.0]))
    assert float(np.asarray(s)) == 8.0
    assert float(np.asarray(m)) == 5.0


def test_named_inputs():
    x = pt.dscalar("x")
    y = pt.dscalar("y")
    f = ptt.function([x, y], x - y)
    assert float(np.asarray(f(y=1.0, x=3.0))) == 2.0


def test_shared_and_updates():
    acc = ptt.shared(np.float64(0.0), name="acc")
    inc = pt.dscalar("inc")
    f = ptt.function([inc], acc, updates={acc: acc + inc})
    assert float(np.asarray(f(1.0))) == 0.0
    assert float(np.asarray(f(10.0))) == 1.0
    assert float(acc.get_value()) == 11.0
    acc.set_value(100.0)
    assert float(np.asarray(f(1.0))) == 100.0


def test_givens():
    x = pt.dscalar("x")
    y = pt.dscalar("y")
    z = x * 2
    f = ptt.function([y], z, givens={x: y + 1})
    assert float(np.asarray(f(3.0))) == 8.0


def test_unused_input_policy():
    x = pt.dscalar("x")
    y = pt.dscalar("y")
    with pytest.raises(UnusedInputError):
        ptt.function([x, y], x * 2)
    f = ptt.function([x, y], x * 2, on_unused_input="ignore")
    assert float(np.asarray(f(1.0, 99.0))) == 2.0


def test_no_explicit_inputs():
    s = ptt.shared(np.arange(3.0))
    f = ptt.function([], s.sum())
    assert float(np.asarray(f())) == 3.0


def test_input_validation():
    x = pt.dmatrix("x")
    f = ptt.function([x], x.sum())
    with pytest.raises(TypeError):
        f(np.zeros(3))  # wrong ndim


def test_default_updates():
    s = ptt.shared(np.float64(0.0), name="s")
    s.default_update = s + 1
    f = ptt.function([], s)
    f()
    f()
    assert float(s.get_value()) == 2.0


def test_trust_input_fastpath():
    x = pt.dvector("x")
    f = ptt.function([x], x * 2)
    f.trust_input = True
    np.testing.assert_allclose(np.asarray(f(np.arange(3.0))), [0, 2, 4])


def test_constant_output():
    x = pt.dscalar("x")
    f = ptt.function([x], pt.constant(7.0), on_unused_input="ignore")
    assert float(np.asarray(f(0.0))) == 7.0


def test_shared_in_two_functions():
    w = ptt.shared(np.zeros(2), name="w")
    f1 = ptt.function([], w.sum(), updates={w: w + 1})
    f2 = ptt.function([], w.sum())
    f1()
    assert float(np.asarray(f2())) == 2.0


class TestTrainLoop:
    """train_loop: K update iterations compiled into ONE on-device scan
    (compile/train.py) — semantics identical to K separate calls."""

    def _build(self):
        from pytensor_tpu.compile.sharedvalue import shared

        rng = np.random.default_rng(0)
        Xv = rng.standard_normal((32, 4))
        yv = (rng.random(32) < 0.5).astype("float64")
        w = shared(np.zeros(4), name="w")
        b = shared(np.zeros(()), name="b")
        X = pt.dmatrix("X")
        y = pt.dvector("y")
        p = pt.sigmoid(pt.dot(X, w) + b)
        loss = -pt.mean(y * pt.log(p + 1e-9)
                        + (1 - y) * pt.log(1 - p + 1e-9))
        gw, gb = ptt.grad(loss, [w, b])
        upd = [(w, w - 0.1 * gw), (b, b - 0.1 * gb)]
        return (X, y), loss, upd, (w, b), (Xv, yv)

    def test_matches_k_sequential_calls(self):
        (X, y), loss, upd, (w, b), (Xv, yv) = self._build()
        f = ptt.function([X, y], loss, updates=upd)
        ref_losses = [float(np.asarray(f(Xv, yv))) for _ in range(8)]
        w_ref = np.asarray(w.get_value()).copy()
        b_ref = np.asarray(b.get_value()).copy()

        w.set_value(np.zeros(4))
        b.set_value(np.zeros(()))
        g = ptt.train_loop([X, y], loss, upd, n_steps=8)
        last = float(np.asarray(g(Xv, yv)))
        np.testing.assert_allclose(last, ref_losses[-1], rtol=1e-10)
        np.testing.assert_allclose(np.asarray(w.get_value()), w_ref,
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(b.get_value()), b_ref,
                                   rtol=1e-10)

    def test_no_outputs_updates_only(self):
        (X, y), loss, upd, (w, b), (Xv, yv) = self._build()
        g = ptt.train_loop([X, y], None, upd, n_steps=3)
        g(Xv, yv)
        assert np.isfinite(np.asarray(w.get_value())).all()

    def test_requires_updates(self):
        x = pt.dvector("x")
        with pytest.raises(ValueError, match="updates"):
            ptt.train_loop([x], x.sum(), [], n_steps=3)

    def test_nested_scan_body(self):
        # a body that itself contains a Scan (RNN) compiles and runs
        from pytensor_tpu.models.rnn import make_elman_rnn_bptt

        f, (Xv, yv), shared_vars = make_elman_rnn_bptt(
            seq_len=8, n_in=4, n_hidden=8, dtype="float64",
            n_steps_per_call=4)
        l1 = float(np.asarray(f(Xv, yv)))
        l2 = float(np.asarray(f(Xv, yv)))
        assert np.isfinite(l2) and l2 <= l1 + 1e-9
