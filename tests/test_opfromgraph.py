"""OpFromGraph contract tests (reference compile/builders.py:116 +
tests/compile/test_builders.py): encapsulation, reuse, gradients
(automatic and overridden), Rop, inlining, nesting, pickling."""

from __future__ import annotations

import pickle

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.compile.builders import OpFromGraph

rng = np.random.default_rng(43)


def _simple_ofg():
    x = pt.dvector("x")
    w = pt.dvector("w")
    out = pt.tanh(x * w).sum()
    return OpFromGraph([x, w], [out]), (x, w)


class TestBasics:
    def test_call_and_reuse(self):
        op, _ = _simple_ofg()
        a = pt.dvector("a")
        b = pt.dvector("b")
        y1 = op(a, b)
        y2 = op(b, a)  # same op applied twice with swapped args
        f = ptt.function([a, b], [y1, y2])
        av, bv = rng.standard_normal(4), rng.standard_normal(4)
        r1, r2 = (float(np.asarray(r)) for r in f(av, bv))
        np.testing.assert_allclose(r1, np.tanh(av * bv).sum(), rtol=1e-12)
        np.testing.assert_allclose(r2, np.tanh(bv * av).sum(), rtol=1e-12)

    def test_multiple_outputs(self):
        x = pt.dvector("x")
        op = OpFromGraph([x], [pt.sum(x ** 2), pt.max(x)])
        a = pt.dvector("a")
        outs = op(a)
        f = ptt.function([a], list(outs))
        av = rng.standard_normal(5)
        s, m = (np.asarray(r) for r in f(av))
        assert float(s) == pytest.approx((av ** 2).sum())
        assert float(m) == av.max()

    def test_constant_inputs_rejected(self):
        c = pt.as_tensor_variable(np.ones(3))
        with pytest.raises(TypeError, match="constant"):
            OpFromGraph([c], [c * 2])

    def test_oracle_executes(self):
        op, _ = _simple_ofg()
        a = pt.dvector("a")
        b = pt.dvector("b")
        f = ptt.function([a, b], op(a, b), mode="FAST_COMPILE")
        av, bv = rng.standard_normal(3), rng.standard_normal(3)
        np.testing.assert_allclose(float(np.asarray(f(av, bv))),
                                   np.tanh(av * bv).sum(), rtol=1e-12)


class TestGradients:
    def test_automatic_grad(self):
        op, _ = _simple_ofg()
        a = pt.dvector("a")
        b = pt.dvector("b")
        g = ptt.grad(op(a, b), a)
        f = ptt.function([a, b], g)
        av, bv = rng.standard_normal(4) * 0.5, rng.standard_normal(4) * 0.5
        exp = (1 - np.tanh(av * bv) ** 2) * bv
        np.testing.assert_allclose(np.asarray(f(av, bv)), exp, rtol=1e-10)

    def test_lop_override(self):
        # override d/dx of f(x) = x^2 with a FAKE gradient 3*g*x to prove
        # the override (not autodiff) is used
        x = pt.dvector("x")
        op = OpFromGraph(
            [x], [pt.sum(x ** 2)],
            lop_overrides=lambda inputs, output_grads:
                [3.0 * output_grads[0] * inputs[0]])
        a = pt.dvector("a")
        g = ptt.grad(op(a), a)
        f = ptt.function([a], g)
        av = rng.standard_normal(4)
        np.testing.assert_allclose(np.asarray(f(av)), 3.0 * av, rtol=1e-12)

    def test_second_order_through_ofg(self):
        x = pt.dscalar("x")
        op = OpFromGraph([x], [x ** 3])
        a = pt.dscalar("a")
        y = op(a)
        g1 = ptt.grad(y, a)
        g2 = ptt.grad(g1, a)
        f = ptt.function([a], [g1, g2])
        g1v, g2v = (float(np.asarray(r)) for r in f(2.0))
        assert g1v == pytest.approx(12.0)  # 3a^2
        assert g2v == pytest.approx(12.0)  # 6a

    def test_rop_through_ofg(self):
        x = pt.dvector("x")
        op = OpFromGraph([x], [pt.sum(x ** 2)])
        a = pt.dvector("a")
        v = pt.dvector("v")
        jvp = ptt.Rop(op(a), a, v)
        f = ptt.function([a, v], jvp)
        av, vv = rng.standard_normal(4), rng.standard_normal(4)
        np.testing.assert_allclose(float(np.asarray(f(av, vv))),
                                   2.0 * (av * vv).sum(), rtol=1e-10)


class TestInlineAndNesting:
    def test_inline_expansion_removes_node(self):
        x = pt.dvector("x")
        op = OpFromGraph([x], [pt.exp(x).sum()], inline=True)
        a = pt.dvector("a")
        f = ptt.function([a], op(a))
        names = [type(n.op).__name__ for n in f.fgraph.toposort()]
        assert "OpFromGraph" not in names

    def test_non_inline_keeps_node_but_matches(self):
        x = pt.dvector("x")
        op = OpFromGraph([x], [pt.exp(x).sum()], inline=False)
        a = pt.dvector("a")
        f = ptt.function([a], op(a))
        av = rng.standard_normal(4)
        np.testing.assert_allclose(float(np.asarray(f(av))),
                                   np.exp(av).sum(), rtol=1e-12)

    def test_nested_ofg(self):
        x = pt.dvector("x")
        inner = OpFromGraph([x], [x * 2.0])
        y = pt.dvector("y")
        outer = OpFromGraph([y], [pt.sum(inner(y) ** 2)])
        a = pt.dvector("a")
        g = ptt.grad(outer(a), a)
        f = ptt.function([a], [outer(a), g])
        av = rng.standard_normal(3)
        val, gv = (np.asarray(r) for r in f(av))
        np.testing.assert_allclose(float(val), (4 * av ** 2).sum(), rtol=1e-12)
        np.testing.assert_allclose(gv, 8 * av, rtol=1e-12)


class TestSerialization:
    def test_pickle_function_with_ofg(self):
        op, _ = _simple_ofg()
        a = pt.dvector("a")
        b = pt.dvector("b")
        f = ptt.function([a, b], op(a, b))
        f2 = pickle.loads(pickle.dumps(f))
        av, bv = rng.standard_normal(3), rng.standard_normal(3)
        assert float(np.asarray(f2(av, bv))) == pytest.approx(
            float(np.asarray(f(av, bv))))
