"""Relational rewriting via the vendored microKanren core
(graph/rewriting/{microkanren,kanren}.py; reference kanren.py:243)."""

import numpy as np

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.graph.fg import FunctionGraph
from pytensor_tpu.graph.rewriting.basic import WalkingGraphRewriter
from pytensor_tpu.graph.rewriting.kanren import (
    KanrenRelationSub,
    graph_to_term,
    term_to_graph,
)
from pytensor_tpu.graph.rewriting.microkanren import (
    conde,
    eq,
    lall,
    run,
    unify,
    var,
)


class TestMicroKanren:
    def test_unify_basic(self):
        x = var()
        assert unify(x, 3, {}) == {x: 3}
        assert unify((1, x), (1, 2), {}) == {x: 2}
        assert unify((1, x), (2, 2), {}) is None

    def test_run_conde(self):
        x = var()
        goal = conde([eq(x, 1)], [eq(x, 2)])
        assert run(0, x, goal) == [1, 2]
        assert run(1, x, goal) == [1]

    def test_lall_threading(self):
        x, y = var(), var()
        goal = lall(eq(x, (1, y)), eq(y, 5))
        assert run(1, (x, y), goal) == [((1, 5), 5)]


def _op_of(expr):
    return expr.owner.op


class TestKanrenRelationSub:
    def test_term_roundtrip(self):
        x = pt.tensor("x", dtype="float64", shape=(3,))
        e = pt.exp(x) + x
        t = graph_to_term(e)
        assert isinstance(t, tuple)
        rebuilt = term_to_graph(t)
        assert rebuilt.type == e.type

    def test_x_plus_x_becomes_2x(self):
        x = pt.tensor("x", dtype="float64", shape=(4,))
        probe = pt.tensor("p", dtype="float64", shape=(4,))
        add_op = _op_of(probe + probe)
        mul_op = _op_of(probe * probe)
        two = pt.constant(np.float64(2.0))

        def rel(in_t, out_t):
            w = var()
            return lall(eq(in_t, (add_op, w, w)),
                        eq(out_t, (mul_op, two, w)))

        y = pt.exp(x) + pt.exp(x)
        fg = FunctionGraph([x], [y], clone=False)
        WalkingGraphRewriter(KanrenRelationSub(rel)).rewrite(fg)
        ops = [type(n.op).__name__ + ":" + str(n.op) for n in fg.toposort()]
        assert any("mul" in o for o in ops), ops
        # numerics preserved
        f = ptt.function([x], fg.outputs[0])
        v = np.random.default_rng(0).standard_normal(4)
        np.testing.assert_allclose(np.asarray(f(v)), 2 * np.exp(v),
                                   rtol=1e-12)

    def test_relation_no_match_leaves_graph(self):
        x = pt.tensor("x", dtype="float64", shape=(4,))
        probe = pt.tensor("p", dtype="float64", shape=(4,))
        add_op = _op_of(probe + probe)

        def rel(in_t, out_t):
            w = var()
            return lall(eq(in_t, (add_op, w, w)), eq(out_t, w))

        y = pt.exp(x) + pt.log(x)  # not x + x
        fg = FunctionGraph([x], [y], clone=False)
        before = len(fg.apply_nodes)
        WalkingGraphRewriter(KanrenRelationSub(rel)).rewrite(fg)
        assert len(fg.apply_nodes) == before

    def test_distributive_relation(self):
        # a*b + a*c -> a*(b+c): the classic relational example
        x = pt.tensor("x", dtype="float64", shape=(4,))
        b = pt.tensor("b", dtype="float64", shape=(4,))
        c = pt.tensor("c", dtype="float64", shape=(4,))
        probe = pt.tensor("p", dtype="float64", shape=(4,))
        add_op = _op_of(probe + probe)
        mul_op = _op_of(probe * probe)

        def rel(in_t, out_t):
            a, u, v = var(), var(), var()
            return lall(
                eq(in_t, (add_op, (mul_op, a, u), (mul_op, a, v))),
                eq(out_t, (mul_op, a, (add_op, u, v))),
            )

        y = x * b + x * c
        fg = FunctionGraph([x, b, c], [y], clone=False)
        WalkingGraphRewriter(KanrenRelationSub(rel)).rewrite(fg)
        f = ptt.function([x, b, c], fg.outputs[0])
        rng = np.random.default_rng(1)
        xv, bv, cv = (rng.standard_normal(4) for _ in range(3))
        np.testing.assert_allclose(np.asarray(f(xv, bv, cv)),
                                   xv * (bv + cv), rtol=1e-12)
        # structurally one add of b+c now exists
        muls = [n for n in fg.apply_nodes
                if getattr(getattr(n.op, "scalar_op", None), "name", "")
                == "mul"]
        assert len(muls) == 1