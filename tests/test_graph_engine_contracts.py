"""Rewrite-engine / Feature contract tests: pattern unification
(Asterisk, ConstrainedVar, OpPattern params, commutative backtracking),
FullHistory undo/redo, ReplaceValidate transactional rollback,
RewriteDatabase position/tag semantics.

Reference analog: tests/graph/rewriting/ (engine unit tests) +
tests/graph/test_features.py.
"""

from __future__ import annotations

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.graph.fg import FunctionGraph
from pytensor_tpu.graph.features import (
    FullHistory,
    NodeFinder,
    ReplaceValidate,
)
from pytensor_tpu.graph.rewriting.unify import (
    Asterisk,
    ConstrainedVar,
    OpPattern,
    PatternVar,
    match_pattern,
)
from pytensor_tpu.tensor.elemwise import Elemwise


class TestUnify:
    def _add_graph(self):
        x = pt.dvector("x")
        y = pt.dvector("y")
        return x, y, x + y

    def test_pattern_var_binds(self):
        x, y, out = self._add_graph()
        b = match_pattern(out, (out.owner.op, PatternVar("a"), PatternVar("b")))
        assert b is not None and b["a"] is x and b["b"] is y

    def test_same_var_must_rebind_consistently(self):
        x = pt.dvector("x")
        out = x + x
        b = match_pattern(out, (out.owner.op, PatternVar("a"), PatternVar("a")))
        assert b is not None and b["a"] is x
        y = pt.dvector("y")
        out2 = x + y
        assert match_pattern(
            out2, (out2.owner.op, PatternVar("a"), PatternVar("a"))) is None

    def test_constrained_var(self):
        x = pt.dvector("x")
        const = pt.as_tensor_variable(np.ones(3))
        out = x + const
        from pytensor_tpu.graph.basic import Constant

        is_const = lambda v: isinstance(v, Constant)  # noqa: E731
        pat = (out.owner.op, PatternVar("a"), ConstrainedVar("c", is_const))
        b = match_pattern(out, pat)
        assert b is not None and b["c"] is const

    def test_commutative_backtracking(self):
        # constant on the LEFT still matches a (var, const) pattern
        x = pt.dvector("x")
        const = pt.as_tensor_variable(np.ones(3))
        out = const + x
        from pytensor_tpu.graph.basic import Constant

        pat = (out.owner.op, PatternVar("a"),
               ConstrainedVar("c", lambda v: isinstance(v, Constant)))
        b = match_pattern(out, pat)
        assert b is not None and b["c"] is const and b["a"] is x

    def test_asterisk_varargs(self):
        x, y, z = pt.dvector("x"), pt.dvector("y"), pt.dvector("z")
        from pytensor_tpu.tensor.basic import join

        out = join(0, x, y, z)
        pat = (out.owner.op, PatternVar("ax"), Asterisk("rest"))
        b = match_pattern(out, pat)
        assert b is not None and len(b["rest"]) == 3

    def test_op_pattern_param_constraint(self):
        from pytensor_tpu.tensor.elemwise import CAReduce

        x = pt.dmatrix("x")
        s0 = pt.sum(x, axis=0)
        s1 = pt.sum(x, axis=1)
        pat0 = OpPattern(CAReduce, axis=(0,))
        assert pat0.matches(s0.owner.op)
        assert not pat0.matches(s1.owner.op)
        # callable constraint
        pat_any = OpPattern(CAReduce, axis=lambda a: a is not None)
        assert pat_any.matches(s0.owner.op) and pat_any.matches(s1.owner.op)

    def test_nested_pattern(self):
        x = pt.dvector("x")
        out = pt.exp(-x)
        neg = out.owner.inputs[0]
        pat = (out.owner.op, (neg.owner.op, PatternVar("inner")))
        b = match_pattern(out, pat)
        assert b is not None and b["inner"] is x


class TestFullHistory:
    def test_undo_redo(self):
        x = pt.dvector("x")
        out = pt.exp(x) + 1.0
        fg = FunctionGraph([x], [out], clone=True)
        hist = FullHistory()
        fg.attach_feature(hist)
        exp_node = [n for n in fg.apply_nodes
                    if getattr(getattr(n.op, "scalar_op", None), "name", "") == "exp"][0]
        old_in = exp_node.inputs[0]
        replacement = old_in * 2.0
        fg.change_node_input(exp_node, 0, replacement, reason="test")
        assert exp_node.inputs[0] is replacement
        hist.prev()
        assert exp_node.inputs[0] is old_in
        hist.next()
        assert exp_node.inputs[0] is replacement

    def test_reasons_recorded(self):
        x = pt.dvector("x")
        fg = FunctionGraph([x], [pt.exp(x)], clone=True)
        hist = FullHistory()
        fg.attach_feature(hist)
        node = next(iter(fg.apply_nodes))
        xin = fg.inputs[0]
        fg.change_node_input(node, 0, xin * 1.0, reason="my_rewrite")
        assert hist.reasons[-1] == "my_rewrite"


class TestReplaceValidate:
    def test_rollback_on_failed_validation(self):
        x = pt.dvector("x")
        out = pt.exp(x)
        fg = FunctionGraph([x], [out], clone=False)
        fg.attach_feature(ReplaceValidate())

        class Vetoer:
            def on_attach(self, fgraph):
                pass

            def validate(self, fgraph):
                raise ValueError("veto")

        # manual callback through the validate hook
        from pytensor_tpu.graph.features import Feature

        class VetoFeature(Feature):
            def validate_(self, fgraph):
                raise ValueError("veto")

            def on_validate(self, fgraph):
                raise ValueError("veto")

        # use the callback-name convention the fgraph dispatches
        class VetoReal(Feature):
            def validate(self, fgraph):
                raise ValueError("veto")

        fg.attach_feature(VetoReal())
        before = list(fg.outputs)
        with pytest.raises(Exception):
            fg.replace_validate(out, x * 3.0, reason="bad")
        assert fg.outputs == before  # rolled back

    def test_successful_replace_keeps_change(self):
        x = pt.dvector("x")
        out = pt.exp(x)
        fg = FunctionGraph([x], [out], clone=False)
        fg.attach_feature(ReplaceValidate())
        new = x * 3.0
        fg.replace_validate(out, new, reason="good")
        assert fg.outputs[0] is new


class TestNodeFinder:
    def test_get_nodes_by_op(self):
        x = pt.dvector("x")
        out = pt.exp(x) + pt.exp(x * 2.0)
        fg = FunctionGraph([x], [out], clone=True)
        nf = NodeFinder()
        fg.attach_feature(nf)
        from pytensor_tpu.scalar.basic import exp as scalar_exp

        exps = [n for n in fg.apply_nodes
                if getattr(getattr(n.op, "scalar_op", None), "name", "") == "exp"]
        found = list(fg.get_nodes(exps[0].op))
        assert set(found) >= set(exps)


class TestRewriteDatabase:
    def test_sequence_positions_order_passes(self):
        from pytensor_tpu.graph.rewriting.basic import GraphRewriter
        from pytensor_tpu.graph.rewriting.db import RewriteDatabaseQuery, SequenceDB

        calls = []

        def mk(tag):
            class R(GraphRewriter):
                def apply(self, fgraph):
                    calls.append(tag)

            return R()

        db = SequenceDB()
        db.register("late", mk("late"), "always", position=10)
        db.register("early", mk("early"), "always", position=1)
        db.register("mid", mk("mid"), "always", position=5)
        rewriter = db.query(RewriteDatabaseQuery(include=["always"]))
        x = pt.dvector("x")
        fg = FunctionGraph([x], [pt.exp(x)], clone=True)
        rewriter.rewrite(fg)
        assert calls == ["early", "mid", "late"]

    def test_query_exclude_tag(self):
        from pytensor_tpu.graph.rewriting.basic import GraphRewriter
        from pytensor_tpu.graph.rewriting.db import RewriteDatabaseQuery, SequenceDB

        calls = []

        def mk(tag):
            class R(GraphRewriter):
                def apply(self, fgraph):
                    calls.append(tag)

            return R()

        db = SequenceDB()
        db.register("a", mk("a"), "always", position=1)
        db.register("b", mk("b"), "always", "slow", position=2)
        rewriter = db.query(
            RewriteDatabaseQuery(include=["always"], exclude=["slow"]))
        x = pt.dvector("x")
        fg = FunctionGraph([x], [pt.exp(x)], clone=True)
        rewriter.rewrite(fg)
        assert calls == ["a"]

    def test_including_excluding_chaining(self):
        from pytensor_tpu.graph.rewriting.db import RewriteDatabaseQuery

        q = RewriteDatabaseQuery(include=["fast_run"])
        q2 = q.including("extra").excluding("bad")
        assert "extra" in q2.include and "bad" in q2.exclude
        assert "extra" not in q.include  # immutable chaining
