"""Rewrite engine + rewrite pack tests (modeled on reference
tests/graph/rewriting/ and tests/tensor/rewriting/)."""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.graph.fg import FunctionGraph
from pytensor_tpu.graph.rewriting.basic import (
    EquilibriumGraphRewriter,
    MergeOptimizer,
    PatternNodeRewriter,
    WalkingGraphRewriter,
    node_rewriter,
)
from pytensor_tpu.graph.rewriting.db import RewriteDatabaseQuery, SequenceDB
from pytensor_tpu.graph.rewriting.utils import rewrite_graph
from pytensor_tpu.graph.traversal import applys_between
from pytensor_tpu.tensor.elemwise import Elemwise


def _ops(*outs):
    return [n.op for n in applys_between([], list(outs))]


def test_merge_optimizer_cse():
    x = pt.dvector("x")
    a = pt.exp(x)
    b = pt.exp(x)
    c = a + b
    fg = FunctionGraph(outputs=[c], clone=True)
    MergeOptimizer().rewrite(fg)
    exp_nodes = [n for n in fg.apply_nodes
                 if isinstance(n.op, Elemwise) and n.op.scalar_op.name == "exp"]
    assert len(exp_nodes) == 1


def test_constant_folding():
    out = pt.constant(2.0) * pt.constant(3.0) + pt.constant(1.0)
    res = rewrite_graph(out, include=("fast_run",))
    from pytensor_tpu.graph.basic import Constant

    assert isinstance(res, Constant)
    assert float(res.data) == 7.0


def test_pattern_rewriter_neg_neg():
    from pytensor_tpu.tensor import math as tm

    x = pt.dvector("x")
    out = -(-x)
    res = rewrite_graph(out, include=("fast_run",))
    assert res.owner is None  # rewritten to x itself


def test_log1p_stabilization():
    x = pt.dvector("x")
    out = pt.log(1 + x)
    res = rewrite_graph(out, include=("fast_run",))
    names = [getattr(n.op, "scalar_op", None) and n.op.scalar_op.name
             for n in applys_between([], [res])]
    assert "log1p" in names


def _all_scalar_op_names(res):
    from pytensor_tpu.graph.op import HasInnerGraph

    names = []
    stack = [res]
    while stack:
        v = stack.pop()
        for n in applys_between([], [v]):
            so = getattr(n.op, "scalar_op", None)
            if so is not None:
                names.append(so.name)
            if isinstance(n.op, HasInnerGraph):
                stack.extend(n.op.inner_outputs)
    return names


def test_log_sigmoid_stabilization():
    x = pt.dvector("x")
    out = pt.log(pt.sigmoid(x))
    res = rewrite_graph(out, include=("fast_run",))
    # the stabilized softplus may live inside a FusedElemwise container
    assert "softplus" in _all_scalar_op_names(res)
    # numeric stability: big negative x
    f = ptt.function([x], res, mode="FAST_COMPILE", on_unused_input="ignore")
    val = np.asarray(f(np.array([-1000.0])))
    np.testing.assert_allclose(val, [-1000.0])


def test_pow_specialization():
    x = pt.dvector("x")
    res = rewrite_graph(x ** 2, include=("fast_run",))
    names = [n.op.scalar_op.name for n in applys_between([], [res])
             if isinstance(n.op, Elemwise)]
    assert "sqr" in names and "pow" not in names


def test_mul_one_removed():
    x = pt.dvector("x")
    res = rewrite_graph(x * 1.0, include=("fast_run",))
    assert res.owner is None or all(
        n.op.scalar_op.name != "mul" for n in applys_between([], [res])
        if isinstance(n.op, Elemwise)
    )


def test_db_query_include_exclude():
    db = SequenceDB(name="testdb")

    @node_rewriter(None)
    def r1(fgraph, node):
        return False

    db.register("r1", WalkingGraphRewriter(r1), "tagA", position=1)
    q = RewriteDatabaseQuery(include=["tagA"])
    rewriter = db.query(q)
    assert len(rewriter.rewriters) == 1
    q2 = RewriteDatabaseQuery(include=["tagA"], exclude=["r1"])
    assert len(db.query(q2).rewriters) == 0


def test_equilibrium_converges():
    from pytensor_tpu.tensor import math as tm

    x = pt.dvector("x")
    out = -(-(-(-x)))

    @node_rewriter([Elemwise])
    def remove_neg_neg(fgraph, node):
        if node.op.scalar_op.name != "neg":
            return False
        inner = node.inputs[0].owner
        if inner is not None and isinstance(inner.op, Elemwise) \
                and inner.op.scalar_op.name == "neg":
            return [inner.inputs[0]]
        return False

    fg = FunctionGraph(outputs=[out], clone=True)
    EquilibriumGraphRewriter([remove_neg_neg], name="eq").rewrite(fg)
    assert fg.outputs[0].owner is None


def test_rewrites_preserve_semantics():
    x = pt.dvector("x")
    exprs = [
        pt.log(1 + pt.exp(x)),
        (x + 0.0) * 1.0,
        pt.exp(pt.log(x + 2.0)),
        pt.log(pt.sigmoid(x)) + pt.sqr(x) ** 1,
    ]
    X = np.random.default_rng(0).random(5) + 0.1
    f_opt = ptt.function([x], exprs, mode="FAST_RUN")
    f_ref = ptt.function([x], exprs, mode="FAST_COMPILE")
    for a, b in zip(f_opt(X), f_ref(X)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)


class TestSwitchSinkNanGuards:
    """local_mul/div_switch_sink + switch-grad-as-switch: guarded logp
    expressions must have NaN-free gradients (reference rewriting/math.py
    local_mul_switch_sink / local_div_switch_sink)."""

    def test_guarded_log_grad(self):
        x = pt.dvector("x")
        safe = pt.switch(x > 0, pt.log(x), 0.0)
        g = ptt.grad((safe * 2.0).sum(), x)
        gv = np.asarray(ptt.function([x], g)(np.array([-1.0, 2.0, 0.0])))
        np.testing.assert_allclose(gv, [0.0, 1.0, 0.0])

    def test_guarded_div_grad(self):
        x = pt.dvector("x")
        safe = pt.switch(x > 0, 1.0 / x, 0.0)
        g = ptt.grad(safe.sum(), x)
        gv = np.asarray(ptt.function([x], g)(np.array([-1.0, 2.0, 0.0])))
        np.testing.assert_allclose(gv, [0.0, -0.25, 0.0])


class TestSigmoidStabilize:
    def test_exp_over_1_plus_exp(self):
        from pytensor_tpu.tensor.elemwise import Elemwise

        z = pt.dvector("z")
        f = ptt.function([z], pt.exp(z) / (1 + pt.exp(z)))
        zv = np.array([-30.0, 0.0, 30.0, 800.0])
        np.testing.assert_allclose(np.asarray(f(zv)), 1 / (1 + np.exp(-np.clip(zv, -700, 700))),
                                   rtol=1e-12)
        assert not np.isnan(np.asarray(f(np.array([800.0])))).any()

    def test_one_over_1_plus_exp_neg(self):
        z = pt.dvector("z")
        f = ptt.function([z], 1 / (1 + pt.exp(-z)))
        zv = np.array([-3.0, 0.5])
        np.testing.assert_allclose(np.asarray(f(zv)), 1 / (1 + np.exp(-zv)),
                                   rtol=1e-12)


class TestDotRewrites:
    def test_subtensor_of_dot(self):
        import pytensor_tpu.tensor.subtensor as pts
        from pytensor_tpu.tensor.blas import Dot22, Gemm
        from pytensor_tpu.tensor.math import Dot

        rng = np.random.default_rng(0)
        a, b = pt.dmatrix("a"), pt.dmatrix("b")
        f = ptt.function([a, b], pt.dot(a, b)[:2])
        av, bv = rng.random((6, 5)), rng.random((5, 4))
        np.testing.assert_allclose(np.asarray(f(av, bv)), (av @ bv)[:2],
                                   rtol=1e-12)
        topo = f.fgraph.toposort()
        di = [i for i, n in enumerate(topo)
              if isinstance(n.op, (Dot, Dot22, Gemm))]
        si = [i for i, n in enumerate(topo) if isinstance(n.op, pts.Subtensor)]
        assert si and di and si[0] < di[0]

    def test_zero_dot_folds(self):
        from pytensor_tpu.tensor.blas import Dot22, Gemm
        from pytensor_tpu.tensor.math import Dot

        b = pt.dmatrix("b")
        f = ptt.function([b], pt.dot(pt.zeros((3, 4)), b))
        assert not any(isinstance(n.op, (Dot, Dot22, Gemm))
                       for n in f.fgraph.apply_nodes)
        np.testing.assert_allclose(
            np.asarray(f(np.random.default_rng(0).random((4, 2)))), 0.0)


class TestScatterToOnehot:
    """local_scatter_add_to_onehot_dot: constant-index segment-sum becomes
    a one-hot MXU contraction for f32/bf16 (f64 stays scatter — emulated
    matmul would lose)."""

    def test_f32_converts_and_matches(self):
        from pytensor_tpu.tensor.subtensor import (AdvancedIncSubtensor,
                                                   AdvancedIncSubtensor1)

        rng = np.random.default_rng(0)
        county = rng.integers(0, 7, size=40)
        a = pt.tensor("a", dtype="float32", shape=(7,))
        r = pt.tensor("r", dtype="float32", shape=(40,))
        g = ptt.grad((a[county] * r).sum(), a)
        f = ptt.function([a, r], g)
        assert not any(isinstance(n.op, (AdvancedIncSubtensor,
                                         AdvancedIncSubtensor1))
                       for n in f.fgraph.apply_nodes)
        av = rng.random(7, dtype=np.float32)
        rv = rng.random(40, dtype=np.float32)
        exp = np.zeros(7, np.float32)
        np.add.at(exp, county, rv)
        np.testing.assert_allclose(np.asarray(f(av, rv)), exp, rtol=1e-5)

    def test_f64_keeps_scatter(self):
        from pytensor_tpu.tensor.subtensor import (AdvancedIncSubtensor,
                                                   AdvancedIncSubtensor1)

        rng = np.random.default_rng(0)
        county = rng.integers(0, 7, size=40)
        a = pt.dvector("a")
        r = pt.dvector("r")
        g = ptt.grad((a[county] * r).sum(), a)
        f = ptt.function([a, r], g)
        assert any(isinstance(n.op, (AdvancedIncSubtensor,
                                     AdvancedIncSubtensor1))
                   for n in f.fgraph.apply_nodes)
