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


# ---------------------------------------------------------------------------
# round-2 rewrite pack: canonizers + math families
# ---------------------------------------------------------------------------

def _opnames(res):
    return " ".join(str(n.op) for n in applys_between([], [res]))


class TestAlgebraicCanonizers:
    def test_div_self_cancels(self):
        x = pt.dvector("x")
        res = rewrite_graph(x / x, include=("fast_run",))
        assert "div" not in _opnames(res)

    def test_constant_fold_across_div(self):
        x = pt.dvector("x")
        y = pt.dvector("y")
        res = rewrite_graph((2 * x) / (4 * y), include=("fast_run",))
        # one coefficient 0.5 remains; no nested mul-of-const chains
        s = _opnames(res)
        assert s.count("mul") <= 2

    def test_reciprocal_reciprocal(self):
        x = pt.dvector("x")
        res = rewrite_graph(1 / (1 / x), include=("fast_run",))
        assert res.owner is None or "reciprocal" not in _opnames(res)

    def test_double_neg_product(self):
        x = pt.dvector("x")
        y = pt.dvector("y")
        res = rewrite_graph((-x) * (-y), include=("fast_run",))
        assert "neg" not in _opnames(res)

    def test_add_cancellation(self):
        x = pt.dvector("x")
        y = pt.dvector("y")
        res = rewrite_graph((x - y) + y, include=("fast_run",))
        assert res.owner is None  # back to x

    def test_add_constant_fold(self):
        x = pt.dvector("x")
        res = rewrite_graph((x + 2.0) - (x + 1.0), include=("fast_run",))
        # collapses to the constant 1 (broadcast)
        s = _opnames(res)
        assert "sub" not in s and "add" not in s

    def test_numeric_parity(self, rng):
        x = pt.dvector("x")
        y = pt.dvector("y")
        exprs = [
            (-x) * (-y) / (2 * x),
            (x + 3.0) - (y + 3.0) + y,
            1 / (1 / (x + y)),
        ]
        xv = rng.uniform(0.5, 2.0, 7)
        yv = rng.uniform(0.5, 2.0, 7)
        for e in exprs:
            f0 = ptt.function([x, y], e, mode="FAST_COMPILE")
            f1 = ptt.function([x, y], e)
            np.testing.assert_allclose(
                np.asarray(f0(xv, yv)), np.asarray(f1(xv, yv)), rtol=1e-12)


class TestStabilizeFamily:
    @pytest.mark.parametrize("build,needle", [
        (lambda x: pt.exp(x) - 1, "expm1"),
        (lambda x: pt.log(1 - pt.exp(x)), "log1mexp"),
        (lambda x: pt.log(1 - pt.sigmoid(x)), "softplus"),
        (lambda x: pt.log(pt.sqrt(x)), "log"),
    ])
    def test_structure(self, build, needle):
        x = pt.dvector("x")
        res = rewrite_graph(build(x), include=("fast_run",))
        assert needle in _opnames(res)

    def test_log1mexp_numeric_extreme(self):
        # the stabilization must be *better* than the naive form
        x = pt.dvector("x")
        f = ptt.function([x], pt.log(1 - pt.exp(x)))
        v = np.asarray(f(np.array([-1e-12])))
        assert np.isfinite(v).all()  # naive form underflows to log(0)

    def test_exp_product_merges(self):
        x = pt.dvector("x")
        y = pt.dvector("y")
        res = rewrite_graph(pt.exp(x) * pt.exp(y), include=("fast_run",))
        assert _opnames(res).count("exp") == 1


class TestExtremumAndLogical:
    @pytest.mark.parametrize("build", [
        lambda x: pt.maximum(x, x),
        lambda x: pt.minimum(x, x),
        lambda x: pt.maximum(x, -np.inf),
        lambda x: pt.minimum(x, np.inf),
        lambda x: pt.clip(x, -np.inf, np.inf),
    ])
    def test_identity(self, build):
        x = pt.dvector("x")
        res = rewrite_graph(build(x), include=("fast_run",))
        assert res.owner is None

    def test_comparisons_self(self):
        x = pt.dvector("x")
        for fn, val in [(pt.lt, 0), (pt.gt, 0), (pt.le, 1), (pt.ge, 1)]:
            res = rewrite_graph(fn(x, x), include=("fast_run",))
            f = ptt.function([x], fn(x, x))
            assert np.all(np.asarray(f(np.arange(3.0))) == val)

    def test_one_sided_clip(self):
        x = pt.dvector("x")
        res = rewrite_graph(pt.clip(x, -np.inf, 2.0), include=("fast_run",))
        assert "minimum" in _opnames(res)
        res = rewrite_graph(pt.clip(x, -1.0, np.inf), include=("fast_run",))
        assert "maximum" in _opnames(res)


class TestReduceRewrites:
    def test_reduce_chain_prod_max_min(self):
        M = pt.dmatrix("M")
        for outer, label in [(pt.prod, "Prod"), (pt.max, "Max"), (pt.min, "Min")]:
            res = rewrite_graph(outer(outer(M, axis=0)), include=("fast_run",))
            assert _opnames(res).count(label) == 1

    def test_sum_of_alloc_removed(self):
        res = rewrite_graph(pt.sum(pt.alloc(2.5, 4, 5)), include=("fast_run",))
        s = _opnames(res)
        assert "Alloc" not in s and "Sum" not in s
        f = ptt.function([], pt.sum(pt.alloc(2.5, 4, 5)))
        assert float(np.asarray(f())) == 50.0

    def test_sum_of_alloc_partial_axis(self, rng):
        out = pt.sum(pt.alloc(1.5, 3, 7), axis=1)
        f = ptt.function([], out)
        np.testing.assert_allclose(np.asarray(f()), np.full(3, 10.5))

    def test_max_of_neg(self):
        M = pt.dmatrix("M")
        res = rewrite_graph(pt.max(-M), include=("fast_run",))
        assert "Min" in _opnames(res)
        f = ptt.function([M], pt.max(-M))
        Mv = np.arange(6.0).reshape(2, 3)
        assert float(np.asarray(f(Mv))) == 0.0

    def test_sum_div_scalar(self, rng):
        M = pt.dmatrix("M")
        out = pt.sum(M / 3.0)
        Mv = rng.normal(size=(3, 4))
        f = ptt.function([M], out)
        np.testing.assert_allclose(float(np.asarray(f(Mv))), Mv.sum() / 3.0)


class TestPowAbsFamily:
    def test_mul_self_to_sqr(self):
        x = pt.dvector("x")
        res = rewrite_graph(x * x, include=("fast_run",))
        assert "sqr" in _opnames(res)

    def test_pow_pow_int(self):
        x = pt.dvector("x")
        res = rewrite_graph((x ** 2) ** 3, include=("fast_run",))
        s = _opnames(res)
        # pow_pow merges to pow(x, 6); local_pow_to_nested_squaring then
        # expands the constant integer power into a sqr/mul chain
        assert s.count("pow") == 0
        assert "sqr" in s
        f = ptt.function([x], (x ** 2) ** 3)
        np.testing.assert_allclose(np.asarray(f(np.array([-2.0]))), [64.0])

    def test_pow_of_exp(self):
        x = pt.dvector("x")
        res = rewrite_graph(pt.exp(x) ** 2.0, include=("fast_run",))
        assert "pow" not in _opnames(res)

    @pytest.mark.parametrize("build", [
        lambda x: pt.abs(pt.abs(x)),
        lambda x: pt.abs(-x),
        lambda x: pt.abs(pt.exp(x)),
        lambda x: pt.abs(pt.sqr(x)),
        lambda x: pt.sqr(pt.abs(x)),
    ])
    def test_abs_family(self, build, rng):
        x = pt.dvector("x")
        expr = build(x)
        res = rewrite_graph(expr, include=("fast_run",))
        xv = rng.normal(size=9)
        f0 = ptt.function([x], expr, mode="FAST_COMPILE")
        f1 = ptt.function([x], expr)
        np.testing.assert_allclose(np.asarray(f0(xv)), np.asarray(f1(xv)),
                                   rtol=1e-12)


class TestAllocFillJoinRewrites:
    def test_fill_thin_carrier(self):
        x = pt.dvector("x")
        res = rewrite_graph((x + 2.0) - (x + 1.0), include=("fast_run",))
        s = _opnames(res)
        assert "add" not in s and "sub" not in s

    def test_alloc_of_alloc(self):
        out = pt.alloc(pt.alloc(1.5, 1, 4), 3, 4)
        res = rewrite_graph(out, include=("fast_run",))
        assert _opnames(res).count("Alloc") <= 1
        f = ptt.function([], out)
        np.testing.assert_allclose(np.asarray(f()), np.full((3, 4), 1.5))

    def test_unary_of_alloc_lifts(self):
        out = pt.exp(pt.alloc(2.0, 3, 4))
        res = rewrite_graph(out, include=("fast_run",))
        f = ptt.function([], out)
        np.testing.assert_allclose(np.asarray(f()), np.full((3, 4), np.exp(2.0)))

    def test_join_of_join_flattens(self, rng):
        a = pt.dvector("a")
        b = pt.dvector("b")
        c = pt.dvector("c")
        out = pt.concatenate([pt.concatenate([a, b]), c])
        res = rewrite_graph(out, include=("fast_run",))
        assert _opnames(res).count("Join") == 1
        av, bv, cv = (rng.normal(size=k) for k in (2, 3, 4))
        f = ptt.function([a, b, c], out)
        np.testing.assert_allclose(np.asarray(f(av, bv, cv)),
                                   np.concatenate([av, bv, cv]))

    def test_join_empty_dropped(self, rng):
        a = pt.tensor("a", dtype="float64", shape=(3,))
        e = pt.tensor("e", dtype="float64", shape=(0,))
        out = pt.concatenate([a, e])
        res = rewrite_graph(out, include=("fast_run",))
        assert "Join" not in _opnames(res)


class TestSubtensorLift:
    def test_elemwise_lift(self, rng):
        x = pt.dmatrix("x")
        y = pt.dmatrix("y")
        res = rewrite_graph((pt.exp(x) + y)[1:3], include=("fast_run",))
        s = _opnames(res).split()
        # the Subtensors must be leaves (appear after the elemwise ops in
        # the reversed toposort string, i.e. the add operates on slices)
        assert "Subtensor{1:3}" in _opnames(res)
        xv = rng.normal(size=(5, 4)); yv = rng.normal(size=(5, 4))
        f = ptt.function([x, y], (pt.exp(x) + y)[1:3])
        np.testing.assert_allclose(np.asarray(f(xv, yv)),
                                   (np.exp(xv) + yv)[1:3])

    def test_elemwise_lift_broadcast_input(self, rng):
        x = pt.dmatrix("x")
        v = pt.dvector("v")
        expr = (x + v)[2]
        f = ptt.function([x, v], expr)
        xv = rng.normal(size=(5, 4)); vv = rng.normal(size=4)
        np.testing.assert_allclose(np.asarray(f(xv, vv)), (xv + vv)[2])

    def test_transpose_lift(self, rng):
        x = pt.dmatrix("x")
        expr = x.T[1:3]
        res = rewrite_graph(expr, include=("fast_run",))
        assert "Subtensor{:, 1:3}" in _opnames(res)
        xv = rng.normal(size=(5, 4))
        f = ptt.function([x], expr)
        np.testing.assert_allclose(np.asarray(f(xv)), xv.T[1:3])

    def test_transpose_int_index_drops_dimshuffle(self, rng):
        x = pt.dmatrix("x")
        res = rewrite_graph(x.T[0], include=("fast_run",))
        assert "Transpose" not in _opnames(res)

    def test_alloc_lift(self):
        expr = pt.alloc(3.3, 7, 8)[1:3, 2:5]
        res = rewrite_graph(expr, include=("fast_run",))
        assert "Subtensor" not in _opnames(res)
        f = ptt.function([], expr)
        np.testing.assert_allclose(np.asarray(f()), np.full((2, 3), 3.3))

    def test_makevector_pick(self):
        x = pt.dmatrix("x")
        expr = pt.stack([x.shape[0], x.shape[1]])[1]
        res = rewrite_graph(expr, include=("fast_run",))
        assert "MakeVector" not in _opnames(res)

    def test_cast_lift(self, rng):
        x = pt.dmatrix("x")
        expr = pt.cast(x, "float32")[2:4]
        res = rewrite_graph(expr, include=("fast_run",))
        names = _opnames(res)
        assert "cast" in names and "Subtensor" in names
        xv = rng.normal(size=(5, 4))
        f = ptt.function([x], expr)
        np.testing.assert_allclose(np.asarray(f(xv)), xv[2:4].astype("float32"))

    def test_useless_set_subtensor(self):
        from pytensor_tpu.tensor.subtensor import IncSubtensor

        x = pt.dmatrix("x")
        y = pt.dmatrix("y")
        expr = IncSubtensor([("slice", None, None, None)],
                            set_instead_of_inc=True)(x, y)
        res = rewrite_graph(expr, include=("fast_run",))
        assert res.owner is None  # reduced to y


class TestBlockwiseAndDimShuffle:
    def test_blockwise_unbatched_to_core(self):
        from pytensor_tpu.tensor.blockwise import Blockwise
        from pytensor_tpu.tensor.linalg import Cholesky

        A = pt.dmatrix("A")
        res = rewrite_graph(Blockwise(Cholesky(lower=True))(A),
                            include=("fast_run",))
        assert "Blockwise" not in _opnames(res)
        assert "Cholesky" in _opnames(res)

    def test_dimshuffle_of_alloc(self):
        res = rewrite_graph(pt.alloc(2.0, 3, 5).T, include=("fast_run",))
        s = _opnames(res)
        assert "Transpose" not in s and "DimShuffle" not in s
        f = ptt.function([], pt.alloc(2.0, 3, 5).T)
        assert np.asarray(f()).shape == (5, 3)


class TestParityAndInverseRules:
    def test_even_fn_of_neg(self):
        x = pt.dvector("x")
        for fn in (pt.cos, pt.cosh, pt.sqr, pt.abs):
            res = rewrite_graph(fn(-x), include=("fast_run",))
            assert "neg" not in _opnames(res)

    def test_odd_fn_cancellation_composes(self, rng):
        x = pt.dvector("x")
        expr = pt.sin(-x) + pt.sin(x)
        f = ptt.function([x], expr)
        np.testing.assert_allclose(np.asarray(f(rng.normal(size=5))),
                                   np.zeros(5), atol=1e-15)

    def test_total_domain_inverse_pairs(self):
        x = pt.dvector("x")
        for fn, inv in ((pt.tan, pt.arctan), (pt.sinh, pt.arcsinh)):
            res = rewrite_graph(fn(inv(x)), include=("fast_run",))
            assert res.owner is None

    def test_floor_of_int(self):
        x = pt.lvector("x")
        res = rewrite_graph(pt.floor(x), include=("fast_run",))
        assert "floor" not in _opnames(res)

    def test_sum_of_makevector(self, rng):
        x = pt.dmatrix("x")
        expr = pt.stack([x[0, 0], x[1, 1]]).sum()
        res = rewrite_graph(expr, include=("fast_run",))
        assert "MakeVector" not in _opnames(res)
        xv = rng.normal(size=(3, 3))
        f = ptt.function([x], expr)
        np.testing.assert_allclose(float(np.asarray(f(xv))),
                                   xv[0, 0] + xv[1, 1])


class TestAssumptionDrivenLinalg:
    """Reference tensor/rewriting/linalg/solvers.py:703 + assumptions/
    modules: facts flow from cholesky/eye/diag constructors into
    structured-solver specializations."""

    def _psd(self, rng, n=5):
        A = rng.normal(size=(n, n))
        return A @ A.T + n * np.eye(n)

    def test_solve_of_gram_to_cho_solve(self, rng):
        A = pt.dmatrix("A")
        b = pt.dvector("b")
        L = pt.linalg.cholesky(A)
        expr = pt.linalg.solve(L @ L.T, b, b_ndim=1)
        res = rewrite_graph(expr, include=("fast_run",))
        assert "CholeskySolve" in _opnames(res)
        assert "assume_a" not in _opnames(res)  # no generic Solve left
        Av, bv = self._psd(rng), rng.normal(size=5)
        f0 = ptt.function([A, b], expr, mode="FAST_COMPILE")
        f1 = ptt.function([A, b], expr)
        np.testing.assert_allclose(np.asarray(f0(Av, bv)),
                                   np.asarray(f1(Av, bv)), rtol=1e-8)

    def test_det_of_triangular_to_prod_diag(self, rng):
        A = pt.dmatrix("A")
        expr = pt.linalg.det(pt.linalg.cholesky(A))
        res = rewrite_graph(expr, include=("fast_run",))
        assert "Det" not in _opnames(res)
        Av = self._psd(rng)
        f0 = ptt.function([A], expr, mode="FAST_COMPILE")
        f1 = ptt.function([A], expr)
        np.testing.assert_allclose(float(np.asarray(f0(Av))),
                                   float(np.asarray(f1(Av))), rtol=1e-8)

    def test_slogdet_of_gram(self, rng):
        A = pt.dmatrix("A")
        L = pt.linalg.cholesky(A)
        _, ld = pt.linalg.slogdet(L @ L.T)
        res = rewrite_graph(ld, include=("fast_run",))
        assert "SLogDet" not in _opnames(res)
        Av = self._psd(rng)
        f0 = ptt.function([A], ld, mode="FAST_COMPILE")
        f1 = ptt.function([A], ld)
        np.testing.assert_allclose(float(np.asarray(f0(Av))),
                                   float(np.asarray(f1(Av))), rtol=1e-8)

    def test_solve_of_diagonal(self, rng):
        d = pt.dvector("d")
        b = pt.dvector("b")
        expr = pt.linalg.solve(pt.alloc_diag(d), b, b_ndim=1)
        res = rewrite_graph(expr, include=("fast_run",))
        assert "Solve" not in _opnames(res)
        dv, bv = rng.uniform(1, 2, 5), rng.normal(size=5)
        f = ptt.function([d, b], expr)
        np.testing.assert_allclose(np.asarray(f(dv, bv)), bv / dv, rtol=1e-12)

    def test_cholesky_of_diagonal(self, rng):
        d = pt.dvector("d")
        expr = pt.linalg.cholesky(pt.alloc_diag(d))
        res = rewrite_graph(expr, include=("fast_run",))
        assert "Cholesky" not in _opnames(res)
        dv = rng.uniform(1, 2, 5)
        f = ptt.function([d], expr)
        np.testing.assert_allclose(np.asarray(f(dv)), np.diag(np.sqrt(dv)),
                                   rtol=1e-12)

    def test_inv_of_permutation_is_transpose(self):
        perm = np.array([2, 0, 1, 4, 3])
        P = pt.eye(5)[perm]
        res = rewrite_graph(pt.linalg.inv(P), include=("fast_run",))
        assert "MatrixInverse" not in _opnames(res)
        f = ptt.function([], pt.linalg.inv(P))
        np.testing.assert_allclose(np.asarray(f()),
                                   np.linalg.inv(np.eye(5)[perm]), atol=1e-12)

    def test_diagonal_of_diag_roundtrip(self, rng):
        d = pt.dvector("d")
        res = rewrite_graph(pt.diagonal(pt.alloc_diag(d)), include=("fast_run",))
        assert res.owner is None  # back to d

    def test_solve_triangular_from_assumed_fact(self, rng):
        from pytensor_tpu.assumptions import assume

        A = pt.dmatrix("A")
        b = pt.dvector("b")
        assume(A, "lower_triangular")
        expr = pt.linalg.solve(A, b, b_ndim=1)
        res = rewrite_graph(expr, include=("fast_run",))
        assert "SolveTriangular" in _opnames(res)
