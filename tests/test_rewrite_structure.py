"""Graph-structure assertions for the rewrite packs: each case builds a
graph that must trigger a specific rewrite and asserts the compiled
structure (plus numeric equivalence with the unrewritten semantics).
Reference model: tests/tensor/rewriting/*."""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.compile.mode import get_mode
from pytensor_tpu.scalar.basic import ScalarOp
from pytensor_tpu.tensor.elemwise import CAReduce, Elemwise

MODE = get_mode(None).excluding("fusion")  # keep Elemwise ops visible


def compiled(inputs, out):
    return ptt.function(inputs, out, mode=MODE)


def op_names(f):
    return [type(n.op).__name__ for n in f.fgraph.apply_nodes]


def scalar_names(f):
    return sorted(
        n.op.scalar_op.name for n in f.fgraph.apply_nodes
        if isinstance(n.op, Elemwise) and isinstance(n.op.scalar_op, ScalarOp)
    )


def _x(shape=(5,), name="x"):
    return pt.tensor(name, dtype="float64", shape=shape)


class TestMathRewriteStructure:
    def test_neg_neg(self):
        x = _x()
        f = compiled([x], -(-x))
        assert "neg" not in scalar_names(f)
        v = np.random.default_rng(0).standard_normal(5)
        np.testing.assert_allclose(f(v), v)

    def test_log_exp(self):
        x = _x()
        f = compiled([x], pt.log(pt.exp(x)))
        s = scalar_names(f)
        assert "log" not in s and "exp" not in s

    def test_log1p_forms(self):
        x = _x()
        f = compiled([x], pt.log(1.0 + x))
        assert "log1p" in scalar_names(f)
        v = np.full(5, 1e-12)
        np.testing.assert_allclose(f(v), np.log1p(v), rtol=1e-13)

    def test_expm1_form(self):
        x = _x()
        f = compiled([x], pt.exp(x) - 1.0)
        assert "expm1" in scalar_names(f)
        v = np.full(5, 1e-12)
        np.testing.assert_allclose(f(v), np.expm1(v), rtol=1e-13)

    def test_exp_over_1_plus_exp_to_sigmoid(self):
        x = _x()
        f = compiled([x], pt.exp(x) / (1.0 + pt.exp(x)))
        s = scalar_names(f)
        assert "sigmoid" in s and "exp" not in s
        v = np.array([-700.0, 0.0, 700.0, 30.0, -30.0])
        np.testing.assert_allclose(f(v), 1 / (1 + np.exp(-v)))

    def test_one_minus_sigmoid(self):
        x = _x()
        f = compiled([x], 1.0 - pt.sigmoid(x))
        s = scalar_names(f)
        assert s.count("sigmoid") == 1 and "sub" not in s

    def test_mul_to_sqr_and_pow_specialize(self):
        x = _x()
        f = compiled([x], x * x)
        assert "sqr" in scalar_names(f)
        f2 = compiled([x], x ** 2.0)
        assert "sqr" in scalar_names(f2)
        f3 = compiled([x], x ** 0.5)
        assert "sqrt" in scalar_names(f3)
        f4 = compiled([x], x ** 1.0)
        assert scalar_names(f4) == [] or "pow" not in scalar_names(f4)

    def test_pow_of_exp(self):
        x = _x()
        f = compiled([x], pt.exp(x) ** 3.0)
        s = scalar_names(f)
        assert "pow" not in s and s.count("exp") == 1

    def test_mul_exp_to_exp_add(self):
        x = _x()
        y = _x(name="y")
        f = compiled([x, y], pt.exp(x) * pt.exp(y))
        assert scalar_names(f).count("exp") == 1
        v = np.ones(5)
        np.testing.assert_allclose(f(v, v), np.exp(2.0) * np.ones(5))

    def test_log_sqrt(self):
        x = _x()
        f = compiled([x], pt.log(pt.sqrt(x)))
        assert "sqrt" not in scalar_names(f)

    def test_log_sum_exp_stable(self):
        x = _x()
        f = compiled([x], pt.log(pt.sum(pt.exp(x))))
        # stabilized: a max appears and the result is finite for big x
        assert np.isfinite(float(np.asarray(f(np.full(5, 1000.0)))))

    def test_mul_add_neutral(self):
        x = _x()
        f = compiled([x], (x * 1.0) + 0.0)
        assert scalar_names(f) == []

    def test_zero_dot(self):
        x = _x((4, 5))
        f = compiled([x], pt.dot(pt.zeros((3, 4)), x))
        assert "Dot" not in op_names(f) and "Gemm" not in op_names(f)
        assert np.all(np.asarray(f(np.ones((4, 5)))) == 0)


class TestShapeRewriteStructure:
    def test_useless_reshape(self):
        x = _x((3, 4))
        f = compiled([x], x.reshape((3, 4)))
        assert "Reshape" not in op_names(f)

    def test_reshape_reshape(self):
        x = _x((3, 4))
        f = compiled([x], x.reshape((12,)).reshape((2, 6)))
        assert op_names(f).count("Reshape") == 1

    def test_useless_specify_shape(self):
        from pytensor_tpu.tensor.shape import specify_shape

        x = _x((3, 4))
        f = compiled([x], specify_shape(x, (3, 4)))
        assert "SpecifyShape" not in op_names(f)

    def test_shape_i_to_constant(self):
        x = _x((3, 4))
        f = compiled([x], x.shape[1])
        assert "Shape_i" not in op_names(f) and "Shape" not in op_names(f)
        assert int(np.asarray(f(np.zeros((3, 4))))) == 4

    def test_useless_dimshuffle(self):
        x = _x((3, 4))
        f = compiled([x], x.dimshuffle(0, 1))
        assert "DimShuffle" not in op_names(f)

    def test_dimshuffle_merge(self):
        x = _x((3, 4))
        f = compiled([x], x.T.T)
        assert "DimShuffle" not in op_names(f)


class TestSubtensorRewriteStructure:
    def test_useless_subtensor_full_slice(self):
        x = _x((5,))
        f = compiled([x], x[:])
        assert "Subtensor" not in op_names(f)

    def test_subtensor_merge(self):
        x = _x((20,))
        f = compiled([x], x[2:18][3:10])
        assert op_names(f).count("Subtensor") == 1
        v = np.arange(20.0)
        np.testing.assert_allclose(f(v), v[2:18][3:10])

    def test_useless_inc_subtensor_full_slice(self):
        # set_subtensor(y[all-full-slices], x) -> x
        x = _x((5,))
        y = _x((5,), "y")
        out = pt.set_subtensor(y[0:5], x)
        f = compiled([x, y], out)
        assert "IncSubtensor" not in op_names(f)
        v = np.arange(5.0)
        np.testing.assert_allclose(f(v, np.zeros(5)), v)

    def test_join_1(self):
        x = _x((5,))
        f = compiled([x], pt.join(0, x))
        assert "Join" not in op_names(f)

    def test_join_of_join(self):
        x = _x((5,))
        y = _x((5,), "y")
        z = _x((5,), "z")
        f = compiled([x, y, z], pt.join(0, pt.join(0, x, y), z))
        assert op_names(f).count("Join") == 1

    def test_subtensor_of_elemwise_lift(self):
        # indexing pushes through elemwise: only 3 elements get computed
        x = _x((100,))
        y = _x((100,), "y")
        f = compiled([x, y], (pt.exp(x) + y)[:3])
        # the subtensor should now be applied to x and y directly
        sub_nodes = [n for n in f.fgraph.apply_nodes
                     if type(n.op).__name__ == "Subtensor"]
        assert sub_nodes, "lift removed subtensor entirely?"
        for n in f.fgraph.apply_nodes:
            if isinstance(n.op, Elemwise):
                assert all(i.type.shape == (3,) for i in n.inputs
                           if i.type.ndim == 1)


class TestReduceRewriteStructure:
    def test_sum_sum(self):
        x = _x((3, 4))
        f = compiled([x], x.sum(axis=0).sum())
        assert op_names(f).count("CAReduce") == 1

    def test_sum_of_neg(self):
        x = _x((5,))
        f = compiled([x], (-x).sum())
        # neg pulled out of the reduction: one neg on a SCALAR
        assert "neg" in scalar_names(f)
        red_in = [n for n in f.fgraph.apply_nodes
                  if isinstance(n.op, CAReduce)][0].inputs[0]
        assert red_in.owner is None or not (
            isinstance(red_in.owner.op, Elemwise)
            and red_in.owner.op.scalar_op.name == "neg")

    def test_reduce_empty_axis(self):
        x = _x((3, 4))
        f = compiled([x], x.sum(axis=[]))
        assert "CAReduce" not in op_names(f)


class TestLinalgRewriteStructure:
    def test_inv_inv(self):
        from pytensor_tpu.tensor.linalg import inv

        x = _x((4, 4))
        f = compiled([x], inv(inv(x)))
        assert "MatrixInverse" not in "".join(op_names(f))

    def test_inv_as_solve(self):
        from pytensor_tpu.tensor.linalg import inv

        x = _x((4, 4))
        b = _x((4,), "b")
        f = compiled([x, b], pt.dot(inv(x), b))
        names = "".join(op_names(f))
        assert "Solve" in names and "Inverse" not in names

    def test_det_of_triangular(self):
        from pytensor_tpu.tensor.linalg import cholesky, det

        x = _x((4, 4))
        f = compiled([x], det(cholesky(x)))
        assert "Det" not in op_names(f)  # -> prod of diagonal

    def test_log_det_to_slogdet(self):
        # the stabilization targets log(ABS(det(A)))
        from pytensor_tpu.tensor.linalg import det

        x = _x((4, 4))
        f = compiled([x], pt.log(abs(det(x))))
        names = "".join(op_names(f))
        assert "SLogDet" in names
        A = np.diag([1.0, 2, 3, 4]) + 0.1
        np.testing.assert_allclose(
            float(np.asarray(f(A))),
            np.linalg.slogdet(A)[1], rtol=1e-12)

    def test_cholesky_of_diagonal(self):
        from pytensor_tpu.tensor.linalg import cholesky

        x = _x((4,))
        f = compiled([x], cholesky(pt.diag(x)))
        assert "Cholesky" not in op_names(f)  # -> diag(sqrt(x))
        v = np.array([4.0, 9.0, 16.0, 25.0])
        np.testing.assert_allclose(np.asarray(f(v)),
                                   np.diag(np.sqrt(v)))


class TestUselessRewriteStructure:
    def test_useless_cast(self):
        x = _x()
        f = compiled([x], pt.cast(x, "float64"))
        assert all("cast" not in s for s in scalar_names(f))

    def test_useless_switch(self):
        x = _x()
        y = _x(name="y")
        f = compiled([x, y], pt.switch(1, x, y))
        assert "switch" not in scalar_names(f)

    def test_useless_clip(self):
        x = _x()
        f = compiled([x], pt.clip(x, -np.inf, np.inf))
        assert "clip" not in scalar_names(f)

    def test_comparison_self(self):
        x = _x()
        f = compiled([x], pt.eq(x, x))
        assert scalar_names(f) in ([], ["second"]) or \
            "eq" not in scalar_names(f)

    def test_remove_proven_assert(self):
        from pytensor_tpu.raise_op import Assert

        x = _x((4,))
        out = Assert("always true")(x, pt.constant(True))
        f = compiled([x], out)
        assert "Assert" not in "".join(op_names(f))


class TestSubtensorLiftExtra:
    """Round-2 lift additions (reference subtensor_lift.py:553,1077,1198)."""

    def test_subtensor_of_reduce(self):
        x = _x((5, 6, 7))
        v = np.random.default_rng(0).standard_normal((5, 6, 7))
        f = compiled([x], pt.sum(x, axis=2)[1])
        order = [type(n.op).__name__ for n in f.fgraph.toposort()]
        # index happens BEFORE the reduction
        assert order.index("Subtensor") < order.index("CAReduce")
        np.testing.assert_allclose(np.asarray(f(v)), v.sum(2)[1])
        f2 = compiled([x], pt.max(x, axis=1)[2:4])
        np.testing.assert_allclose(np.asarray(f2(v)), v.max(1)[2:4])

    def test_subtensor_of_reduce_leading_slice_then_index(self):
        # regression (ADVICE r2): leading slice keeps axis 0, so the
        # remaining entries must skip it — on a SQUARE reduce output the
        # type guard cannot catch the axis mixup
        x = _x((2, 2, 4))
        v = np.random.default_rng(1).standard_normal((2, 2, 4))
        f = compiled([x], pt.sum(x, axis=2)[0:2, 1])
        np.testing.assert_allclose(np.asarray(f(v)), v.sum(2)[0:2, 1])
        # non-square as well, with a trailing slice
        y = _x((3, 5, 4), "y")
        w = np.random.default_rng(2).standard_normal((3, 5, 4))
        g = compiled([y], pt.sum(y, axis=2)[1:3, 2:5])
        np.testing.assert_allclose(np.asarray(g(w)), w.sum(2)[1:3, 2:5])

    def test_subtensor_of_reduce_shared_not_lifted(self):
        # the reduction has another consumer: lifting would recompute
        x = _x((5, 6))
        s = pt.sum(x, axis=1)
        f = compiled([x], s[1] + s.sum())
        order = [type(n.op).__name__ for n in f.fgraph.toposort()]
        assert order.count("CAReduce") == 2  # s and s.sum(), no extra

    def test_subtensor_of_join(self):
        a = _x((5, 3), "a")
        b = _x((5, 4), "b")
        av = np.arange(15.0).reshape(5, 3)
        bv = np.arange(20.0).reshape(5, 4)
        f = compiled([a, b], pt.join(1, a, b)[2])
        np.testing.assert_allclose(np.asarray(f(av, bv)),
                                   np.concatenate([av, bv], 1)[2])
        # pieces are indexed before joining
        join_node = [n for n in f.fgraph.apply_nodes
                     if type(n.op).__name__ == "Join"][0]
        assert all(i.type.ndim == 1 for i in join_node.inputs[1:])

    def test_subtensor_of_specify_shape(self):
        from pytensor_tpu.tensor.shape import specify_shape

        # slice index: the SpecifyShape stays (numpy clips slice bounds,
        # so x[2:5] of an unknown-dim x is NOT statically length-3
        # without the runtime check; reference subtensor_lift.py:1093
        # also bails on slices) but the numerics hold
        x = pt.tensor("x", dtype="float64", shape=(None,))
        f = compiled([x], specify_shape(x, (7,))[2:5])
        np.testing.assert_allclose(np.asarray(f(np.arange(7.0))),
                                   [2.0, 3.0, 4.0])
        # integer index: lifts through, re-specifying trailing dims
        xm = pt.tensor("xm", dtype="float64", shape=(None, None))
        f2 = compiled([xm], specify_shape(xm, (5, 7))[2])
        ops2 = [type(n.op).__name__ for n in f2.fgraph.apply_nodes]
        sub2 = [n for n in f2.fgraph.apply_nodes
                if type(n.op).__name__ == "Subtensor"]
        assert sub2 and sub2[0].inputs[0].owner is None  # reads xm directly
        assert "SpecifyShape" in ops2  # trailing dim 7 still checked
        np.testing.assert_allclose(
            np.asarray(f2(np.arange(35.0).reshape(5, 7))),
            np.arange(35.0).reshape(5, 7)[2])
        # scalar result: no SpecifyShape left at all
        xv = pt.tensor("xv", dtype="float64", shape=(None,))
        f3 = compiled([xv], specify_shape(xv, (7,))[3])
        assert "SpecifyShape" not in [type(n.op).__name__
                                      for n in f3.fgraph.apply_nodes]
        np.testing.assert_allclose(np.asarray(f3(np.arange(7.0))), 3.0)

    def test_extract_diag_of_eye(self):
        f = compiled([], pt.diagonal(pt.eye(5)))
        assert "ExtractDiag" not in [type(n.op).__name__
                                     for n in f.fgraph.apply_nodes]
        np.testing.assert_allclose(np.asarray(f()), np.ones(5))
        f2 = compiled([], pt.diagonal(pt.eye(5, 7, 0), offset=1))
        np.testing.assert_allclose(
            np.asarray(f2()), np.diagonal(np.eye(5, 7), 1))
