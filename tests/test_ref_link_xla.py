"""Reference tests/link/jax corpus ported onto the XLA dispatch.

Per-op lowering-corner tests from /root/reference/tests/link/jax/
(test_basic.py:36 compare_jax_and_py and the per-module files), run
against ``fgraph_to_jax`` through ``compare_xla_and_py``.  Where the
reference's JAX linker *fails* on dynamic shapes (slice bounds, arange,
split sizes), this backend compiles them via static_argnums
(link/xla/linker.py) — those cases are ported as positive tests.
"""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.tensor import extra_ops as pt_extra_ops
from tests.utils import compare_xla_and_py

floatX = "float64"
RNG = np.random.default_rng(213234)


# ---------------------------------------------------------------------------
# test_basic.py — linker semantics
# ---------------------------------------------------------------------------

class TestLinkerBasics:
    def test_fgraph_output_computed_once(self):
        """An output referenced twice lowers to one computation
        (reference test_jax_FunctionGraph_once)."""
        from pytensor_tpu.graph.fg import FunctionGraph
        from pytensor_tpu.link.xla.linker import fgraph_to_jax

        x = pt.dvector("x")
        y = pt.dvector("y")
        q = x + y
        out1 = q * 2
        out2 = q * 2  # same graph twice
        fg = FunctionGraph([x, y], [out1 + out2, out1 * out2], clone=True)
        fn = fgraph_to_jax(fg)
        res = fn(np.r_[1.0, 2.0], np.r_[2.0, 3.0])
        assert isinstance(res, tuple) and len(res) == 2
        np.testing.assert_allclose(np.asarray(res[0]), [12.0, 20.0])

    def test_shared(self):
        a = ptt.shared(np.array([1, 2, 3], dtype=floatX))
        f = ptt.function([], a)
        np.testing.assert_allclose(np.asarray(f()), a.get_value())
        f2 = ptt.function([], a * 2)
        np.testing.assert_allclose(np.asarray(f2()), a.get_value() * 2)
        a.set_value(np.array([3, 4, 5], dtype=floatX))
        np.testing.assert_allclose(np.asarray(f2()), [6.0, 8.0, 10.0])

    def test_shared_updates(self):
        a = ptt.shared(0)
        f = ptt.function([], a, updates={a: a + 1})
        res1, res2 = f(), f()
        assert int(res1) == 0 and int(res2) == 1
        assert int(a.get_value()) == 2
        a.set_value(5)
        assert int(f()) == 5 and int(f()) == 6
        assert int(a.get_value()) == 7

    def test_ifelse(self):
        from pytensor_tpu.ifelse import ifelse

        true_vals = np.r_[1, 2, 3]
        false_vals = np.r_[-1, -2, -3]
        x = ifelse(np.array(True), true_vals, false_vals)
        compare_xla_and_py([], [x], [])

        a = pt.dscalar("a")
        x = ifelse(a < 0.5, true_vals, false_vals)
        compare_xla_and_py([a], [x], [np.array(0.2)])

    def test_checkandraise(self):
        from pytensor_tpu.raise_op import assert_op

        p = pt.dscalar("p")
        res = assert_op(p, p < 1.0)
        f = ptt.function([p], res)
        assert float(f(0.5)) == 0.5
        with pytest.raises(Exception):
            np.asarray(f(2.0))

    def test_OpFromGraph(self):
        from pytensor_tpu.compile.builders import OpFromGraph

        x, y, z = pt.matrices("xyz")
        ofg_1 = OpFromGraph([x, y], [x + y], inline=False)
        ofg_2 = OpFromGraph([x, y], [x * y, x - y], inline=False)
        o1, o2 = ofg_2(y, z)
        out = ofg_1(x, o1) + o2
        xv = np.ones((2, 2), dtype="float32")
        yv = np.ones((2, 2), dtype="float32") * 3
        zv = np.ones((2, 2), dtype="float32") * 5
        compare_xla_and_py([x, y, z], [out], [xv, yv, zv])


# ---------------------------------------------------------------------------
# test_math.py / test_blas.py / test_sort.py / test_einsum.py
# ---------------------------------------------------------------------------

class TestMathBlasSortEinsum:
    def test_max_and_argmax(self):
        from pytensor_tpu.tensor.math import Argmax, Max

        x = pt.dvector("x")
        mx = Max([0])(x)
        amx = Argmax([0])(x)
        compare_xla_and_py([x], [mx * amx], [np.r_[1.0, 2.0]])

    def test_dot_chain(self):
        y = pt.dvector("y")
        x = pt.dvector("x")
        A = pt.dmatrix("A")
        alpha = pt.dscalar("alpha")
        beta = pt.dscalar("beta")
        out = y.dot(alpha * A).dot(x) + beta * y
        compare_xla_and_py(
            [y, x, A, alpha, beta], [out],
            [np.r_[1.0, 2.0], np.r_[3.0, 4.0],
             np.asarray([[1.0, 2.0], [3.0, 4.0]]),
             np.array(3.0), np.array(5.0)])

    def test_maximum_and_reduce_max(self):
        y = pt.dvector("y")
        x = pt.dvector("x")
        compare_xla_and_py([y, x], [pt.maximum(y, x)],
                           [np.r_[1.0, 2.0], np.r_[3.0, 0.0]])
        compare_xla_and_py([y], [pt.max(y)], [np.r_[1.0, 2.0]])

    def test_batched_dot(self):
        from pytensor_tpu.tensor.blas import BatchedDot

        a = pt.tensor3("a", dtype=floatX)
        b = pt.tensor3("b", dtype=floatX)
        av = np.linspace(-1, 1, 10 * 5 * 3).astype(floatX).reshape((10, 5, 3))
        bv = np.linspace(1, -1, 10 * 3 * 2).astype(floatX).reshape((10, 3, 2))
        out = BatchedDot()(a, b)
        compare_xla_and_py([a, b], [out], [av, bv])
        # batch-dim mismatch raises (reference: TypeError at runtime)
        f = ptt.function([a, b], out)
        with pytest.raises(Exception):
            np.asarray(f(av[:-1], bv)[0] if isinstance(f(av[:-1], bv), list)
                       else f(av[:-1], bv))

    @pytest.mark.parametrize("axis", [None, -1])
    @pytest.mark.parametrize("func_name", ["sort", "argsort"])
    def test_sort(self, func_name, axis):
        from pytensor_tpu.tensor.sort import argsort, sort

        func = {"sort": sort, "argsort": argsort}[func_name]
        x = pt.matrix("x", shape=(2, 2), dtype="float64")
        out = func(x, axis=axis)
        compare_xla_and_py([x], [out], [np.array([[1.0, 4.0], [5.0, 2.0]])])

    def test_einsum(self):
        x = np.random.default_rng(0).random((3, 5))
        y = np.random.default_rng(1).random((5, 2))
        z = np.random.default_rng(2).random((2, 4))
        x_pt = pt.tensor("x", shape=(3, 5), dtype=floatX)
        y_pt = pt.tensor("y", shape=(5, 2), dtype=floatX)
        z_pt = pt.tensor("z", shape=(2, 4), dtype=floatX)
        out = pt.einsum("ij, jk, kl -> il", x_pt, y_pt, z_pt)
        compare_xla_and_py([x_pt, y_pt, z_pt], [out], [x, y, z])

    def test_ellipsis_einsum(self):
        x = np.random.default_rng(3).random((2, 5))
        y = np.random.default_rng(4).random((2, 5))
        x_pt = pt.tensor("x", shape=x.shape, dtype=floatX)
        y_pt = pt.tensor("y", shape=y.shape, dtype=floatX)
        out = pt.einsum("...i,...i->...", x_pt, y_pt)
        compare_xla_and_py([x_pt, y_pt], [out], [x, y])

    def test_blockwise_matmul(self):
        from pytensor_tpu.tensor.blockwise import Blockwise

        a = pt.tensor("a", shape=(2, 3, 5), dtype=floatX)
        b = pt.tensor("b", shape=(2, 5, 3), dtype=floatX)
        vals = [RNG.normal(size=(2, 3, 5)), RNG.normal(size=(2, 5, 3))]
        out = pt.matmul(a, b)
        assert isinstance(out.owner.op, Blockwise)
        compare_xla_and_py([a, b], [out], vals)


# ---------------------------------------------------------------------------
# test_elemwise.py
# ---------------------------------------------------------------------------

class TestElemwise:
    def test_dimshuffle(self):
        a_pt = pt.dmatrix("a")
        v = np.c_[[1.0, 2.0], [3.0, 4.0]]
        compare_xla_and_py([a_pt], [a_pt.T], [v])
        compare_xla_and_py([a_pt], [a_pt.dimshuffle([0, 1, "x"])], [v])
        b_pt = pt.tensor(dtype=floatX, shape=(None, 1), name="b")
        compare_xla_and_py([b_pt], [b_pt.dimshuffle((0,))],
                           [np.c_[[1.0, 2.0, 3.0, 4.0]]])

    def test_careduce(self):
        a = pt.dvector("a")
        compare_xla_and_py([a], [pt.sum(a, axis=None)], [np.r_[1.0, 2.0, 3.0]])
        m = pt.dmatrix("m")
        mv = np.c_[[1.0, 2.0, 3.0], [1.0, 2.0, 3.0]]
        compare_xla_and_py([m], [pt.sum(m, axis=0)], [mv])
        compare_xla_and_py([m], [pt.sum(m, axis=1)], [mv])
        compare_xla_and_py([m], [pt.prod(m, axis=0)], [mv])
        compare_xla_and_py([m], [pt.all(m)], [mv])

    @pytest.mark.parametrize("axis", [None, 0, 1])
    def test_softmax(self, axis):
        from pytensor_tpu.tensor.special import log_softmax, softmax

        x = pt.dmatrix("x")
        v = np.arange(6, dtype=floatX).reshape(2, 3)
        compare_xla_and_py([x], [softmax(x, axis=axis)], [v])
        compare_xla_and_py([x], [log_softmax(x, axis=axis)], [v])

    def test_multiple_input_multiply(self):
        x, y, z = pt.dvectors("xyz")
        out = pt.mul(x, y, z)
        compare_xla_and_py([x, y, z], [out],
                           [np.r_[1.5], np.r_[2.5], np.r_[3.5]])

    @pytest.mark.parametrize("op", [pt.add, pt.mul], ids=["add", "mul"])
    def test_variadic_broadcast(self, op):
        x = pt.tensor("x", shape=(3, 4), dtype=floatX)
        y = pt.tensor("y", shape=(1, 4), dtype=floatX)
        z = pt.tensor("z", shape=(3, 1), dtype=floatX)
        out = op(x, y, z)
        assert len(out.owner.inputs) == 3
        vals = [RNG.normal(size=s) for s in [(3, 4), (1, 4), (3, 1)]]
        compare_xla_and_py([x, y, z], [out], vals)

    @pytest.mark.parametrize("dtype", ["bool", "int8"])
    def test_variadic_add_dtype(self, dtype):
        x = pt.tensor("x", shape=(3,), dtype=dtype)
        y = pt.tensor("y", shape=(3,), dtype=dtype)
        z = pt.tensor("z", shape=(3,), dtype=dtype)
        out = pt.add(x, y, z)
        vals = (np.array([True, False, True]) if dtype == "bool"
                else np.array([1, 2, 3], dtype=dtype))
        compare_xla_and_py([x, y, z], [out], [vals, vals, vals])


# ---------------------------------------------------------------------------
# test_shape.py
# ---------------------------------------------------------------------------

class TestShape:
    def test_shape_ops(self):
        from pytensor_tpu.tensor.shape import Shape, Shape_i

        x_np = np.zeros((20, 3))
        compare_xla_and_py([], [Shape()(pt.as_tensor_variable(x_np))], [])
        compare_xla_and_py([], [Shape_i(1)(pt.as_tensor_variable(x_np))], [])

    def test_specify_shape(self):
        in_pt = pt.dmatrix("in")
        x = pt.specify_shape(in_pt, (4, None))
        compare_xla_and_py([in_pt], [x], [np.ones((4, 5))])

        in2 = pt.dmatrix("in")
        shp = pt.dmatrix("shape")
        x = pt.specify_shape(in2, shp.shape)
        compare_xla_and_py([in2, shp], [x], [np.ones((4, 5)), np.ones((4, 5))])

    def test_reshape_constant(self):
        a = pt.dvector("a")
        compare_xla_and_py([a], [pt.reshape(a, (2, 2))],
                           [np.r_[1.0, 2.0, 3.0, 4.0]])

    def test_reshape_concrete_shape(self):
        a = pt.dvector("a")
        compare_xla_and_py([a], [pt.reshape(a, a.shape)],
                           [np.r_[1.0, 2.0, 3.0, 4.0]])
        compare_xla_and_py([a], [pt.reshape(a, (a.shape[0] // 2,
                                                a.shape[0] // 2))],
                           [np.r_[1.0, 2.0, 3.0, 4.0]])

    def test_reshape_shape_graph_input(self):
        """Reference JAX xfails this (dynamic reshape); ours compiles the
        shape input as a static argument (link/xla/linker.py
        static_argnums)."""
        a = pt.dvector("a")
        b = pt.iscalar("b")
        x = pt.reshape(a, (b, b))
        compare_xla_and_py([a, b], [x], [np.r_[1.0, 2.0, 3.0, 4.0],
                                         np.array(2, dtype="int32")])

    def test_compile_ops(self):
        from pytensor_tpu.compile.ops import DeepCopyOp, ViewOp

        compare_xla_and_py([], [DeepCopyOp()(pt.as_tensor_variable(1.1))], [])
        x_np = np.zeros((20, 1, 1))
        compare_xla_and_py([], [ViewOp()(pt.as_tensor_variable(x_np))], [])


# ---------------------------------------------------------------------------
# test_tensor_basic.py
# ---------------------------------------------------------------------------

class TestTensorBasics:
    def test_alloc(self):
        res = compare_xla_and_py([], [pt.alloc(0.0, 2, 3)], [])
        assert np.asarray(res[0]).shape == (2, 3)
        compare_xla_and_py([], [pt.alloc(1.1, 2, 3)], [])

        a = pt.dscalar("a")
        compare_xla_and_py([a], [pt.alloc(a, 20)], [np.array(10.0)])
        av = pt.dvector("av")
        compare_xla_and_py([av], [pt.alloc(av, 20, 10)], [np.ones(10)])

    def test_alloc_empty(self):
        from pytensor_tpu.tensor.basic import AllocEmpty

        x = AllocEmpty("float32")(2, 3)
        f = ptt.function([], x)
        r = np.asarray(f())
        assert r.shape == (2, 3) and r.dtype == np.float32

    def test_make_vector(self):
        compare_xla_and_py([], [pt.make_vector(1, 2, 3)], [])

    def test_arange(self):
        compare_xla_and_py([], [pt.arange(1, 10, 2)], [])

    def test_arange_of_shape(self):
        x = pt.dvector("x")
        compare_xla_and_py([x], [pt.arange(1, x.shape[-1], 2)],
                           [np.zeros((5,))])

    def test_arange_nonconcrete_compiles(self):
        """Reference JAX raises NotImplementedError; ours lowers the
        bound as a static argument and recompiles per value."""
        a = pt.iscalar("a")
        out = pt.arange(a)
        f = ptt.function([a], out)
        np.testing.assert_array_equal(np.asarray(f(np.int32(4))),
                                      np.arange(4))
        np.testing.assert_array_equal(np.asarray(f(np.int32(7))),
                                      np.arange(7))

    def test_arange_shape_bound_over_int8(self):
        x = pt.dvector("x")
        out = pt.arange(x.shape[-1])
        res = compare_xla_and_py([x], [out], [np.zeros(200)])
        assert np.asarray(res[0])[-1] == 199

    def test_join(self):
        a = pt.dmatrix("a")
        b = pt.dmatrix("b")
        x = pt.join(0, a, b)
        compare_xla_and_py([a, b], [x], [np.c_[[1.0, 2.0, 3.0]],
                                         np.c_[[4.0, 5.0, 6.0]]])
        compare_xla_and_py([a, b], [x], [np.c_[[1.0, 2.0, 3.0]],
                                         np.c_[[4.0, 5.0]]])
        y = pt.join(1, a, b)
        compare_xla_and_py([a, b], [y], [np.c_[[1.0, 2.0, 3.0]],
                                         np.c_[[4.0, 5.0, 6.0]]])
        compare_xla_and_py([a, b], [y], [np.c_[[1.0, 2.0], [3.0, 4.0]],
                                         np.c_[[5.0, 6.0]]])

    def test_split_basic(self):
        a = pt.dmatrix("a")
        splits = pt.split(a, splits_size=[1, 2, 3], n_splits=3, axis=0)
        compare_xla_and_py([a], splits, [np.zeros((6, 4))])

        a2 = pt.matrix("a2", shape=(6, None), dtype=floatX)
        splits2 = pt.split(a2, splits_size=[2, a2.shape[0] - 2],
                           n_splits=2, axis=0)
        compare_xla_and_py([a2], splits2, [np.zeros((6, 4))])

    def test_split_symbolic_axis1(self):
        """Reference JAX warns + ConcretizationTypeError; ours lowers the
        symbolic split sizes statically."""
        a = pt.matrix("a", shape=(6, None), dtype=floatX)
        splits = pt.split(a, splits_size=[2, a.shape[1] - 2],
                          n_splits=2, axis=1)
        f = ptt.function([a], splits)
        r = f(np.zeros((6, 4), dtype=floatX))
        assert [np.asarray(t).shape for t in r] == [(6, 2), (6, 2)]

    def test_split_runtime_errors(self):
        a = pt.dmatrix("a")
        with pytest.raises(ValueError):
            pt.split(a, splits_size=[2, 2, 2], n_splits=2, axis=0)
        splits = pt.split(a, splits_size=[2, 4], n_splits=2, axis=0)
        f = ptt.function([a], splits)
        with pytest.raises(ValueError):
            [np.asarray(t) for t in f(np.zeros((7, 4)))]

    def test_eye_tri(self):
        compare_xla_and_py([], [pt.eye(3)], [])
        compare_xla_and_py([], [pt.tri(10, 10, 0)], [])


# ---------------------------------------------------------------------------
# test_subtensor.py
# ---------------------------------------------------------------------------

class TestSubtensorLowering:
    shape = (3, 4, 5)

    def _x(self):
        x_pt = pt.tensor("x", shape=self.shape, dtype="int64")
        x_np = np.arange(np.prod(self.shape)).reshape(self.shape)
        return x_pt, x_np

    def test_subtensor_constant(self):
        from pytensor_tpu.tensor.subtensor import (
            AdvancedSubtensor,
            Subtensor,
            advanced_subtensor1,
        )

        x_pt, x_np = self._x()
        for out in (x_pt[1, 2, 0], x_pt[1:, 1, :], x_pt[:2, 1, :],
                    x_pt[1:2, 1, :], x_pt[::-1]):
            compare_xla_and_py([x_pt], [out], [x_np])

        out = advanced_subtensor1(x_pt, [1, 2])
        compare_xla_and_py([x_pt], [out], [x_np])
        for out in (x_pt[[1, 2], [2, 3]], x_pt[[1, 2], :],
                    x_pt[[1, 2], :, [3, 4]]):
            compare_xla_and_py([x_pt], [out], [x_np])

        # constant boolean mask
        mask = np.random.default_rng(0).binomial(
            1, 0.5, size=self.shape).astype(bool)
        compare_xla_and_py([x_pt], [x_pt[mask]], [x_np])

    def test_subtensor_dynamic_bound(self):
        """Reference JAX xfails (`a` must be static); ours compiles via
        static_argnums."""
        a = pt.iscalar("a")
        x = pt.arange(3)
        f = ptt.function([a], x[:a])
        np.testing.assert_array_equal(np.asarray(f(np.int32(1))), [0])
        np.testing.assert_array_equal(np.asarray(f(np.int32(3))), [0, 1, 2])

    def test_dynamic_boolean_mask_raises(self):
        x_pt = pt.vector("x", dtype="float64")
        out = x_pt[x_pt < 0]
        with pytest.raises(NotImplementedError):
            f = ptt.function([x_pt], out)
            np.asarray(f(np.arange(-5.0, 5.0)))

    def test_boolean_mask_sum_reexpressible(self):
        x_pt = pt.dmatrix("x")
        out = x_pt[x_pt < 0].sum()
        compare_xla_and_py([x_pt], [out],
                           [np.arange(25).reshape(5, 5).astype(floatX) - 12])

    def test_inc_subtensor_basic(self):
        from pytensor_tpu.tensor.subtensor import (
            IncSubtensor,
            inc_subtensor,
            set_subtensor,
        )

        x_pt = pt.constant(
            np.arange(3 * 4 * 5).reshape(self.shape).astype(floatX))
        st = pt.as_tensor_variable(np.array(-10.0, dtype=floatX))
        out = set_subtensor(x_pt[1, 2, 3], st)
        assert isinstance(out.owner.op, IncSubtensor)
        compare_xla_and_py([], [out], [])

        stv = pt.as_tensor_variable(np.r_[-1.0, 0.0].astype(floatX))
        for out in (set_subtensor(x_pt[:2, 0, 0], stv),
                    set_subtensor(x_pt[0, 1:3, 0], stv),
                    inc_subtensor(x_pt[1, 2, 3], st),
                    inc_subtensor(x_pt[:2, 0, 0], stv)):
            compare_xla_and_py([], [out], [])

    def test_inc_subtensor_advanced(self):
        from pytensor_tpu.tensor.subtensor import (
            AdvancedIncSubtensor,
            AdvancedIncSubtensor1,
            inc_subtensor,
            set_subtensor,
        )

        x_np = RNG.uniform(-1, 1, size=self.shape).astype(floatX)
        x_pt = pt.constant(
            np.arange(3 * 4 * 5).reshape(self.shape).astype(floatX))
        st3 = pt.as_tensor_variable(
            RNG.uniform(-1, 1, size=(2, 4, 5)).astype(floatX))
        stv = pt.as_tensor_variable(np.r_[-1.0, 0.0].astype(floatX))
        mask = pt.constant(x_np > 0)
        cases = [
            set_subtensor(x_pt[np.r_[0, 2]], st3),
            set_subtensor(x_pt[[0, 2], 0, 0], stv),
            set_subtensor(x_pt[mask], 0.0),
            inc_subtensor(x_pt[np.r_[0, 2]], st3),
            inc_subtensor(x_pt[[0, 2], 0, 0], stv),
            set_subtensor(x_pt[mask], 1.0),
        ]
        for out in cases:
            # the vector-index form specializes to AdvancedIncSubtensor1
            # at graph build (the reference only specializes in rewrites)
            assert isinstance(out.owner.op,
                              (AdvancedIncSubtensor, AdvancedIncSubtensor1))
            compare_xla_and_py([], [out], [])

        stm = pt.as_tensor_variable(x_np[[0, 2], 0, :3])
        for fn in (set_subtensor, inc_subtensor):
            out = fn(x_pt[[0, 2], 0, :3], stm)
            compare_xla_and_py([], [out], [])

    def test_boolean_set_or_inc_reexpressible(self):
        from pytensor_tpu.tensor.subtensor import (
            inc_subtensor,
            set_subtensor,
        )

        x_np = RNG.uniform(-1, 1, size=(4, 5)).astype(floatX)
        x_pt = pt.dmatrix("x")
        mask = x_pt > 0
        compare_xla_and_py([x_pt], [set_subtensor(x_pt[mask], 0.0)], [x_np])
        compare_xla_and_py([x_pt], [inc_subtensor(x_pt[mask], 1.0)], [x_np])

    @pytest.mark.parametrize("mode", ["inc", "set"])
    def test_advanced_inc_subtensor1_runtime_broadcast(self, mode):
        from pytensor_tpu.tensor.subtensor import (
            advanced_inc_subtensor1,
            advanced_set_subtensor1,
        )

        func = {"inc": advanced_inc_subtensor1,
                "set": advanced_set_subtensor1}[mode]
        y = pt.matrix("y", dtype="float64")
        x = pt.zeros((10, 5))
        idxs = np.repeat(np.arange(10), 2)
        out = func(x, y, idxs)
        f = ptt.function([y], out)
        np.asarray(f(np.ones((20, 5))))  # correctly sized
        with pytest.raises(ValueError, match="[Rr]untime broadcast"):
            np.asarray(f(np.ones((1, 5))))
        with pytest.raises(ValueError, match="[Rr]untime broadcast"):
            np.asarray(f(np.ones((20, 1))))


# ---------------------------------------------------------------------------
# test_scalar.py
# ---------------------------------------------------------------------------

class TestScalarLowering:
    def test_second(self):
        a0 = pt.dscalar("a0")
        b = pt.dscalar("b")
        compare_xla_and_py([a0, b], [pt.second(a0, b)],
                           [np.array(10.0), np.array(5.0)])
        a1 = pt.dvector("a1")
        compare_xla_and_py([a1, b], [pt.second(a1, b)],
                           [np.zeros(5), np.array(5.0)])

    def test_second_mixed_shape(self):
        a2 = pt.matrix("a2", shape=(1, None), dtype="float64")
        b2 = pt.matrix("b2", shape=(None, 1), dtype="int32")
        out = pt.second(a2, b2)
        compare_xla_and_py(
            [a2, b2], [out],
            [np.zeros((1, 3)), np.ones((5, 1), dtype="int32")])

    def test_identity(self):
        from pytensor_tpu.scalar.basic import identity
        from pytensor_tpu.tensor.elemwise import Elemwise

        a = pt.dscalar("a")
        out = Elemwise(identity)(a)
        compare_xla_and_py([a], [out], [np.array(10.0)])

    @pytest.mark.parametrize(
        "fn_name,args",
        [
            ("erf", [1.0]), ("erfc", [1.0]), ("erfinv", [0.95]),
            ("erfcx", [0.7]), ("erfcinv", [0.7]),
            ("psi", [3.0]),
        ],
    )
    def test_special_scalars(self, fn_name, args):
        fn = getattr(pt, fn_name)
        x = pt.dscalar("x")
        compare_xla_and_py([x], [fn(x)], [np.array(args[0])],
                           rtol=1e-6)

    def test_ndtri_exp(self):
        x = pt.dscalar("x")
        compare_xla_and_py([x], [pt.ndtri_exp(x)], [np.array(-4.0)],
                           rtol=1e-6)

    def test_bessel_lowering(self):
        iv_v = pt.dscalar("v")
        iv_x = pt.dscalar("x")
        compare_xla_and_py([iv_v, iv_x], [pt.iv(iv_v, iv_x)],
                           [np.array(0.3), np.array(0.7)], rtol=1e-6)
        compare_xla_and_py([iv_v, iv_x], [pt.kve(iv_v, iv_x)],
                           [np.array(-2.5), np.array(2.0)], rtol=1e-6)

    def test_betaincinv(self):
        a = pt.dvector("a")
        b = pt.dvector("b")
        x = pt.dvector("x")
        compare_xla_and_py(
            [a, b, x], [pt.betaincinv(a, b, x)],
            [np.array([5.5, 7.0]), np.array([5.5, 7.0]),
             np.array([0.25, 0.7])], rtol=1e-6)

    def test_gammainc_inverses(self):
        k = pt.dvector("k")
        x = pt.dvector("x")
        vals = [np.array([5.5, 7.0]), np.array([0.25, 0.7])]
        compare_xla_and_py([k, x], [pt.gammaincinv(k, x)], vals, rtol=1e-6)
        compare_xla_and_py([k, x], [pt.gammainccinv(k, x)], vals, rtol=1e-6)

    def test_tri_gamma_and_polygamma(self):
        x = pt.dvector("x")
        compare_xla_and_py([x], [pt.tri_gamma(x)],
                           [np.array([3.0, 5.0])], rtol=1e-6)
        n = pt.vector("n", dtype="int32")
        xf = pt.vector("xf", dtype="float64")
        compare_xla_and_py(
            [n, xf], [pt.polygamma(n, xf)],
            [np.array([0, 1, 2], dtype="int32"),
             np.array([0.5, 0.9, 2.5])], rtol=1e-6)

    def test_log1mexp(self):
        x = pt.dvector("x")
        compare_xla_and_py([x], [pt.log1mexp(x)],
                           [np.r_[-1.0, -0.75, -0.5, -0.25]])

    def test_nnet(self):
        x = pt.dvector("x")
        v = np.r_[1.0, 2.0]
        compare_xla_and_py([x], [pt.sigmoid(x)], [v])
        compare_xla_and_py([x], [pt.softplus(x)], [v])

    def test_variadic_scalar_mix(self):
        mu = pt.dvector("mu")
        tau = pt.dvector("tau")
        mu_v = np.r_[0.1, 1.1]
        tau_v = np.r_[1.0, 2.0]
        compare_xla_and_py([mu, tau], [-tau * mu], [mu_v, tau_v])
        compare_xla_and_py([mu, tau], [-tau * (tau - mu) ** 2],
                           [mu_v, tau_v])

    @pytest.mark.parametrize("expr", ["add", "mul", "div", "mod"])
    def test_scalar_shape_arith(self, expr):
        x = pt.dmatrix("x")
        s0, s1 = x.shape[0], x.shape[1]
        size = {"add": s0 + s0 + s1, "mul": s0 * s0 * s1,
                "div": s0 // s1, "mod": s0 % s1}[expr]
        out = pt.ones(size)
        compare_xla_and_py([x], [out], [np.ones((12, 3))])

    def test_multioutput(self):
        x = pt.dvector("x")
        y = pt.dvector("y")
        w = pt.cosh(x ** 2 + y / 3.0)
        v = pt.cosh(x / 3.0 + y ** 2)
        compare_xla_and_py([x, y], [w, v], [np.r_[1.0, 2.0], np.r_[3.0, 4.0]])

    def test_logp_switch_graph(self):
        mu = pt.dvector("mu")
        tau = pt.dvector("tau")
        sigma = pt.dvector("sigma")
        value = pt.dvector("value")
        logp = (-tau * (value - mu) ** 2 + pt.log(tau / np.pi / 2.0)) / 2.0
        alltrue = pt.all(pt.all(1 * (sigma > 0)))
        normal_logp = pt.switch(alltrue, logp, -np.inf)
        compare_xla_and_py(
            [mu, tau, sigma, value], [normal_logp],
            [np.r_[0.0, 0.0], np.r_[1.0, 1.0], np.r_[1.0, 1.0],
             np.r_[0.1, -10.0]])


# ---------------------------------------------------------------------------
# test_extra_ops.py
# ---------------------------------------------------------------------------

class TestExtraOps:
    def test_extra_ops(self):
        a = pt.dmatrix("a")
        a_test = np.arange(6, dtype=floatX).reshape((3, 2))
        compare_xla_and_py([a], [pt_extra_ops.cumsum(a, axis=0)], [a_test])
        compare_xla_and_py([a], [pt_extra_ops.cumprod(a, axis=1)], [a_test])
        compare_xla_and_py([a], [pt_extra_ops.diff(a, n=2, axis=1)], [a_test])
        compare_xla_and_py([a], [pt_extra_ops.repeat(a, (3, 3), axis=1)],
                           [a_test])
        c = pt.as_tensor_variable(5.0)
        compare_xla_and_py([a], [pt_extra_ops.fill_diagonal(a, c)], [a_test])

    def test_unravel_index(self):
        indices = np.arange(np.prod((3, 4)))
        out = pt_extra_ops.unravel_index(indices, (3, 4), order="C")
        compare_xla_and_py([], list(out), [])

    def test_searchsorted(self):
        from pytensor_tpu.tensor.sort import argsort

        a = pt.dmatrix("a")
        a_test = np.arange(6, dtype=floatX).reshape((3, 2))
        v = pt.as_tensor_variable(3.5)
        srt = a.ravel()[argsort(a.ravel())]
        out = pt_extra_ops.searchsorted(srt, v)
        compare_xla_and_py([a], [out], [a_test])

    def test_bartlett_static(self):
        out = pt_extra_ops.bartlett(pt.as_tensor_variable(5))
        compare_xla_and_py([], [out], [])


# ---------------------------------------------------------------------------
# test_pad.py — grad through every pad mode on the XLA path
# ---------------------------------------------------------------------------

class TestPadGrad:
    @pytest.mark.parametrize(
        "mode", ["constant", "edge", "linear_ramp", "mean", "maximum",
                 "minimum", "wrap", "symmetric", "reflect"])
    def test_pad_grad(self, mode):
        from pytensor_tpu.tensor.pad import pad

        x_pt = pt.tensor("x", shape=(8, 8), dtype=floatX)
        x = RNG.normal(size=(8, 8))
        res = pad(x_pt, mode=mode, pad_width=[[1, 1], [2, 2]])
        grad_x = ptt.grad(res.sum(), x_pt)
        compare_xla_and_py([x_pt], [grad_x], [x], rtol=1e-6)
