"""Reference scalar API surface: autocasting, output-type-preference
callables, subclassable Unary/BinaryScalarOp, Composite.

Reference: /root/reference/pytensor/scalar/basic.py:94 (NumpyAutocaster),
:1023-1140 (preference callables), :1155 (ScalarOp ctor contract).
"""

import pickle

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.scalar as ps
from pytensor_tpu import gradient as G
from pytensor_tpu.config import config
from pytensor_tpu.tensor import dscalar, dvector, fvector
from pytensor_tpu.tensor.elemwise import Elemwise


class TestAutocast:
    def test_int_literal_smallest_dtype(self):
        assert ptt.tensor.constant(7).dtype == "int8"
        assert ptt.tensor.constant(300).dtype == "int16"
        assert ptt.tensor.constant(2**20).dtype == "int32"
        assert ptt.tensor.constant(2**40).dtype == "int64"

    def test_float_literal_value_dependent(self):
        # 1.5 is exactly representable in float32; 1.1 is not.  Under
        # floatX=float32 the custom policy downcasts any float literal,
        # so pin float64 to see the value-dependent choice.
        with config.change_flags(floatX="float64"):
            assert ptt.tensor.constant(1.5).dtype == "float32"
            assert ptt.tensor.constant(1.1).dtype == "float64"
        with config.change_flags(floatX="float32"):
            assert ptt.tensor.constant(1.1).dtype == "float32"

    def test_autocast_float_as(self):
        with ps.autocast_float_as("float64"):
            assert ptt.tensor.constant(1.5).dtype == "float64"
        assert ptt.tensor.constant(1.5).dtype == "float32"
        with ps.autocast_float_as("float32"):
            # float32 only: even non-representable values land there
            assert ptt.tensor.constant(1.1).dtype == "float32"

    def test_fvector_plus_literal(self):
        # the reference's doc example: downcasting inside the context
        x = fvector("x")
        with config.change_flags(floatX="float64"):
            with ps.autocast_float_as("float32"):
                assert (x + 1.1).dtype == "float32"
            assert (x + 1.1).dtype == "float64"

    def test_numpy_scalars_keep_dtype(self):
        assert ptt.tensor.constant(np.float64(1.5)).dtype == "float64"
        assert ptt.tensor.constant(np.int32(7)).dtype == "int32"

    def test_numpy_floatX_policy(self):
        with config.change_flags(cast_policy="numpy+floatX",
                                 floatX="float32"):
            assert ptt.tensor.constant(1.1).dtype == "float32"
            assert ptt.tensor.constant(7).dtype == "int64"

    def test_convert(self):
        assert ps.convert(7).dtype == np.dtype("int8")
        assert ps.convert(1.5).dtype == np.dtype("float32")
        assert ps.convert(7, dtype="float64").dtype == np.dtype("float64")


class TestScalarTypes:
    def test_instances_and_call(self):
        assert ps.int8.dtype == "int8" and ps.int8.ndim == 0
        v = ps.float64("v")
        assert v.type.dtype == "float64" and v.type.ndim == 0

    def test_usable_as_dict_keys(self):
        d = {ps.int8: "a", ps.float32: "b"}
        assert d[ps.get_scalar_type("int8")] == "a"

    def test_scalar_type_factory(self):
        t = ps.ScalarType("float32")
        assert t.dtype == "float32" and t.ndim == 0


class TestPreferenceCallables:
    def test_upgrade_to_float(self):
        assert ps.upgrade_to_float(ps.int8)[0].dtype == "float32"
        assert ps.upgrade_to_float(ps.int64)[0].dtype == "float64"
        assert ps.upgrade_to_float(ps.float32)[0].dtype == "float32"

    def test_upcast_out(self):
        assert ps.upcast_out(ps.int8, ps.float32)[0].dtype == "float32"
        assert ps.upcast_out("int32", "int8")[0].dtype == "int32"

    def test_same_out_family(self):
        assert ps.same_out(ps.int16)[0].dtype == "int16"
        assert ps.same_out_min8(ps.bool)[0].dtype == "int8"
        with pytest.raises(TypeError):
            ps.same_out_nobool(ps.bool)
        with pytest.raises(TypeError):
            ps.same_out_float_only(ps.int32)
        with pytest.raises(TypeError):
            ps.same_out_nocomplex(ps.complex64)

    def test_complex_guards(self):
        with pytest.raises(TypeError):
            ps.upcast_out_no_complex(ps.complex128)
        with pytest.raises(TypeError):
            ps.upgrade_to_float_no_complex(ps.complex64)

    def test_fixed_out(self):
        assert ps.int_out(ps.int8)[0].dtype == "int64"
        assert ps.float_out(ps.int8)[0].dtype == "float64"
        assert ps.upgrade_to_float64(ps.float32)[0].dtype == "float64"

    def test_real_out(self):
        assert ps.real_out(ps.complex64)[0].dtype == "float32"
        assert ps.real_out(ps.complex128)[0].dtype == "float64"
        assert ps.real_out(ps.float32)[0].dtype == "float32"

    def test_specific_out(self):
        pref = ps.specific_out("int32")
        assert pref(ps.float64)[0].dtype == "int32"


class _Triple(ps.UnaryScalarOp):
    def impl(self, x):
        return 3.0 * x

    def grad(self, inputs, gz):
        return [gz[0] * 3.0]


class _PowDiff(ps.BinaryScalarOp):
    """x**2 - y, with a native jax lowering and L_op-style grads."""

    def impl(self, x, y):
        return x * x - y

    def jax_impl(self, x, y):
        import jax.numpy as jnp

        return jnp.square(x) - y

    def L_op(self, inputs, outputs, gz):
        x, y = inputs
        return [gz[0] * 2 * x, -gz[0]]


class TestCustomScalarOps:
    def test_unary_host_callback_path(self):
        triple = _Triple(ps.upgrade_to_float, name="triple")
        x = dvector("x")
        y = Elemwise(triple)(x)
        assert y.type.dtype == "float64"
        np.testing.assert_allclose(
            ptt.function([x], y)(np.array([1.0, 2.0])), [3.0, 6.0])

    def test_unary_grad_reference_signature(self):
        triple = _Triple(ps.upgrade_to_float, name="triple")
        x = dvector("x")
        y = Elemwise(triple)(x)
        g = G.grad(y.sum(), x)
        np.testing.assert_allclose(
            ptt.function([x], g)(np.array([1.0, 2.0])), [3.0, 3.0])

    def test_binary_native_lowering_and_L_op(self):
        op = _PowDiff(ps.upgrade_to_float, name="powdiff")
        x, y = dvector("x"), dvector("y")
        out = Elemwise(op)(x, y)
        f = ptt.function([x, y], out)
        np.testing.assert_allclose(f(np.array([2.0, 3.0]),
                                     np.array([1.0, 1.0])), [3.0, 8.0])
        gx, gy = G.grad(out.sum(), [x, y])
        fg = ptt.function([x, y], [gx, gy])
        rx, ry = fg(np.array([2.0, 3.0]), np.array([1.0, 1.0]))
        np.testing.assert_allclose(rx, [4.0, 6.0])
        np.testing.assert_allclose(ry, [-1.0, -1.0])

    def test_int_dtype_preference(self):
        triple = _Triple(ps.same_out, name="triple_same")
        x = ptt.tensor.lvector("x")
        y = Elemwise(triple)(x)
        assert y.type.dtype == "int64"
        np.testing.assert_array_equal(
            ptt.function([x], y)(np.array([2, 5])), [6, 15])

    def test_pickle_roundtrip(self):
        triple = _Triple(ps.upgrade_to_float, name="triple")
        t2 = pickle.loads(pickle.dumps(triple))
        assert t2 == triple and type(t2) is _Triple

    def test_default_grad_not_implemented(self):
        class NoGrad(ps.UnaryScalarOp):
            def impl(self, x):
                return x + 1

        op = NoGrad(ps.same_out, name="nograd")
        x = dvector("x")
        y = Elemwise(op)(x)
        with pytest.raises(Exception):
            G.grad(y.sum(), x)

    def test_missing_preference_raises(self):
        class Bare(ps.UnaryScalarOp):
            def impl(self, x):
                return x

        with pytest.raises(NotImplementedError):
            Elemwise(Bare(name="bare"))(dvector("x"))

    def test_non_callable_preference_rejected(self):
        with pytest.raises(TypeError):
            _Triple("float64", name="bad")

    def test_scalar_loop_alias(self):
        from pytensor_tpu.scalar.loop import ScalarLoop

        assert ps.ScalarLoop is ScalarLoop


class TestComposite:
    def test_scalar_application(self):
        a, b = dscalar("a"), dscalar("b")
        comp = ps.Composite([a, b], [a * b + a])
        f = ptt.function([a, b], comp(a, b))
        assert f(2.0, 3.0) == 8.0

    def test_vectorized_application(self):
        a, b = dscalar("a"), dscalar("b")
        comp = ps.Composite([a, b], [a * b + a])
        x = dvector("x")
        np.testing.assert_allclose(
            ptt.function([x], comp(x, x))(np.array([2.0, 3.0])),
            [6.0, 12.0])

    def test_multi_output(self):
        a = dscalar("a")
        comp = ps.Composite([a], [a + 1, a * 2])
        outs = comp(a)
        f = ptt.function([a], outs)
        assert tuple(f(3.0)) == (4.0, 6.0)

    def test_fgraph_property(self):
        a, b = dscalar("a"), dscalar("b")
        comp = ps.Composite([a, b], [a * b])
        fg = comp.fgraph
        assert len(fg.inputs) == 2 and len(fg.outputs) == 1


class TestMisc:
    def test_mod_check_complex_raises(self):
        a = ptt.tensor.zvector("a")
        with pytest.raises(ps.ComplexError):
            ps.mod_check(a, a)

    def test_round_half_away_from_zero_vec(self):
        np.testing.assert_allclose(
            ps.round_half_away_from_zero_vec(np.array([2.5, -2.5])),
            [3.0, -3.0])

    def test_exceptions_exported(self):
        assert issubclass(ps.ComplexError, NotImplementedError)
        assert issubclass(ps.IntegerDivisionError, Exception)
