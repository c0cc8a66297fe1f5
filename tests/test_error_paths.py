"""Error-path coverage: bad shapes, dtype filtering, grad errors,
malformed graphs, bad function arguments — each must fail LOUDLY with
the documented exception, not silently miscompute (reference test
strategy: tests/test_basic error modes, tests/graph strictness)."""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt


class TestCallTimeErrors:
    def test_wrong_shape_rejected(self):
        x = pt.tensor("x", dtype="float64", shape=(3,))
        f = ptt.function([x], x * 2)
        with pytest.raises((TypeError, ValueError)):
            f(np.zeros(4))

    def test_wrong_ndim_rejected(self):
        x = pt.dvector("x")
        f = ptt.function([x], x * 2)
        with pytest.raises((TypeError, ValueError)):
            f(np.zeros((2, 2)))

    def test_unsafe_downcast_rejected(self):
        x = pt.tensor("x", dtype="float32", shape=(3,))
        f = ptt.function([x], x * 2)
        with pytest.raises(TypeError):
            f(np.zeros(3, dtype="float64"))

    def test_wrong_arg_count(self):
        x = pt.dvector("x")
        y = pt.dvector("y")
        f = ptt.function([x, y], x + y)
        with pytest.raises(TypeError):
            f(np.zeros(3))

    def test_int_to_float_upcast_allowed(self):
        x = pt.dvector("x")
        f = ptt.function([x], x * 2)
        np.testing.assert_allclose(f(np.arange(3)), [0, 2, 4])


class TestBuildTimeErrors:
    def test_shape_mismatch_elemwise(self):
        a = pt.tensor("a", dtype="float64", shape=(3,))
        b = pt.tensor("b", dtype="float64", shape=(4,))
        with pytest.raises((TypeError, ValueError)):
            ptt.function([a, b], a + b)

    def test_dot_dim_mismatch(self):
        a = pt.tensor("a", dtype="float64", shape=(3, 4))
        b = pt.tensor("b", dtype="float64", shape=(5, 6))
        with pytest.raises((TypeError, ValueError)):
            pt.dot(a, b)

    def test_missing_input_detected(self):
        x = pt.dvector("x")
        y = pt.dvector("y")
        with pytest.raises(Exception, match="[Ii]nput|[Mm]issing"):
            ptt.function([x], x + y)

    def test_reshape_wrong_total_static(self):
        x = pt.tensor("x", dtype="float64", shape=(6,))
        with pytest.raises((TypeError, ValueError)):
            f = ptt.function([x], x.reshape((4, 2)))
            f(np.zeros(6))

    def test_index_out_of_bounds_static(self):
        x = pt.tensor("x", dtype="float64", shape=(3,))
        with pytest.raises(IndexError):
            x[5]

    def test_bool_mask_wrong_length(self):
        x = pt.tensor("x", dtype="float64", shape=(5,))
        with pytest.raises(IndexError):
            x[np.array([True, False, True])]


class TestGradErrors:
    def test_disconnected_raises_by_default(self):
        from pytensor_tpu.gradient import DisconnectedInputError

        x = pt.dvector("x")
        y = pt.dvector("y")
        with pytest.raises(DisconnectedInputError):
            ptt.grad(pt.sum(x), y)

    def test_disconnected_ignore_returns_zeros(self):
        x = pt.dvector("x")
        y = pt.tensor("y", dtype="float64", shape=(3,))
        g = ptt.grad(pt.sum(x), y, disconnected_inputs="ignore")
        f = ptt.function([x, y], g, on_unused_input="ignore")
        np.testing.assert_allclose(f(np.ones(2), np.ones(3)), np.zeros(3))

    def test_grad_of_nonscalar_cost_rejected(self):
        x = pt.dvector("x")
        with pytest.raises((TypeError, ValueError)):
            ptt.grad(x * 2, x)

    def test_grad_of_integer_output_is_zero(self):
        # reference semantics: discrete costs are piecewise-constant,
        # grad returns zeros rather than raising
        x = pt.dvector("x")
        g = ptt.grad(pt.sum(pt.cast(x, "int64")), x)
        f = ptt.function([x], g, mode="FAST_COMPILE")
        np.testing.assert_allclose(f(np.ones(3)), np.zeros(3))


class TestAssertAndNan:
    def test_assert_fires_on_oracle(self):
        from pytensor_tpu.raise_op import Assert

        x = pt.dvector("x")
        out = Assert("must be positive")(x, pt.all(x > 0))
        f = ptt.function([x], out, mode="FAST_COMPILE")
        np.testing.assert_allclose(f(np.ones(3)), np.ones(3))
        with pytest.raises(Exception, match="must be positive"):
            f(-np.ones(3))

    def test_nanguard_catches_nan(self):
        from pytensor_tpu.compile.debug.nanguardmode import NanGuardMode

        x = pt.dvector("x")
        f = ptt.function([x], pt.log(x), mode=NanGuardMode())
        with pytest.raises(Exception, match="[Nn]an|[Ii]nf"):
            f(np.array([-1.0, 1.0]))


class TestUpdatesErrors:
    def test_update_type_mismatch(self):
        from pytensor_tpu.compile.sharedvalue import shared

        w = shared(np.zeros(3), name="w")
        x = pt.dvector("x")
        with pytest.raises((TypeError, ValueError)):
            # update changes the ndim
            ptt.function([x], x, updates=[(w, pt.outer(x, x))])

    def test_update_of_non_shared_rejected(self):
        x = pt.dvector("x")
        y = pt.dvector("y")
        with pytest.raises((TypeError, ValueError)):
            ptt.function([x, y], x, updates=[(y, x)])

    def test_duplicate_update_rejected(self):
        from pytensor_tpu.compile.sharedvalue import shared

        w = shared(np.zeros(3), name="w")
        x = pt.dvector("x")
        with pytest.raises((TypeError, ValueError)):
            ptt.function([x], x, updates=[(w, x), (w, x * 2)])


class TestScanErrors:
    def test_scan_no_steps_no_sequences(self):
        with pytest.raises((TypeError, ValueError)):
            ptt.scan(lambda: pt.constant(1.0))

    def test_scan_bad_outputs_info_count(self):
        x = pt.dvector("x")
        with pytest.raises((TypeError, ValueError)):
            ptt.scan(lambda xt, a, b: a + b + xt, sequences=[x],
                     outputs_info=[pt.constant(0.0)])

    def test_scan_updates_dropped_raises(self):
        """return_updates=False with non-empty updates must raise (the
        advisor finding: silently dropping RNG updates yields repeated
        draws)."""
        from pytensor_tpu.tensor.random import RandomStream

        srng = RandomStream(seed=0)
        with pytest.raises(ValueError):
            ptt.scan(lambda: srng.normal(0.0, 1.0), n_steps=3,
                     return_updates=False)
