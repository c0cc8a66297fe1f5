"""Data-dependent boolean-mask indexing (reference
tensor/subtensor.py bool-mask semantics + tensor/rewriting/jax.py:12,56
boolean_indexing_set_or_inc / boolean_indexing_sum).

Graph-level x[mask] with a symbolic mask is supported everywhere; the
oracle executes it directly, and the XLA path compiles the
size-preserving consumption patterns (scalar set/inc, reduce-to-scalar,
and their gradients) via the where() rewrites.  Anything else raises a
guided NotImplementedError at lowering."""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt


def _v():
    x = pt.dvector("x")
    m = pt.vector("mask", dtype="bool")
    xv = np.array([1.0, 2.0, 3.0, 4.0])
    mv = np.array([True, False, True, True])
    return x, m, xv, mv


class TestOracle:
    """FAST_COMPILE (numpy oracle) runs dynamic-shape masking directly."""

    def test_gather_1d(self):
        x, m, xv, mv = _v()
        f = ptt.function([x, m], x[m], mode="FAST_COMPILE")
        np.testing.assert_array_equal(np.asarray(f(xv, mv)), xv[mv])

    def test_gather_2d_full_mask(self):
        X = pt.dmatrix("X")
        M = pt.matrix("M", dtype="bool")
        f = ptt.function([X, M], X[M], mode="FAST_COMPILE")
        Xv = np.arange(6.0).reshape(2, 3)
        Mv = Xv % 2 == 0
        np.testing.assert_array_equal(np.asarray(f(Xv, Mv)), Xv[Mv])

    def test_gather_leading_axis_mask(self):
        X = pt.dtensor3("X")
        M = pt.vector("M", dtype="bool")
        f = ptt.function([X, M], X[M], mode="FAST_COMPILE")
        Xv = np.arange(24.0).reshape(4, 3, 2)
        Mv = np.array([True, False, True, False])
        np.testing.assert_array_equal(np.asarray(f(Xv, Mv)), Xv[Mv])

    def test_static_type_shape(self):
        x, m, *_ = _v()
        assert x[m].type.shape == (None,)
        X = pt.tensor("X", dtype="float64", shape=(4, 3, 2))
        M = pt.matrix("M", dtype="bool")
        assert X[M].type.shape == (None, 2)

    def test_set_vector_values(self):
        # dynamic-length y: only the oracle can run it
        x, m, xv, mv = _v()
        y = pt.dvector("y")
        f = ptt.function([x, m, y], pt.set_subtensor(x[m], y),
                         mode="FAST_COMPILE")
        got = np.asarray(f(xv, mv, np.array([10.0, 20.0, 30.0])))
        exp = xv.copy()
        exp[mv] = [10.0, 20.0, 30.0]
        np.testing.assert_array_equal(got, exp)

    def test_mask_shape_mismatch_raises(self):
        X = pt.tensor("X", dtype="float64", shape=(4, 3))
        M = pt.tensor("M", dtype="bool", shape=(5,))
        with pytest.raises(IndexError, match="did not match"):
            X[M]

    def test_mask_rank_too_high_raises(self):
        x = pt.dvector("x")
        M = pt.matrix("M", dtype="bool")
        with pytest.raises(IndexError, match="rank"):
            x[M]

    def test_mixed_with_other_indices_oracle(self):
        # graph-legal since round 4: bool masks mix with other indices
        # (reference semantics); the oracle executes them, XLA rejects
        # non-where-convertible patterns at lowering
        X = pt.dmatrix("X")
        m = pt.vector("m", dtype="bool")
        out = X[m, 0]
        f = ptt.function([X, m], out, mode="FAST_COMPILE")
        Xv = np.arange(12.0).reshape(3, 4)
        np.testing.assert_array_equal(
            np.asarray(f(Xv, np.array([True, False, True]))), Xv[[True, False, True], 0])


class TestXlaWhereRewrites:
    """Default (XLA) mode: the two reference jax-rewrite patterns plus
    gradients compile and match numpy."""

    def test_sum_and_grad(self):
        x, m, xv, mv = _v()
        s = pt.sum(x[m])
        g = ptt.grad(s, x)
        f = ptt.function([x, m], [s, g])
        sv, gv = f(xv, mv)
        assert float(np.asarray(sv)) == xv[mv].sum()
        np.testing.assert_array_equal(np.asarray(gv), mv.astype(float))

    def test_prod(self):
        x, m, xv, mv = _v()
        f = ptt.function([x, m], pt.prod(x[m]))
        assert float(np.asarray(f(xv, mv))) == xv[mv].prod()

    def test_sum_2d_mask_and_grad(self):
        X = pt.dmatrix("X")
        M = pt.matrix("M", dtype="bool")
        s = pt.sum(X[M])
        g = ptt.grad(s, X)
        f = ptt.function([X, M], [s, g])
        Xv = np.arange(6.0).reshape(2, 3)
        Mv = Xv % 2 == 0
        sv, gv = f(Xv, Mv)
        assert float(np.asarray(sv)) == Xv[Mv].sum()
        np.testing.assert_array_equal(np.asarray(gv), Mv.astype(float))

    def test_sum_leading_axis_mask_and_grad(self):
        X = pt.dtensor3("X")
        M = pt.vector("M", dtype="bool")
        s = pt.sum(X[M])
        g = ptt.grad(s, X)
        f = ptt.function([X, M], [s, g])
        Xv = np.arange(24.0).reshape(4, 3, 2)
        Mv = np.array([True, False, True, False])
        sv, gv = f(Xv, Mv)
        assert float(np.asarray(sv)) == Xv[Mv].sum()
        exp = np.zeros_like(Xv)
        exp[Mv] = 1.0
        np.testing.assert_array_equal(np.asarray(gv), exp)

    def test_set_scalar(self):
        x, m, xv, mv = _v()
        f = ptt.function([x, m], pt.set_subtensor(x[m], 0.0))
        exp = xv.copy()
        exp[mv] = 0.0
        np.testing.assert_array_equal(np.asarray(f(xv, mv)), exp)

    def test_inc_scalar(self):
        x, m, xv, mv = _v()
        f = ptt.function([x, m], pt.inc_subtensor(x[m], 5.0))
        exp = xv.copy()
        exp[mv] += 5.0
        np.testing.assert_array_equal(np.asarray(f(xv, mv)), exp)

    def test_set_scalar_grad(self):
        # d/dx set_subtensor(x[m], c) = 1 - m
        x, m, xv, mv = _v()
        out = pt.sum(pt.set_subtensor(x[m], 0.0) * 2.0)
        g = ptt.grad(out, x)
        f = ptt.function([x, m], g)
        np.testing.assert_array_equal(np.asarray(f(xv, mv)),
                                      2.0 * (~mv).astype(float))

    def test_masked_mse_pattern(self):
        # the classic "loss over valid entries only" pattern, fwd+grad
        yhat = pt.dvector("yhat")
        ytrue = pt.dvector("ytrue")
        m = pt.vector("m", dtype="bool")
        err = (yhat - ytrue) ** 2
        loss = pt.sum(err[m])
        g = ptt.grad(loss, yhat)
        f = ptt.function([yhat, ytrue, m], [loss, g])
        rng = np.random.default_rng(0)
        a, b = rng.standard_normal(8), rng.standard_normal(8)
        mv = rng.random(8) > 0.5
        lv, gv = f(a, b, mv)
        np.testing.assert_allclose(float(np.asarray(lv)),
                                   (((a - b) ** 2)[mv]).sum(), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(gv),
                                   2 * (a - b) * mv, rtol=1e-12)

    def test_plain_gather_raises_with_guidance(self):
        x, m, xv, mv = _v()
        with pytest.raises(NotImplementedError, match="where"):
            ptt.function([x, m], x[m])

    def test_set_vector_raises(self):
        # dynamic-length y cannot be expressed on XLA
        x, m, xv, mv = _v()
        y = pt.dvector("y")
        with pytest.raises(Exception):
            f = ptt.function([x, m, y], pt.set_subtensor(x[m], y))
            f(xv, mv, np.array([1.0, 2.0, 3.0]))


class TestOracleXlaParity:
    def test_sum_matches_oracle(self):
        x, m, xv, mv = _v()
        s = pt.sum(x[m])
        f_x = ptt.function([x, m], s)
        f_o = ptt.function([x, m], s, mode="FAST_COMPILE")
        assert float(np.asarray(f_x(xv, mv))) == float(np.asarray(f_o(xv, mv)))

    def test_debugmode_set_scalar(self):
        # DebugMode dual-executes oracle vs XLA per node
        x, m, xv, mv = _v()
        f = ptt.function([x, m], pt.inc_subtensor(x[m], 1.5), mode="DebugMode")
        exp = xv.copy()
        exp[mv] += 1.5
        np.testing.assert_array_equal(np.asarray(f(xv, mv)), exp)


class TestMaskedShapeQueries:
    """shape(x[mask]) folds to sum(mask) without the gather — unlocks
    mean/size of masked values under XLA."""

    def test_mean_and_grad(self):
        x, m, xv, mv = _v()
        s = pt.mean(x[m])
        g = ptt.grad(s, x)
        f = ptt.function([x, m], [s, g])
        sv, gv = f(xv, mv)
        assert float(np.asarray(sv)) == pytest.approx(xv[mv].mean())
        np.testing.assert_allclose(np.asarray(gv), mv / mv.sum())

    def test_mean_3d_leading_mask(self):
        X = pt.dtensor3("X")
        M = pt.vector("M", dtype="bool")
        f = ptt.function([X, M], pt.mean(X[M]))
        Xv = np.arange(24.0).reshape(4, 3, 2)
        Mv = np.array([True, False, True, False])
        assert float(np.asarray(f(Xv, Mv))) == pytest.approx(Xv[Mv].mean())

    def test_nnz_query(self):
        x, m, xv, mv = _v()
        f = ptt.function([x, m], x[m].shape[0], on_unused_input="ignore")
        assert int(np.asarray(f(xv, mv))) == int(mv.sum())

    def test_full_shape_vector(self):
        X = pt.dtensor3("X")
        M = pt.vector("M", dtype="bool")
        f = ptt.function([X, M], X[M].shape, on_unused_input="ignore")
        Xv = np.arange(24.0).reshape(4, 3, 2)
        Mv = np.array([True, False, True, False])
        np.testing.assert_array_equal(np.asarray(f(Xv, Mv)), [2, 3, 2])


class TestMaskedMoments:
    """var/std of masked values: the reduce rewrite sees through the
    elemwise tree between the Sum and the gather, and the pullback's
    vector cotangent (an elemwise of the same gather) converts too."""

    def test_var_value_and_grad(self):
        x, m, xv, mv = _v()
        v = pt.var(x[m])
        g = ptt.grad(v, x)
        f = ptt.function([x, m], [v, g])
        vv, gv = f(xv, mv)
        assert float(np.asarray(vv)) == pytest.approx(xv[mv].var())
        eps = 1e-6
        num = np.zeros(4)
        for i in range(4):
            p = xv.copy(); p[i] += eps
            q = xv.copy(); q[i] -= eps
            num[i] = (p[mv].var() - q[mv].var()) / (2 * eps)
        np.testing.assert_allclose(np.asarray(gv), num, rtol=1e-5, atol=1e-9)

    def test_std_value(self):
        x, m, xv, mv = _v()
        f = ptt.function([x, m], pt.std(x[m]))
        assert float(np.asarray(f(xv, mv))) == pytest.approx(xv[mv].std())

    def test_sum_of_transformed_masked(self):
        # sum(exp(x[m]) * 2): elemwise between Sum and gather
        x, m, xv, mv = _v()
        f = ptt.function([x, m], pt.sum(pt.exp(x[m]) * 2.0))
        assert float(np.asarray(f(xv, mv))) == pytest.approx(
            (np.exp(xv[mv]) * 2).sum())

    def test_two_gathers_same_mask(self):
        x, m, xv, mv = _v()
        y = pt.dvector("y")
        yv = np.array([2.0, 3.0, 4.0, 5.0])
        f = ptt.function([x, y, m], pt.sum(x[m] * y[m]))
        assert float(np.asarray(f(xv, yv, mv))) == pytest.approx(
            (xv[mv] * yv[mv]).sum())

    def test_mixed_masks_still_raise(self):
        x, m, xv, mv = _v()
        m2 = pt.vector("m2", dtype="bool")
        with pytest.raises(Exception):
            f = ptt.function([x, m, m2], pt.sum(x[m] * x[m2]))
            f(xv, mv, mv)
