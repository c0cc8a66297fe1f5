"""Reference rewriting/test_math.py corpus: erf/erfc stabilization,
sigmoid specializations, log/exp stabilizations, functional inverses,
switch merging, and algebraic simplifications.

Cases mirror /root/reference/tests/tensor/rewriting/test_math.py
(TestLocalErf, TestLocalErfc, TestSigmoidRewrites, TestLogDiffExp,
test_local_zero_div, test_local_div_by_one, test_mul_div_abs,
test_local_merge_switch_same_cond, test_local_reduce_join,
test_local_func_inv, test_polygamma) against the rewrite pack in
pytensor_tpu/tensor/rewriting/math.py.  Each test asserts BOTH that the
rewrite fired (scalar-op inventory of the optimized graph) and that the
numerics match/stabilize.
"""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt


def _snames(f):
    """Scalar-op names of all Elemwise nodes in the optimized graph,
    recursing into FusedElemwise inner graphs."""

    def walk(fg, out):
        for n in fg.toposort():
            sop = getattr(n.op, "scalar_op", None)
            if sop is not None:
                out.append(sop.name)
            inner = getattr(n.op, "fgraph", None)
            if inner is not None:
                walk(inner, out)
        return out

    return walk(f.fgraph, [])


def _fgraph_snames(outputs, inputs):
    f = ptt.function(inputs, outputs)
    return f, _snames(f)


RNG = np.random.default_rng(42)


class TestLocalErf:
    """1 +- erf(x) <-> erfc (reference TestLocalErf)."""

    def test_one_plus_erf(self):
        x = pt.dvector("x")
        f, names = _fgraph_snames(1 + pt.erf(x), [x])
        assert "erfc" in names and "erf" not in names
        v = RNG.standard_normal(8)
        from scipy.special import erf as sp_erf
        np.testing.assert_allclose(np.asarray(f(v)), 1 + sp_erf(v),
                                   rtol=1e-12)

    def test_one_minus_erf(self):
        x = pt.dvector("x")
        f, names = _fgraph_snames(1 - pt.erf(x), [x])
        assert "erfc" in names and "erf" not in names
        v = RNG.standard_normal(8)
        from scipy.special import erfc as sp_erfc
        np.testing.assert_allclose(np.asarray(f(v)), sp_erfc(v), rtol=1e-12)

    def test_erf_minus_one(self):
        x = pt.dvector("x")
        f, names = _fgraph_snames(pt.erf(x) - 1, [x])
        assert "erfc" in names and "erf" not in names
        v = RNG.standard_normal(8)
        from scipy.special import erfc as sp_erfc
        np.testing.assert_allclose(np.asarray(f(v)), -sp_erfc(v), rtol=1e-12)

    def test_one_plus_neg_erf(self):
        # 1 + (-erf(x)) -> erfc(x)
        x = pt.dvector("x")
        f, names = _fgraph_snames(1 + (-pt.erf(x)), [x])
        assert "erfc" in names and "erf" not in names

    def test_minus_one_plus_erf(self):
        # erf(x) + (-1) -> -erfc(x); add with constant folded to -1
        x = pt.dvector("x")
        f, names = _fgraph_snames(pt.erf(x) + (-1.0), [x])
        assert "erfc" in names and "erf" not in names
        v = RNG.standard_normal(8)
        from scipy.special import erfc as sp_erfc
        np.testing.assert_allclose(np.asarray(f(v)), -sp_erfc(v), rtol=1e-12)


class TestLocalErfc:
    def test_one_minus_erfc(self):
        x = pt.dvector("x")
        f, names = _fgraph_snames(1 - pt.erfc(x), [x])
        assert "erf" in names and "erfc" not in names
        v = RNG.standard_normal(8)
        from scipy.special import erf as sp_erf
        np.testing.assert_allclose(np.asarray(f(v)), sp_erf(v), rtol=1e-12)

    def test_erfc_minus_one(self):
        x = pt.dvector("x")
        f, names = _fgraph_snames(pt.erfc(x) - 1, [x])
        assert "erf" in names and "erfc" not in names
        v = RNG.standard_normal(8)
        from scipy.special import erf as sp_erf
        np.testing.assert_allclose(np.asarray(f(v)), -sp_erf(v), rtol=1e-12)

    def test_log_erfc_stabilized(self):
        """log(erfc(x)) is finite far beyond the f64 underflow point
        x ~ 26.64 (reference test_log_erfc)."""
        x = pt.dvector("x")
        f = ptt.function([x], pt.log(pt.erfc(x)))
        v = np.asarray([-5.0, 0.0, 3.0, 26.0, 27.0, 50.0, 110.0])
        out = np.asarray(f(v))
        assert np.isfinite(out).all()
        from scipy.special import erfc as sp_erfc

        safe = v < 26
        np.testing.assert_allclose(out[safe], np.log(sp_erfc(v[safe])),
                                   rtol=1e-10)
        # asymptotic region: compare against the log-scaled identity
        # log(erfc(x)) = -x^2 + log(erfcx(x)) with erfcx the scaled erfc
        from scipy.special import erfcx
        np.testing.assert_allclose(out[~safe],
                                   -v[~safe] ** 2 + np.log(erfcx(v[~safe])),
                                   rtol=1e-7)

    def test_grad_log_erfc_stabilized(self):
        """d/dx log(erfc(x)) stays finite at large x (reference
        test_grad_log_erfc_neg)."""
        x = pt.dvector("x")
        g = ptt.grad(pt.log(pt.erfc(x)).sum(), x)
        f = ptt.function([x], g)
        v = np.asarray([-3.0, 0.0, 10.0, 27.0, 100.0])
        out = np.asarray(f(v))
        assert np.isfinite(out).all()
        # analytic: -2/sqrt(pi) * exp(-x^2)/erfc(x) = -2/sqrt(pi)/erfcx(x)
        from scipy.special import erfcx
        np.testing.assert_allclose(out, -2 / np.sqrt(np.pi) / erfcx(v),
                                   rtol=1e-6)


class TestSigmoidRewrites:
    def test_reciprocal_one_plus_exp(self):
        x = pt.dvector("x")
        f, names = _fgraph_snames(1 / (1 + pt.exp(x)), [x])
        assert "sigmoid" in names and "exp" not in names
        v = RNG.standard_normal(8) * 3
        np.testing.assert_allclose(np.asarray(f(v)),
                                   1 / (1 + np.exp(v)), rtol=1e-12)

    def test_sigm_times_exp(self):
        x = pt.dvector("x")
        f, names = _fgraph_snames(pt.sigmoid(-x) * pt.exp(x), [x])
        assert names.count("sigmoid") == 1 and "exp" not in names
        v = RNG.standard_normal(8)
        np.testing.assert_allclose(np.asarray(f(v)), 1 / (1 + np.exp(-v)),
                                   rtol=1e-12)

    def test_exp_over_one_plus_exp(self):
        """exp(x)/(1+exp(x)) -> sigmoid(x) via div->mul + sigm*exp."""
        x = pt.dvector("x")
        f, names = _fgraph_snames(pt.exp(x) / (1 + pt.exp(x)), [x])
        assert "sigmoid" in names and "exp" not in names
        v = RNG.standard_normal(8)
        np.testing.assert_allclose(np.asarray(f(v)), 1 / (1 + np.exp(-v)),
                                   rtol=1e-12)

    def test_odds_sigmoid(self):
        x = pt.dvector("x")
        f, names = _fgraph_snames(pt.sigmoid(x) / pt.sigmoid(-x), [x])
        assert "exp" in names and "sigmoid" not in names
        # stays finite where sigmoid(-x) underflows to 0 (x >= ~40)
        v = np.asarray([-2.0, 0.0, 2.0, 45.0])
        out = np.asarray(f(v))
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out, np.exp(v), rtol=1e-12)

    def test_sigmoid_of_logit(self):
        x = pt.dvector("x")
        f, names = _fgraph_snames(pt.sigmoid(pt.log(x / (1 - x))), [x])
        assert "sigmoid" not in names and "log" not in names
        v = RNG.uniform(0.05, 0.95, 8)
        np.testing.assert_allclose(np.asarray(f(v)), v, rtol=1e-12)

    def test_logit_of_sigmoid(self):
        x = pt.dvector("x")
        f, names = _fgraph_snames(pt.logit(pt.sigmoid(x)), [x])
        assert "sigmoid" not in names and "logit" not in names
        v = RNG.standard_normal(8)
        np.testing.assert_allclose(np.asarray(f(v)), v, rtol=1e-12)


class TestLogExpStabilize:
    def test_logdiffexp(self):
        x = pt.dvector("x")
        y = pt.dvector("y")
        f, names = _fgraph_snames(pt.log(pt.exp(x) - pt.exp(y)), [x, y])
        assert "log1mexp" in names
        # finite where exp overflows
        vx = np.asarray([800.0, 3.0])
        vy = np.asarray([799.0, 1.0])
        out = np.asarray(f(vx, vy))
        assert np.isfinite(out).all()
        np.testing.assert_allclose(
            out, vx + np.log1p(-np.exp(vy - vx)), rtol=1e-12)

    def test_log_kv(self):
        x = pt.dvector("x")
        f, names = _fgraph_snames(pt.log(pt.kv(2.5, x)), [x])
        assert "kve" in names and "kv" not in names
        v = np.asarray([0.5, 5.0, 750.0])  # kv underflows at 750
        out = np.asarray(f(v))
        assert np.isfinite(out).all()
        from scipy.special import kve
        np.testing.assert_allclose(out, np.log(kve(2.5, v)) - v, rtol=1e-6)

    def test_log_iv(self):
        x = pt.dvector("x")
        f, names = _fgraph_snames(pt.log(pt.iv(1.5, x)), [x])
        assert "ive" in names and "iv" not in names
        v = np.asarray([0.5, 5.0, 800.0])  # iv overflows at 800
        out = np.asarray(f(v))
        assert np.isfinite(out).all()
        from scipy.special import ive
        np.testing.assert_allclose(out, np.log(ive(1.5, v)) + v, rtol=1e-6)

    def test_log_reciprocal(self):
        x = pt.dvector("x")
        f, names = _fgraph_snames(pt.log(1 / x), [x])
        assert "log" in names and "reciprocal" not in names \
            and "true_div" not in names
        v = RNG.uniform(0.1, 3.0, 8)
        np.testing.assert_allclose(np.asarray(f(v)), -np.log(v), rtol=1e-12)

    def test_log_div_const(self):
        x = pt.dvector("x")
        f, names = _fgraph_snames(pt.log(x / 7.0), [x])
        assert "true_div" not in names
        v = RNG.uniform(0.1, 3.0, 8)
        np.testing.assert_allclose(np.asarray(f(v)), np.log(v / 7.0),
                                   rtol=1e-12)

    def test_log_neg_expm1(self):
        x = pt.dvector("x")
        f, names = _fgraph_snames(pt.log(-pt.expm1(x)), [x])
        assert "log1mexp" in names and "expm1" not in names
        v = np.asarray([-3.0, -0.5, -1e-8])
        np.testing.assert_allclose(np.asarray(f(v)),
                                   np.log(-np.expm1(v)), rtol=1e-10)

    def test_div_exp_to_mul_exp(self):
        x = pt.dvector("x")
        y = pt.dvector("y")
        f, names = _fgraph_snames(y / pt.exp(x), [x, y])
        assert "true_div" not in names
        vx = RNG.standard_normal(8)
        vy = RNG.standard_normal(8)
        np.testing.assert_allclose(np.asarray(f(vx, vy)),
                                   vy / np.exp(vx), rtol=1e-12)


class TestSignAbsDiv:
    def test_sign_reciprocal(self):
        x = pt.dvector("x")
        f, names = _fgraph_snames(pt.sign(1 / x), [x])
        assert "reciprocal" not in names and "true_div" not in names
        v = np.asarray([-2.0, 3.0, -0.5])
        np.testing.assert_allclose(np.asarray(f(v)), np.sign(v))

    def test_div_abs_to_sign(self):
        x = pt.dvector("x")
        f, names = _fgraph_snames(x / pt.abs(x), [x])
        assert "sign" in names and "true_div" not in names
        v = np.asarray([-2.0, 3.0, -0.5])
        np.testing.assert_allclose(np.asarray(f(v)), np.sign(v))

    def test_scaled_div_abs(self):
        # (2x) / (4*abs(3x)) -> (1/6) sign(x)
        x = pt.dvector("x")
        f, names = _fgraph_snames((2 * x) / (4 * pt.abs(3 * x)), [x])
        assert "sign" in names and "true_div" not in names
        v = np.asarray([-2.0, 3.0])
        np.testing.assert_allclose(np.asarray(f(v)), np.sign(v) / 6,
                                   rtol=1e-12)


class TestAlgebraic:
    def test_zero_div(self):
        x = pt.dvector("x")
        f, names = _fgraph_snames(0.0 / x, [x])
        assert "true_div" not in names
        np.testing.assert_allclose(np.asarray(f(np.asarray([2.0, -3.0]))),
                                   [0.0, 0.0])

    def test_div_by_one(self):
        x = pt.dvector("x")
        f, names = _fgraph_snames(x / 1.0, [x])
        assert "true_div" not in names
        v = RNG.standard_normal(4)
        np.testing.assert_allclose(np.asarray(f(v)), v)

    def test_int_div_by_one(self):
        x = pt.lvector("x")
        f, names = _fgraph_snames(x // 1, [x])
        assert "int_div" not in names
        v = np.asarray([5, -7], dtype="int64")
        np.testing.assert_array_equal(np.asarray(f(v)), v)

    def test_sub_neg_to_add(self):
        x = pt.dvector("x")
        y = pt.dvector("y")
        f, names = _fgraph_snames(x - (-y), [x, y])
        assert "sub" not in names and "neg" not in names
        vx, vy = RNG.standard_normal(4), RNG.standard_normal(4)
        np.testing.assert_allclose(np.asarray(f(vx, vy)), vx + vy)

    def test_add_neg_to_sub(self):
        x = pt.dvector("x")
        y = pt.dvector("y")
        f, names = _fgraph_snames(x + (-y), [x, y])
        assert "neg" not in names
        vx, vy = RNG.standard_normal(4), RNG.standard_normal(4)
        np.testing.assert_allclose(np.asarray(f(vx, vy)), vx - vy)

    def test_sqr_of_sqrt(self):
        x = pt.dvector("x")
        f, names = _fgraph_snames(pt.sqr(pt.sqrt(x)), [x])
        assert "sqrt" not in names
        v = np.asarray([4.0, 0.0, 2.5])
        np.testing.assert_allclose(np.asarray(f(v)), v)
        # negative input keeps the nan domain signal
        out = np.asarray(f(np.asarray([-1.0])))
        assert np.isnan(out).all()

    def test_xor_self(self):
        x = pt.lvector("x")
        f, names = _fgraph_snames(pt.bitwise_xor(x, x), [x])
        assert "xor" not in names
        np.testing.assert_array_equal(
            np.asarray(f(np.asarray([3, 7]))), [0, 0])

    def test_mul_pow_same_base(self):
        x = pt.dvector("x")
        a = pt.dscalar("a")
        b = pt.dscalar("b")
        f, names = _fgraph_snames((x ** a) * (x ** b), [x, a, b])
        assert names.count("pow") == 1
        v = RNG.uniform(0.5, 2.0, 4)
        np.testing.assert_allclose(np.asarray(f(v, 2.0, 3.0)), v ** 5,
                                   rtol=1e-12)

    def test_polygamma_specialize(self):
        x = pt.dvector("x")
        f0, names0 = _fgraph_snames(pt.polygamma(0, x), [x])
        assert "psi" in names0 and "polygamma" not in names0
        f1, names1 = _fgraph_snames(pt.polygamma(1, x), [x])
        assert "tri_gamma" in names1 and "polygamma" not in names1
        from scipy.special import polygamma as sp_polygamma
        v = RNG.uniform(0.5, 5.0, 6)
        np.testing.assert_allclose(np.asarray(f0(v)), sp_polygamma(0, v),
                                   rtol=1e-8)
        np.testing.assert_allclose(np.asarray(f1(v)), sp_polygamma(1, v),
                                   rtol=1e-8)


class TestFuncInverse:
    @pytest.mark.parametrize(
        "outer,inner,lo,hi",
        [
            (pt.rad2deg, pt.deg2rad, -180, 180),
            (pt.deg2rad, pt.rad2deg, -3, 3),
            (pt.arcsinh, pt.sinh, -3, 3),
            (pt.sinh, pt.arcsinh, -3, 3),
            (pt.tanh, pt.arctanh, -0.9, 0.9),
            (pt.arctanh, pt.tanh, -2, 2),
            (pt.cosh, pt.arccosh, 1.1, 4.0),
            (pt.arccosh, pt.cosh, 1.1, 4.0),
            (pt.expm1, pt.log1p, -0.5, 3.0),
            (pt.log1p, pt.expm1, -2.0, 2.0),
        ],
    )
    def test_pairs(self, outer, inner, lo, hi):
        x = pt.dvector("x")
        f, names = _fgraph_snames(outer(inner(x)), [x])
        # both ops gone: elided to identity, or (for the domain-unsafe
        # expm1(log1p(x)) direction) to a nan-guarded switch (reference
        # local_exp_log_nan_switch produces switch(x >= -1, x, nan))
        v = RNG.uniform(lo, hi, 6)
        np.testing.assert_allclose(np.asarray(f(v)), v, rtol=1e-9)
        assert len([n for n in names
                    if n not in ("second", "ge", "switch")]) == 0, names

    def test_neg_neg(self):
        x = pt.dvector("x")
        f, names = _fgraph_snames(-(-x), [x])
        assert "neg" not in names


class TestSwitchMerge:
    def test_merge_same_cond(self):
        c = pt.dvector("c")
        a, b, u, w = (pt.dvector(n) for n in "abuw")
        cond = c > 0
        out = pt.switch(cond, a, b) + pt.switch(cond, u, w)
        f = ptt.function([c, a, b, u, w], out)
        names = _snames(f)
        assert names.count("switch") == 1
        vals = [RNG.standard_normal(6) for _ in range(5)]
        expect = np.where(vals[0] > 0, vals[1] + vals[3], vals[2] + vals[4])
        np.testing.assert_allclose(np.asarray(f(*vals)), expect)


class TestShapeCmpZero:
    def test_shape_ge_zero(self):
        x = pt.dmatrix("x")
        f = ptt.function([x], pt.ge(x.shape[0], 0))
        # folds to constant 1: no comparison in the graph
        assert "ge" not in _snames(f)
        assert np.asarray(f(np.zeros((3, 2)))) == 1

    def test_shape_lt_zero(self):
        x = pt.dmatrix("x")
        f = ptt.function([x], pt.lt(x.shape[1], 0))
        assert "lt" not in _snames(f)
        assert np.asarray(f(np.zeros((3, 2)))) == 0

    def test_maximum_shape_zero(self):
        x = pt.dmatrix("x")
        f = ptt.function([x], pt.maximum(x.shape[0], 0))
        assert "maximum" not in _snames(f)
        assert np.asarray(f(np.zeros((5, 2)))) == 5

    def test_shape_eq_minus_one(self):
        x = pt.dmatrix("x")
        f = ptt.function([x], pt.eq(x.shape[0], -1))
        assert "eq" not in _snames(f)
        assert np.asarray(f(np.zeros((3, 2)))) == 0


class TestReduceJoin:
    def test_sum_of_stack(self):
        a = pt.dvector("a")
        b = pt.dvector("b")
        c = pt.dvector("c")
        out = pt.stack([a, b, c], axis=0).sum(axis=0)
        f = ptt.function([a, b, c], out)
        ops = [type(n.op).__name__ for n in f.fgraph.toposort()]
        assert "Join" not in ops and "CAReduce" not in ops
        va, vb, vc = (RNG.standard_normal(5) for _ in range(3))
        np.testing.assert_allclose(np.asarray(f(va, vb, vc)), va + vb + vc)

    @pytest.mark.parametrize("red,npfn", [
        (pt.max, np.maximum), (pt.min, np.minimum)])
    def test_extrema_of_stack(self, red, npfn):
        a = pt.dvector("a")
        b = pt.dvector("b")
        out = red(pt.stack([a, b], axis=0), axis=0)
        f = ptt.function([a, b], out)
        ops = [type(n.op).__name__ for n in f.fgraph.toposort()]
        assert "Join" not in ops
        va, vb = RNG.standard_normal(5), RNG.standard_normal(5)
        np.testing.assert_allclose(np.asarray(f(va, vb)), npfn(va, vb))

    def test_partial_reduce_keeps_join(self):
        # reduce along a non-join axis must keep the join
        a = pt.dmatrix("a")
        b = pt.dmatrix("b")
        out = pt.stack([a, b], axis=0).sum(axis=2)
        f = ptt.function([a, b], out)
        va = RNG.standard_normal((2, 3))
        vb = RNG.standard_normal((2, 3))
        np.testing.assert_allclose(
            np.asarray(f(va, vb)), np.stack([va, vb]).sum(axis=2))


class TestBatchedMatmulToCore:
    """Reference test_local_batched_matmul_to_core_matmul."""

    def _blockwise_ops(self, f):
        from pytensor_tpu.tensor.blockwise import Blockwise

        return [n for n in f.fgraph.toposort()
                if isinstance(n.op, Blockwise)]

    def test_x_batched(self):
        rng = np.random.default_rng(4433)
        x = pt.tensor("x", shape=(None, 3, 2), dtype="float64")
        y = pt.tensor("y", shape=(2, 2), dtype="float64")
        f = ptt.function([x, y], x @ y)
        assert not self._blockwise_ops(f)
        xv = rng.normal(size=(5, 3, 2))
        yv = rng.normal(size=(2, 2))
        np.testing.assert_allclose(np.asarray(f(xv, yv)), xv @ yv)

    def test_y_batched(self):
        rng = np.random.default_rng(4434)
        x = pt.tensor("x", shape=(1, 3, 2), dtype="float64")
        y = pt.tensor("y", shape=(5, 2, 2), dtype="float64")
        f = ptt.function([x, y], x @ y)
        assert not self._blockwise_ops(f)
        xv = rng.normal(size=(1, 3, 2))
        yv = rng.normal(size=(5, 2, 2))
        np.testing.assert_allclose(np.asarray(f(xv, yv)), xv @ yv)

    def test_both_batched_not_rewritten_but_correct(self):
        rng = np.random.default_rng(4435)
        x = pt.tensor("x", shape=(None, 3, 2), dtype="float64")
        y = pt.tensor("y", shape=(5, 2, 2), dtype="float64")
        f = ptt.function([x, y], x @ y)
        xv = rng.normal(size=(5, 3, 2))
        yv = rng.normal(size=(5, 2, 2))
        np.testing.assert_allclose(np.asarray(f(xv, yv)), xv @ yv)


class TestDotToMul:
    def _dot_count(self, f):
        from pytensor_tpu.tensor.blockwise import Blockwise
        from pytensor_tpu.tensor.math import Dot

        return sum(isinstance(n.op, (Dot, Blockwise))
                   for n in f.fgraph.toposort())

    @pytest.mark.parametrize(
        "a_shape,b_shape,expect_rewrite",
        [
            ((1, 1), (1, 3), True),
            ((3, 1), (1, 1), True),
            ((1, 1), (1, 1), True),
            ((3, 1), (1, 3), False),  # core outer: kept for the MXU
        ],
    )
    def test_core(self, a_shape, b_shape, expect_rewrite):
        a = pt.tensor("a", shape=a_shape, dtype="float64")
        b = pt.tensor("b", shape=b_shape, dtype="float64")
        f = ptt.function([a, b], a @ b)
        assert (self._dot_count(f) == 0) == expect_rewrite
        rng = np.random.default_rng(1)
        av = rng.normal(size=a_shape)
        bv = rng.normal(size=b_shape)
        np.testing.assert_allclose(np.asarray(f(av, bv)), av @ bv,
                                   rtol=1e-12)

    def test_batched_outer_rewritten(self):
        a = pt.tensor("a", shape=(4, 3, 1), dtype="float64")
        b = pt.tensor("b", shape=(4, 1, 3), dtype="float64")
        f = ptt.function([a, b], a @ b)
        assert self._dot_count(f) == 0
        rng = np.random.default_rng(2)
        av = rng.normal(size=(4, 3, 1))
        bv = rng.normal(size=(4, 1, 3))
        np.testing.assert_allclose(np.asarray(f(av, bv)), av @ bv,
                                   rtol=1e-12)

    def test_unspecified_length_1(self):
        """Reference test_local_dot_to_mul_unspecified_length_1: the
        unknown dim is pinned with specify_shape, not silently assumed."""
        x = pt.matrix("x", shape=(5, 1), dtype="float64")
        y = pt.matrix("y", shape=(None, 1), dtype="float64")
        f = ptt.function([x, y], x @ y)
        assert self._dot_count(f) == 0
        np.testing.assert_allclose(
            np.asarray(f(np.ones((5, 1)), np.ones((1, 1)) * 5)),
            np.ones((5, 1)) * 5)


class TestSumsqr2Dot:
    def test_basic(self):
        from pytensor_tpu.tensor.math import Dot

        W = pt.dmatrix("W")
        G = pt.dmatrix("G")
        y = pt.sqr(W.dimshuffle("x", 0, 1) * G.dimshuffle(0, "x", 1)) \
            .sum(axis=(1, 2))
        f = ptt.function([W, G], y)
        assert any(isinstance(n.op, Dot) for n in f.fgraph.toposort())
        rng = np.random.default_rng(3)
        w_val = rng.random((4, 3))
        g_val = rng.random((5, 3))
        np.testing.assert_allclose(
            np.asarray(f(w_val, g_val)),
            np.dot(np.square(g_val), np.square(w_val).sum(axis=0)),
            rtol=1e-10)
