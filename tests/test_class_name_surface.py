"""Reference class-name surface + round modes + zero-safe Prod grad.

The reference defines one class per scalar op (scalar/basic.py:1835+)
and per distribution (tensor/random/basic.py:83+); downstream code —
PyMC in particular — dispatches with ``isinstance(op, Exp)`` /
``isinstance(op, NormalRV)``.  Ours generates those subclasses lazily;
this file pins the contract.
"""

import pickle

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.scalar.basic as psb
import pytensor_tpu.scalar.math as psm
from pytensor_tpu import gradient as G
from pytensor_tpu.tensor import math as tm
from pytensor_tpu.tensor import special as sp
from pytensor_tpu.tensor import dvector
from pytensor_tpu.tensor.random import basic as prb


class TestScalarOpClasses:
    def test_generated_classes(self):
        assert isinstance(psb.exp, psb.Exp)
        assert isinstance(psb.add, psb.Add)
        assert isinstance(psb.true_div, psb.TrueDiv)
        assert isinstance(psb.eq, psb.EQ)
        assert isinstance(psm.erf, psm.Erf)
        assert isinstance(psm.betainc, psm.BetaInc)
        assert isinstance(psm.hyp2f1, psm.Hyp2F1)
        # no cross-class leakage
        assert not isinstance(psb.exp, psb.Add)

    def test_cast_ops_share_class(self):
        c32 = psb.cast_op("float32")
        c64 = psb.cast_op("float64")
        assert type(c32) is type(c64) is psb.Cast

    def test_pickle_by_name(self):
        assert pickle.loads(pickle.dumps(psb.exp)) is psb.exp
        assert pickle.loads(pickle.dumps(psm.owens_t)) is psm.owens_t

    def test_elemwise_scalar_op_isinstance(self):
        # the idiom downstream code actually uses
        x = dvector("x")
        node = tm.exp(x).owner
        assert isinstance(node.op.scalar_op, psb.Exp)


class TestRVClasses:
    def test_generated_rv_classes(self):
        assert isinstance(prb.normal, prb.NormalRV)
        assert isinstance(prb.multivariate_normal, prb.MvNormalRV)
        assert isinstance(prb.t, prb.StudentTRV)
        assert not isinstance(prb.normal, prb.GammaRV)

    def test_scipy_rv_base(self):
        assert isinstance(prb.bernoulli, prb.ScipyRandomVariable)
        assert isinstance(prb.cauchy, prb.ScipyRandomVariable)
        assert not isinstance(prb.normal, prb.ScipyRandomVariable)

    def test_rv_pickle(self):
        assert pickle.loads(pickle.dumps(prb.normal)) is prb.normal

    def test_rv_node_isinstance(self):
        rng = ptt.tensor.random.RandomStream(7)
        draw = rng.normal(0.0, 1.0, size=(3,))
        assert isinstance(draw.owner.op, prb.NormalRV)


class TestRoundModes:
    def test_half_away_from_zero(self):
        x = dvector("x")
        f = ptt.function([x], tm.round(x, "half_away_from_zero"))
        np.testing.assert_allclose(
            f(np.array([2.5, -2.5, 1.4, -0.5, 3.5])),
            [3.0, -3.0, 1.0, -1.0, 4.0])

    def test_half_to_even_default(self):
        x = dvector("x")
        f = ptt.function([x], tm.round(x))
        np.testing.assert_allclose(f(np.array([2.5, 3.5, -2.5])),
                                   [2.0, 4.0, -2.0])

    def test_bad_mode(self):
        with pytest.raises(ValueError, match="round mode"):
            tm.round(dvector("x"), "nearest")

    def test_iround_dtype_and_value(self):
        x = dvector("x")
        out = tm.iround(x, "half_away_from_zero")
        assert out.type.dtype == "int64"
        f = ptt.function([x], out)
        np.testing.assert_array_equal(f(np.array([2.5, -2.5])), [3, -3])


class TestProdGradZeros:
    """Reference Prod.grad handles zeros via ProdWithoutZeros
    (tensor/math.py:3816); ours uses a switch-based zero-safe form."""

    def _grad_fn(self, axis=None):
        x = ptt.tensor.dmatrix("x")
        g = G.grad(tm.prod(x, axis=axis).sum(), x)
        return ptt.function([x], g)

    def test_no_zero_matches_formula(self):
        f = self._grad_fn()
        v = np.array([[2.0, 3.0], [4.0, 5.0]])
        np.testing.assert_allclose(f(v), np.prod(v) / v)

    def test_single_zero(self):
        f = self._grad_fn()
        v = np.array([[2.0, 0.0], [4.0, 5.0]])
        expect = np.zeros_like(v)
        expect[0, 1] = 2.0 * 4.0 * 5.0
        np.testing.assert_allclose(f(v), expect)

    def test_two_zeros_all_zero(self):
        f = self._grad_fn()
        v = np.array([[0.0, 0.0], [4.0, 5.0]])
        np.testing.assert_allclose(f(v), np.zeros_like(v))

    def test_axis_reduction_with_zero(self):
        f = self._grad_fn(axis=1)
        v = np.array([[2.0, 0.0], [4.0, 5.0]])
        expect = np.array([[0.0, 2.0], [5.0, 4.0]])
        np.testing.assert_allclose(f(v), expect)

    def test_finite_difference_away_from_zero(self):
        x = ptt.tensor.dvector("x")
        G.verify_grad(lambda v: tm.prod(v),
                      [np.array([1.5, -2.0, 0.7])],
                      rng=np.random.default_rng(5))


class TestXLogY:
    def test_xlogy_zero_convention(self):
        import scipy.special as sps
        x, y = dvector("x"), dvector("y")
        f = ptt.function([x, y], sp.xlogy(x, y))
        xv = np.array([0.0, 2.0, 0.0, 3.0])
        yv = np.array([0.0, 3.0, 5.0, 0.5])
        np.testing.assert_allclose(f(xv, yv), sps.xlogy(xv, yv))

    def test_xlog1py(self):
        import scipy.special as sps
        x, y = dvector("x"), dvector("y")
        f = ptt.function([x, y], sp.xlog1py(x, y))
        xv = np.array([0.0, 2.0, 1.5])
        yv = np.array([-1.0, 0.5, 0.0])
        np.testing.assert_allclose(f(xv, yv), sps.xlog1py(xv, yv))

    def test_xlogy_grad(self):
        G.verify_grad(lambda a, b: sp.xlogy(a, b),
                      [np.array([0.5, 2.0]), np.array([1.5, 3.0])],
                      rng=np.random.default_rng(6))
