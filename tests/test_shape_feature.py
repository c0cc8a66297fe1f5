"""ShapeFeature: symbolic per-dim shapes + shape-driven rewrites on
``None``-dim graphs (reference tensor/rewriting/shape.py ShapeFeature:70,
ShapeOptimizer:420)."""

import numpy as np

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.graph.fg import FunctionGraph
from pytensor_tpu.tensor.rewriting.shape import ShapeFeature


def _ops(f):
    return [type(n.op).__name__ for n in f.fgraph.toposort()]


class TestShapeFeatureAPI:
    def test_static_shapes_are_ints(self):
        x = pt.tensor("x", dtype="float32", shape=(4, 5))
        y = pt.exp(x)
        fg = FunctionGraph([x], [y], clone=False)
        sf = ShapeFeature()
        fg.attach_feature(sf)
        assert sf.shape_tuple(y) == (4, 5)

    def test_propagates_through_ops(self):
        x = pt.tensor("x", dtype="float32", shape=(None, 7))
        w = pt.tensor("w", dtype="float32", shape=(7, 3))
        y = pt.tanh(pt.dot(x, w))
        fg = FunctionGraph([x, w], [y], clone=False)
        sf = ShapeFeature()
        fg.attach_feature(sf)
        st = sf.shape_tuple(y)
        assert st[1] == 3
        # dim 0 is symbolic and equals x's dim 0
        assert sf.same_shape(y, x, dim_a=0, dim_b=0)

    def test_same_shape_whole(self):
        x = pt.tensor("x", dtype="float32", shape=(None, None))
        y = pt.exp(x) * 2 + 1
        fg = FunctionGraph([x], [y], clone=False)
        sf = ShapeFeature()
        fg.attach_feature(sf)
        assert sf.same_shape(x, y)

    def test_different_inputs_not_same(self):
        x = pt.tensor("x", dtype="float32", shape=(None,))
        z = pt.tensor("z", dtype="float32", shape=(None,))
        fg = FunctionGraph([x, z], [x + 0, z + 0], clone=False)
        sf = ShapeFeature()
        fg.attach_feature(sf)
        assert not sf.same_shape(x, z)

    def test_cache_invalidation_on_change(self):
        x = pt.tensor("x", dtype="float32", shape=(None, 3))
        y = pt.exp(x)
        fg = FunctionGraph([x], [y], clone=False)
        sf = ShapeFeature()
        fg.attach_feature(sf)
        sf.shape_tuple(y)
        assert sf._cache
        # graph mutations clear the cache (recomputed lazily)
        sf.on_import(fg, y.owner, "test")
        assert not sf._cache


class TestShapeDrivenRewrites:
    def test_useless_reshape_dynamic(self):
        # reshape(x, x.shape) with an unknown dim folds away
        x = pt.tensor("x", dtype="float32", shape=(None, 5))
        y = pt.reshape(pt.exp(x), pt.shape(pt.exp(x)))
        f = ptt.function([x], y)
        assert "Reshape" not in _ops(f)
        v = np.random.default_rng(0).standard_normal((3, 5)).astype("f4")
        np.testing.assert_allclose(np.asarray(f(v)), np.exp(v), rtol=1e-6)

    def test_reduce_of_makevector_folds(self):
        # prod(shape(x)) becomes a product of the entries, so size
        # graphs with one unknown dim carry ONE Shape_i, no reduce
        x = pt.tensor("x", dtype="float32", shape=(None, 4))
        size = pt.prod(pt.shape(x))
        f = ptt.function([x], size)
        ops = _ops(f)
        assert "CAReduce" not in ops and "MakeVector" not in ops
        v = np.zeros((6, 4), "f4")
        assert int(np.asarray(f(v))) == 24

    def test_dynamic_mean_uses_single_shape_i(self):
        x = pt.tensor("x", dtype="float32", shape=(None,))
        y = pt.tensor("y", dtype="float32", shape=(None,))
        m = pt.mean(x * y)
        f = ptt.function([x, y], m)
        ops = _ops(f)
        # broadcast unification: one Shape_i, no maximum / MakeVector
        assert ops.count("Shape_i") == 1
        assert "MakeVector" not in ops
        a = np.arange(5, dtype="f4")
        b = np.ones(5, dtype="f4")
        np.testing.assert_allclose(float(np.asarray(f(a, b))), 2.0)

    def test_dynamic_logreg_matches_static_structure(self):
        """VERDICT r2 done-criterion: a dynamic-batch logreg graph gets
        the same canonicalizations as the static one (node count equal
        up to the inherent dynamic-size arithmetic)."""
        from collections import Counter

        def build(batch):
            X = pt.tensor("X", dtype="float32", shape=(batch, 16))
            y = pt.tensor("y", dtype="float32", shape=(batch,))
            w = pt.tensor("w", dtype="float32", shape=(16,))
            b = pt.tensor("b", dtype="float32", shape=())
            p = pt.sigmoid(pt.dot(X, w) + b)
            eps = np.float32(1e-7)
            xent = -pt.mean(y * pt.log(p + eps)
                            + (1 - y) * pt.log(1 - p + eps))
            gw, gb = ptt.grad(xent, [w, b])
            return ptt.function([X, y, w, b], [xent, gw, gb])

        ns = len(_ops(build(64)))
        ops_d = _ops(build(None))
        nd = len(ops_d)
        # inherent extras: Shape_i + the cast/div of the dynamic mean
        assert nd <= ns + 4, (nd, ns, ops_d)
        assert ops_d.count("Shape_i") == 1