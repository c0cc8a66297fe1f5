"""General pipeline / expert parallel APIs (parallel/{pipeline,moe}.py):
arbitrary user stage graphs, gradients vs serial execution.

VERDICT r2 item 6 done-criterion: a >=4-stage, >=64-dim pipeline built
from a ptt.function stage matches serial gradients at 1e-6.
"""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu import parallel


def _mesh_or_skip(shape):
    import jax

    n = int(np.prod(list(shape.values())))
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return parallel.make_mesh(shape)


class TestGeneralPipeline:
    def test_pipeline_grads_match_serial(self):
        """4 stages x 64 dims, float64: one pipeline SGD step equals the
        serial step at 1e-6."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = _mesh_or_skip({"pipe": 4})
        S, d, mb, n_micro, lr = 4, 64, 4, 8, 0.05
        dtype = "float64"

        # user stage graph compiled via ptt.function
        W = pt.tensor("W", dtype=dtype, shape=(d, d))
        b = pt.tensor("b", dtype=dtype, shape=(d,))
        x = pt.tensor("x", dtype=dtype, shape=(mb, d))
        y = pt.tanh(pt.dot(x, W) + b)
        layer_f = ptt.function([x, W, b], y, name="stage")

        from pytensor_tpu.parallel.pipeline import make_pipeline_train_step

        step = make_pipeline_train_step(layer_f, mesh=mesh, n_micro=n_micro,
                                        lr=lr)

        rng = np.random.default_rng(0)
        Wv = (rng.standard_normal((S, d, d)) * 0.2).astype(dtype)
        bv = (rng.standard_normal((S, d)) * 0.1).astype(dtype)
        xs = rng.standard_normal((n_micro, mb, d)).astype(dtype)
        ys = np.tanh(rng.standard_normal((n_micro, mb, d))).astype(dtype)

        Wd = jax.device_put(Wv, NamedSharding(mesh, P("pipe")))
        bd = jax.device_put(bv, NamedSharding(mesh, P("pipe")))
        (W1, b1), loss = step((Wd, bd), jax.device_put(xs),
                              jax.device_put(ys))

        # serial reference through the SAME framework
        Ws = pt.tensor("Ws", dtype=dtype, shape=(S, d, d))
        bs = pt.tensor("bs", dtype=dtype, shape=(S, d))
        xs_v = pt.tensor("xs", dtype=dtype, shape=(n_micro, mb, d))
        ys_v = pt.tensor("ys", dtype=dtype, shape=(n_micro, mb, d))
        h = xs_v.reshape((n_micro * mb, d))
        for s in range(S):
            h = pt.tanh(pt.dot(h, Ws[s]) + bs[s])
        loss_s = pt.mean((h.reshape((n_micro, mb, d)) - ys_v) ** 2)
        gW, gb = ptt.grad(loss_s, [Ws, bs])
        f = ptt.function([Ws, bs, xs_v, ys_v], [loss_s, gW, gb])
        loss_ref, gW_ref, gb_ref = (np.asarray(v)
                                    for v in f(Wv, bv, xs, ys))

        np.testing.assert_allclose(float(np.asarray(loss)),
                                   float(loss_ref), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(W1), Wv - lr * gW_ref,
                                   atol=1e-6, rtol=1e-8)
        np.testing.assert_allclose(np.asarray(b1), bv - lr * gb_ref,
                                   atol=1e-6, rtol=1e-8)

    def test_pipeline_custom_loss_and_three_params(self):
        """Stage graphs with three params and a user loss graph."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = _mesh_or_skip({"pipe": 2})
        S, d, mb, n_micro = 2, 8, 2, 4
        dtype = "float64"
        W = pt.tensor("W", dtype=dtype, shape=(d, d))
        g = pt.tensor("g", dtype=dtype, shape=(d,))
        b = pt.tensor("b", dtype=dtype, shape=(d,))
        x = pt.tensor("x", dtype=dtype, shape=(mb, d))
        y = pt.tanh(pt.dot(x, W) * g + b)
        pred = pt.tensor("p", dtype=dtype, shape=(n_micro, mb, d))
        tgt = pt.tensor("t", dtype=dtype, shape=(n_micro, mb, d))
        l1 = pt.mean(pt.abs(pred - tgt))

        from pytensor_tpu.parallel.pipeline import make_pipeline_train_step

        step = make_pipeline_train_step(
            ([x, W, g, b], y), loss=([pred, tgt], l1), mesh=mesh,
            n_micro=n_micro, lr=0.01)
        rng = np.random.default_rng(1)
        params = tuple(jax.device_put(v, NamedSharding(mesh, P("pipe")))
                       for v in (
            (rng.standard_normal((S, d, d)) * 0.2).astype(dtype),
            np.ones((S, d), dtype),
            np.zeros((S, d), dtype)))
        xs = jax.device_put(
            rng.standard_normal((n_micro, mb, d)).astype(dtype))
        ys = jax.device_put(
            np.tanh(rng.standard_normal((n_micro, mb, d))).astype(dtype))
        p1, loss1 = step(params, xs, ys)
        p2, loss2 = step(p1, xs, ys)
        assert np.isfinite(float(np.asarray(loss2)))
        assert float(np.asarray(loss2)) <= float(np.asarray(loss1)) + 1e-9


class TestGeneralMoE:
    def test_moe_user_expert_trains(self):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = _mesh_or_skip({"expert": 4})
        E, d, h, tpd = 4, 8, 16, 8
        dtype = "float32"
        W1 = pt.tensor("W1", dtype=dtype, shape=(d, h))
        W2 = pt.tensor("W2", dtype=dtype, shape=(h, d))
        x = pt.tensor("x", dtype=dtype, shape=(E * tpd, d))
        y = pt.dot(pt.maximum(pt.dot(x, W1), np.asarray(0.0, dtype)), W2)
        expert_f = ptt.function([x, W1, W2], y)

        from pytensor_tpu.parallel.moe import make_moe_train_step

        step = make_moe_train_step(expert_f, mesh=mesh, d=d,
                                   tokens_per_dev=tpd, lr=0.05)
        rng = np.random.default_rng(2)
        Wg = jax.device_put((rng.standard_normal((d, E)) * 0.3)
                            .astype(dtype), NamedSharding(mesh, P()))
        params = tuple(jax.device_put(v, NamedSharding(mesh, P("expert")))
                       for v in (
            (rng.standard_normal((E, d, h)) * 0.3).astype(dtype),
            (rng.standard_normal((E, h, d)) * 0.3).astype(dtype)))
        xv = jax.device_put(
            rng.standard_normal((E * tpd, d)).astype(dtype),
            NamedSharding(mesh, P("expert")))
        yv = jax.device_put(
            np.tanh(rng.standard_normal((E * tpd, d))).astype(dtype),
            NamedSharding(mesh, P("expert")))
        losses = []
        for _ in range(4):
            Wg, params, loss = step(Wg, params, xv, yv)
            losses.append(float(np.asarray(loss)))
        assert all(np.isfinite(losses))
        assert losses[-1] <= losses[0] + 1e-6