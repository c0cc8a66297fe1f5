"""Coverage for wrap_jax, optimize, models, parallel, pickling, scalar loop."""

import io
import pickle

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt

rng = np.random.default_rng(0)


class TestWrapJax:
    def test_forward_and_grad(self):
        import jax.numpy as jnp

        @ptt.wrap_jax
        def fn(x, w):
            return jnp.tanh(x @ w)

        x = pt.TensorType("float64", (4, 3))("x")
        w = pt.TensorType("float64", (3, 2))("w")
        y = fn(x, w)
        assert y.type.shape == (4, 2)
        X, W = rng.random((4, 3)), rng.random((3, 2))
        f = ptt.function([x, w], y.sum())
        np.testing.assert_allclose(float(np.asarray(f(X, W))),
                                   np.tanh(X @ W).sum(), rtol=1e-10)
        g = ptt.grad(y.sum(), w)
        gv = np.asarray(ptt.function([x, w], g)(X, W))
        eps = 1e-6
        num = np.zeros_like(W)
        for i in range(3):
            for j in range(2):
                E = np.zeros_like(W)
                E[i, j] = eps
                num[i, j] = (np.tanh(X @ (W + E)).sum()
                             - np.tanh(X @ (W - E)).sum()) / (2 * eps)
        np.testing.assert_allclose(gv, num, atol=1e-5)


class TestOptimize:
    def test_minimize_and_ift(self):
        from pytensor_tpu.tensor.optimize import minimize

        x = pt.dscalar("x")
        a = pt.dscalar("a")
        (xstar, ok), _ = minimize((x - a) ** 2, x)
        f = ptt.function([x, a], xstar, mode="FAST_COMPILE")
        np.testing.assert_allclose(float(np.asarray(f(0.0, 3.0))), 3.0, atol=1e-5)
        g = ptt.grad(xstar, a)
        fg = ptt.function([x, a], g, mode="FAST_COMPILE")
        np.testing.assert_allclose(float(np.asarray(fg(0.0, 3.0))), 1.0, rtol=1e-5)

    def test_minimize_scalar_and_ift(self):
        """MinimizeScalarOp (reference tensor/optimize.py:552): brent on
        the oracle, Newton-on-stationarity on the device; IFT gradient."""
        from pytensor_tpu.tensor.optimize import MinimizeScalarOp, minimize_scalar

        x = pt.dscalar("x")
        a = pt.dscalar("a")
        (xstar, ok), op = minimize_scalar((x - a) ** 2 + 1.0, x)
        assert isinstance(op, MinimizeScalarOp)
        for mode in ("FAST_COMPILE", None):
            f = ptt.function([x, a], xstar, mode=mode)
            np.testing.assert_allclose(float(np.asarray(f(0.0, 3.0))), 3.0,
                                       atol=1e-5)
        g = ptt.grad(xstar, a)
        fg = ptt.function([x, a], g, mode="FAST_COMPILE")
        np.testing.assert_allclose(float(np.asarray(fg(0.0, 3.0))), 1.0,
                                   rtol=1e-5)

    def test_minimize_scalar_rejects_vector(self):
        from pytensor_tpu.tensor.optimize import minimize_scalar

        v = pt.dvector("v")
        with pytest.raises(ValueError, match="scalar"):
            minimize_scalar((v ** 2).sum(), v)

    def test_root_scalar_and_ift(self):
        """RootScalarOp (reference tensor/optimize.py:886): scipy newton
        with autodiffed fprime on the oracle; IFT gradient."""
        from pytensor_tpu.tensor.optimize import RootScalarOp, root_scalar

        x = pt.dscalar("x")
        a = pt.dscalar("a")
        (r, ok), op = root_scalar(x ** 3 - a, x)
        assert isinstance(op, RootScalarOp)
        for mode in ("FAST_COMPILE", None):
            fr = ptt.function([x, a], r, mode=mode)
            np.testing.assert_allclose(float(np.asarray(fr(1.5, 8.0))), 2.0,
                                       rtol=1e-6)
        gr = ptt.grad(r, a)
        fgr = ptt.function([x, a], gr, mode="FAST_COMPILE")
        # d(a^{1/3})/da = 1/(3 a^{2/3}) = 1/12 at a=8
        np.testing.assert_allclose(float(np.asarray(fgr(1.5, 8.0))), 1 / 12,
                                   rtol=1e-6)

    def test_root_and_ift(self):
        from pytensor_tpu.tensor.optimize import root

        x = pt.dscalar("x")
        a = pt.dscalar("a")
        (r, ok), _ = root(x ** 2 - a, x)
        fr = ptt.function([x, a], r, mode="FAST_COMPILE")
        np.testing.assert_allclose(float(np.asarray(fr(1.0, 4.0))), 2.0, rtol=1e-8)
        gr = ptt.grad(r, a)
        fgr = ptt.function([x, a], gr, mode="FAST_COMPILE")
        np.testing.assert_allclose(float(np.asarray(fgr(1.0, 4.0))), 0.25, rtol=1e-6)


class TestAssumptions:
    def test_solve_specialization(self):
        from pytensor_tpu.tensor import linalg as ptl
        from pytensor_tpu.tensor.linalg import SolveTriangular

        A = pt.dmatrix("A")
        b = pt.dvector("b")
        L = ptl.cholesky(A)
        x = ptl.solve(L, b, b_ndim=1)
        f = ptt.function([A, b], x)
        assert any(isinstance(n.op, SolveTriangular) for n in f.fgraph.apply_nodes)
        Av = rng.random((3, 3))
        Av = Av @ Av.T + 3 * np.eye(3)
        bv = rng.random(3)
        Lv = np.linalg.cholesky(Av)
        np.testing.assert_allclose(np.asarray(f(Av, bv)),
                                   np.linalg.solve(Lv, bv), rtol=1e-8)

    def test_assume_and_holds(self):
        from pytensor_tpu.assumptions import FactState, assume, holds

        x = pt.dmatrix("x")
        assume(x, "positive_definite")
        assert holds(x, "positive_definite") == FactState.TRUE
        assert holds(x, "diagonal") == FactState.UNKNOWN
        assert holds(pt.exp(x), "positive") == FactState.TRUE


class TestScalarLoop:
    def test_fori(self):
        from pytensor_tpu.scalar.loop import ScalarLoop

        st = pt.dscalar("st")
        cc = pt.dscalar("cc")
        loop = ScalarLoop([st], [st * cc], [cc])
        s0 = pt.dscalar("s0")
        c = pt.dscalar("c")
        out = loop(10, s0, c)
        for mode in ("FAST_RUN", "FAST_COMPILE"):
            f = ptt.function([s0, c], out, mode=mode)
            np.testing.assert_allclose(float(np.asarray(f(1.0, 2.0))), 1024.0)


class TestPickling:
    def test_graph_roundtrip(self):
        x = pt.dvector("x")
        y = pt.exp(x) * 2 + x[1:].sum()
        x2, y2 = pickle.loads(pickle.dumps([x, y]))
        f = ptt.function([x2], y2, mode="FAST_COMPILE")
        v = np.arange(3.0)
        np.testing.assert_allclose(np.asarray(f(v)),
                                   np.exp(v) * 2 + v[1:].sum())

    def test_function_roundtrip_and_copy(self):
        acc = ptt.shared(np.float64(0.0), name="acc")
        x = pt.dscalar("x")
        f = ptt.function([x], acc * 2, updates={acc: acc + x}, mode="FAST_COMPILE")
        f(1.0)
        f2 = pickle.loads(pickle.dumps(f))
        assert float(np.asarray(f2(1.0))) == 2.0  # acc pickled with value 1.0
        acc2 = ptt.shared(np.float64(100.0), name="acc2")
        f3 = f.copy(swap={acc: acc2})
        assert float(np.asarray(f3(1.0))) == 200.0
        assert float(acc2.get_value()) == 101.0

    def test_pkl_utils_zip(self):
        from pytensor_tpu.misc.pkl_utils import dump, load

        w = ptt.shared(np.arange(3.0), name="w")
        z = (pt.dscalar("s") * w).sum()
        buf = io.BytesIO()
        dump(z, buf)
        buf.seek(0)
        z2 = load(buf)
        assert float(z2.eval({"s": 2.0})) == 6.0


class TestModels:
    def test_radon_logp_parity(self):
        from pytensor_tpu.models.radon import make_radon_logp_grad

        f, theta0, n = make_radon_logp_grad(n_obs=50, n_counties=7)
        fp, _, _ = make_radon_logp_grad(n_obs=50, n_counties=7, mode="FAST_COMPILE")
        r_xla = [np.asarray(v) for v in f(theta0)]
        r_py = [np.asarray(v) for v in fp(theta0)]
        np.testing.assert_allclose(r_xla[0], r_py[0], rtol=1e-8)
        np.testing.assert_allclose(r_xla[1], r_py[1], rtol=1e-7, atol=1e-9)

    def test_radon_grad_matches_fd(self):
        from pytensor_tpu.models.radon import make_radon_logp_grad

        f, theta0, n = make_radon_logp_grad(n_obs=30, n_counties=5,
                                            mode="FAST_COMPILE")
        lp0, g = (np.asarray(v) for v in f(theta0))
        eps = 1e-6
        for k in (0, n - 1):
            t = theta0.copy()
            t[k] += eps
            lp_p = np.asarray(f(t)[0])
            t[k] -= 2 * eps
            lp_m = np.asarray(f(t)[0])
            np.testing.assert_allclose((lp_p - lp_m) / (2 * eps), g[k], rtol=1e-4)

    def test_logreg_step_decreases_loss(self):
        from pytensor_tpu.models.logreg import make_logreg_training_step

        f, (X, y), (w, b) = make_logreg_training_step(n=256, d=16)
        l1 = float(np.asarray(f(X, y)))
        for _ in range(5):
            l2 = float(np.asarray(f(X, y)))
        assert l2 < l1

    def test_gp_mll_runs(self):
        from pytensor_tpu.models.gp import make_gp_marginal_likelihood

        f, theta0 = make_gp_marginal_likelihood(n=32, mode="FAST_COMPILE")
        res = [float(np.asarray(v)) for v in f(*theta0)]
        assert all(np.isfinite(res))


class TestParallel:
    def test_dp_training_step_on_mesh(self):
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices")
        from pytensor_tpu import parallel
        from pytensor_tpu.models.logreg import make_logreg_training_step

        n_dev = len(jax.devices())
        mesh = parallel.make_mesh({"data": n_dev})
        f, (X, y), _ = make_logreg_training_step(n=8 * n_dev, d=8, mesh=mesh)
        Xs = parallel.device_put_sharded_value(X, mesh, parallel.spec("data", None))
        ys = parallel.device_put_sharded_value(y, mesh, parallel.spec("data"))
        l1 = float(np.asarray(f(Xs, ys)))
        l2 = float(np.asarray(f(Xs, ys)))
        assert l2 <= l1 + 1e-6


class TestDebugModeCatches:
    def test_bad_lowering_detected(self):
        from pytensor_tpu.compile.debug import BadThunkOutput, DebugMode
        from pytensor_tpu.graph.basic import Apply
        from pytensor_tpu.graph.op import Op
        from pytensor_tpu.link.xla.dispatch import xla_funcify
        from pytensor_tpu.tensor.type import TensorType

        class WrongOp(Op):
            __props__ = ()

            def make_node(self, x):
                return Apply(self, [x], [x.type()])

            def perform(self, node, inputs, output_storage):
                output_storage[0][0] = inputs[0] * 2

        @xla_funcify.register(WrongOp)
        def _wrong(op, node=None, **kw):
            return lambda x: x * 3  # deliberately inconsistent

        x = pt.dvector("x")
        out = WrongOp()(x)
        f = ptt.function([x], out, mode=DebugMode())
        with pytest.raises(BadThunkOutput):
            f(np.ones(3))


    def test_bad_rewrite_blamed(self):
        """Rewrite blame: a semantics-changing rewrite is detected and
        NAMED (reference debugmode.py:694 _find_bad_optimizations)."""
        from pytensor_tpu.compile.debug import BadOptimization, DebugMode
        from pytensor_tpu.compile.mode import optdb
        from pytensor_tpu.graph.rewriting.basic import node_rewriter
        from pytensor_tpu.graph.rewriting.db import EquilibriumDB
        from pytensor_tpu.scalar import basic as ps
        from pytensor_tpu.tensor.basic import constant
        from pytensor_tpu.tensor.elemwise import Elemwise

        @node_rewriter([Elemwise])
        def evil_exp_scale(fgraph, node):
            if getattr(node.op.scalar_op, "name", None) != "exp":
                return False
            if getattr(node.tag, "evil", False):
                return False
            new = Elemwise(ps.exp)(*node.inputs)
            new.owner.tag.evil = True
            return [new * constant(np.float64(1.5))]

        db = EquilibriumDB(name="evil")
        db.register("evil_exp_scale", evil_exp_scale, "evil_tag_test")
        optdb.register("evil_test", db, position=47.5)
        try:
            x = pt.dvector("x")
            mode = DebugMode().including("evil_tag_test")
            f = ptt.function([x], pt.exp(x) + 1.0, mode=mode)
            with pytest.raises(BadOptimization, match="evil_exp_scale"):
                f(np.ones(3))
            # and a clean pipeline does NOT blame
            f2 = ptt.function([x], pt.exp(x) + 1.0, mode=DebugMode())
            np.testing.assert_allclose(f2(np.ones(3)), np.e + 1)
        finally:
            del optdb._names["evil_test"]
            del optdb._tags["evil_test"]
            del optdb.positions["evil_test"]


class TestBatchedRadon:
    def test_matches_per_chain(self):
        from pytensor_tpu.models.radon import (
            make_radon_logp_batched,
            make_radon_logp_grad,
        )

        theta_b, logp_b, dlogp_b, n = make_radon_logp_batched(n_obs=40, n_counties=6)
        fb = ptt.function([theta_b], [logp_b, dlogp_b], mode="FAST_COMPILE")
        fs, theta0, _ = make_radon_logp_grad(n_obs=40, n_counties=6,
                                             mode="FAST_COMPILE")
        T = theta0 + 0.1 * np.random.default_rng(0).standard_normal((3, n))
        lb, gb = (np.asarray(v) for v in fb(T))
        for k in range(3):
            ls, gs = (np.asarray(v) for v in fs(T[k]))
            np.testing.assert_allclose(lb[k], ls, rtol=1e-10)
            np.testing.assert_allclose(gb[k], gs, rtol=1e-9)


class TestParallelTP:
    def test_mlp_dp_tp_step(self):
        import jax

        if len(jax.devices()) < 4:
            pytest.skip("needs >=4 devices")
        from pytensor_tpu import parallel
        from pytensor_tpu.models.mlp import make_mlp_training_step

        mesh = parallel.make_mesh({"data": len(jax.devices()) // 2, "model": 2})
        f, (X, y), _ = make_mlp_training_step(n=32, d=8, h=16, mesh=mesh)
        Xs = parallel.device_put_sharded_value(X, mesh,
                                               parallel.spec("data", None))
        ys = parallel.device_put_sharded_value(y, mesh, parallel.spec("data"))
        l1 = float(np.asarray(f(Xs, ys)))
        for _ in range(4):
            l2 = float(np.asarray(f(Xs, ys)))
        assert np.isfinite(l1) and l2 < l1

    def test_mlp_sharded_matches_unsharded(self):
        import jax

        if len(jax.devices()) < 4:
            pytest.skip("needs >=4 devices")
        from pytensor_tpu import parallel
        from pytensor_tpu.models.mlp import make_mlp_training_step

        mesh = parallel.make_mesh({"data": 2, "model": 2})
        fs, (X, y), _ = make_mlp_training_step(n=32, d=8, h=16, mesh=mesh)
        fu, _, _ = make_mlp_training_step(n=32, d=8, h=16)
        Xs = parallel.device_put_sharded_value(X, mesh,
                                               parallel.spec("data", None))
        ys = parallel.device_put_sharded_value(y, mesh, parallel.spec("data"))
        l_sharded = float(np.asarray(fs(Xs, ys)))
        l_plain = float(np.asarray(fu(X, y)))
        np.testing.assert_allclose(l_sharded, l_plain, rtol=1e-5)

    def test_hmc_chains_sharded(self):
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices")
        from pytensor_tpu import parallel
        from pytensor_tpu.models.hmc import make_radon_hmc_chains

        mesh = parallel.make_mesh({"data": len(jax.devices())})
        f, pos, n = make_radon_hmc_chains(
            n_chains=2 * len(jax.devices()), n_obs=40, n_counties=5,
            n_leapfrog=3, mesh=mesh)
        lp1, _ = f()
        lp2, _ = f()
        assert np.isfinite(np.asarray(lp2)).all()
        assert np.abs(np.asarray(pos.get_value())).sum() > 0


class TestMultinomialHMC:
    def test_trajectory_sampling_moves(self):
        from pytensor_tpu.models.hmc import make_radon_multinomial_hmc

        f, pos, n = make_radon_multinomial_hmc(n_obs=50, n_counties=6,
                                               n_leapfrog=6)
        idxs = set()
        for _ in range(10):
            lp, idx = f()
            idxs.add(int(np.asarray(idx)))
        assert np.isfinite(float(np.asarray(lp)))
        assert len(idxs) > 1  # samples along the trajectory, not endpoint-only
        assert np.abs(np.asarray(pos.get_value())).sum() > 0


def test_dump_function():
    from pytensor_tpu.compile.debug.dump import dump_function

    x = pt.dvector("x")
    f = ptt.function([x], (x ** 2).sum(), profile=True)
    f(np.arange(3.0))
    txt = dump_function(f, hlo=True)
    assert "backend" in txt and len(txt) > 200


def test_convolve2d_grads_fd():
    """Convolve2d pullback for full/valid modes (reference
    tensor/signal/conv.py Convolve2d:253)."""
    from pytensor_tpu.tensor.signal.conv import convolve2d

    rng2 = np.random.default_rng(7)
    xv, kv = rng2.random((8, 9)), rng2.random((3, 4))
    x, k = pt.dmatrix("x"), pt.dmatrix("k")
    for mode_c in ("full", "valid"):
        cost = (convolve2d(x, k, mode=mode_c) ** 2).sum()
        gx, gk = ptt.grad(cost, [x, k])
        f = ptt.function([x, k], [cost, gx, gk], mode="FAST_COMPILE")
        c0, gxa, gka = (np.asarray(v) for v in f(xv, kv))
        eps = 1e-6
        for (i, j) in [(0, 0), (1, 2), (2, 3)]:
            e = np.zeros((3, 4))
            e[i, j] = eps
            fd = (float(np.asarray(f(xv, kv + e)[0]))
                  - float(np.asarray(f(xv, kv - e)[0]))) / (2 * eps)
            np.testing.assert_allclose(gka[i, j], fd, rtol=1e-5)


def test_fft_grads_fd():
    """rfft/irfft pullbacks (reference fft.py:50,111 adapted to our
    np-normalized irfft), even and odd lengths, both backends."""
    from pytensor_tpu.tensor.fft import irfft, rfft

    rng2 = np.random.default_rng(3)
    for N in (16, 9):
        xv = rng2.random(N)
        x = pt.tensor("x", dtype="float64", shape=(N,))
        w = rng2.random((N // 2 + 1, 2))
        cost = (rfft(x) * w).sum()
        g = ptt.grad(cost, x)
        f = ptt.function([x], [cost, g], mode="FAST_COMPILE")
        c0, gv = (np.asarray(v) for v in f(xv))
        eps = 1e-6
        E = rng2.standard_normal(N)
        fd = (float(np.asarray(f(xv + eps * E)[0]))
              - float(np.asarray(f(xv - eps * E)[0]))) / (2 * eps)
        np.testing.assert_allclose((gv * E).sum(), fd, rtol=1e-6)
    K = 9
    zv = rng2.random((K, 2))
    z = pt.tensor("z", dtype="float64", shape=(K, 2))
    w2 = rng2.random(2 * (K - 1))
    cost = (irfft(z) * w2).sum()
    g = ptt.grad(cost, z)
    f = ptt.function([z], [cost, g], mode="FAST_COMPILE")
    c0, gv = (np.asarray(v) for v in f(zv))
    E = rng2.standard_normal((K, 2))
    eps = 1e-6
    fd = (float(np.asarray(f(zv + eps * E)[0]))
          - float(np.asarray(f(zv - eps * E)[0]))) / (2 * eps)
    np.testing.assert_allclose((gv * E).sum(), fd, rtol=1e-6)


def test_pad_sort_repeat_interp_grads_fd():
    from pytensor_tpu.tensor.extra_ops import repeat
    from pytensor_tpu.tensor.interpolate import interp
    from pytensor_tpu.tensor.pad import pad
    from pytensor_tpu.tensor.sort import sort

    rng2 = np.random.default_rng(3)

    def fd_check(cost_fn, xv, rtol=1e-4):
        x = pt.tensor("x", dtype="float64", shape=xv.shape)
        cost = cost_fn(x)
        g = ptt.grad(cost, x)
        f = ptt.function([x], [cost, g], mode="FAST_COMPILE")
        c0, gv = (np.asarray(v) for v in f(xv))
        eps = 1e-6
        E = rng2.standard_normal(xv.shape)
        fd = (float(np.asarray(f(xv + eps * E)[0]))
              - float(np.asarray(f(xv - eps * E)[0]))) / (2 * eps)
        np.testing.assert_allclose((gv * E).sum(), fd, rtol=rtol)

    for mode in ("constant", "reflect", "edge"):
        fd_check(lambda x, m=mode: (pad(x, 2, mode=m) ** 2).sum(),
                 rng2.random(9))
    fd_check(lambda x: (sort(x) * np.arange(1.0, 10.0)).sum(), rng2.random(9))
    fd_check(lambda x: (repeat(x, 3, axis=0) * np.arange(27.0)).sum(),
             rng2.random(9))
    fd_check(lambda x: interp(pt.as_tensor_variable(np.array([0.5, 1.5, 2.5])),
                              np.arange(4.0), x).sum(), rng2.random(4))


def test_convolve_same_mode_grads_fd():
    """same-mode conv pullbacks: gz embedded into the full-mode cotangent."""
    from pytensor_tpu.tensor.signal.conv import convolve1d, convolve2d

    rng2 = np.random.default_rng(7)
    xv, kv = rng2.random(12), rng2.random(5)
    x = pt.tensor("x", dtype="float64", shape=(12,))
    k = pt.tensor("k", dtype="float64", shape=(5,))
    cost = (convolve1d(x, k, mode="same") ** 2).sum()
    gx, gk = ptt.grad(cost, [x, k])
    f = ptt.function([x, k], [cost, gx, gk], mode="FAST_COMPILE")
    c0, gxa, gka = (np.asarray(v) for v in f(xv, kv))
    eps = 1e-6
    Ek = rng2.standard_normal(5)
    fdk = (float(np.asarray(f(xv, kv + eps * Ek)[0]))
           - float(np.asarray(f(xv, kv - eps * Ek)[0]))) / (2 * eps)
    np.testing.assert_allclose((gka * Ek).sum(), fdk, rtol=1e-6)
    xv2, kv2 = rng2.random((7, 8)), rng2.random((3, 3))
    x2 = pt.tensor("x2", dtype="float64", shape=(7, 8))
    k2 = pt.tensor("k2", dtype="float64", shape=(3, 3))
    cost = (convolve2d(x2, k2, mode="same") ** 2).sum()
    gk2 = ptt.grad(cost, k2)
    f2 = ptt.function([x2, k2], [cost, gk2], mode="FAST_COMPILE")
    c0, gka2 = (np.asarray(v) for v in f2(xv2, kv2))
    E2 = rng2.standard_normal((3, 3))
    fd2 = (float(np.asarray(f2(xv2, kv2 + eps * E2)[0]))
           - float(np.asarray(f2(xv2, kv2 - eps * E2)[0]))) / (2 * eps)
    np.testing.assert_allclose((gka2 * E2).sum(), fd2, rtol=1e-6)


class TestParallelPPandEP:
    """Pipeline (GPipe over ppermute) and expert (Switch MoE over
    all_to_all) parallelism on the virtual mesh (SURVEY §5.8)."""

    def test_pipeline_forward_matches_sequential(self):
        import jax
        import jax.numpy as jnp
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from pytensor_tpu import parallel
        from pytensor_tpu.parallel import pipeline as plmod

        n_stages, n_micro, mb, d = 4, 6, 4, 8
        mesh = parallel.make_mesh({"pipe": n_stages})
        Wv_ = pt.tensor("W", dtype="float32", shape=(d, d))
        bv_ = pt.tensor("b", dtype="float32", shape=(d,))
        xv_ = pt.tensor("x", dtype="float32", shape=(mb, d))
        stage_fn = plmod.as_stage_callable(
            ([xv_, Wv_, bv_], pt.tanh(pt.dot(xv_, Wv_) + bv_)))
        layer = lambda Wl, bl, xl: (stage_fn(xl, Wl, bl),)  # noqa: E731
        rng = np.random.default_rng(0)
        W = (rng.standard_normal((n_stages, d, d)) * 0.3).astype("float32")
        b = np.zeros((n_stages, d), "float32")
        xs = rng.standard_normal((n_micro, mb, d)).astype("float32")
        out = xs.copy()
        for s in range(n_stages):
            out = np.tanh(out @ W[s] + b[s])

        ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def probe(W_l, b_l, xs_):
            idx = jax.lax.axis_index("pipe")

            def body(carry, t):
                k_in = jnp.minimum(t, n_micro - 1)
                inp = jnp.where(idx == 0, xs_[k_in], carry)
                y = layer(W_l[0], b_l[0], inp)[0]
                nxt = jax.lax.ppermute(y, "pipe", ring)
                k_out = t - (n_stages - 1)
                emit = jnp.where((idx == n_stages - 1) & (k_out >= 0), y,
                                 jnp.zeros_like(y))
                return nxt, (emit, k_out)

            init = jax.lax.pcast(jnp.zeros((mb, d), "float32"), ("pipe",),
                                 to="varying")
            _, (emits, ks) = jax.lax.scan(body, init,
                                          jnp.arange(n_micro + n_stages - 1))
            outs = jnp.zeros((n_micro, mb, d))
            outs = outs.at[jnp.clip(ks, 0, n_micro - 1)].add(
                jnp.where((ks >= 0)[:, None, None], emits, 0.0))
            return jax.lax.psum(outs, "pipe")

        f = jax.jit(shard_map(probe, mesh=mesh,
                              in_specs=(P("pipe"), P("pipe"), P()),
                              out_specs=P()))
        np.testing.assert_allclose(np.asarray(f(W, b, xs)), out,
                                   rtol=1e-5, atol=1e-6)

    def test_pipeline_train_step_decreases_loss(self):
        from pytensor_tpu import parallel
        from pytensor_tpu.parallel.pipeline import (
            make_demo_pipeline_train_step,
        )

        mesh = parallel.make_mesh({"pipe": 4})
        step, params, (xs, ys) = make_demo_pipeline_train_step(
            mesh, n_micro=8, mb=4, d=8)
        losses = []
        for _ in range(8):
            params, loss = step(params, xs, ys)
            losses.append(float(np.asarray(loss)))
        assert losses[-1] < losses[0]

    def test_moe_train_step_decreases_loss(self):
        from pytensor_tpu import parallel
        from pytensor_tpu.parallel.moe import make_demo_moe_train_step

        mesh = parallel.make_mesh({"expert": 8})
        step, (Wg, params), (x, y) = make_demo_moe_train_step(
            mesh, tokens_per_dev=16, d=8, h=16)
        losses = []
        for _ in range(8):
            Wg, params, loss = step(Wg, params, x, y)
            losses.append(float(np.asarray(loss)))
        assert losses[-1] < losses[0]


def test_debugmode_stochastic_order_check():
    """DebugMode rewrites the graph twice and compares canonical
    signatures (reference debugmode.py:287 StochasticOrder)."""
    import itertools

    from pytensor_tpu.compile.debug import DebugMode
    from pytensor_tpu.compile.debug.debugmode import (StochasticOrder,
                                                      _RecordingRewriter)
    from pytensor_tpu.graph.fg import FunctionGraph
    from pytensor_tpu.graph.rewriting.basic import GraphRewriter

    # deterministic pipeline passes silently
    x = pt.dvector("x")
    f = ptt.function([x], pt.exp(x) + pt.log1p(x * x), mode=DebugMode())
    np.testing.assert_allclose(np.asarray(f(np.ones(3))),
                               np.e + np.log(2.0))

    # a nondeterministic rewriter is caught
    flips = itertools.count()

    class Flaky(GraphRewriter):
        def apply(self, fgraph):
            if next(flips) % 2:
                fgraph.replace(fgraph.outputs[0],
                               fgraph.outputs[0] + 0.0, reason="flaky")

    fg = FunctionGraph([x], [pt.exp(x)], clone=True)
    with pytest.raises(StochasticOrder):
        _RecordingRewriter(Flaky()).apply(fg)
