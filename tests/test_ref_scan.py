"""Port of the semantics audited by the reference's tests/scan/test_basic.py
(4,285 LoC): zero-step and empty-sequence loops, tap plumbing (sequence taps,
negative/future taps, min-tap one-step), shared-variable update dicts from the
inner function, gradient semantics (clipped sequences, grad-of-grad,
multi-tap states, disconnected outputs, until+truncate interaction), and the
error contracts (bad output taps, missing update inputs, inconsistent
broadcast).

Semantics only — CVM/linker-specific and inner-Function-storage tests are N/A
by design (whole-loop lax.scan lowering).  Reference file:
/root/reference/tests/scan/test_basic.py.
"""

from __future__ import annotations

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.gradient import grad, verify_grad
from pytensor_tpu.graph.fg import MissingInputError
from pytensor_tpu.scan import scan
from pytensor_tpu.scan.op import Scan
from pytensor_tpu.scan.utils import until
from pytensor_tpu.tensor.math import dot, mean

floatX = ptt.config.floatX
rng = np.random.default_rng(20260820)


def asX(x):
    return np.asarray(x, dtype=floatX)


class TestScanBasics:
    @pytest.mark.parametrize("mode", ["FAST_COMPILE", "FAST_RUN"])
    def test_no_step(self, mode):
        """n_steps == 0 yields an empty output buffer of the state dtype."""
        x_init = pt.scalar("x_init")
        n_steps = pt.iscalar("n_steps")
        values = scan(lambda x: 2 * x, outputs_info=(x_init,),
                      n_steps=n_steps, return_updates=False)
        f = ptt.function([x_init, n_steps], values, mode=mode)
        res = np.asarray(f(1.0, 0))
        assert res.shape == (0,)
        assert str(res.dtype) == values.dtype

    @pytest.mark.parametrize("mode", ["FAST_COMPILE", "FAST_RUN"])
    @pytest.mark.parametrize("seq_dtype", [floatX, "int32"])
    def test_no_steps_sit_sot(self, mode, seq_dtype):
        x = pt.vector("x", dtype=seq_dtype)
        x_init = pt.scalar("x_init")
        values = scan(lambda s, xi: 2 * xi, sequences=x,
                      outputs_info=(x_init,), return_updates=False)
        f = ptt.function([x_init, x], values, mode=mode)
        res = np.asarray(f(1.0, np.array([], dtype=seq_dtype)))
        assert res.shape == (0,)

    @pytest.mark.parametrize("mode", ["FAST_COMPILE", "FAST_RUN"])
    @pytest.mark.parametrize("seq_dtype", [floatX, "int32"])
    def test_no_steps_nit_sot(self, mode, seq_dtype):
        x = pt.vector("x", dtype=seq_dtype)
        values = scan(lambda s: 2 * s, sequences=x, return_updates=False)
        f = ptt.function([x], values, mode=mode)
        res = np.asarray(f(np.array([], dtype=seq_dtype)))
        assert res.shape == (0,)
        assert str(res.dtype) == values.dtype

    def test_only_nonseq_inputs(self):
        n_steps = 2
        inp = pt.matrix()
        broadcasted_inp = scan(lambda x: x, non_sequences=[inp],
                               n_steps=n_steps, return_updates=False)
        out = broadcasted_inp.sum()
        gr = grad(out, inp)
        fun = ptt.function([inp], [broadcasted_inp, gr])
        inputs = np.array([[1, 2], [3, 4]], dtype=floatX)
        out1, out2 = fun(inputs)
        np.testing.assert_allclose(np.asarray(out1),
                                   np.repeat(inputs[None], n_steps, axis=0))
        np.testing.assert_allclose(np.asarray(out2),
                                   np.full(inputs.shape, n_steps))

    @pytest.mark.parametrize("go_backwards", [False, True])
    def test_one_sequence_one_output_weights(self, go_backwards):
        u = pt.vector("u")
        x0 = pt.scalar("x0")
        W_in = pt.scalar("win")
        W = pt.scalar("w")
        output = scan(lambda u_t, x_tm1, wi, w: u_t * wi + x_tm1 * w,
                      u, x0, [W_in, W], go_backwards=go_backwards,
                      return_updates=False)
        f2 = ptt.function([u, x0, W_in, W], output)
        v_u = rng.uniform(-5.0, 5.0, size=(4,)).astype(floatX)
        v_x0, vW, vW_in = rng.uniform(), rng.uniform(), rng.uniform()
        seq = v_u[::-1] if go_backwards else v_u
        v_out = np.zeros(4)
        v_out[0] = seq[0] * vW_in + v_x0 * vW
        for step in range(1, 4):
            v_out[step] = seq[step] * vW_in + v_out[step - 1] * vW
        np.testing.assert_allclose(
            np.asarray(f2(v_u, asX(v_x0), asX(vW_in), asX(vW))), v_out,
            rtol=1e-5)

    def test_one_sequence_one_output_weights_shared(self):
        u = pt.vector("u")
        x0 = pt.scalar("x0")
        vW_in, vW = asX(rng.uniform()), asX(rng.uniform())
        W_in = ptt.shared(vW_in, name="w_in")
        W = ptt.shared(vW, name="w")
        output = scan(lambda u_t, x_tm1: u_t * W_in + x_tm1 * W,
                      u, x0, return_updates=False)
        f = ptt.function([u, x0], output)
        v_u = rng.uniform(-5.0, 5.0, size=(4,)).astype(floatX)
        v_x0 = asX(rng.uniform())
        v_out = np.zeros(4)
        v_out[0] = v_u[0] * vW_in + v_x0 * vW
        for step in range(1, 4):
            v_out[step] = v_u[step] * vW_in + v_out[step - 1] * vW
        np.testing.assert_allclose(np.asarray(f(v_u, v_x0)), v_out, rtol=1e-5)

    def test_output_only(self):
        u = pt.vector("u")
        outputs = scan(lambda u_t: u_t + 3, u, [], [], return_updates=False)
        f2 = ptt.function([u], outputs)
        v_u = rng.uniform(-5.0, 5.0, size=(5,)).astype(floatX)
        np.testing.assert_allclose(np.asarray(f2(v_u)), v_u + 3, rtol=1e-6)

    def test_using_taps_sequence(self):
        x = pt.dvector()
        y = scan(lambda x: [x], sequences=dict(input=x, taps=[-1]),
                 outputs_info=[None], return_updates=False)
        inp = np.arange(5).astype("float64")
        rval = np.asarray(ptt.function([x], y)(inp))
        assert np.all(rval == inp[:-1])

    def test_using_negative_taps_sequence(self):
        x = pt.fvector("x")
        res, upd = scan(lambda a, b: a, sequences=dict(input=x, taps=[-2, -1]))
        f = ptt.function([x], res, updates=upd)
        np.testing.assert_allclose(
            np.asarray(f(np.asarray([1, 2, 3, 4, 5], dtype="float32"))),
            np.array([1, 2, 3], dtype="float32"))

    def test_past_future_taps_shared(self):
        vW, vW_in = asX(rng.uniform()), asX(rng.uniform())
        vu = rng.uniform(-5.0, 5.0, size=(6,)).astype(floatX)
        vx0 = rng.uniform(-5.0, 5.0, size=(2,)).astype(floatX)
        u = pt.vector("u")
        x0 = pt.vector("x0")
        W_in = ptt.shared(vW_in, name="w_in")
        W = ptt.shared(vW, name="w")

        def f_rnn_shared(u_tm2, u_tp2, x_tm1, x_tm2):
            return (u_tm2 + u_tp2) * W_in + x_tm1 * W + x_tm2

        output = scan(f_rnn_shared, dict(input=u, taps=[-2, 2]),
                      dict(initial=x0, taps=[-1, -2]), [],
                      return_updates=False)
        f8 = ptt.function([u, x0], output)
        numpy_out = np.zeros(2)
        numpy_out[0] = (vu[0] + vu[4]) * vW_in + vx0[1] * vW + vx0[0]
        numpy_out[1] = (vu[1] + vu[5]) * vW_in + numpy_out[0] * vW + vx0[1]
        np.testing.assert_allclose(np.asarray(f8(vu, vx0)), numpy_out,
                                   rtol=1e-5)

    def test_mintap_onestep(self):
        seq = pt.ivector("seq")
        rs = scan(lambda seq_t, prev: prev + seq_t,
                  sequences={"input": seq, "taps": [2]},
                  outputs_info=0, n_steps=1, return_updates=False)
        f = ptt.function([seq], rs)
        assert np.asarray(f(np.arange(20).astype("int32"))) == 2

    def test_generator_one_output_scalar_return_list(self):
        state = pt.scalar("state")
        n_steps = pt.iscalar("nsteps")
        output = scan(lambda x: 2 * x, [], state, [], n_steps=n_steps,
                      return_list=True, return_updates=False)
        assert isinstance(output, list)
        my_f = ptt.function([state, n_steps], output)
        st = rng.uniform()
        expected = np.array([st * 2 ** (k + 1) for k in range(5)])
        # function returns a list (return_list): index like the reference
        np.testing.assert_allclose(np.asarray(my_f(asX(st), 5)[0]), expected,
                                   rtol=1e-5)

    def test_output_padding(self):
        """n_steps=1: dict(initial=...) keeps ndim for [-1]; updates never
        get the leading time axis (reference changeset ba7157e95cb1)."""
        init_a = pt.vector("init_a")
        b = ptt.shared(rng.random((5, 4)))
        out, updates = scan(lambda a: (a + 1, {b: 2 * b}),
                            outputs_info=[{"initial": init_a}], n_steps=1)
        assert out[-1].type.ndim == init_a.type.ndim
        assert updates[b].type.ndim == b.type.ndim
        out, updates = scan(lambda a: (a + 1, {b: 2 * b}),
                            outputs_info=[init_a], n_steps=1)
        assert out.type.ndim == init_a.type.ndim + 1
        assert updates[b].type.ndim == b.type.ndim

    def test_sequence_dict_input_only_key(self):
        x = pt.vector("x")
        sx, _upx = scan(fn=lambda s: s + 1, sequences=[{"input": x}])
        assert isinstance(sx.owner.op, Scan) or isinstance(
            sx.owner.inputs[0].owner.op, Scan)

    def test_seq_tap_bug_jeremiah(self):
        inp = np.arange(10).reshape(-1, 1).astype(floatX)
        exp_out = np.zeros((10, 1)).astype(floatX)
        exp_out[4:] = inp[:-4]
        seq = pt.matrix()
        initial_value = ptt.shared(np.zeros((4, 1), dtype=floatX))
        results = scan(lambda x, x_tm4: (x, x_tm4), sequences=seq,
                       outputs_info=[{"initial": initial_value, "taps": [-4]},
                                     None],
                       return_updates=False)
        f = ptt.function([seq], results[1])
        assert np.all(exp_out == np.asarray(f(inp)))


class TestScanUpdates:
    def test_shared_arguments_with_updates(self):
        lrng = np.random.default_rng(101)
        vW1, vW2 = asX(lrng.random((2, 3))), asX(lrng.random((3, 2)))
        vu1, vu2 = asX(lrng.random((3, 2))), asX(lrng.random((3, 3)))
        vy0, vy1 = asX(lrng.random((3, 2))), asX(lrng.random(2))
        W1 = ptt.shared(vW1.copy(), "W1")
        W2 = ptt.shared(vW2.copy(), "W2")
        u1 = ptt.shared(vu1.copy(), "u1")
        y1 = ptt.shared(vy1.copy(), "y1")

        def f(u1_t, u2_t, y0_tm3, y0_tm2, y0_tm1, y1_tm1):
            y0_t = (dot(dot(u1_t, W1), W2) + 0.1 * y0_tm1
                    + 0.33 * y0_tm2 + 0.17 * y0_tm3)
            y1_t = dot(u2_t, W2) + y1_tm1
            y2_t = dot(u1_t, W1)
            return ([y0_t, y1_t, y2_t], [(W1, W1 + 0.1), (W2, W2 + 0.05)])

        u2 = pt.matrix("u2")
        y0 = pt.matrix("y0")
        outputs, updates = scan(
            f, [u1, u2], [dict(initial=y0, taps=[-3, -2, -1]), y1, None], [])
        f10 = ptt.function([u2, y0], outputs, updates=updates)
        py0, py1, py2 = (np.asarray(a) for a in f10(vu2, vy0))

        ny0, ny1 = np.zeros((6, 2)), np.zeros((4, 2))
        ny2 = np.zeros((3, 3))
        ny0[:3], ny1[0] = vy0, vy1
        nW1, nW2 = vW1.copy().astype("float64"), vW2.copy().astype("float64")
        for i in range(3):
            ny0[i + 3] = (vu1[i] @ nW1 @ nW2 + 0.1 * ny0[i + 2]
                          + 0.33 * ny0[i + 1] + 0.17 * ny0[i])
            ny1[i + 1] = vu2[i] @ nW2 + ny1[i]
            ny2[i] = vu1[i] @ nW1
            nW1, nW2 = nW1 + 0.1, nW2 + 0.05
        np.testing.assert_allclose(py0, ny0[3:], rtol=1e-4)
        np.testing.assert_allclose(py1, ny1[1:], rtol=1e-4)
        np.testing.assert_allclose(py2, ny2, rtol=1e-4)
        np.testing.assert_allclose(W1.get_value(), nW1, rtol=1e-4)
        np.testing.assert_allclose(W2.get_value(), nW2, rtol=1e-4)

    @pytest.mark.parametrize("mode", ["FAST_COMPILE", "FAST_RUN"])
    def test_only_shared_no_input_no_output(self, mode):
        v_state = asX(rng.uniform())
        state = ptt.shared(v_state.copy(), "vstate")
        n_steps = pt.iscalar("nstep")
        output, updates = scan(lambda: {state: 2 * state}, [], [], [],
                               n_steps=n_steps)
        this_f = ptt.function([n_steps], output, updates=updates, mode=mode)
        this_f(3)
        np.testing.assert_allclose(state.get_value(), v_state * 8, rtol=1e-5)
        state.set_value(v_state.copy())

    def test_grad_numeric_shared(self):
        shared_var = ptt.shared(np.float32(1.0))
        _, updates = scan(lambda: ([], {shared_var: shared_var
                                        + np.float32(1.0)}),
                          n_steps=10)
        cost = next(iter(updates.values()))
        g_sh = grad(cost, shared_var)
        fgrad = ptt.function([], g_sh)
        assert np.asarray(fgrad()) == 1

    def test_update_target_must_be_shared(self):
        x = pt.scalar("x")
        with pytest.raises(TypeError):
            scan(lambda: {x: x + 1}, n_steps=3)


class TestScanGrads:
    def test_grad_multiple_seqs_different_nsteps(self):
        # sequences are clipped to n_steps before the gradient reverses them
        c = pt.vector("c")
        x = pt.scalar("x")
        full_range = pt.arange(1000)
        components = scan(lambda coeff, power, free_var:
                          coeff * (free_var ** power),
                          outputs_info=None, sequences=[c, full_range],
                          non_sequences=x, return_updates=False)
        P = components.sum()
        dP = grad(P, x)
        tf = ptt.function([c, x], dP)
        assert np.asarray(tf(asX([1.0, 2.0, -3.0, 4.0]), asX(2.0))) == 38

    def test_grad_of_grad_of_state(self):
        c = pt.vector("c")
        x = pt.scalar("x")
        full_range = pt.arange(1000)
        components = scan(lambda coeff, power, free_var:
                          coeff * (free_var ** power),
                          outputs_info=None, sequences=[c, full_range],
                          non_sequences=x, return_updates=False)
        P = components.sum()
        dP = grad(P, x).sum()
        ddP = grad(dP, x)
        tf = ptt.function([c, x], ddP)
        assert np.asarray(tf(asX([1.0, 2.0, -3.0, 4.0]), asX(2.0))) == 42

    def test_grad_multiple_taps_state(self):
        xinit = pt.tensor3("xinit")
        w = pt.matrix("w")
        (xseq, _updates) = scan(
            n_steps=10,
            fn=lambda xdl, xprev, w_: w_ + xprev,
            outputs_info=[dict(initial=xinit, taps=[-4, -1])],
            non_sequences=w)
        loss = (xseq[-1] ** 2).sum()
        v_x = rng.uniform(1.0, 3.0, size=(5, 2, 2)).astype(floatX)
        v_w = rng.uniform(1.0, 3.0, size=(2, 2)).astype(floatX)

        def loss_fn(xv, wv):
            buf = list(xv[:4])
            prev4 = list(xv[:4])
            for _ in range(10):
                new = wv + prev4[-1]
                prev4 = prev4[1:] + [new]
                buf.append(new)
            return (buf[-1] ** 2).sum()

        gw, gx = grad(loss, [w, xinit])
        grad_fn = ptt.function([xinit, w], [gx, gw])
        a_gx, a_gw = (np.asarray(a) for a in grad_fn(v_x, v_w))
        eps = 1e-3 if floatX == "float64" else 3e-2
        # finite differences on a couple of entries of each input
        for idx in [(0, 0, 0), (3, 1, 1)]:
            pert = v_x.copy()
            pert[idx] += eps
            num = (loss_fn(pert, v_w) - loss_fn(v_x, v_w)) / eps
            np.testing.assert_allclose(a_gx[idx], num, rtol=0.12, atol=0.05)
        pert = v_w.copy()
        pert[0, 1] += eps
        num = (loss_fn(v_x, pert) - loss_fn(v_x, v_w)) / eps
        np.testing.assert_allclose(a_gw[0, 1], num, rtol=0.12, atol=0.05)

    def test_disconnected_gradient(self):
        v = pt.vector("v")
        m = pt.matrix("m")
        u0 = pt.zeros((7,))
        [_u, m2] = scan(lambda _, u: [u, v], sequences=m,
                        outputs_info=[u0, None], return_updates=False)
        grad((m * m2).sum(), v)

    def test_disconnected_gradient2(self):
        v = pt.vector("v")
        m = pt.matrix("m")
        u0 = pt.zeros((7,))
        [_u, m2] = scan(lambda x, u: [x + u, u + v], sequences=m,
                        outputs_info=[u0, None], return_updates=False)
        grad(m2.sum(), m)

    def test_disconnected_gradient3(self):
        v = pt.dvector("v")

        def step(seq):
            out1 = seq + 1
            out2 = out1 + 1
            return out1, out2

        [_out1, out2] = scan(step, sequences=v, return_updates=False)
        gv = grad(out2.sum(), [v])
        f = ptt.function([v], gv)
        np.testing.assert_allclose(np.asarray(f(rng.random(5))[0]),
                                   np.ones(5))

    def test_grad_bug_disconnected_input(self):
        W = ptt.shared(np.zeros((3, 3)), name="W")
        v = pt.ivector(name="v")
        y = scan(lambda i, W_: W_[i], sequences=v, outputs_info=None,
                 non_sequences=W, return_updates=False)
        f = ptt.function([v], grad(y.sum(), W))
        np.testing.assert_allclose(np.asarray(f(np.asarray([1, 2], "int32"))),
                                   [[0, 0, 0], [1, 1, 1], [1, 1, 1]])

    def test_grad_find_input(self):
        w = ptt.shared(np.array(0, dtype="float32"), name="w")
        init = pt.fscalar("init")
        out = scan(fn=lambda prev: w, outputs_info=init, n_steps=2,
                   return_updates=False)
        grad(out[-1], w)

    def test_grad_wrt_shared(self):
        x1 = ptt.shared(asX(3.0))
        x1.name = "x1"
        x2 = pt.vector("x2")
        y = scan(lambda v: x1 * v, sequences=x2, return_updates=False)
        m = grad(y.sum(), x1)
        f = ptt.function([x2], m)
        np.testing.assert_allclose(np.asarray(f(asX([2, 3]))), 5.0)

    def test_inconsistent_broadcast_error(self):
        x = pt.tensor3()
        initial_x = pt.constant(np.zeros((1, 10), dtype=floatX))
        y = scan(fn=lambda x_, prev_x: x_ + prev_x, sequences=x,
                 outputs_info=[dict(initial=initial_x)],
                 return_updates=False)
        with pytest.raises((TypeError, ValueError)):
            grad(y.sum(), x)


class TestGradUntil:
    def setup_method(self):
        self.x = pt.vector(name="x")
        self.threshold = pt.scalar(name="threshold", dtype="int64")
        self.seq = np.arange(15, dtype=floatX)
        self.numpy_output = self.seq[:7] ** 2
        z = np.zeros(8, dtype=floatX)
        self.numpy_gradient = 2 * np.concatenate([self.seq[:7], z], axis=0)

    def test_grad_until(self):
        r = scan(lambda x, u: (x * x, until(x > u)), sequences=self.x,
                 non_sequences=[self.threshold], return_updates=False)
        g = grad(r.sum(), self.x)
        f = ptt.function([self.x, self.threshold], [r, g])
        out, gout = (np.asarray(a) for a in f(self.seq, 5))
        np.testing.assert_allclose(out, self.numpy_output, rtol=1e-6)
        np.testing.assert_allclose(gout, self.numpy_gradient, rtol=1e-6)

    def test_grad_until_ndim_greater_one(self):
        def tile_array(inp):
            return np.tile(inp.reshape((-1, 1)), (1, 5))

        X = pt.matrix(name="x")
        arr = tile_array(self.seq).astype(floatX)
        from pytensor_tpu.tensor.math import all as pt_all

        r = scan(lambda x, u: (x * x, until(pt_all(x > u))), sequences=X,
                 non_sequences=[self.threshold], return_updates=False)
        g = grad(r.sum(), X)
        f = ptt.function([X, self.threshold], [r, g])
        out, gout = (np.asarray(a) for a in f(arr, 5))
        np.testing.assert_allclose(out, tile_array(self.numpy_output),
                                   rtol=1e-6)
        np.testing.assert_allclose(gout, tile_array(self.numpy_gradient),
                                   rtol=1e-6)

    def test_grad_until_and_truncate(self):
        n = 3
        r = scan(lambda x, u: (x * x, until(x > u)), sequences=self.x,
                 non_sequences=[self.threshold], truncate_gradient=n,
                 return_updates=False)
        g = grad(r.sum(), self.x)
        f = ptt.function([self.x, self.threshold], [r, g])
        out, gout = (np.asarray(a) for a in f(self.seq, 5))
        expected_grad = self.numpy_gradient.copy()
        expected_grad[: 7 - n] = 0
        np.testing.assert_allclose(out, self.numpy_output, rtol=1e-6)
        np.testing.assert_allclose(gout, expected_grad, rtol=1e-6)

    def test_grad_until_with_recurrent_state(self):
        x0 = pt.scalar(name="x0")
        a = np.asarray(1.3, dtype=floatX)
        xs = scan(lambda y, x: (a * x + y, until(a * x + y > 5.0)),
                  sequences=self.x, outputs_info=[x0], return_updates=False)
        g_seq, g_x0 = grad(xs.sum(), [self.x, x0])
        f = ptt.function([self.x, x0], [xs, g_seq, g_x0])
        seq_v = np.linspace(0.4, 0.9, 12).astype(floatX)
        x0_v = np.asarray(0.2, dtype=floatX)
        out, g_seq_v, g_x0_v = (np.asarray(r) for r in f(seq_v, x0_v))
        k = out.shape[0]
        assert 1 < k < seq_v.shape[0], "until must fire mid-sequence"
        j = np.arange(seq_v.shape[0])
        g_seq_ref = np.where(j < k, (a ** (k - j) - 1) / (a - 1), 0.0)
        np.testing.assert_allclose(g_seq_v, g_seq_ref, rtol=1e-4)
        np.testing.assert_allclose(g_x0_v, a * (a ** k - 1) / (a - 1),
                                   rtol=1e-4)


class TestScanErrors:
    def test_constant_folding_n_steps(self):
        res = scan(lambda x: x * 2, outputs_info=pt.ones(()), n_steps=10,
                   return_updates=False)
        ptt.function([], res)()

    def test_outputs_taps_check(self):
        x = pt.fvector("x")
        y = pt.fvector("y")
        with pytest.raises(ValueError):
            scan(lambda a, b: [a], x, {"initial": y, "taps": [0]})
        with pytest.raises(ValueError):
            scan(lambda a, b: [a], x, {"initial": y, "taps": [-1, -1]})

    def test_missing_input_error(self):
        c = ptt.shared(0.0)
        inc = pt.scalar("inc")
        with pytest.raises(MissingInputError):
            scan(lambda: (pt.zeros(()), {c: c + inc}), n_steps=20)

    def test_condition_hidden_inp(self):
        """Outer root variables reachable from the CONDITION are pulled in
        as implicit non-sequences (reference test_condition_hidden_inp)."""
        max_value = pt.scalar("max_value")
        n_steps = pt.iscalar("n_steps")

        def accum(prev_value, step):
            new_value = prev_value + step
            new_step = step + 1
            return [new_value, new_step], until(new_value > max_value)

        rs = scan(fn=accum, outputs_info=[asX(0.0), asX(0.0)],
                  n_steps=n_steps, return_updates=False)
        f = ptt.function([max_value, n_steps], rs)
        _sum, _total_steps = f(asX(100), 100)

    def test_default_value_broadcasted(self):
        X = pt.matrix("X")
        in_size, out_size = 2, 4
        W_x = ptt.shared(asX(rng.random((in_size, out_size)) * 0.1), "W_x")

        def _active(x, pre_h):
            x = pt.reshape(x, (1, in_size))
            return dot(x, W_x)

        value = scan(_active, sequences=X,
                     outputs_info=[pt.alloc(asX(0.0), 1, out_size)],
                     return_updates=False)
        cost = mean(value)
        gW_x = grad(cost, W_x)
        f = ptt.function([X], outputs=cost,
                         updates=[(W_x, W_x - 0.1 * gW_x)])
        f(rng.random((10, in_size)).astype(X.dtype))
