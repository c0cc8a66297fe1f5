"""Direct numerical parity against the actual reference implementation.

Compiles the same float64 graphs with pymc-devs/pytensor (C-VM backend,
/root/reference) and with pytensor_tpu, and compares values and
gradients at 1e-6 or better — the BASELINE.md acceptance criterion.
Skipped automatically when the reference tree is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree not available")
    os.environ.setdefault("PYTENSOR_FLAGS", "mode=FAST_RUN,linker=cvm,floatX=float64")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    try:
        import pytensor
        import pytensor.tensor as rt
    except Exception as e:
        pytest.skip(f"reference not importable: {e!r}")
    return pytensor


rng = np.random.default_rng(7)


def test_elemwise_chain_and_grad(ref):
    import pytensor
    import pytensor.tensor as rt

    import pytensor_tpu as ptt
    import pytensor_tpu.tensor as pt

    v = rng.random(1000) + 0.1

    def build(mod_t, mod_f, grad_fn):
        x = mod_t.dvector("x")
        y = (mod_t.exp(-x) + mod_t.log(x) * mod_t.sigmoid(x)).sum()
        g = grad_fn(y, x)
        return mod_f([x], [y, g])

    f_ref = build(rt, pytensor.function, pytensor.grad)
    f_us = build(pt, ptt.function, ptt.grad)
    r1 = [np.asarray(a) for a in f_ref(v)]
    r2 = [np.asarray(a) for a in f_us(v)]
    np.testing.assert_allclose(r2[0], r1[0], rtol=1e-12)
    np.testing.assert_allclose(r2[1], r1[1], rtol=1e-10)


def test_scan_ewma_grad(ref):
    import pytensor
    import pytensor.tensor as rt

    import pytensor_tpu as ptt
    import pytensor_tpu.tensor as pt

    v = rng.random(64)

    x_r = rt.dvector("x")
    a_r = rt.dscalar("a")
    ew_r, _ = pytensor.scan(lambda xt, prev, a: a * xt + (1 - a) * prev,
                            sequences=[x_r],
                            outputs_info=[rt.constant(np.float64(0.0))],
                            non_sequences=[a_r])
    g_r = pytensor.grad(ew_r.sum(), a_r)
    f_ref = pytensor.function([x_r, a_r], [ew_r.sum(), g_r])

    x_u = pt.dvector("x")
    a_u = pt.dscalar("a")
    ew_u, _ = ptt.scan(lambda xt, prev, a: a * xt + (1 - a) * prev,
                       sequences=[x_u],
                       outputs_info=[pt.constant(0.0, dtype="float64")],
                       non_sequences=[a_u])
    g_u = ptt.grad(ew_u.sum(), a_u)
    f_us = ptt.function([x_u, a_u], [ew_u.sum(), g_u])

    r1 = [float(np.asarray(z)) for z in f_ref(v, 0.3)]
    r2 = [float(np.asarray(z)) for z in f_us(v, 0.3)]
    np.testing.assert_allclose(r2, r1, rtol=1e-10)


def test_cholesky_solve_grads(ref):
    import pytensor
    import pytensor.tensor as rt

    import pytensor_tpu as ptt
    import pytensor_tpu.tensor as pt
    from pytensor_tpu.tensor import linalg as ptl

    A_ = rng.random((8, 8))
    A_ = A_ @ A_.T + 8 * np.eye(8)
    b_ = rng.random(8)

    A_r = rt.dmatrix("A")
    b_r = rt.dvector("b")
    L_r = rt.linalg.cholesky(A_r)
    x_r = rt.linalg.solve_triangular(L_r, b_r, lower=True)
    cost_r = (x_r ** 2).sum() + 2.0 * rt.log(rt.diag(L_r)).sum()
    g_r = pytensor.grad(cost_r, A_r)
    f_ref = pytensor.function([A_r, b_r], [cost_r, g_r])

    A_u = pt.dmatrix("A")
    b_u = pt.dvector("b")
    L_u = ptl.cholesky(A_u)
    x_u = ptl.solve_triangular(L_u, b_u, lower=True)
    cost_u = (x_u ** 2).sum() + 2.0 * pt.log(pt.diagonal(L_u)).sum()
    g_u = ptt.grad(cost_u, A_u)
    f_us = ptt.function([A_u, b_u], [cost_u, g_u])

    r1 = [np.asarray(z) for z in f_ref(A_, b_)]
    r2 = [np.asarray(z) for z in f_us(A_, b_)]
    np.testing.assert_allclose(r2[0], r1[0], rtol=1e-10)
    np.testing.assert_allclose(r2[1], r1[1], rtol=1e-8, atol=1e-10)


def test_radon_logp_dlogp_vs_reference(ref):
    """The north-star workload at 1e-6: identical logp+dlogp graphs."""
    import pytensor
    import pytensor.tensor as rt

    from pytensor_tpu.models.radon import make_radon_logp_grad, radon_synthetic_data

    N_OBS, N_C = 200, 20
    county_v, floor_v, y_v = radon_synthetic_data(N_OBS, N_C, 0, "float64")
    LOG_2PI = float(np.log(2 * np.pi))
    n_params = N_C + 4

    theta = rt.dvector("theta")
    county = rt.as_tensor_variable(county_v)
    floor = rt.as_tensor_variable(floor_v)
    y = rt.as_tensor_variable(y_v)
    a_raw = theta[:N_C]
    mu_a = theta[N_C]
    log_sigma_a = theta[N_C + 1]
    b = theta[N_C + 2]
    log_sigma_y = theta[N_C + 3]
    sigma_a = rt.exp(log_sigma_a)
    sigma_y = rt.exp(log_sigma_y)
    a = mu_a + sigma_a * a_raw
    mu_y = a[county] + b * floor

    def nlp(x, mu, sigma):
        return -0.5 * ((x - mu) / sigma) ** 2 - rt.log(sigma) - 0.5 * LOG_2PI

    logp = (rt.sum(nlp(y, mu_y, sigma_y)) + rt.sum(nlp(a_raw, 0.0, 1.0))
            + rt.sum(nlp(mu_a, 0.0, 10.0)) + rt.sum(nlp(b, 0.0, 10.0))
            + rt.sum(nlp(log_sigma_a, 0.0, 2.0)) + rt.sum(nlp(log_sigma_y, 0.0, 2.0))
            + log_sigma_a + log_sigma_y)
    dlogp = pytensor.grad(logp, theta)
    f_ref = pytensor.function([theta], [logp, dlogp])

    f_us, theta0, _ = make_radon_logp_grad(N_OBS, N_C, dtype="float64")
    t = theta0 + 0.1 * rng.standard_normal(n_params)
    r_ref = [np.asarray(z) for z in f_ref(t)]
    r_us = [np.asarray(z) for z in f_us(t)]
    # reduction-order noise on a ~200-term f64 sum: 1e-7 beats the 1e-6 bar
    np.testing.assert_allclose(r_us[0], r_ref[0], rtol=1e-7)
    np.testing.assert_allclose(r_us[1], r_ref[1], rtol=1e-6, atol=1e-8)


def test_subtensor_inc_grads(ref):
    import pytensor
    import pytensor.tensor as rt

    import pytensor_tpu as ptt
    import pytensor_tpu.tensor as pt

    v = rng.random(12)
    w = rng.random(4)
    idx = np.array([1, 3, 5, 3])

    def build(mod_t, mod_f, grad_fn, set_st, inc_st):
        x = mod_t.dvector("x")
        y = mod_t.dvector("y")
        a = x[2:9:2].sum() + x[idx].prod()
        b = inc_st(x[idx], y).sum() + set_st(x[:4], y * 2).sum()
        out = a + b
        gx, gy = grad_fn(out, [x, y])
        return mod_f([x, y], [out, gx, gy])

    f_ref = build(rt, pytensor.function, pytensor.grad,
                  rt.set_subtensor, rt.inc_subtensor)
    from pytensor_tpu.tensor.subtensor import inc_subtensor, set_subtensor

    f_us = build(pt, ptt.function, ptt.grad, set_subtensor, inc_subtensor)
    r1 = [np.asarray(a) for a in f_ref(v, w)]
    r2 = [np.asarray(a) for a in f_us(v, w)]
    for a, b in zip(r2, r1):
        np.testing.assert_allclose(a, b, rtol=1e-10)


def test_softmax_logsumexp_grads(ref):
    import pytensor
    import pytensor.tensor as rt

    import pytensor_tpu as ptt
    import pytensor_tpu.tensor as pt

    v = rng.random((6, 5)) * 4 - 2

    def build(mod_t, mod_f, grad_fn, sm, lse):
        x = mod_t.dmatrix("x")
        y = (sm(x) ** 2).sum() + lse(x, 1).sum()
        g = grad_fn(y, x)
        return mod_f([x], [y, g])

    f_ref = build(rt, pytensor.function, pytensor.grad,
                  lambda x: rt.special.softmax(x, axis=-1),
                  lambda x, ax: rt.logsumexp(x, axis=ax))
    from pytensor_tpu.tensor.special import logsumexp, softmax

    f_us = build(pt, ptt.function, ptt.grad,
                 lambda x: softmax(x, axis=-1),
                 lambda x, ax: logsumexp(x, axis=ax))
    r1 = [np.asarray(a) for a in f_ref(v)]
    r2 = [np.asarray(a) for a in f_us(v)]
    np.testing.assert_allclose(r2[0], r1[0], rtol=1e-10)
    np.testing.assert_allclose(r2[1], r1[1], rtol=1e-9, atol=1e-12)


def test_betainc_gammainc_grads(ref):
    import pytensor
    import pytensor.tensor as rt

    import pytensor_tpu as ptt
    import pytensor_tpu.tensor as pt

    av = rng.random(5) * 3 + 0.5
    bv = rng.random(5) * 3 + 0.5
    xv = rng.random(5) * 0.8 + 0.1

    def build(mod_t, mod_f, grad_fn, betainc, gammainc):
        a = mod_t.dvector("a")
        b = mod_t.dvector("b")
        x = mod_t.dvector("x")
        y = betainc(a, b, x).sum() + gammainc(a, x).sum()
        ga, gb, gx = grad_fn(y, [a, b, x])
        return mod_f([a, b, x], [y, ga, gb, gx])

    f_ref = build(rt, pytensor.function, pytensor.grad, rt.betainc, rt.gammainc)
    f_us = build(pt, ptt.function, ptt.grad, pt.math.betainc, pt.math.gammainc)
    r1 = [np.asarray(v) for v in f_ref(av, bv, xv)]
    r2 = [np.asarray(v) for v in f_us(av, bv, xv)]
    for a, b in zip(r2, r1):
        np.testing.assert_allclose(a, b, rtol=5e-6, atol=1e-10)


def test_extra_ops_values(ref):
    import pytensor
    import pytensor.tensor as rt

    import pytensor_tpu as ptt
    import pytensor_tpu.tensor as pt

    v = rng.random((4, 6))

    def build(mod_t, mod_f, cumsum, repeat, diff):
        x = mod_t.dmatrix("x")
        return mod_f([x], [cumsum(x, 1), repeat(x, 3, 0), diff(x, axis=1)])

    f_ref = build(rt, pytensor.function, rt.cumsum, rt.repeat, rt.diff)
    from pytensor_tpu.tensor.extra_ops import cumsum, diff, repeat

    f_us = build(pt, ptt.function, cumsum, repeat, diff)
    for a, b in zip(f_us(v), f_ref(v)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-14)


def test_einsum_and_batched_dot(ref):
    import pytensor
    import pytensor.tensor as rt

    import pytensor_tpu as ptt
    import pytensor_tpu.tensor as pt

    A = rng.random((3, 4, 5))
    B = rng.random((3, 5, 2))

    def build(mod_t, mod_f, grad_fn, einsum):
        a = mod_t.tensor("a", dtype="float64", shape=(3, 4, 5))
        b = mod_t.tensor("b", dtype="float64", shape=(3, 5, 2))
        y = einsum("bij,bjk->bik", a, b)
        cost = (y ** 2).sum()
        ga, gb = grad_fn(cost, [a, b])
        return mod_f([a, b], [y, cost, ga, gb])

    f_ref = build(rt, pytensor.function, pytensor.grad, rt.einsum)
    f_us = build(pt, ptt.function, ptt.grad, pt.einsum)
    r1 = [np.asarray(v) for v in f_ref(A, B)]
    r2 = [np.asarray(v) for v in f_us(A, B)]
    for a, b in zip(r2, r1):
        np.testing.assert_allclose(a, b, rtol=1e-9)


def test_ifelse_and_switch(ref):
    import pytensor
    import pytensor.tensor as rt
    from pytensor.ifelse import ifelse as ref_ifelse

    import pytensor_tpu as ptt
    import pytensor_tpu.tensor as pt
    from pytensor_tpu.ifelse import ifelse as our_ifelse

    v = rng.random(7) - 0.5

    def build(mod_t, mod_f, grad_fn, ife):
        x = mod_t.dvector("x")
        c = x.sum() > 0
        y = ife(c, (x ** 2).sum(), (-x).sum())
        z = mod_t.switch(x > 0, mod_t.log1p(x), x)
        out = y + z.sum()
        g = grad_fn(out, x)
        return mod_f([x], [out, g])

    f_ref = build(rt, pytensor.function, pytensor.grad, ref_ifelse)
    f_us = build(pt, ptt.function, ptt.grad, our_ifelse)
    for vv in (v, -v):
        r1 = [np.asarray(a) for a in f_ref(vv)]
        r2 = [np.asarray(a) for a in f_us(vv)]
        np.testing.assert_allclose(r2[0], r1[0], rtol=1e-12)
        np.testing.assert_allclose(r2[1], r1[1], rtol=1e-12)


def test_while_scan_values_vs_reference(ref):
    import pytensor
    import pytensor.tensor as rt

    import pytensor_tpu as ptt
    import pytensor_tpu.tensor as pt
    from pytensor_tpu.scan.utils import until as our_until

    x0v = 1.3

    # reference while-scan
    def ref_step(acc):
        nxt = acc * 1.5
        from pytensor.scan.utils import until as ref_until

        return nxt, ref_until(nxt > 40.0)

    rx0 = rt.dscalar("x0")
    rout, _ = pytensor.scan(ref_step, outputs_info=[rx0], n_steps=16)
    f_ref = pytensor.function([rx0], [rout, rout.shape[0]])
    ref_trace, ref_len = f_ref(x0v)

    ox0 = pt.dscalar("x0")
    oout, _ = ptt.scan(lambda acc: (acc * 1.5, our_until(acc * 1.5 > 40.0)),
                       outputs_info=[ox0], n_steps=16)
    f_us = ptt.function([ox0], oout)
    our_trace = np.asarray(f_us(x0v))
    # reference truncates the trace at termination; we pad with the final
    # value (static shapes) — the executed prefix must match exactly
    n = int(ref_len)
    np.testing.assert_allclose(our_trace[:n], np.asarray(ref_trace),
                               rtol=1e-12)
    assert np.all(our_trace[n:] == our_trace[n - 1])


def test_scan_taps_vs_reference(ref):
    import pytensor
    import pytensor.tensor as rt

    import pytensor_tpu as ptt
    import pytensor_tpu.tensor as pt

    y0 = np.array([0.1, 0.2])

    c9, c4 = np.float64(0.9), np.float64(0.4)

    def build(mod_scan, mod_t, mod_f, grad_fn):
        init = mod_t.dvector("init")
        out, _ = mod_scan(lambda m2, m1: c9 * m1 + c4 * m2,
                          outputs_info=[dict(initial=init, taps=[-2, -1])],
                          n_steps=9)
        cost = (out ** 2).sum()
        g = grad_fn(cost, init)
        return mod_f([init], [out, cost, g])

    f_ref = build(pytensor.scan, rt, pytensor.function, pytensor.grad)
    f_us = build(ptt.scan, pt, ptt.function, ptt.grad)
    r1 = [np.asarray(v) for v in f_ref(y0)]
    r2 = [np.asarray(v) for v in f_us(y0)]
    for a, b in zip(r2, r1):
        np.testing.assert_allclose(a, b, rtol=1e-10)


def test_conv1d_and_grad(ref):
    import pytensor
    import pytensor.tensor as rt

    import pytensor_tpu as ptt
    import pytensor_tpu.tensor as pt
    from pytensor_tpu.tensor.signal.conv import convolve1d

    xv = rng.random(20)
    kv = rng.random(5)

    for mode_c in ("full", "valid"):
        def build(mod_t, mod_f, grad_fn, conv):
            x = mod_t.dvector("x")
            k = mod_t.dvector("k")
            y = conv(x, k, mode=mode_c)
            cost = (y ** 2).sum()
            gx, gk = grad_fn(cost, [x, k])
            return mod_f([x, k], [y, gx, gk])

        from pytensor.tensor.signal import convolve1d as ref_conv

        f_ref = build(rt, pytensor.function, pytensor.grad, ref_conv)
        f_us = build(pt, ptt.function, ptt.grad, convolve1d)
        r1 = [np.asarray(v) for v in f_ref(xv, kv)]
        r2 = [np.asarray(v) for v in f_us(xv, kv)]
        for a, b in zip(r2, r1):
            np.testing.assert_allclose(a, b, rtol=1e-9)


def test_cumsum_prod_grads(ref):
    import pytensor
    import pytensor.tensor as rt

    import pytensor_tpu as ptt
    import pytensor_tpu.tensor as pt
    from pytensor_tpu.tensor.extra_ops import cumprod, cumsum

    xv = rng.random((4, 6)) + 0.2

    def build(mod_t, mod_f, grad_fn, cs, cp):
        x = mod_t.dmatrix("x")
        y = (cs(x, 1) ** 2).sum() + cp(x, 0).sum()
        g = grad_fn(y, x)
        return mod_f([x], [y, g])

    f_ref = build(rt, pytensor.function, pytensor.grad,
                  lambda x, ax: rt.cumsum(x, axis=ax),
                  lambda x, ax: rt.cumprod(x, axis=ax))
    f_us = build(pt, ptt.function, ptt.grad,
                 lambda x, ax: cumsum(x, axis=ax),
                 lambda x, ax: cumprod(x, axis=ax))
    r1 = [np.asarray(v) for v in f_ref(xv)]
    r2 = [np.asarray(v) for v in f_us(xv)]
    np.testing.assert_allclose(r2[0], r1[0], rtol=1e-10)
    np.testing.assert_allclose(r2[1], r1[1], rtol=1e-9)


def test_scan_go_backwards_order(ref):
    import pytensor
    import pytensor.tensor as rt

    import pytensor_tpu as ptt
    import pytensor_tpu.tensor as pt

    v = np.arange(6.0)
    rx = rt.dvector("x")
    rout, _ = pytensor.scan(lambda xt, acc: acc + xt, sequences=[rx],
                            outputs_info=[rt.constant(np.float64(0.0))],
                            go_backwards=True)
    ref_r = np.asarray(pytensor.function([rx], rout)(v))
    ox = pt.dvector("x")
    oout, _ = ptt.scan(lambda xt, acc: acc + xt, sequences=[ox],
                       outputs_info=[pt.constant(np.float64(0.0))],
                       go_backwards=True)
    our_r = np.asarray(ptt.function([ox], oout)(v))
    np.testing.assert_allclose(our_r, ref_r)


def test_scan_sequence_taps_vs_reference(ref):
    import pytensor
    import pytensor.tensor as rt

    import pytensor_tpu as ptt
    import pytensor_tpu.tensor as pt

    v = np.arange(6.0)
    rx = rt.dvector("x")
    rout, _ = pytensor.scan(lambda xm2, x0: x0 - xm2,
                            sequences=[dict(input=rx, taps=[-2, 0])])
    ref_r = np.asarray(pytensor.function([rx], rout)(v))
    ox = pt.dvector("x")
    oout, _ = ptt.scan(lambda xm2, x0: x0 - xm2,
                       sequences=[dict(input=ox, taps=[-2, 0])])
    our_r = np.asarray(ptt.function([ox], oout)(v))
    np.testing.assert_allclose(our_r, ref_r)


def test_dtype_promotion_table(ref):
    """Exhaustive +,*,/ output-dtype parity over the common dtypes (this
    check caught int/int true_div diverging to float64 instead of floatX)."""
    import pytensor
    import pytensor.tensor as rt

    import pytensor_tpu.tensor  # noqa: F401
    from pytensor_tpu.config import config as our_config
    from pytensor_tpu.tensor.type import TensorType

    dtypes = ["int8", "int16", "int32", "int64", "uint8",
              "float32", "float64"]
    ctx = our_config.change_flags(floatX=str(pytensor.config.floatX))
    ctx.__enter__()
    for a in dtypes:
        for b in dtypes:
            ra, rb = rt.vector("a", dtype=a), rt.vector("b", dtype=b)
            va, vb = TensorType(a, (None,))("a"), TensorType(b, (None,))("b")
            for opname, rexpr, vexpr in (
                ("+", ra + rb, va + vb),
                ("*", ra * rb, va * vb),
                ("/", ra / rb, va / vb),
            ):
                assert vexpr.type.dtype == rexpr.type.dtype, \
                    (a, opname, b, vexpr.type.dtype, rexpr.type.dtype)
    ctx.__exit__(None, None, None)


def test_reduction_dtype_table(ref):
    """sum/prod/mean/max/sqr output-dtype parity (caught mean-of-int
    diverging to floatX instead of float64)."""
    import pytensor
    import pytensor.tensor as rt

    from pytensor_tpu.config import config as our_config
    from pytensor_tpu.tensor.type import TensorType

    with our_config.change_flags(floatX=str(pytensor.config.floatX)):
        for a in ("bool", "int8", "int32", "int64", "uint8",
                  "float32", "float64"):
            rv = rt.vector("v", dtype=a)
            v = TensorType(a, (None,))("v")
            pairs = [("sum", rv.sum(), v.sum()),
                     ("prod", rv.prod(), v.prod()),
                     ("mean", rv.mean(), v.mean()),
                     ("max", rv.max(), v.max())]
            for k, re_, ve in pairs:
                assert ve.type.dtype == re_.type.dtype, \
                    (k, a, ve.type.dtype, re_.type.dtype)


def test_unary_dtype_table(ref):
    """Unary elemwise output-dtype parity (caught floor/ceil on ints not
    upgrading to float like the reference's upgrade_to_float rule)."""
    import pytensor
    import pytensor.tensor as rt

    from pytensor_tpu.config import config as our_config
    from pytensor_tpu.tensor.type import TensorType
    import pytensor_tpu.tensor as pt2

    name_map = {"sgn": "sign"}
    with our_config.change_flags(floatX=str(pytensor.config.floatX)):
        for a in ("bool", "int8", "int32", "int64", "uint8",
                  "float32", "float64"):
            rv = rt.vector("v", dtype=a)
            v = TensorType(a, (None,))("v")
            for fn in ("exp", "log", "sqrt", "sigmoid", "tanh", "erf",
                       "floor", "ceil", "round", "abs", "sgn"):
                try:
                    want = getattr(rt, fn)(rv).type.dtype
                except Exception:
                    continue
                got = getattr(pt2.math, name_map.get(fn, fn))(v).type.dtype
                assert got == want, (fn, a, got, want)


def test_binary_dtype_table(ref):
    """pow/mod/floordiv/maximum/arctan2 output-dtype parity."""
    import pytensor
    import pytensor.tensor as rt

    import pytensor_tpu.tensor as pt2
    from pytensor_tpu.config import config as our_config
    from pytensor_tpu.tensor.type import TensorType

    with our_config.change_flags(floatX=str(pytensor.config.floatX)):
        for a in ("int8", "int32", "int64", "uint8", "float32", "float64"):
            for b in ("int8", "int32", "float32", "float64"):
                ra, rb = rt.vector("a", dtype=a), rt.vector("b", dtype=b)
                va = TensorType(a, (None,))("a")
                vb = TensorType(b, (None,))("b")
                for k, re_, ve in (
                    ("pow", ra ** rb, va ** vb),
                    ("mod", ra % rb, va % vb),
                    ("fdiv", ra // rb, va // vb),
                    ("max2", rt.maximum(ra, rb), pt2.math.maximum(va, vb)),
                ):
                    assert ve.type.dtype == re_.type.dtype, \
                        (k, a, b, ve.type.dtype, re_.type.dtype)


def test_distribution_parameterizations(ref):
    """Distribution mean parity (caught gamma using scale where the
    reference's positional arg is the rate)."""
    import pytensor
    import pytensor.tensor.random as rrand

    import pytensor_tpu as ptt
    import pytensor_tpu.tensor.random as prand
    from pytensor_tpu.tensor.random.utils import RandomStream

    N = 50000
    rng_ref = pytensor.shared(np.random.default_rng(0))
    srng = RandomStream(seed=0)
    cases = [
        ("gamma", (3.0, 2.0)),
        ("lognormal", (0.5, 0.4)),
        ("wald", (2.0, 3.0)),
        ("negative_binomial", (5, 0.4)),
        ("beta", (2.0, 5.0)),
        ("gumbel", (1.0, 2.0)),
        ("laplace", (1.0, 2.0)),
        ("triangular", (0.0, 1.0, 3.0)),
    ]
    for name, params in cases:
        a = np.asarray(pytensor.function(
            [], getattr(rrand, name)(*params, size=(N,), rng=rng_ref))())
        b = np.asarray(ptt.function(
            [], srng.gen(getattr(prand, name), *params, size=(N,)))())
        tol = 6 * a.std() / np.sqrt(N) + 0.02 * abs(a.mean())
        assert abs(a.mean() - b.mean()) < tol, \
            (name, a.mean(), b.mean())
