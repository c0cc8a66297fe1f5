"""Seeded graph fuzzer: random tensor programs run under DebugMode,
which re-executes EVERY node with both the numpy oracle and the eager
XLA lowering and raises on any disagreement — plus the full-graph
rewrite-blame and determinism checks.  One test = 30 random programs;
deterministic seeds keep failures reproducible."""

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from pytensor_tpu.compile.debug import DebugMode

UNARY = [pt.exp, pt.tanh, pt.sigmoid, pt.softplus, pt.sin, pt.cos,
         pt.sqr, pt.abs, pt.neg, pt.erf,
         lambda v: pt.log1p(pt.abs(v)),
         lambda v: pt.sqrt(pt.abs(v) + 0.1)]
BINARY = [lambda a, b: a + b, lambda a, b: a * b, lambda a, b: a - b,
          lambda a, b: a / (pt.abs(b) + 0.5),
          pt.maximum, pt.minimum,
          lambda a, b: pt.switch(a > b, a, b)]


def _random_program(rng, x, depth=6):
    """Grow a random expression over ``x`` (shape (4, 5) float64)."""
    pool = [x, x.T.T, x * 0.5 + 1.0]
    for _ in range(depth):
        r = rng.random()
        if r < 0.45:
            f = UNARY[rng.integers(len(UNARY))]
            pool.append(f(pool[rng.integers(len(pool))]))
        elif r < 0.8:
            f = BINARY[rng.integers(len(BINARY))]
            a = pool[rng.integers(len(pool))]
            b = pool[rng.integers(len(pool))]
            pool.append(f(a, b))
        elif r < 0.9:
            v = pool[rng.integers(len(pool))]
            axis = int(rng.integers(2))
            red = [pt.sum, pt.max, pt.min, pt.mean][rng.integers(4)]
            pool.append(red(v, axis=axis, keepdims=True) + v * 0.0)
        else:
            v = pool[rng.integers(len(pool))]
            sl = [slice(None), slice(1, 4), slice(None, None, 2)][
                rng.integers(3)]
            pool.append(v[sl] * 1.0 if sl == slice(None) else
                        pt.inc_subtensor(v[sl], v[sl] * 0.25))
    out = pool[-1]
    if out.type.ndim > 0:
        out = pt.sum(out)
    return out


@pytest.mark.parametrize("seed", range(30))
def test_fuzz_program_oracle_vs_xla(seed):
    rng = np.random.default_rng(1000 + seed)
    x = pt.tensor("x", dtype="float64", shape=(4, 5))
    out = _random_program(rng, x)
    # DebugMode: per-node oracle-vs-XLA comparison + rewrite blame +
    # rewrite determinism, all in one compile/run
    f = ptt.function([x], [out, ptt.grad(out, x)], mode=DebugMode())
    xv = rng.standard_normal((4, 5)) * 0.8
    val, g = (np.asarray(r) for r in f(xv))
    assert np.isfinite(val).all()
    assert np.isfinite(g).all()


def _random_program_structural(rng, x, y, depth=5):
    """Programs mixing matmul/join/cumsum/indexing with elemwise."""
    pool = [x, y, pt.dot(x, y)]  # x (4,5), y (5,4) -> (4,4)
    for _ in range(depth):
        r = rng.random()
        v = pool[rng.integers(len(pool))]
        if r < 0.3:
            f = UNARY[rng.integers(len(UNARY))]
            pool.append(f(v))
        elif r < 0.5 and v.type.ndim == 2:
            pool.append(pt.cumsum(v, axis=int(rng.integers(2))))
        elif r < 0.65 and v.type.ndim == 2:
            pool.append(pt.join(int(rng.integers(2)), v, v * 0.5))
        elif r < 0.8 and v.type.ndim == 2 and v.type.shape[0] ==                 v.type.shape[1] == 4:
            pool.append(pt.dot(v, pool[2]) * 0.1)
        elif r < 0.9 and v.type.ndim >= 2:
            pool.append(pt.diff(pt.sum(v, axis=0)))
        else:
            idx = np.array([0, 2, 1])
            if v.type.ndim >= 1 and (v.type.shape[0] or 4) >= 3:
                pool.append(v[idx] * 1.0)
    out = pool[-1]
    if out.type.ndim > 0:
        out = pt.sum(pt.tanh(out * 0.1))
    return out


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_structural_oracle_vs_xla(seed):
    rng = np.random.default_rng(7000 + seed)
    x = pt.tensor("x", dtype="float64", shape=(4, 5))
    y = pt.tensor("y", dtype="float64", shape=(5, 4))
    out = _random_program_structural(rng, x, y)
    gx, gy = ptt.grad(out, [x, y], disconnected_inputs="ignore")
    f = ptt.function([x, y], [out, gx, gy], mode=DebugMode(),
                     on_unused_input="ignore")
    xv = rng.standard_normal((4, 5)) * 0.7
    yv = rng.standard_normal((5, 4)) * 0.7
    for r in f(xv, yv):
        assert np.isfinite(np.asarray(r)).all()


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_float32(seed):
    """Same sweep in float32 (the production dtype) with looser bands."""
    rng = np.random.default_rng(3000 + seed)
    x = pt.tensor("x", dtype="float32", shape=(4, 5))
    out = _random_program(rng, x, depth=4)
    f = ptt.function([x], out, mode=DebugMode())
    xv = (rng.standard_normal((4, 5)) * 0.8).astype("float32")
    assert np.isfinite(np.asarray(f(xv))).all()


def _random_scan_body(rng):
    """Random (step_fn, init, n_steps) for a sit-sot f32 vector scan."""
    ops = [lambda a: pt.tanh(a) * np.float32(0.9),
           lambda a: a * np.float32(0.8) + np.float32(0.1),
           lambda a: pt.sigmoid(a) - np.float32(0.5),
           lambda a: pt.maximum(a * np.float32(0.7), -a),
           lambda a: pt.sin(a) * np.float32(0.5)]
    picks = [ops[rng.integers(len(ops))] for _ in range(int(rng.integers(1, 4)))]

    def step(acc):
        for f in picks:
            acc = f(acc)
        return acc

    init = rng.standard_normal(4).astype("float32")
    return step, init, int(rng.integers(3, 9))


@pytest.mark.parametrize("seed", range(15))
def test_fuzz_scan_paths_agree(seed):
    """Oracle (FAST_COMPILE), lax.scan, and Pallas whole-loop lowerings
    of the same random scan agree on trace AND gradient."""
    from pytensor_tpu.config import config

    rng = np.random.default_rng(5000 + seed)
    step, init_v, n = _random_scan_body(rng)
    v0 = pt.tensor("v0", dtype="float32", shape=(4,))

    results = {}
    for label, flags, mode in (
        ("oracle", dict(scan__pallas=False), "FAST_COMPILE"),
        ("lax", dict(scan__pallas=False), None),
        ("pallas", dict(scan__pallas=True), None),
    ):
        with config.change_flags(**flags):
            tr, _ = ptt.scan(step, outputs_info=[v0], n_steps=n)
            g = ptt.grad(tr[-1].sum(), v0)
            f = ptt.function([v0], [tr, g], mode=mode)
        tr_v, g_v = (np.asarray(r) for r in f(init_v))
        results[label] = (tr_v, g_v)

    for label in ("lax", "pallas"):
        np.testing.assert_allclose(results[label][0], results["oracle"][0],
                                   rtol=2e-5, atol=1e-6, err_msg=label)
        np.testing.assert_allclose(results[label][1], results["oracle"][1],
                                   rtol=2e-4, atol=1e-5, err_msg=label)


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_while_scan_agree(seed):
    """Random while-scan bodies: the oracle loop and the lax.while_loop
    lowering agree on the padded trace, the executed-step count stays
    within bounds, and the gradient matches over the executed prefix."""
    import pytensor_tpu as ptt_mod
    from pytensor_tpu.scan.utils import until

    rng = np.random.default_rng(7000 + seed)
    # strictly growing bodies so the threshold always trips
    grow = [lambda a: a * np.float32(1.3) + np.float32(0.05),
            lambda a: a + pt.abs(pt.sin(a)) + np.float32(0.1),
            lambda a: a * np.float32(1.1) + np.float32(0.2)]
    picks = [grow[rng.integers(len(grow))]
             for _ in range(int(rng.integers(1, 3)))]
    thresh = np.float32(2.0 + 3.0 * rng.random())
    T = int(rng.integers(20, 60))

    def step(acc):
        out = acc
        for g in picks:
            out = g(out)
        return out, until(pt.max(out) >= thresh)

    v0 = pt.tensor("v0", dtype="float32", shape=(3,))
    init_v = (0.1 + 0.2 * rng.random(3)).astype("float32")

    results = {}
    for label, mode in (("oracle", "FAST_COMPILE"), ("lax", None)):
        tr, _ = ptt_mod.scan(step, outputs_info=[v0], n_steps=T)
        g = ptt_mod.grad(tr[-1].sum(), v0)
        f = ptt_mod.function([v0], [tr, g], mode=mode)
        tr_v, g_v = (np.asarray(r) for r in f(init_v))
        results[label] = (tr_v, g_v)

    np.testing.assert_allclose(results["lax"][0], results["oracle"][0],
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(results["lax"][1], results["oracle"][1],
                               rtol=2e-4, atol=1e-5)


def _random_program_masks(rng, x, depth=6):
    """Programs over the round-3 session-2 surfaces: pad modes (+crop
    back), roll/flip, tril/triu/diag masks, einsum contractions, and
    boolean-mask reductions — the paths rewritten to constant-mask /
    where() forms.  All shapes stay (5, 5)."""
    pool = [x, pt.einsum("ij,jk->ik", x, x) * 0.1]
    scalars = []
    for _ in range(depth):
        r = rng.random()
        v = pool[rng.integers(len(pool))]
        if r < 0.2:
            mode = ["constant", "edge", "reflect", "wrap", "maximum",
                    "mean", "linear_ramp"][rng.integers(7)]
            pool.append(pt.pad(v, 1, mode=mode)[1:-1, 1:-1])
        elif r < 0.35:
            shift = int(rng.integers(-7, 8))
            pool.append(pt.roll(v, shift, axis=int(rng.integers(2))))
        elif r < 0.45:
            pool.append(pt.flip(v, int(rng.integers(2))))
        elif r < 0.6:
            k = int(rng.integers(-2, 3))
            f = [pt.tril, pt.triu][rng.integers(2)]
            pool.append(f(v, k))
        elif r < 0.7:
            pool.append(pt.diag(pt.diagonal(v)) + v * 0.5)
        elif r < 0.8:
            w = pool[rng.integers(len(pool))]
            spec = ["ij,jk->ik", "ij,kj->ik", "ij,ij->ij"][rng.integers(3)]
            pool.append(pt.einsum(spec, v, w) * 0.1)
        elif r < 0.9:
            scalars.append(pt.sum(v[v > 0.0]))
        else:
            scalars.append(pt.prod(pt.clip(v, 0.5, 2.0)[v < 0.0]))
    out = pt.sum(pt.tanh(pool[-1] * 0.1))
    for s in scalars:
        out = out + pt.tanh(s * 0.01)
    return out


@pytest.mark.parametrize("seed", range(20))
def test_fuzz_mask_surfaces(seed):
    rng = np.random.default_rng(11000 + seed)
    x = pt.tensor("x", dtype="float64", shape=(5, 5))
    out = _random_program_masks(rng, x)
    g = ptt.grad(out, x)
    f = ptt.function([x], [out, g], mode=DebugMode())
    xv = rng.standard_normal((5, 5)) * 0.9
    val, gv = (np.asarray(r) for r in f(xv))
    assert np.isfinite(val).all()
    assert np.isfinite(gv).all()


def _random_linalg_program(rng, A, depth=4):
    """Random SPD-preserving linalg pipelines: cholesky / solves /
    logdet / inverse / eigh chained with SPD-safe combinators, fwd+grad
    under DebugMode — stresses the constant-mask decomposition
    pullbacks."""
    import pytensor_tpu.tensor.linalg as ptl

    spd = A  # (4, 4) SPD by construction at the value level
    scalars = []
    for _ in range(depth):
        r = rng.random()
        if r < 0.25:
            L = ptl.cholesky(spd)
            scalars.append(pt.sum(pt.log(pt.diagonal(L))))
            spd = spd + 0.1 * pt.dot(L, pt.matrix_transpose(L))
        elif r < 0.45:
            scalars.append(ptl.logdet(spd + pt.eye(4, 4, 0, dtype="float64")))
        elif r < 0.6:
            Iv = ptl.inv(spd)
            spd = 0.5 * (Iv + pt.matrix_transpose(Iv)) \
                + 4.0 * pt.eye(4, 4, 0, dtype="float64")
        elif r < 0.8:
            w, V = ptl.eigh(0.5 * (spd + pt.matrix_transpose(spd)))
            scalars.append(pt.sum(pt.log(w + 1.0)))
        else:
            b = pt.as_tensor_variable(
                np.linspace(0.5, 1.5, 4))
            x = ptl.solve(spd, b, b_ndim=1)
            scalars.append(pt.sum(x ** 2))
    out = pt.sum(spd * 0.01)
    for s in scalars:
        out = out + pt.tanh(s * 0.1)
    return out


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_linalg_pipelines(seed):
    rng = np.random.default_rng(21000 + seed)
    A = pt.tensor("A", dtype="float64", shape=(4, 4))
    out = _random_linalg_program(rng, A)
    g = ptt.grad(out, A)
    f = ptt.function([A], [out, g], mode=DebugMode())
    a = rng.standard_normal((4, 4))
    Av = a @ a.T + 4.0 * np.eye(4)
    val, gv = (np.asarray(r) for r in f(Av))
    assert np.isfinite(val).all()
    assert np.isfinite(gv).all()
    # cross-check the gradient against finite differences (oracle mode)
    f_o = ptt.function([A], out, mode="FAST_COMPILE")
    eps = 1e-6
    for idx in [(0, 0), (1, 2), (3, 3)]:
        p = Av.copy(); p[idx] += eps
        m = Av.copy(); m[idx] -= eps
        num = (float(np.asarray(f_o(p))) - float(np.asarray(f_o(m)))) / (2 * eps)
        np.testing.assert_allclose(gv[idx], num, rtol=5e-4, atol=1e-7)
