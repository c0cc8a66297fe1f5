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
