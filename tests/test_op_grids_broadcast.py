"""Broadcast-grid op contract tests, the makeBroadcastTester analog.

The reference generates op contract classes over dtype x shape x
broadcast grids with good-value AND error cases
(/root/reference/tests/tensor/utils.py:334 makeTester, :673
makeBroadcastTester).  This module is the systematic equivalent:

- BINARY elemwise grid: op x dtype x shape-pair, where the shape pairs
  sweep equal shapes, left/right scalar, row/column broadcast, size-1
  dims, EMPTY arrays and 0-d, checking values against numpy, output
  dtype promotion, and static shape inference.
- REDUCTION grid: op x axis-config x shape, including empty axes,
  keepdims, negative axes, 0-d inputs.
- STRUCTURAL grid: reshape/transpose/concat/stack/tile/repeat/flip/roll
  over shape sweeps including -1 reshape holes and empty operands.
- ERROR grid: shape mismatches, invalid axes, bad reshapes — each case
  must raise (at build or call time), mirroring the reference's
  bad_build/bad_runtime cases.

To keep suite wall-time bounded, every (op, dtype) cell compiles ONE
function whose outputs cover all shape cases of that cell (compile once,
check many), instead of one function per case.
"""

from __future__ import annotations

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt

rng = np.random.default_rng(2024)


def _mk(shape, dtype, domain="any"):
    if dtype.startswith("int") or dtype.startswith("uint"):
        return rng.integers(1, 5, size=shape).astype(dtype)
    if dtype == "bool":
        return (rng.random(shape) < 0.5)
    if domain == "pos":
        v = rng.random(shape) + 0.5
    elif domain == "nonzero":
        v = rng.random(shape) + 0.5
    else:
        v = rng.standard_normal(shape)
    return np.asarray(v, dtype=dtype)


# ---------------------------------------------------------------------------
# binary elemwise broadcast grid
# ---------------------------------------------------------------------------

# (name, graph builder, numpy fn, right-operand domain)
BINARY_OPS = [
    ("add", lambda a, b: a + b, np.add, "any"),
    ("sub", lambda a, b: a - b, np.subtract, "any"),
    ("mul", lambda a, b: a * b, np.multiply, "any"),
    ("div", lambda a, b: a / b, np.true_divide, "nonzero"),
    ("pow", lambda a, b: pt.abs(a) ** b, lambda a, b: np.abs(a) ** b, "any"),
    ("maximum", pt.maximum, np.maximum, "any"),
    ("minimum", pt.minimum, np.minimum, "any"),
    ("lt", pt.lt, np.less, "any"),
    ("le", pt.le, np.less_equal, "any"),
    ("gt", pt.gt, np.greater, "any"),
    ("eq", pt.eq, np.equal, "any"),
    ("neq", pt.neq, np.not_equal, "any"),
    ("arctan2", pt.arctan2, np.arctan2, "nonzero"),
    ("hypot", lambda a, b: pt.sqrt(a * a + b * b),
     lambda a, b: np.hypot(a, b), "any"),
]

# (left shape, right shape): the broadcast sweep incl. empty + 0-d
SHAPE_PAIRS = [
    ((), ()),
    ((4,), ()),
    ((), (4,)),
    ((5,), (5,)),
    ((3, 4), (3, 4)),
    ((3, 4), (4,)),          # trailing broadcast
    ((3, 1), (1, 4)),        # outer broadcast
    ((1, 4), (3, 1)),
    ((2, 1, 4), (3, 1)),     # rank mismatch + broadcast
    ((2, 3, 4), (1, 1, 1)),
    ((0,), (0,)),            # empty
    ((0, 3), (1, 3)),        # empty with broadcast
    ((1,), (5,)),
    ((6, 1, 1), (1, 2, 3)),
]

BIN_DTYPES = ["float64", "float32", "int64", "int32"]


@pytest.mark.parametrize("name,build,npf,domain",
                         BINARY_OPS, ids=[o[0] for o in BINARY_OPS])
@pytest.mark.parametrize("dtype", BIN_DTYPES)
def test_binary_broadcast_grid(name, build, npf, domain, dtype):
    if dtype.startswith("int") and name in ("div", "arctan2", "hypot", "pow"):
        pytest.skip("float-only op")
    ins, outs, vals, expects = [], [], [], []
    for sa, sb in SHAPE_PAIRS:
        a = pt.tensor(f"a{len(ins)}", dtype=dtype, shape=sa)
        b = pt.tensor(f"b{len(ins)}", dtype=dtype, shape=sb)
        av, bv = _mk(sa, dtype), _mk(sb, dtype, domain)
        out = build(a, b)
        expect = npf(av, bv) if name != "pow" else npf(av, bv)
        # static shape inference must match numpy broadcasting
        assert tuple(out.type.shape) == np.broadcast_shapes(sa, sb), \
            (name, sa, sb, out.type.shape)
        ins += [a, b]
        vals += [av, bv]
        outs.append(out)
        expects.append(expect)
    f = ptt.function(ins, outs)
    got = f(*vals)
    for g, e, (sa, sb) in zip(got, expects, SHAPE_PAIRS):
        g = np.asarray(g)
        assert g.shape == np.asarray(e).shape, (name, sa, sb)
        tol = 1e-5 if dtype == "float32" else 1e-9
        if np.asarray(e).dtype.kind == "b":
            assert np.array_equal(g.astype(bool), e), (name, sa, sb)
        else:
            np.testing.assert_allclose(
                g.astype("float64"), np.asarray(e).astype("float64"),
                rtol=tol, atol=tol, err_msg=f"{name} {sa}x{sb} {dtype}")


@pytest.mark.parametrize("name,build,npf,domain",
                         BINARY_OPS[:6], ids=[o[0] for o in BINARY_OPS[:6]])
def test_binary_grad_grid(name, build, npf, domain):
    """Finite-difference gradient over a broadcast subset (float64)."""
    for sa, sb in [((3, 4), (4,)), ((3, 1), (1, 4)), ((5,), (5,)),
                   ((2, 1, 4), (3, 1))]:
        # keep both operands away from kinks (abs in pow, division)
        av = np.abs(_mk(sa, "float64")) + 0.5
        bv = np.abs(_mk(sb, "float64", domain)) + 0.5
        ptt.verify_grad(lambda a, b: build(a, b).sum(), [av, bv],
                        rng=np.random.default_rng(7), abs_tol=1e-5,
                        rel_tol=1e-5)


# mixed-dtype promotion sweep: output dtype must match numpy
PROMOTE_PAIRS = [
    ("float32", "float64"), ("int32", "float32"), ("int64", "float64"),
    ("int32", "int64"), ("int8", "int32"), ("uint8", "int16"),
    ("float32", "int64"), ("bool", "int32"), ("bool", "float32"),
]


@pytest.mark.parametrize("da,db", PROMOTE_PAIRS,
                         ids=[f"{a}-{b}" for a, b in PROMOTE_PAIRS])
def test_binary_dtype_promotion(da, db):
    a = pt.tensor("a", dtype=da, shape=(3,))
    b = pt.tensor("b", dtype=db, shape=(3,))
    out = a + b
    expect = (np.zeros(3, da) + np.zeros(3, db)).dtype
    assert str(out.type.dtype) == str(expect)
    f = ptt.function([a, b], out)
    got = np.asarray(f(_mk((3,), da), _mk((3,), db)))
    assert str(got.dtype) == str(expect)


# ---------------------------------------------------------------------------
# reduction grid
# ---------------------------------------------------------------------------

REDUCTIONS = [
    ("sum", pt.sum, np.sum),
    ("prod", pt.prod, np.prod),
    ("max", pt.max, np.max),
    ("min", pt.min, np.min),
    ("mean", pt.mean, np.mean),
    ("all", lambda x, axis=None: pt.all(x > 0, axis=axis),
     lambda v, axis=None: np.all(v > 0, axis=axis)),
    ("any", lambda x, axis=None: pt.any(x > 0, axis=axis),
     lambda v, axis=None: np.any(v > 0, axis=axis)),
]

RED_CASES = [
    # (shape, axis)
    ((5,), None), ((5,), 0), ((5,), -1),
    ((3, 4), None), ((3, 4), 0), ((3, 4), 1), ((3, 4), -2),
    ((2, 3, 4), (0, 2)), ((2, 3, 4), (1,)), ((2, 3, 4), None),
    ((1, 1), None), ((1, 4), 0),
    ((), None),
]


@pytest.mark.parametrize("name,build,npf", REDUCTIONS,
                         ids=[r[0] for r in REDUCTIONS])
@pytest.mark.parametrize("dtype", ["float64", "float32", "int64"])
def test_reduction_grid(name, build, npf, dtype):
    ins, outs, vals, expects = [], [], [], []
    for shape, axis in RED_CASES:
        if shape == () and name in ("max", "min"):
            pass  # 0-d max/min is legal
        x = pt.tensor(f"x{len(ins)}", dtype=dtype, shape=shape)
        v = _mk(shape, dtype)
        try:
            out = build(x, axis=axis)
        except TypeError:
            out = build(x) if axis is None else None
        if out is None:
            continue
        ins.append(x)
        vals.append(v)
        outs.append(out)
        expects.append(npf(v, axis=axis))
    f = ptt.function(ins, outs)
    for g, e, (shape, axis) in zip(f(*vals), expects, RED_CASES):
        g = np.asarray(g)
        e = np.asarray(e)
        assert g.shape == e.shape, (name, shape, axis)
        tol = 2e-5 if dtype == "float32" else 1e-10
        np.testing.assert_allclose(g.astype("f8"), e.astype("f8"),
                                   rtol=tol, atol=tol,
                                   err_msg=f"{name} {shape} axis={axis}")


@pytest.mark.parametrize("name,build,npf", REDUCTIONS[:5],
                         ids=[r[0] for r in REDUCTIONS[:5]])
def test_reduction_empty_arrays(name, build, npf):
    """Reductions over empty arrays follow numpy (identity element or
    error for max/min)."""
    x = pt.tensor("x", dtype="float64", shape=(0,))
    v = np.zeros((0,))
    if name in ("max", "min"):
        f = ptt.function([x], build(x))
        with pytest.raises(Exception):
            f(v)
    else:
        f = ptt.function([x], build(x))
        np.testing.assert_allclose(np.asarray(f(v)), npf(v))


@pytest.mark.parametrize("name,build,npf", REDUCTIONS[:5],
                         ids=[r[0] for r in REDUCTIONS[:5]])
def test_reduction_keepdims(name, build, npf):
    x = pt.tensor("x", dtype="float64", shape=(3, 4))
    v = _mk((3, 4), "float64")
    out = build(x, axis=1)
    f = ptt.function([x], out.reshape((3, 1)))
    np.testing.assert_allclose(np.asarray(f(v)),
                               npf(v, axis=1).reshape(3, 1), rtol=1e-12)


# ---------------------------------------------------------------------------
# structural grid
# ---------------------------------------------------------------------------

RESHAPE_CASES = [
    ((6,), (2, 3)), ((2, 3), (6,)), ((2, 3), (3, 2)),
    ((2, 3, 4), (6, 4)), ((2, 3, 4), (2, 12)), ((4,), (2, 2)),
    ((2, 3), (-1,)), ((2, 3, 4), (2, -1)), ((2, 3, 4), (-1, 4)),
    ((0, 3), (0,)), ((1, 1, 1), ()),
    ((5,), (5, 1)), ((5,), (1, 5, 1)),
]


def test_reshape_grid():
    ins, outs, vals, expects = [], [], [], []
    for src, dst in RESHAPE_CASES:
        x = pt.tensor(f"x{len(ins)}", dtype="float64", shape=src)
        v = _mk(src, "float64")
        ins.append(x)
        vals.append(v)
        outs.append(pt.reshape(x, dst))
        expects.append(v.reshape(dst))
    f = ptt.function(ins, outs)
    for g, e, case in zip(f(*vals), expects, RESHAPE_CASES):
        g = np.asarray(g)
        assert g.shape == e.shape, case
        np.testing.assert_array_equal(g, e, err_msg=str(case))


TRANSPOSE_CASES = [
    ((3, 4), (1, 0)), ((2, 3, 4), (2, 0, 1)), ((2, 3, 4), (0, 2, 1)),
    ((2, 3, 4, 5), (3, 2, 1, 0)), ((1, 4), (1, 0)), ((0, 3), (1, 0)),
]


def test_transpose_grid():
    ins, outs, vals, expects = [], [], [], []
    for shape, perm in TRANSPOSE_CASES:
        x = pt.tensor(f"x{len(ins)}", dtype="float64", shape=shape)
        v = _mk(shape, "float64")
        ins.append(x)
        vals.append(v)
        outs.append(pt.transpose(x, perm))
        expects.append(np.transpose(v, perm))
    f = ptt.function(ins, outs)
    for g, e, case in zip(f(*vals), expects, TRANSPOSE_CASES):
        assert np.asarray(g).shape == e.shape, case
        np.testing.assert_array_equal(np.asarray(g), e, err_msg=str(case))


JOIN_CASES = [
    (0, [(2, 3), (4, 3)]), (1, [(2, 3), (2, 1)]), (0, [(0, 3), (2, 3)]),
    (-1, [(2, 2), (2, 5)]), (0, [(1,), (0,), (2,)]),
    (2, [(2, 3, 1), (2, 3, 4)]),
]


def test_join_grid():
    ins, outs, vals, expects = [], [], [], []
    for axis, shapes in JOIN_CASES:
        xs, vs = [], []
        for s in shapes:
            x = pt.tensor(f"x{len(ins)}_{len(xs)}", dtype="float64", shape=s)
            xs.append(x)
            vs.append(_mk(s, "float64"))
        ins += xs
        vals += vs
        outs.append(pt.join(axis, *xs))
        expects.append(np.concatenate(vs, axis=axis))
    f = ptt.function(ins, outs)
    for g, e, case in zip(f(*vals), expects, JOIN_CASES):
        assert np.asarray(g).shape == e.shape, case
        np.testing.assert_array_equal(np.asarray(g), e, err_msg=str(case))


MISC_STRUCTURAL = [
    ("tile", lambda x: pt.tile(x, (2, 3)), lambda v: np.tile(v, (2, 3)),
     (2, 2)),
    ("repeat0", lambda x: pt.repeat(x, 3, axis=0),
     lambda v: np.repeat(v, 3, axis=0), (2, 2)),
    ("repeat_flat", lambda x: pt.repeat(x, 2),
     lambda v: np.repeat(v, 2), (3,)),
    ("flip", lambda x: x[::-1], lambda v: v[::-1], (4,)),
    ("flip2", lambda x: x[:, ::-1], lambda v: v[:, ::-1], (3, 4)),
    ("roll", lambda x: pt.roll(x, 2), lambda v: np.roll(v, 2), (5,)),
    ("rollax", lambda x: pt.roll(x, -1, axis=1),
     lambda v: np.roll(v, -1, axis=1), (2, 5)),
    ("diag_of", lambda x: pt.diagonal(x), lambda v: np.diagonal(v), (4, 4)),
    ("triu", lambda x: pt.triu(x), np.triu, (4, 4)),
    ("tril", lambda x: pt.tril(x), np.tril, (4, 4)),
    ("cumsum", lambda x: pt.cumsum(x, axis=0),
     lambda v: np.cumsum(v, axis=0), (3, 4)),
    ("cumprod", lambda x: pt.cumprod(x, axis=1),
     lambda v: np.cumprod(v, axis=1), (3, 4)),
    ("sort", lambda x: pt.sort(x, axis=-1),
     lambda v: np.sort(v, axis=-1), (3, 5)),
    ("argsort", lambda x: pt.argsort(x, axis=-1),
     lambda v: np.argsort(v, axis=-1, kind="stable"), (3, 5)),
    ("squeeze", lambda x: pt.squeeze(x), np.squeeze, (1, 3, 1)),
    ("ravel", lambda x: x.flatten(), np.ravel, (2, 3, 2)),
]


@pytest.mark.parametrize("name,build,npf,shape", MISC_STRUCTURAL,
                         ids=[m[0] for m in MISC_STRUCTURAL])
def test_misc_structural(name, build, npf, shape):
    x = pt.tensor("x", dtype="float64", shape=shape)
    v = _mk(shape, "float64")
    f = ptt.function([x], build(x))
    g = np.asarray(f(v))
    e = np.asarray(npf(v))
    assert g.shape == e.shape, name
    np.testing.assert_allclose(g.astype("f8"), e.astype("f8"), rtol=1e-12,
                               err_msg=name)


# ---------------------------------------------------------------------------
# error grid: each case must raise at build or call time
# ---------------------------------------------------------------------------

def _build_mismatched_add():
    a = pt.tensor("a", dtype="float64", shape=(3,))
    b = pt.tensor("b", dtype="float64", shape=(4,))
    return [a, b], a + b, (np.zeros(3), np.zeros(4))


def _build_bad_dot():
    a = pt.tensor("a", dtype="float64", shape=(3, 4))
    b = pt.tensor("b", dtype="float64", shape=(5, 2))
    return [a, b], pt.dot(a, b), (np.zeros((3, 4)), np.zeros((5, 2)))


def _build_bad_reshape():
    x = pt.tensor("x", dtype="float64", shape=(6,))
    return [x], pt.reshape(x, (4,)), (np.zeros(6),)


def _build_bad_axis_sum():
    x = pt.tensor("x", dtype="float64", shape=(3, 4))
    return [x], pt.sum(x, axis=5), (np.zeros((3, 4)),)


def _build_bad_join_axis():
    a = pt.tensor("a", dtype="float64", shape=(2, 3))
    b = pt.tensor("b", dtype="float64", shape=(2, 3))
    return [a, b], pt.join(3, a, b), (np.zeros((2, 3)),) * 2


def _build_bad_join_shapes():
    a = pt.tensor("a", dtype="float64", shape=(2, 3))
    b = pt.tensor("b", dtype="float64", shape=(2, 4))
    return [a, b], pt.join(0, a, b), (np.zeros((2, 3)), np.zeros((2, 4)))


def _build_wrong_rank_input():
    x = pt.tensor("x", dtype="float64", shape=(3,))
    return [x], pt.exp(x), (np.zeros((3, 3)),)


def _build_wrong_dtype_strict():
    x = pt.tensor("x", dtype="float32", shape=(3,))
    return [x], pt.exp(x), (np.zeros(3, dtype="float64"),)


ERROR_CASES = [
    ("mismatched_add", _build_mismatched_add),
    ("bad_dot_inner", _build_bad_dot),
    ("bad_reshape_size", _build_bad_reshape),
    ("bad_axis_sum", _build_bad_axis_sum),
    ("bad_join_axis", _build_bad_join_axis),
    ("bad_join_shapes", _build_bad_join_shapes),
    ("wrong_rank_input", _build_wrong_rank_input),
    ("wrong_dtype_input", _build_wrong_dtype_strict),
]


@pytest.mark.parametrize("name,builder", ERROR_CASES,
                         ids=[c[0] for c in ERROR_CASES])
def test_error_grid(name, builder):
    """Bad graphs/values raise — at build time (preferred) or call time."""
    with pytest.raises(Exception):
        ins, out, vals = builder()
        f = ptt.function(ins, out)
        f(*vals)


# ---------------------------------------------------------------------------
# degenerate-case sweep for unary ops: 0-d, empty, single-element
# ---------------------------------------------------------------------------

UNARY_SMALL = [
    ("exp", pt.exp, np.exp), ("tanh", pt.tanh, np.tanh),
    ("abs", pt.abs, np.abs), ("sqrt_abs", lambda x: pt.sqrt(pt.abs(x)),
                              lambda v: np.sqrt(np.abs(v))),
    ("sigmoid", pt.sigmoid, lambda v: 1 / (1 + np.exp(-v))),
    ("neg", lambda x: -x, np.negative),
    ("sign", pt.sign, np.sign),
    ("floor", pt.floor, np.floor), ("ceil", pt.ceil, np.ceil),
    ("round", pt.round, np.round),
]

DEGENERATE_SHAPES = [(), (0,), (1,), (0, 4), (1, 1), (1, 0, 2)]


@pytest.mark.parametrize("name,build,npf", UNARY_SMALL,
                         ids=[u[0] for u in UNARY_SMALL])
def test_unary_degenerate_shapes(name, build, npf):
    ins, outs, vals, expects = [], [], [], []
    for shape in DEGENERATE_SHAPES:
        x = pt.tensor(f"x{len(ins)}", dtype="float64", shape=shape)
        v = _mk(shape, "float64")
        ins.append(x)
        vals.append(v)
        outs.append(build(x))
        expects.append(npf(v))
    f = ptt.function(ins, outs)
    for g, e, shape in zip(f(*vals), expects, DEGENERATE_SHAPES):
        g = np.asarray(g)
        assert g.shape == np.asarray(e).shape, (name, shape)
        np.testing.assert_allclose(g, e, rtol=1e-12, atol=1e-12,
                                   err_msg=f"{name} {shape}")