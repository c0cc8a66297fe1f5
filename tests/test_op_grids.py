"""Op contract grids.

The reference generates parametrized op contract classes over
dtype x shape x broadcast grids (tests/tensor/utils.py:334 makeTester,
:673 makeBroadcastTester) plus shape-inference assertions
(tests/unittest_tools.py:177 InferShapeTester).  This module is the
pytest-parametrize equivalent: every case compares the XLA backend
against a numpy/scipy expectation (and the oracle linker via
compare_xla_and_py), sweeps gradients by finite differences, and checks
static shape inference removes the op from shape-only graphs.
"""

from __future__ import annotations

import numpy as np
import pytest

import pytensor_tpu as ptt
import pytensor_tpu.tensor as pt
from tests.utils import compare_xla_and_py

rng = np.random.default_rng(42)


def _val(shape, dtype, domain):
    if dtype.startswith("int"):
        v = rng.integers(1, 5, size=shape)
        return v.astype(dtype)
    if domain == "pos":
        v = rng.random(shape) + 0.5
    elif domain == "unit":
        v = rng.uniform(-0.9, 0.9, size=shape)
    elif domain == "ge1":
        v = rng.random(shape) + 1.0
    else:
        v = rng.standard_normal(shape)
    return np.asarray(v, dtype=dtype)


# ---------------------------------------------------------------------------
# unary elemwise: op x dtype x shape
# ---------------------------------------------------------------------------

UNARY = [
    ("exp", pt.exp, np.exp, "any"),
    ("log", pt.log, np.log, "pos"),
    ("log1p", pt.log1p, np.log1p, "pos"),
    ("sqrt", pt.sqrt, np.sqrt, "pos"),
    ("abs", pt.abs, np.abs, "any"),
    ("neg", lambda x: -x, np.negative, "any"),
    ("sin", pt.sin, np.sin, "any"),
    ("cos", pt.cos, np.cos, "any"),
    ("tan", pt.tan, np.tan, "unit"),
    ("arcsin", pt.arcsin, np.arcsin, "unit"),
    ("arccos", pt.arccos, np.arccos, "unit"),
    ("arctan", pt.arctan, np.arctan, "any"),
    ("sinh", pt.sinh, np.sinh, "any"),
    ("cosh", pt.cosh, np.cosh, "any"),
    ("tanh", pt.tanh, np.tanh, "any"),
    ("arcsinh", pt.arcsinh, np.arcsinh, "any"),
    ("arccosh", pt.arccosh, np.arccosh, "ge1"),
    ("arctanh", pt.arctanh, np.arctanh, "unit"),
    ("floor", pt.floor, np.floor, "any"),
    ("ceil", pt.ceil, np.ceil, "any"),
    ("trunc", pt.trunc, np.trunc, "any"),
    ("sqr", pt.sqr, np.square, "any"),
    ("sign", pt.sign, np.sign, "any"),
    ("sigmoid", pt.sigmoid, lambda v: 1 / (1 + np.exp(-v)), "any"),
    ("softplus", pt.softplus, lambda v: np.log1p(np.exp(-np.abs(v)))
     + np.maximum(v, 0), "any"),
    ("expm1", pt.expm1, np.expm1, "any"),
    ("reciprocal", pt.reciprocal, np.reciprocal, "pos"),
    ("deg2rad", pt.deg2rad, np.deg2rad, "any"),
    ("rad2deg", pt.rad2deg, np.rad2deg, "any"),
]

UNARY_SHAPES = [(), (4,), (3, 4), (2, 1, 3)]


@pytest.mark.parametrize("dtype", ["float32", "float64"])
@pytest.mark.parametrize("shape", UNARY_SHAPES,
                         ids=[str(s) for s in UNARY_SHAPES])
@pytest.mark.parametrize("name,op,expected,domain", UNARY,
                         ids=[u[0] for u in UNARY])
def test_unary_grid(name, op, expected, domain, shape, dtype):
    x = pt.tensor("x", dtype=dtype, shape=shape)
    v = _val(shape, dtype, domain)
    tol = dict(rtol=2e-5, atol=2e-6) if dtype == "float32" else \
        dict(rtol=1e-9, atol=1e-12)
    res = compare_xla_and_py([x], op(x), [v], **tol)
    np.testing.assert_allclose(np.asarray(res[0]), expected(v), **tol)


UNARY_GRAD = [u for u in UNARY if u[0] not in
              ("floor", "ceil", "trunc", "sign", "abs")]


def _grad_val(shape, domain, seed):
    """Well-conditioned values for finite-difference checks: stay away
    from domain boundaries where FD error blows up."""
    r = np.random.default_rng(seed)
    if domain == "pos":
        return r.random(shape) * 0.5 + 0.8
    if domain == "unit":
        return r.uniform(-0.6, 0.6, shape)
    if domain == "ge1":
        return r.random(shape) * 0.5 + 1.5
    return r.standard_normal(shape) * 0.7


@pytest.mark.parametrize("name,op,expected,domain", UNARY_GRAD,
                         ids=[u[0] for u in UNARY_GRAD])
def test_unary_grad_fd(name, op, expected, domain):
    v = _grad_val((3,), domain, seed=abs(hash(name)) % (2 ** 31))
    ptt.verify_grad(lambda x: op(x).sum(), [v],
                    rng=np.random.default_rng(5), abs_tol=1e-4, rel_tol=1e-4)


INT_UNARY = [
    ("abs", pt.abs, np.abs),
    ("neg", lambda x: -x, np.negative),
    ("sqr", pt.sqr, np.square),
    ("sign", pt.sign, np.sign),
]


@pytest.mark.parametrize("dtype", ["int32", "int64"])
@pytest.mark.parametrize("name,op,expected", INT_UNARY,
                         ids=[u[0] for u in INT_UNARY])
def test_unary_int_grid(name, op, expected, dtype):
    x = pt.tensor("x", dtype=dtype, shape=(5,))
    v = _val((5,), dtype, "any")
    res = compare_xla_and_py([x], op(x), [v])
    np.testing.assert_array_equal(np.asarray(res[0]), expected(v))


# ---------------------------------------------------------------------------
# binary elemwise with broadcasting: op x shape-pair x dtype
# ---------------------------------------------------------------------------

BINARY = [
    ("add", lambda a, b: a + b, np.add, "any"),
    ("sub", lambda a, b: a - b, np.subtract, "any"),
    ("mul", lambda a, b: a * b, np.multiply, "any"),
    ("true_div", lambda a, b: a / b, np.true_divide, "pos"),
    ("pow", lambda a, b: a ** b, np.power, "pos"),
    ("maximum", pt.maximum, np.maximum, "any"),
    ("minimum", pt.minimum, np.minimum, "any"),
    ("arctan2", pt.arctan2, np.arctan2, "any"),
]

SHAPE_PAIRS = [
    ((), (3,)),
    ((3,), (3,)),
    ((2, 3), (3,)),
    ((2, 1), (1, 3)),
    ((2, 3, 4), (3, 4)),
    ((4, 1, 3), (1, 2, 1)),
]


@pytest.mark.parametrize("dtype", ["float32", "float64"])
@pytest.mark.parametrize("sa,sb", SHAPE_PAIRS,
                         ids=[f"{a}x{b}" for a, b in SHAPE_PAIRS])
@pytest.mark.parametrize("name,op,expected,domain", BINARY,
                         ids=[b[0] for b in BINARY])
def test_binary_broadcast_grid(name, op, expected, domain, sa, sb, dtype):
    a = pt.tensor("a", dtype=dtype, shape=sa)
    b = pt.tensor("b", dtype=dtype, shape=sb)
    va, vb = _val(sa, dtype, domain), _val(sb, dtype, domain)
    tol = dict(rtol=2e-5, atol=2e-6) if dtype == "float32" else \
        dict(rtol=1e-9, atol=1e-12)
    res = compare_xla_and_py([a, b], op(a, b), [va, vb], **tol)
    np.testing.assert_allclose(np.asarray(res[0]), expected(va, vb), **tol)


COMPARISONS = [
    ("lt", pt.lt, np.less), ("le", pt.le, np.less_equal),
    ("gt", pt.gt, np.greater), ("ge", pt.ge, np.greater_equal),
    ("eq", pt.eq, np.equal), ("neq", pt.neq, np.not_equal),
]


@pytest.mark.parametrize("sa,sb", [((3,), (3,)), ((2, 1), (1, 3))],
                         ids=["same", "bcast"])
@pytest.mark.parametrize("name,op,expected", COMPARISONS,
                         ids=[c[0] for c in COMPARISONS])
def test_comparison_grid(name, op, expected, sa, sb):
    a = pt.tensor("a", dtype="float64", shape=sa)
    b = pt.tensor("b", dtype="float64", shape=sb)
    va, vb = _val(sa, "float64", "any"), _val(sb, "float64", "any")
    out = op(a, b)
    assert out.type.dtype == "bool"
    res = compare_xla_and_py([a, b], out, [va, vb])
    np.testing.assert_array_equal(np.asarray(res[0]), expected(va, vb))


@pytest.mark.parametrize("name,op,expected,domain",
                         [b for b in BINARY if b[0] in
                          ("add", "sub", "mul", "true_div", "pow")],
                         ids=["add", "sub", "mul", "true_div", "pow"])
def test_binary_grad_fd(name, op, expected, domain):
    va = _grad_val((2, 3), domain, seed=abs(hash(name)) % (2 ** 31))
    vb = _grad_val((3,), domain, seed=abs(hash(name + "b")) % (2 ** 31))
    ptt.verify_grad(lambda a, b: op(a, b).sum(), [va, vb],
                    rng=np.random.default_rng(7), abs_tol=1e-4, rel_tol=1e-4)


# ---------------------------------------------------------------------------
# reductions: op x axis x keepdims
# ---------------------------------------------------------------------------

REDUCES = [
    ("sum", pt.sum, np.sum, "float64"),
    ("prod", pt.prod, np.prod, "float64"),
    ("max", pt.max, np.max, "float64"),
    ("min", pt.min, np.min, "float64"),
    ("mean", pt.mean, np.mean, "float64"),
    ("all", pt.all, np.all, "bool"),
    ("any", pt.any, np.any, "bool"),
]

AXES = [None, 0, 1, -1, (0, 1)]


@pytest.mark.parametrize("keepdims", [False, True], ids=["flat", "keep"])
@pytest.mark.parametrize("axis", AXES, ids=[str(a) for a in AXES])
@pytest.mark.parametrize("name,op,expected,dt", REDUCES,
                         ids=[r[0] for r in REDUCES])
def test_reduce_grid(name, op, expected, dt, axis, keepdims):
    shape = (3, 4)
    if dt == "bool":
        v = rng.random(shape) > 0.4
        x = pt.tensor("x", dtype="bool", shape=shape)
    else:
        v = _val(shape, dt, "any")
        x = pt.tensor("x", dtype=dt, shape=shape)
    out = op(x, axis=axis, keepdims=keepdims)
    res = compare_xla_and_py([x], out, [v])
    np.testing.assert_allclose(np.asarray(res[0]),
                               expected(v, axis=axis, keepdims=keepdims),
                               rtol=1e-12)


@pytest.mark.parametrize("axis", [None, 0, 1], ids=["none", "0", "1"])
@pytest.mark.parametrize("name,op", [("sum", pt.sum), ("prod", pt.prod),
                                     ("max", pt.max), ("mean", pt.mean)],
                         ids=["sum", "prod", "max", "mean"])
def test_reduce_grad_fd(name, op, axis):
    v = _val((3, 4), "float64", "pos")
    ptt.verify_grad(lambda x: op(x, axis=axis).sum(), [v],
                    rng=np.random.default_rng(9), abs_tol=1e-5, rel_tol=1e-5)


# ---------------------------------------------------------------------------
# subtensor grid: numpy-semantics index expressions
# ---------------------------------------------------------------------------

SUBTENSOR_CASES = [
    ("int", (5,), lambda x: x[2]),
    ("neg_int", (5,), lambda x: x[-1]),
    ("slice", (5,), lambda x: x[1:4]),
    ("slice_open", (5,), lambda x: x[2:]),
    ("slice_neg", (5,), lambda x: x[:-2]),
    ("step", (6,), lambda x: x[::2]),
    ("rev", (5,), lambda x: x[::-1]),
    ("rev_slice", (6,), lambda x: x[4:1:-1]),
    ("row", (4, 5), lambda x: x[1]),
    ("col", (4, 5), lambda x: x[:, 2]),
    ("block", (4, 5), lambda x: x[1:3, ::2]),
    ("ellipsis", (3, 4, 5), lambda x: x[..., 0]),
    ("newaxis", (4,), lambda x: x[None, :]),
    ("mixed3d", (3, 4, 5), lambda x: x[1, :, 2:4]),
    ("full_rev_2d", (3, 4), lambda x: x[::-1, ::-1]),
]


@pytest.mark.parametrize("name,shape,idx", SUBTENSOR_CASES,
                         ids=[c[0] for c in SUBTENSOR_CASES])
def test_subtensor_grid(name, shape, idx):
    x = pt.tensor("x", dtype="float64", shape=shape)
    v = _val(shape, "float64", "any")
    res = compare_xla_and_py([x], idx(x), [v])
    np.testing.assert_array_equal(np.asarray(res[0]), idx(v))


@pytest.mark.parametrize("name,shape,idx", SUBTENSOR_CASES[:10],
                         ids=[c[0] for c in SUBTENSOR_CASES[:10]])
def test_subtensor_grad_fd(name, shape, idx):
    v = _val(shape, "float64", "any")
    ptt.verify_grad(lambda x: (idx(x) ** 2).sum(), [v],
                    rng=np.random.default_rng(11), abs_tol=1e-5, rel_tol=1e-5)


ADV_CASES = [
    ("int_vec", (5,), lambda x: x[np.array([0, 2, 4])]),
    ("int_vec_repeat", (5,), lambda x: x[np.array([1, 1, 3])]),
    ("rows", (4, 5), lambda x: x[np.array([0, 2])]),
    ("bool_mask", (5,),
     lambda x: x[np.array([True, False, True, False, True])]),
    ("pair_lists", (4, 5),
     lambda x: x[np.array([0, 2]), np.array([1, 3])]),
]


@pytest.mark.parametrize("name,shape,idx", ADV_CASES,
                         ids=[c[0] for c in ADV_CASES])
def test_advanced_subtensor_grid(name, shape, idx):
    x = pt.tensor("x", dtype="float64", shape=shape)
    v = _val(shape, "float64", "any")
    res = compare_xla_and_py([x], idx(x), [v])
    np.testing.assert_array_equal(np.asarray(res[0]), idx(v))


SET_CASES = [
    ("set_slice", (5,), lambda x, y: pt.set_subtensor(x[1:3], y[:2])),
    ("inc_slice", (5,), lambda x, y: pt.inc_subtensor(x[1:3], y[:2])),
    ("set_int", (5,), lambda x, y: pt.set_subtensor(x[0], y[0])),
    ("inc_adv", (5,),
     lambda x, y: pt.inc_subtensor(x[np.array([0, 0, 2])], y[:3])),
]


@pytest.mark.parametrize("name,shape,build", SET_CASES,
                         ids=[c[0] for c in SET_CASES])
def test_inc_subtensor_grid(name, shape, build):
    x = pt.tensor("x", dtype="float64", shape=shape)
    y = pt.tensor("y", dtype="float64", shape=shape)
    vx, vy = _val(shape, "float64", "any"), _val(shape, "float64", "any")
    compare_xla_and_py([x, y], build(x, y), [vx, vy])
    ptt.verify_grad(lambda a, b: (build(a, b) ** 2).sum(), [vx, vy],
                    rng=np.random.default_rng(13), abs_tol=1e-5, rel_tol=1e-5)


# ---------------------------------------------------------------------------
# InferShapeTester analog: the op must vanish from shape-only graphs
# ---------------------------------------------------------------------------

def assert_infershape(inputs, out, vals, op_class):
    """Compile shape(out) and assert op_class does not appear: its
    infer_shape produced a static/symbolic shape without computing the op
    (reference tests/unittest_tools.py:177)."""
    shape_out = out.shape
    f = ptt.function(inputs, shape_out, on_unused_input="ignore")
    ops = [type(n.op) for n in f.fgraph.apply_nodes]
    assert op_class not in ops, (
        f"{op_class.__name__} survived in the shape graph: {ops}")
    # shape graphs must be integer-only: any float intermediate means the
    # data computation survived
    for n in f.fgraph.apply_nodes:
        for o in n.outputs:
            dt = getattr(o.type, "dtype", "int64")
            assert dt.startswith(("int", "uint", "bool")), (
                f"non-integer intermediate {o} ({dt}) in the shape graph — "
                f"data computation survived: {[t.__name__ for t in ops]}")
    expected = ptt.function(inputs, out, on_unused_input="ignore")(*vals)
    np.testing.assert_array_equal(np.asarray(f(*vals)),
                                  np.shape(np.asarray(expected)))


def _infershape_cases():
    from pytensor_tpu.tensor.basic import Alloc, Join
    from pytensor_tpu.tensor.blockwise import Blockwise
    from pytensor_tpu.tensor.elemwise import CAReduce, Elemwise
    from pytensor_tpu.tensor.extra_ops import CumOp, Repeat
    from pytensor_tpu.tensor.math import Dot
    from pytensor_tpu.tensor.shape import Reshape
    from pytensor_tpu.tensor.subtensor import IncSubtensor, Subtensor

    a = pt.tensor("a", dtype="float64", shape=(None, None))
    v = pt.tensor("v", dtype="float64", shape=(None,))
    av = rng.random((3, 4))
    vv = rng.random(4)
    cases = [
        ("elemwise", [a], pt.exp(a) * 2, [av], Elemwise),
        ("dot", [a, v], pt.dot(a, v), [av, vv], Dot),
        ("reduce", [a], pt.sum(a, axis=1), [av], CAReduce),
        ("subtensor", [a], a[1:, ::2], [av], Subtensor),
        ("inc_subtensor", [a, v],
         pt.set_subtensor(a[0], v), [av, vv], IncSubtensor),
        ("alloc", [v], pt.alloc(v, 5, 4), [vv], Alloc),
        ("join", [a], pt.join(0, a, a), [av], Join),
        ("reshape", [a], a.reshape((2, 6)), [av], Reshape),
        ("cumsum", [v], pt.cumsum(v), [vv], CumOp),
        ("repeat", [v], pt.repeat(v, 3), [vv], Repeat),
        ("blockwise_matmul", [a], pt.matmul(a[None], a[None].mT),
         [av], Blockwise),
    ]
    return cases


@pytest.mark.parametrize("name,inputs,out,vals,op_class", _infershape_cases(),
                         ids=[c[0] for c in _infershape_cases()])
def test_infershape(name, inputs, out, vals, op_class):
    assert_infershape(inputs, out, vals, op_class)


# ---------------------------------------------------------------------------
# error paths: bad shapes, strict filter, unused inputs
# ---------------------------------------------------------------------------

class TestErrorPaths:
    def test_static_shape_mismatch_raises(self):
        x = pt.tensor("x", dtype="float64", shape=(3,))
        f = ptt.function([x], x * 2)
        with pytest.raises((TypeError, ValueError)):
            f(np.zeros(4))

    def test_dtype_downcast_refused(self):
        x = pt.tensor("x", dtype="float32", shape=(3,))
        f = ptt.function([x], x * 2)
        with pytest.raises(TypeError):
            f(np.zeros(3, dtype="float64"))

    def test_specify_shape_runtime_check(self):
        x = pt.dvector("x")
        out = pt.specify_shape(x, (3,))
        f = ptt.function([x], out, mode="FAST_COMPILE")
        np.testing.assert_array_equal(np.asarray(f(np.zeros(3))), np.zeros(3))
        with pytest.raises(Exception):
            f(np.zeros(4))

    def test_bad_reshape_total_size(self):
        x = pt.dvector("x")
        f = ptt.function([x], x.reshape((2, 3)), mode="FAST_COMPILE")
        with pytest.raises(Exception):
            f(np.zeros(5))

    def test_unused_input_raises_by_default(self):
        from pytensor_tpu.compile.maker import UnusedInputError

        x = pt.dvector("x")
        y = pt.dvector("y")
        with pytest.raises(UnusedInputError):
            ptt.function([x, y], x * 2)

    def test_wrong_arity(self):
        x = pt.dvector("x")
        f = ptt.function([x], x * 2)
        with pytest.raises(TypeError):
            f(np.zeros(3), np.zeros(3))

    def test_unknown_kwarg_name(self):
        x = pt.dvector("x")
        f = ptt.function([x], x * 2)
        with pytest.raises(TypeError):
            f(bad_name=np.zeros(3))

    def test_incompatible_broadcast_static(self):
        a = pt.tensor("a", dtype="float64", shape=(3,))
        b = pt.tensor("b", dtype="float64", shape=(4,))
        with pytest.raises((TypeError, ValueError)):
            (a + b)

    def test_bool_mask_wrong_length(self):
        x = pt.tensor("x", dtype="float64", shape=(5,))
        with pytest.raises(IndexError):
            x[np.array([True, False, True])]

    def test_grad_of_argmax_is_zeros(self):
        # reference Argmax.pullback returns x.zeros_like() — piecewise
        # constant, not an error
        x = pt.dvector("x")
        g = ptt.grad(pt.argmax(x), x)
        f = ptt.function([x], g, mode="FAST_COMPILE")
        np.testing.assert_array_equal(np.asarray(f(np.array([1.0, 3.0]))),
                                      [0.0, 0.0])
