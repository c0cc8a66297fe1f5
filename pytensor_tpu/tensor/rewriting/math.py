"""Algebraic canonicalization / stabilization / specialization rewrites.

Parallels /root/reference/pytensor/tensor/rewriting/math.py (4k LoC:
AlgebraicCanonizer:1119, exp/log/pow simplifications, sigmoid/softplus
stabilizations :553-677).  This pack keeps the numerically-load-bearing
rewrites; pure speed rewrites matter less here because XLA fuses and
simplifies elementwise chains itself.
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.compile.mode import (
    register_canonicalize,
    register_specialize,
    register_stabilize,
)
from pytensor_tpu.graph.basic import Constant
from pytensor_tpu.graph.rewriting.basic import copy_stack_trace, node_rewriter
from pytensor_tpu.tensor import math as tm
from pytensor_tpu.tensor.basic import as_tensor_variable, cast
from pytensor_tpu.tensor.elemwise import CAReduce, DimShuffle, Elemwise
from pytensor_tpu.tensor.variable import TensorConstant


def _is_ew(node, name):
    return isinstance(node.op, Elemwise) and node.op.scalar_op.name == name


def _unique_value(v):
    """Scalar value if v is a constant with all-equal entries, else None."""
    if isinstance(v, TensorConstant):
        return v.unique_value
    if isinstance(v, Constant):
        data = np.asarray(v.data)
        if data.size and np.all(data == data.flat[0]):
            return data.flat[0]
    if v.owner is not None and isinstance(v.owner.op, DimShuffle):
        return _unique_value(v.owner.inputs[0])
    if v.owner is not None and isinstance(v.owner.op, Elemwise) \
            and v.owner.op.scalar_op.name in ("second", "cast"):
        # fill(x, c) / cast(c): the value is the last input's value
        return _unique_value(v.owner.inputs[-1])
    from pytensor_tpu.tensor.basic import Alloc

    if v.owner is not None and isinstance(v.owner.op, Alloc):
        return _unique_value(v.owner.inputs[0])
    return None


def _same_type_out(node, result):
    out = node.outputs[0]
    result = as_tensor_variable(result)
    if result.type.dtype != out.type.dtype:
        result = cast(result, out.type.dtype)
    if result.type.ndim != out.type.ndim or not out.type.is_super(result.type):
        # broadcast up using an existing input as the shape carrier
        if result.type.ndim <= out.type.ndim:
            carrier = None
            for i in node.inputs:
                if i.type.ndim == out.type.ndim and out.type.is_super(i.type):
                    carrier = i
                    break
            if carrier is not None:
                result = tm.second(carrier, result)
            else:
                return None
        else:
            return None
    if result.type.dtype != out.type.dtype:
        result = cast(result, out.type.dtype)
    if not out.type.is_super(result.type):
        return None
    copy_stack_trace(out, result)
    return result


@node_rewriter([Elemwise])
def local_add_neutral(fgraph, node):
    """add(..., 0, ...) -> add(...); single term passes through."""
    if not _is_ew(node, "add"):
        return False
    new_inputs = []
    changed = False
    for i in node.inputs:
        u = _unique_value(i)
        if u is not None and u == 0:
            changed = True
            continue
        new_inputs.append(i)
    if not changed:
        return False
    if not new_inputs:
        new_inputs = [node.inputs[0]]
    res = new_inputs[0] if len(new_inputs) == 1 else tm.add(*new_inputs)
    res = _same_type_out(node, res)
    return [res] if res is not None else False


register_canonicalize(local_add_neutral, name="local_add_neutral")


@node_rewriter([Elemwise])
def local_mul_neutral(fgraph, node):
    """mul(..., 1, ...) -> mul(...); mul(..., 0, ...) -> 0."""
    if not _is_ew(node, "mul"):
        return False
    new_inputs = []
    changed = False
    for i in node.inputs:
        u = _unique_value(i)
        if u is not None and u == 1:
            changed = True
            continue
        if u is not None and u == 0:
            res = _same_type_out(node, as_tensor_variable(0.0))
            return [res] if res is not None else False
        new_inputs.append(i)
    if not changed:
        return False
    if not new_inputs:
        new_inputs = [node.inputs[0]]
    res = new_inputs[0] if len(new_inputs) == 1 else tm.mul(*new_inputs)
    res = _same_type_out(node, res)
    return [res] if res is not None else False


register_canonicalize(local_mul_neutral, name="local_mul_neutral")


@node_rewriter([Elemwise])
def local_flatten_assoc(fgraph, node):
    """add(add(x,y),z) -> add(x,y,z); same for mul (fusion prep)."""
    if not (_is_ew(node, "add") or _is_ew(node, "mul")):
        return False
    name = node.op.scalar_op.name
    new_inputs = []
    changed = False
    for i in node.inputs:
        if (
            i.owner is not None
            and _is_ew(i.owner, name)
            and len(fgraph.clients.get(i, ())) == 1
            and i.type.ndim == node.outputs[0].type.ndim
        ):
            new_inputs.extend(i.owner.inputs)
            changed = True
        else:
            new_inputs.append(i)
    if not changed:
        return False
    fn = tm.add if name == "add" else tm.mul
    res = _same_type_out(node, fn(*new_inputs))
    return [res] if res is not None else False


register_canonicalize(local_flatten_assoc, name="local_flatten_assoc")


@node_rewriter([Elemwise])
def local_neg_neg(fgraph, node):
    if not _is_ew(node, "neg"):
        return False
    inner = node.inputs[0].owner
    if inner is not None and _is_ew(inner, "neg"):
        res = _same_type_out(node, inner.inputs[0])
        return [res] if res is not None else False
    return False


register_canonicalize(local_neg_neg, name="local_neg_neg")


@node_rewriter([Elemwise])
def local_log_exp(fgraph, node):
    """log(exp(x)) -> x (float domain)."""
    if not _is_ew(node, "log"):
        return False
    inner = node.inputs[0].owner
    if inner is not None and _is_ew(inner, "exp"):
        res = _same_type_out(node, inner.inputs[0])
        return [res] if res is not None else False
    return False


register_canonicalize(local_log_exp, name="local_log_exp")


@node_rewriter([Elemwise])
def local_pow_specialize(fgraph, node):
    """pow(x, const) for const in {0, 0.5, 1, 2, -1, -2} -> cheaper forms."""
    if not _is_ew(node, "pow"):
        return False
    x, y = node.inputs
    u = _unique_value(y)
    if u is None:
        return False
    u = float(u)
    if u == 1.0:
        res = x
    elif u == 2.0:
        res = tm.sqr(x)
    elif u == 0.5:
        res = tm.sqrt(x)
    elif u == -1.0:
        res = tm.reciprocal(x)
    elif u == -2.0:
        res = tm.reciprocal(tm.sqr(x))
    elif u == 0.0:
        from pytensor_tpu.tensor.basic import ones_like

        res = ones_like(x)
    else:
        return False
    res = _same_type_out(node, res)
    return [res] if res is not None else False


register_specialize(local_pow_specialize, name="local_pow_specialize")


@node_rewriter([Elemwise])
def local_log1p(fgraph, node):
    """log(1 + x) -> log1p(x)."""
    if not _is_ew(node, "log"):
        return False
    inner = node.inputs[0].owner
    if inner is None or not _is_ew(inner, "add"):
        return False
    terms = inner.inputs
    ones_idx = [k for k, t in enumerate(terms) if _unique_value(t) == 1]
    if not ones_idx:
        return False
    rest = [t for k, t in enumerate(terms) if k != ones_idx[0]]
    arg = rest[0] if len(rest) == 1 else tm.add(*rest)
    res = _same_type_out(node, tm.log1p(arg))
    return [res] if res is not None else False


register_stabilize(local_log1p, name="local_log1p")


@node_rewriter([Elemwise])
def local_log_sigmoid(fgraph, node):
    """log(sigmoid(x)) -> -softplus(-x) (numerically stable)."""
    if not _is_ew(node, "log"):
        return False
    inner = node.inputs[0].owner
    if inner is not None and _is_ew(inner, "sigmoid"):
        x = inner.inputs[0]
        res = _same_type_out(node, -tm.softplus(-x))
        return [res] if res is not None else False
    return False


register_stabilize(local_log_sigmoid, name="local_log_sigmoid")


@node_rewriter([Elemwise])
def local_log1p_exp_to_softplus(fgraph, node):
    """log1p(exp(x)) -> softplus(x)."""
    if not _is_ew(node, "log1p"):
        return False
    inner = node.inputs[0].owner
    if inner is not None and _is_ew(inner, "exp"):
        res = _same_type_out(node, tm.softplus(inner.inputs[0]))
        return [res] if res is not None else False
    return False


register_stabilize(local_log1p_exp_to_softplus, name="local_log1p_exp_to_softplus")


@node_rewriter([Elemwise])
def local_one_minus_sigmoid(fgraph, node):
    """1 - sigmoid(x) -> sigmoid(-x)."""
    if not _is_ew(node, "sub"):
        return False
    one, s = node.inputs
    if _unique_value(one) != 1:
        return False
    inner = s.owner
    if inner is not None and _is_ew(inner, "sigmoid"):
        res = _same_type_out(node, tm.sigmoid(-inner.inputs[0]))
        return [res] if res is not None else False
    return False


register_stabilize(local_one_minus_sigmoid, name="local_one_minus_sigmoid")


@node_rewriter([Elemwise])
def local_exp_log(fgraph, node):
    """exp(log(x)) -> x is unsafe (domain); but exp(log1p(x)) -> 1+x is
    similarly unsafe.  Do the safe one: exp(-softplus(-x)) -> sigmoid(x)."""
    if not _is_ew(node, "exp"):
        return False
    inner = node.inputs[0].owner
    if inner is not None and _is_ew(inner, "neg"):
        inner2 = inner.inputs[0].owner
        if inner2 is not None and _is_ew(inner2, "softplus"):
            arg = inner2.inputs[0].owner
            if arg is not None and _is_ew(arg, "neg"):
                res = _same_type_out(node, tm.sigmoid(arg.inputs[0]))
                return [res] if res is not None else False
    return False


register_specialize(local_exp_log, name="local_exp_softplus_sigmoid")


@node_rewriter([CAReduce])
def local_sum_of_neg(fgraph, node):
    """sum(-x) -> -sum(x)."""
    if node.op.scalar_op.name != "add":
        return False
    inner = node.inputs[0].owner
    if inner is not None and _is_ew(inner, "neg") and \
            len(fgraph.clients.get(node.inputs[0], ())) == 1:
        s = type(node.op)(node.op.scalar_op, node.op.axis, node.op.dtype,
                          node.op.acc_dtype, node.op.upcast_discrete_output)(
            inner.inputs[0]
        )
        res = _same_type_out(node, -s)
        return [res] if res is not None else False
    return False


register_specialize(local_sum_of_neg, name="local_sum_of_neg")


@node_rewriter([Elemwise])
def local_useless_eq_neq(fgraph, node):
    """eq(x, x) -> ones; neq(x, x) -> zeros."""
    name = node.op.scalar_op.name
    if name not in ("eq", "neq") or len(node.inputs) != 2:
        return False
    x, y = node.inputs
    if x is not y:
        return False
    from pytensor_tpu.tensor.basic import cast, ones_like, zeros_like

    res = ones_like(x, dtype="bool") if name == "eq" else zeros_like(x, dtype="bool")
    res = _same_type_out(node, res)
    return [res] if res is not None else False


register_canonicalize(local_useless_eq_neq, name="local_useless_eq_neq")


@node_rewriter([Elemwise])
def local_sqrt_sqr(fgraph, node):
    """sqrt(sqr(x)) -> abs(x)."""
    if not _is_ew(node, "sqrt"):
        return False
    inner = node.inputs[0].owner
    if inner is not None and _is_ew(inner, "sqr"):
        res = _same_type_out(node, tm.abs(inner.inputs[0]))
        return [res] if res is not None else False
    return False


register_canonicalize(local_sqrt_sqr, name="local_sqrt_sqr")


@node_rewriter([CAReduce])
def local_sum_sum(fgraph, node):
    """sum(sum(x, a), b) -> one sum over the combined axes."""
    if node.op.scalar_op.name != "add":
        return False
    inner_var = node.inputs[0]
    if inner_var.owner is None or not isinstance(inner_var.owner.op, CAReduce):
        return False
    if inner_var.owner.op.scalar_op.name != "add":
        return False
    if len(fgraph.clients.get(inner_var, ())) != 1:
        return False
    x = inner_var.owner.inputs[0]
    inner_axes = inner_var.owner.op.axis
    outer_axes = node.op.axis
    if inner_axes is None or outer_axes is None:
        combined = None
    else:
        # outer axes index the reduced tensor: map back to x's axes
        kept = [d for d in range(x.type.ndim) if d not in inner_axes]
        combined = tuple(sorted(set(inner_axes) | {kept[a] for a in outer_axes}))
    from pytensor_tpu.tensor.elemwise import Sum

    res = Sum(combined, dtype=node.op.dtype)(x)
    out = node.outputs[0]
    if not out.type.is_super(res.type):
        return False
    copy_stack_trace(out, res)
    return [res]


register_canonicalize(local_sum_sum, name="local_sum_sum")


@node_rewriter([CAReduce])
def local_sum_mul_by_scalar(fgraph, node):
    """sum(x * c) -> c * sum(x) when c is 0-d (fewer flops on big x)."""
    if node.op.scalar_op.name != "add" or node.op.axis is not None:
        return False
    inner_var = node.inputs[0]
    if inner_var.owner is None or not _is_ew(inner_var.owner, "mul"):
        return False
    if len(fgraph.clients.get(inner_var, ())) != 1:
        return False
    scalars = []
    tensors = []
    for i in inner_var.owner.inputs:
        if i.type.ndim == 0:
            scalars.append(i)
        else:
            tensors.append(i)
    if not scalars or not tensors:
        return False
    from pytensor_tpu.tensor.elemwise import Sum

    base = tensors[0] if len(tensors) == 1 else tm.mul(*tensors)
    res = tm.mul(*scalars) * Sum(None, dtype=node.op.dtype)(base)
    out = node.outputs[0]
    if res.type.dtype != out.type.dtype:
        from pytensor_tpu.tensor.basic import cast

        res = cast(res, out.type.dtype)
    if not out.type.is_super(res.type):
        return False
    copy_stack_trace(out, res)
    return [res]


register_specialize(local_sum_mul_by_scalar, name="local_sum_mul_by_scalar")


@node_rewriter([Elemwise])
def local_log_sum_exp(fgraph, node):
    """log(sum(exp(x), axis)) -> stable logsumexp graph."""
    if not _is_ew(node, "log"):
        return False
    s = node.inputs[0].owner
    if s is None or not isinstance(s.op, CAReduce) or s.op.scalar_op.name != "add":
        return False
    if len(fgraph.clients.get(node.inputs[0], ())) != 1:
        return False
    e = s.inputs[0].owner
    if e is None or not _is_ew(e, "exp"):
        return False
    if len(fgraph.clients.get(s.inputs[0], ())) != 1:
        return False
    x = e.inputs[0]
    axis = s.op.axis
    res = tm.logsumexp(x, axis=axis)
    out = node.outputs[0]
    if res.type.dtype != out.type.dtype:
        from pytensor_tpu.tensor.basic import cast

        res = cast(res, out.type.dtype)
    if not out.type.is_super(res.type):
        return False
    copy_stack_trace(out, res)
    return [res]


register_stabilize(local_log_sum_exp, name="local_log_sum_exp")



def _as_guarded_switch(v, fgraph):
    """If v (possibly under neg) is switch(c, ...) with a zero branch and a
    single client chain, return (cond, zero_idx, other_branch, negate)."""
    negate = False
    while v.owner is not None and _is_ew(v.owner, "neg") \
            and len(fgraph.clients.get(v, ())) == 1:
        negate = not negate
        v = v.owner.inputs[0]
    if v.owner is None or not _is_ew(v.owner, "switch") \
            or len(fgraph.clients.get(v, ())) != 1:
        return None
    cond, tbranch, fbranch = v.owner.inputs
    if _unique_value(tbranch) == 0:
        return cond, 1, fbranch, negate
    if _unique_value(fbranch) == 0:
        return cond, 2, tbranch, negate
    return None


@node_rewriter([Elemwise])
def local_mul_switch_sink(fgraph, node):
    """mul(switch(c, 0, x), y) -> switch(c, 0, mul(x, y)) (reference
    rewriting/math.py local_mul_switch_sink).  Load-bearing for NaN-free
    gradients: logp graphs guard invalid regions with switch(cond, 0, expr);
    without sinking, grad produces 0 * inf = NaN."""
    if not _is_ew(node, "mul"):
        return False
    for pos, inp in enumerate(node.inputs):
        got = _as_guarded_switch(inp, fgraph)
        if got is None:
            continue
        cond, zero_idx, other_branch, negate = got
        others = [i for k, i in enumerate(node.inputs) if k != pos]
        new_mul = tm.mul(other_branch, *others)
        if negate:
            new_mul = -new_mul
        zero = tm.second(new_mul, cast(as_tensor_variable(0.0),
                                       new_mul.type.dtype))
        if zero_idx == 1:
            res = tm.switch(cond, zero, new_mul)
        else:
            res = tm.switch(cond, new_mul, zero)
        res = _same_type_out(node, res)
        if res is None:
            return False
        copy_stack_trace(node.outputs[0], res)
        return [res]
    return False


register_specialize(local_mul_switch_sink, name="local_mul_switch_sink")


@node_rewriter([Elemwise])
def local_div_switch_sink(fgraph, node):
    """true_div(switch(c, 0, x), y) -> switch(c, 0, x/y) (reference
    local_div_switch_sink); same NaN-guard rationale as mul."""
    if not _is_ew(node, "true_div"):
        return False
    num, den = node.inputs
    got = _as_guarded_switch(num, fgraph)
    if got is None:
        return False
    cond, zero_idx, other_branch, negate = got
    new_div = tm.true_div(other_branch, den)
    if negate:
        new_div = -new_div
    zero = tm.second(new_div, cast(as_tensor_variable(0.0),
                                   new_div.type.dtype))
    if zero_idx == 1:
        res = tm.switch(cond, zero, new_div)
    else:
        res = tm.switch(cond, new_div, zero)
    res = _same_type_out(node, res)
    if res is None:
        return False
    copy_stack_trace(node.outputs[0], res)
    return [res]


register_specialize(local_div_switch_sink, name="local_div_switch_sink")


@node_rewriter([Elemwise])
def local_exp_over_1_plus_exp(fgraph, node):
    """exp(x) / (1 + exp(x)) -> sigmoid(x); 1 / (1 + exp(-x)) -> sigmoid(x)
    (reference rewriting/math.py sigmoid stabilizations :553-677)."""
    if not _is_ew(node, "true_div"):
        return False
    num, den = node.inputs
    if den.owner is None or not _is_ew(den.owner, "add") \
            or len(den.owner.inputs) != 2:
        return False
    a, b = den.owner.inputs
    one_side, exp_side = (a, b) if _unique_value(a) == 1 else (b, a)
    if _unique_value(one_side) != 1 or exp_side.owner is None \
            or not _is_ew(exp_side.owner, "exp"):
        return False
    (z,) = exp_side.owner.inputs
    if num.owner is not None and _is_ew(num.owner, "exp") \
            and num.owner.inputs[0] is z:
        res = _same_type_out(node, tm.sigmoid(z))
    elif _unique_value(num) == 1:
        res = _same_type_out(node, tm.sigmoid(-z))
    else:
        return False
    if res is None:
        return False
    copy_stack_trace(node.outputs[0], res)
    return [res]


register_stabilize(local_exp_over_1_plus_exp, name="local_exp_over_1_plus_exp")


@node_rewriter(None)
def local_0_dot_x(fgraph, node):
    """dot(zeros, x) -> zeros (reference local_0_dot_x)."""
    from pytensor_tpu.tensor.basic import zeros
    from pytensor_tpu.tensor.math import Dot
    from pytensor_tpu.tensor.shape import shape

    if not isinstance(node.op, Dot):
        return False
    x, y = node.inputs
    if _unique_value(x) == 0 or _unique_value(y) == 0:
        out = node.outputs[0]
        shp = [shape(x)[0], shape(y)[1]][: out.type.ndim] if out.type.ndim else []
        if out.type.ndim == 1:
            shp = [shape(x)[0]] if x.type.ndim == 2 else [shape(y)[1]]
        res = zeros(shp, dtype=out.type.dtype) if shp else \
            cast(as_tensor_variable(0.0), out.type.dtype)
        if res.type.ndim == out.type.ndim and any(d is not None
                                                  for d in out.type.shape):
            from pytensor_tpu.tensor.shape import specify_shape

            res = specify_shape(res, out.type.shape)
        if res.type.dtype != out.type.dtype or not out.type.is_super(res.type):
            return False
        copy_stack_trace(out, res)
        return [res]
    return False


register_canonicalize(local_0_dot_x, name="local_0_dot_x")
