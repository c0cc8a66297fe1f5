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


def _needs_broadcast_fix(res_type, out_type):
    """True when ``res`` may be narrower than the node output: a static
    1 where the output is not statically 1 means the dropped operand was
    the broadcast carrier (e.g. add(sum_keepdims, x*0) -> sum_keepdims
    silently loses x's shape)."""
    if res_type.ndim != out_type.ndim:
        return True
    return any(r == 1 and o != 1
               for r, o in zip(res_type.shape, out_type.shape))


def _same_type_out(node, result):
    out = node.outputs[0]
    result = as_tensor_variable(result)
    if result.type.dtype != out.type.dtype:
        result = cast(result, out.type.dtype)
    if result.type.ndim != out.type.ndim \
            or not out.type.is_super(result.type) \
            or _needs_broadcast_fix(result.type, out.type):
        # broadcast up using an existing input as the shape carrier; the
        # carrier must itself REACH the output shape (an input with a
        # static-1 dim where the output has more would under-broadcast)
        if result.type.ndim <= out.type.ndim:
            carrier = None
            for i in node.inputs:
                if (i.type.ndim == out.type.ndim
                        and out.type.is_super(i.type)
                        and not _needs_broadcast_fix(i.type, out.type)):
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
    if inner is None:
        return False
    if _is_ew(inner, "sub"):
        # log(1 - y) -> log1p(-y)
        a, b = inner.inputs
        if _unique_value(a) == 1:
            res = _same_type_out(node, tm.log1p(-b))
            return [res] if res is not None else False
        return False
    if not _is_ew(inner, "add"):
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


# ---------------------------------------------------------------------------
# Algebraic canonicalization (reference tensor/rewriting/math.py
# AlgebraicCanonizer:1119, redesigned: instead of a generic two-op
# canonizer class we walk single-client mul/div/neg/reciprocal (resp.
# add/sub/neg) chains once, fold constants, and cancel identical factors.
# Fires only when it provably simplified, so the equilibrium pass is
# stable without an uncanonicalize undo step.
# ---------------------------------------------------------------------------

_MUL_CHAIN = ("mul", "true_div", "neg", "reciprocal")


def _single_client(fgraph, v):
    return len(fgraph.clients.get(v, ())) == 1


def _collect_mul(fgraph, v, num, den, state, invert=False, root=False,
                 at_top=False):
    """Collect multiplicative factors of v into num/den lists.

    state tracks: coeff (python float), n_const (constants folded),
    n_inner_div (div/reciprocal found outside the canonical position).
    The canonical form is [neg] true_div(mul(c?, f...), mul(g...)), so
    one div at the top spine (root, possibly under pure negs) is NOT
    structural change — anything else is.
    """
    node = v.owner
    name = node.op.scalar_op.name if (
        node is not None and isinstance(node.op, Elemwise)) else None
    absorb = root or (name in _MUL_CHAIN and _single_client(fgraph, v))
    if name == "mul" and absorb:
        for i in node.inputs:
            _collect_mul(fgraph, i, num, den, state, invert)
        return
    if name == "true_div" and absorb:
        if (root or at_top) and not state["seen_top_div"]:
            state["seen_top_div"] = True
        else:
            state["n_inner_div"] += 1
        _collect_mul(fgraph, node.inputs[0], num, den, state, invert)
        _collect_mul(fgraph, node.inputs[1], num, den, state, not invert)
        return
    if name == "reciprocal" and absorb:
        if not (root or at_top):
            state["n_inner_div"] += 1
        _collect_mul(fgraph, node.inputs[0], num, den, state, not invert)
        return
    if name == "neg" and absorb:
        state["coeff"] = -state["coeff"]
        state["n_neg"] += 1
        _collect_mul(fgraph, node.inputs[0], num, den, state, invert,
                     at_top=root or at_top)
        return
    u = _unique_value(v)
    if u is not None and v.type.ndim == 0 and np.isfinite(u):
        state["n_const"] += 1
        if invert:
            if float(u) == 0.0:
                # 1/0: keep symbolic (inf/nan semantics)
                den.append(v)
                state["n_const"] -= 1
            else:
                state["coeff"] /= float(u)
        else:
            state["coeff"] *= float(u)
        return
    (den if invert else num).append(v)


@node_rewriter([Elemwise])
def local_mul_div_canonizer(fgraph, node):
    """Canonicalize mul/div/neg/reciprocal trees: fold constants into one
    coefficient, flatten nested divisions, cancel identical factors.
    x/x -> 1, (2*x)/(4*y) -> 0.5*x/y, 1/(1/x) -> x, (-x)*(-y) -> x*y."""
    name = node.op.scalar_op.name
    if name not in ("mul", "true_div", "reciprocal", "neg"):
        return False
    out = node.outputs[0]
    if out.type.dtype.startswith(("int", "uint", "bool")):
        return False  # integer semantics (floor, overflow) differ
    num, den = [], []
    state = {"coeff": 1.0, "n_const": 0, "n_inner_div": 0, "n_neg": 0,
             "seen_top_div": False}
    _collect_mul(fgraph, out, num, den, state, root=True)

    # cancel identical factors (same Variable object; CSE makes these
    # common), only when types match exactly so broadcasting is preserved
    n_cancel = 0
    new_den = []
    for d in den:
        hit = next((k for k, n in enumerate(num)
                    if n is d and n.type == d.type), None)
        if hit is not None:
            del num[hit]
            n_cancel += 1
        else:
            new_den.append(d)
    den = new_den

    coeff = state["coeff"]
    fired = (
        n_cancel > 0
        or state["n_const"] >= 2
        or state["n_inner_div"] > 0
        or (coeff == 0.0 and not den)
        or state["n_neg"] >= 2  # (-x)*(-y) -> x*y
        # a sign folding into a real constant (not +-1, which would just
        # re-emit the same neg node and loop the equilibrium pass):
        or (state["n_neg"] >= 1 and state["n_const"] >= 1
            and coeff not in (1.0, -1.0))
        or (state["n_const"] == 1 and coeff == 1.0 and num)
    )
    if not fired:
        return False

    if coeff == 0.0 and not den:
        res = _same_type_out(node, as_tensor_variable(0.0))
        return [res] if res is not None else False

    dtype = out.type.dtype
    factors = list(num)
    negate = False
    if coeff == -1.0:
        negate = True
    elif coeff != 1.0:
        factors.insert(0, constant_like(coeff, dtype))
    if not factors:
        num_expr = constant_like(1.0, dtype)
    elif len(factors) == 1:
        num_expr = factors[0]
    else:
        num_expr = tm.mul(*factors)
    if den:
        den_expr = den[0] if len(den) == 1 else tm.mul(*den)
        res = tm.true_div(num_expr, den_expr)
    else:
        res = num_expr
    if negate:
        res = -res
    res = _same_type_out(node, res)
    return [res] if res is not None else False


def constant_like(value, dtype):
    from pytensor_tpu.tensor.basic import constant

    return constant(np.array(value, dtype=dtype))


register_canonicalize(local_mul_div_canonizer, name="local_mul_div_canonizer")


def _collect_add(fgraph, v, terms, state, sign=1, root=False):
    node = v.owner
    name = node.op.scalar_op.name if (
        node is not None and isinstance(node.op, Elemwise)) else None
    absorb = root or (name in ("add", "sub", "neg")
                      and _single_client(fgraph, v))
    if name == "add" and absorb:
        for i in node.inputs:
            _collect_add(fgraph, i, terms, state, sign)
        return
    if name == "sub" and absorb:
        _collect_add(fgraph, node.inputs[0], terms, state, sign)
        _collect_add(fgraph, node.inputs[1], terms, state, -sign)
        return
    if name == "neg" and absorb:
        _collect_add(fgraph, node.inputs[0], terms, state, -sign)
        return
    u = _unique_value(v)
    if u is not None and v.type.ndim == 0 and np.isfinite(u):
        state["n_const"] += 1
        state["coeff"] += sign * float(u)
        return
    terms.append((v, sign))


@node_rewriter([Elemwise])
def local_add_sub_canonizer(fgraph, node):
    """Canonicalize add/sub/neg trees: fold constants, cancel x + (-x).
    (x + 2) - (x + 1) -> 1;  (a - b) + b -> a."""
    name = node.op.scalar_op.name
    if name not in ("add", "sub"):
        return False
    out = node.outputs[0]
    if out.type.dtype.startswith(("uint", "bool")):
        return False
    terms = []
    state = {"coeff": 0.0, "n_const": 0}
    _collect_add(fgraph, out, terms, state, root=True)

    n_cancel = 0
    kept = []
    for v, s in terms:
        hit = next((k for k, (w, t) in enumerate(kept)
                    if w is v and t == -s and w.type == v.type), None)
        if hit is not None:
            del kept[hit]
            n_cancel += 1
        else:
            kept.append((v, s))

    if not (n_cancel > 0 or state["n_const"] >= 2):
        return False

    dtype = out.type.dtype
    coeff = state["coeff"]
    pos = [v for v, s in kept if s > 0]
    neg = [v for v, s in kept if s < 0]
    if coeff != 0.0:
        pos.append(constant_like(coeff, dtype))
    if not pos and not neg:
        res = _same_type_out(node, as_tensor_variable(0.0))
        return [res] if res is not None else False
    pos_expr = (pos[0] if len(pos) == 1 else tm.add(*pos)) if pos else None
    neg_expr = (neg[0] if len(neg) == 1 else tm.add(*neg)) if neg else None
    if pos_expr is None:
        res = -neg_expr
    elif neg_expr is None:
        res = pos_expr
    else:
        res = tm.sub(pos_expr, neg_expr)
    res = _same_type_out(node, res)
    return [res] if res is not None else False


register_canonicalize(local_add_sub_canonizer, name="local_add_sub_canonizer")


# ---------------------------------------------------------------------------
# exp / log family (reference rewriting/math.py stabilize rules)
# ---------------------------------------------------------------------------

@node_rewriter([Elemwise])
def local_expm1(fgraph, node):
    """exp(x) - 1 -> expm1(x) (and add(exp(x), -1))."""
    name = node.op.scalar_op.name
    if name == "sub":
        a, b = node.inputs
        if _unique_value(b) == 1 and a.owner is not None \
                and _is_ew(a.owner, "exp"):
            res = _same_type_out(node, tm.expm1(a.owner.inputs[0]))
            return [res] if res is not None else False
    elif name == "add":
        exps = [i for i in node.inputs
                if i.owner is not None and _is_ew(i.owner, "exp")]
        m1 = [i for i in node.inputs if _unique_value(i) == -1]
        if len(exps) == 1 and len(m1) == 1 and len(node.inputs) == 2:
            res = _same_type_out(node, tm.expm1(exps[0].owner.inputs[0]))
            return [res] if res is not None else False
    return False


register_stabilize(local_expm1, name="local_expm1")


@node_rewriter([Elemwise])
def local_log1mexp(fgraph, node):
    """log1p(-exp(x)) -> log1mexp(x) (stable for x <= 0)."""
    if not _is_ew(node, "log1p"):
        return False
    inner = node.inputs[0].owner
    if inner is None or not _is_ew(inner, "neg"):
        return False
    e = inner.inputs[0].owner
    if e is None or not _is_ew(e, "exp"):
        return False
    res = _same_type_out(node, tm.log1mexp(e.inputs[0]))
    return [res] if res is not None else False


register_stabilize(local_log1mexp, name="local_log1mexp")


@node_rewriter([Elemwise])
def local_log1msigm(fgraph, node):
    """log1p(-sigmoid(x)) -> -softplus(x) (the log(1-p) of a logistic)."""
    if not _is_ew(node, "log1p"):
        return False
    inner = node.inputs[0].owner
    if inner is None or not _is_ew(inner, "neg"):
        return False
    s = inner.inputs[0].owner
    if s is None or not _is_ew(s, "sigmoid"):
        return False
    res = _same_type_out(node, -tm.softplus(s.inputs[0]))
    return [res] if res is not None else False


register_stabilize(local_log1msigm, name="local_log1msigm")


@node_rewriter([Elemwise])
def local_log_sqrt(fgraph, node):
    """log(sqrt(x)) -> 0.5 * log(x)."""
    if not _is_ew(node, "log"):
        return False
    inner = node.inputs[0].owner
    if inner is None or not _is_ew(inner, "sqrt"):
        return False
    if not _single_client(fgraph, node.inputs[0]):
        return False
    x = inner.inputs[0]
    res = _same_type_out(node, 0.5 * tm.log(x))
    return [res] if res is not None else False


register_stabilize(local_log_sqrt, name="local_log_sqrt")


@node_rewriter([Elemwise])
def local_mul_exp_to_exp_add(fgraph, node):
    """exp(a) * exp(b) -> exp(a + b); exp(a) / exp(b) -> exp(a - b).
    One transcendental instead of two or three (reference
    local_mulexp2expadd / local_divexp2expsub)."""
    name = node.op.scalar_op.name
    if name == "mul":
        exps = [i for i in node.inputs
                if i.owner is not None and _is_ew(i.owner, "exp")
                and _single_client(fgraph, i)]
        if len(exps) < 2:
            return False
        rest = [i for i in node.inputs if i not in exps]
        combined = tm.exp(tm.add(*[e.owner.inputs[0] for e in exps]))
        res = combined if not rest else tm.mul(combined, *rest)
        res = _same_type_out(node, res)
        return [res] if res is not None else False
    if name == "true_div":
        a, b = node.inputs
        if (a.owner is not None and _is_ew(a.owner, "exp")
                and b.owner is not None and _is_ew(b.owner, "exp")
                and _single_client(fgraph, a) and _single_client(fgraph, b)):
            res = _same_type_out(
                node, tm.exp(a.owner.inputs[0] - b.owner.inputs[0]))
            return [res] if res is not None else False
    return False


register_specialize(local_mul_exp_to_exp_add, name="local_mul_exp_to_exp_add")


@node_rewriter([Elemwise])
def local_exp_log_nan_switch(fgraph, node):
    """exp(log(x)) -> x is domain-unsafe; exp(log1p(x)) -> 1+x likewise.
    The safe pair: sqrt(x)*sqrt(x) handled by mul_to_sqr; here do
    exp(2*log(x)) style: exp(log(x)*c) -> x**c only for c positive even?
    Not safe either — keep only exp(log(abs-like)) out.  Instead:
    exp(x)**c with constant c -> exp(c*x)."""
    if not _is_ew(node, "pow"):
        return False
    base, expo = node.inputs
    if base.owner is None or not _is_ew(base.owner, "exp"):
        return False
    if _unique_value(expo) is None:
        return False
    if not _single_client(fgraph, base):
        return False
    res = _same_type_out(node, tm.exp(expo * base.owner.inputs[0]))
    return [res] if res is not None else False


register_specialize(local_exp_log_nan_switch, name="local_pow_of_exp")


# ---------------------------------------------------------------------------
# abs / sqr / pow simplifications
# ---------------------------------------------------------------------------

@node_rewriter([Elemwise])
def local_abs_simplify(fgraph, node):
    """abs(abs(x)) -> abs(x); abs(-x) -> abs(x); abs(sqr(x)) -> sqr(x);
    abs(exp(x)) -> exp(x) (all real-dtype)."""
    if not _is_ew(node, "abs"):
        return False
    inner = node.inputs[0].owner
    if inner is None or not isinstance(inner.op, Elemwise):
        return False
    if node.inputs[0].type.dtype.startswith("complex"):
        return False
    name = inner.op.scalar_op.name
    if name == "abs":
        res = _same_type_out(node, node.inputs[0])
    elif name == "neg":
        res = _same_type_out(node, tm.abs(inner.inputs[0]))
    elif name in ("sqr", "exp", "sqrt", "softplus", "exp2", "expm1"):
        # nonnegative-range ops (expm1 >= -1 is NOT nonneg; exclude)
        if name == "expm1":
            return False
        res = _same_type_out(node, node.inputs[0])
    else:
        return False
    return [res] if res is not None else False


register_canonicalize(local_abs_simplify, name="local_abs_simplify")


@node_rewriter([Elemwise])
def local_mul_to_sqr(fgraph, node):
    """x * x -> sqr(x) (one read instead of two on the VPU)."""
    if not _is_ew(node, "mul") or len(node.inputs) != 2:
        return False
    a, b = node.inputs
    if a is not b:
        return False
    res = _same_type_out(node, tm.sqr(a))
    return [res] if res is not None else False


register_specialize(local_mul_to_sqr, name="local_mul_to_sqr")


@node_rewriter([Elemwise])
def local_pow_pow(fgraph, node):
    """(x**a)**b -> x**(a*b) for constant positive-integer a, b (the only
    composition that is domain-safe for all real x)."""
    if not _is_ew(node, "pow"):
        return False
    base, expo = node.inputs
    if base.owner is None or not _is_ew(base.owner, "pow"):
        return False
    if not _single_client(fgraph, base):
        return False
    a = _unique_value(base.owner.inputs[1])
    b = _unique_value(expo)
    if a is None or b is None:
        return False
    af, bf = float(a), float(b)
    if af <= 0 or bf <= 0 or af != int(af) or bf != int(bf):
        return False
    res = _same_type_out(
        node, tm.pow(base.owner.inputs[0],
                     constant_like(af * bf, node.outputs[0].type.dtype)))
    return [res] if res is not None else False


register_canonicalize(local_pow_pow, name="local_pow_pow")


@node_rewriter([Elemwise])
def local_sqr_of_sqrt_even_pow(fgraph, node):
    """sqr(abs(x)) -> sqr(x) (even powers ignore sign)."""
    if not _is_ew(node, "sqr"):
        return False
    inner = node.inputs[0].owner
    if inner is not None and _is_ew(inner, "abs"):
        res = _same_type_out(node, tm.sqr(inner.inputs[0]))
        return [res] if res is not None else False
    return False


register_canonicalize(local_sqr_of_sqrt_even_pow, name="local_sqr_of_abs")


# ---------------------------------------------------------------------------
# comparison / extremum / logical simplifications
# (reference rewriting/math.py local_useless_elemwise family)
# ---------------------------------------------------------------------------

@node_rewriter([Elemwise])
def local_comparison_self(fgraph, node):
    """lt(x,x)->0, gt(x,x)->0, le(x,x)->1, ge(x,x)->1."""
    name = node.op.scalar_op.name
    if name not in ("lt", "gt", "le", "ge") or len(node.inputs) != 2:
        return False
    x, y = node.inputs
    if x is not y:
        return False
    from pytensor_tpu.tensor.basic import ones_like, zeros_like

    val = ones_like if name in ("le", "ge") else zeros_like
    res = _same_type_out(node, val(x, dtype="bool"))
    return [res] if res is not None else False


register_canonicalize(local_comparison_self, name="local_comparison_self")


@node_rewriter([Elemwise])
def local_extremum_self(fgraph, node):
    """maximum(x,x) -> x; minimum(x,x) -> x."""
    name = node.op.scalar_op.name
    if name not in ("maximum", "minimum") or len(node.inputs) != 2:
        return False
    x, y = node.inputs
    if x is not y:
        return False
    res = _same_type_out(node, x)
    return [res] if res is not None else False


register_canonicalize(local_extremum_self, name="local_extremum_self")


@node_rewriter([Elemwise])
def local_extremum_inf(fgraph, node):
    """maximum(x, -inf) -> x; minimum(x, +inf) -> x; also the saturated
    duals maximum(x, +inf) -> +inf etc. for float dtypes."""
    name = node.op.scalar_op.name
    if name not in ("maximum", "minimum") or len(node.inputs) != 2:
        return False
    out = node.outputs[0]
    if not out.type.dtype.startswith("float"):
        return False
    for pos in (0, 1):
        u = _unique_value(node.inputs[pos])
        if u is None or np.isfinite(u):
            continue
        other = node.inputs[1 - pos]
        if (name == "maximum") == (float(u) < 0):
            res = _same_type_out(node, other)  # neutral element
        else:
            res = _same_type_out(node, as_tensor_variable(float(u)))
        if res is not None:
            return [res]
    return False


register_canonicalize(local_extremum_inf, name="local_extremum_inf")


@node_rewriter([Elemwise])
def local_logical_self(fgraph, node):
    """and_(x,x)->x, or_(x,x)->x, xor(x,x)->0."""
    name = node.op.scalar_op.name
    if name not in ("and_", "or_", "xor") or len(node.inputs) != 2:
        return False
    x, y = node.inputs
    if x is not y:
        return False
    from pytensor_tpu.tensor.basic import zeros_like

    res = zeros_like(x) if name == "xor" else x
    res = _same_type_out(node, res)
    return [res] if res is not None else False


register_canonicalize(local_logical_self, name="local_logical_self")


@node_rewriter([Elemwise])
def local_useless_clip(fgraph, node):
    """clip(x, -inf, +inf) -> x; one-sided infinities -> maximum/minimum."""
    if node.op.scalar_op.name != "clip":
        return False
    x, lo, hi = node.inputs
    lo_u, hi_u = _unique_value(lo), _unique_value(hi)
    lo_free = lo_u is not None and np.isneginf(float(lo_u))
    hi_free = hi_u is not None and np.isposinf(float(hi_u))
    if lo_free and hi_free:
        res = _same_type_out(node, x)
    elif lo_free:
        res = _same_type_out(node, tm.minimum(x, hi))
    elif hi_free:
        res = _same_type_out(node, tm.maximum(x, lo))
    else:
        return False
    return [res] if res is not None else False


register_canonicalize(local_useless_clip, name="local_useless_clip")


# ---------------------------------------------------------------------------
# reduction rewrites (reference local_reduce_chain / local_sum_prod_*)
# ---------------------------------------------------------------------------

_CHAINABLE_REDUCE = ("mul", "maximum", "minimum", "and_", "or_")


@node_rewriter([CAReduce])
def local_reduce_chain(fgraph, node):
    """reduce(reduce(x, a), b) -> one reduce over combined axes, for
    prod/max/min/all/any (sum handled by local_sum_sum)."""
    name = node.op.scalar_op.name
    if name not in _CHAINABLE_REDUCE:
        return False
    inner_var = node.inputs[0]
    inner = inner_var.owner
    if inner is None or not isinstance(inner.op, CAReduce):
        return False
    if inner.op.scalar_op.name != name:
        return False
    if len(fgraph.clients.get(inner_var, ())) != 1:
        return False
    x = inner.inputs[0]
    inner_axes = inner.op.axis
    outer_axes = node.op.axis
    if inner_axes is None or outer_axes is None:
        combined = None
    else:
        kept = [d for d in range(x.type.ndim) if d not in inner_axes]
        combined = tuple(sorted(set(inner_axes) | {kept[a] for a in outer_axes}))
    res = CAReduce(node.op.scalar_op, combined, node.op.dtype,
                   node.op.acc_dtype, node.op.upcast_discrete_output)(x)
    out = node.outputs[0]
    if res.type.dtype != out.type.dtype or not out.type.is_super(res.type):
        return False
    copy_stack_trace(out, res)
    return [res]


register_canonicalize(local_reduce_chain, name="local_reduce_chain")


@node_rewriter([CAReduce])
def local_extremum_of_neg(fgraph, node):
    """max(-x) -> -min(x); min(-x) -> -max(x)."""
    name = node.op.scalar_op.name
    if name not in ("maximum", "minimum"):
        return False
    inner_var = node.inputs[0]
    inner = inner_var.owner
    if inner is None or not _is_ew(inner, "neg") \
            or len(fgraph.clients.get(inner_var, ())) != 1:
        return False
    from pytensor_tpu.scalar import basic as ps

    dual = ps.minimum if name == "maximum" else ps.maximum
    s = CAReduce(dual, node.op.axis, node.op.dtype, node.op.acc_dtype,
                 node.op.upcast_discrete_output)(inner.inputs[0])
    res = _same_type_out(node, -s)
    return [res] if res is not None else False


register_specialize(local_extremum_of_neg, name="local_extremum_of_neg")


@node_rewriter([CAReduce])
def local_sum_of_alloc(fgraph, node):
    """sum(alloc(c, s0, s1, ...), axis) -> alloc(c * prod(reduced sizes),
    kept sizes) for scalar fill c: removes the materialization entirely."""
    from pytensor_tpu.tensor.basic import Alloc, alloc

    if node.op.scalar_op.name != "add":
        return False
    inner_var = node.inputs[0]
    inner = inner_var.owner
    if inner is None or not isinstance(inner.op, Alloc):
        return False
    if len(fgraph.clients.get(inner_var, ())) != 1:
        return False
    c, *shape_vars = inner.inputs
    if c.type.ndim != 0:
        return False
    ndim = len(shape_vars)
    axes = node.op.axis if node.op.axis is not None else tuple(range(ndim))
    out = node.outputs[0]
    count = None
    for a in axes:
        count = shape_vars[a] if count is None else count * shape_vars[a]
    scaled = c * cast(count, out.type.dtype) if count is not None else c
    if scaled.type.dtype != out.type.dtype:
        scaled = cast(scaled, out.type.dtype)
    kept = [shape_vars[d] for d in range(ndim) if d not in axes]
    res = alloc(scaled, *kept) if kept else scaled
    if res.type.dtype != out.type.dtype or not out.type.is_super(res.type):
        return False
    copy_stack_trace(out, res)
    return [res]


register_specialize(local_sum_of_alloc, name="local_sum_of_alloc")


@node_rewriter([CAReduce])
def local_sum_div_by_scalar(fgraph, node):
    """sum(x / c) -> sum(x) / c for 0-d c (one division instead of n)."""
    if node.op.scalar_op.name != "add":
        return False
    inner_var = node.inputs[0]
    inner = inner_var.owner
    if inner is None or not _is_ew(inner, "true_div"):
        return False
    if len(fgraph.clients.get(inner_var, ())) != 1:
        return False
    num, den = inner.inputs
    if den.type.ndim != 0:
        return False
    s = CAReduce(node.op.scalar_op, node.op.axis, node.op.dtype,
                 node.op.acc_dtype, node.op.upcast_discrete_output)(num)
    res = s / den
    out = node.outputs[0]
    if res.type.dtype != out.type.dtype:
        res = cast(res, out.type.dtype)
    if not out.type.is_super(res.type):
        return False
    copy_stack_trace(out, res)
    return [res]


register_specialize(local_sum_div_by_scalar, name="local_sum_div_by_scalar")


@node_rewriter([Elemwise])
def local_mod_self(fgraph, node):
    """mod(x, x) -> 0 (numpy convention, incl. mod(0,0)=0)."""
    if node.op.scalar_op.name != "mod" or len(node.inputs) != 2:
        return False
    x, y = node.inputs
    if x is not y:
        return False
    from pytensor_tpu.tensor.basic import zeros_like

    res = _same_type_out(node, zeros_like(x))
    return [res] if res is not None else False


register_canonicalize(local_mod_self, name="local_mod_self")


# ---------------------------------------------------------------------------
# parity (even/odd) function rules + inverse-composition identities
# ---------------------------------------------------------------------------

_EVEN_FNS = ("cos", "cosh", "sqr", "abs")
_ODD_FNS = ("sin", "tan", "sinh", "tanh", "arcsin", "arctan", "arcsinh",
            "arctanh", "erf", "sign", "cbrt")


@node_rewriter([Elemwise])
def local_even_fn_of_neg(fgraph, node):
    """f(-x) -> f(x) for even f (cos, cosh, sqr, abs)."""
    name = node.op.scalar_op.name
    if name not in _EVEN_FNS:
        return False
    inner = node.inputs[0].owner
    if inner is None or not _is_ew(inner, "neg"):
        return False
    res = _same_type_out(node, Elemwise(node.op.scalar_op)(inner.inputs[0]))
    return [res] if res is not None else False


register_canonicalize(local_even_fn_of_neg, name="local_even_fn_of_neg")


@node_rewriter([Elemwise])
def local_odd_fn_of_neg(fgraph, node):
    """f(-x) -> -f(x) for odd f: pulls the neg up where canonizers can
    cancel it."""
    name = node.op.scalar_op.name
    if name not in _ODD_FNS:
        return False
    inner = node.inputs[0].owner
    if inner is None or not _is_ew(inner, "neg"):
        return False
    res = _same_type_out(node, -Elemwise(node.op.scalar_op)(inner.inputs[0]))
    return [res] if res is not None else False


register_canonicalize(local_odd_fn_of_neg, name="local_odd_fn_of_neg")


@node_rewriter([Elemwise])
def local_inverse_composition(fgraph, node):
    """tan(arctan(x)) -> x, sinh(arcsinh(x)) -> x (total-domain inverse
    pairs only, so NaN semantics are preserved)."""
    name = node.op.scalar_op.name
    pairs = {"tan": "arctan", "sinh": "arcsinh"}
    if name not in pairs:
        return False
    inner = node.inputs[0].owner
    if inner is None or not _is_ew(inner, pairs[name]):
        return False
    res = _same_type_out(node, inner.inputs[0])
    return [res] if res is not None else False


register_canonicalize(local_inverse_composition, name="local_inverse_composition")


@node_rewriter([Elemwise])
def local_useless_floor_ceil_int(fgraph, node):
    """floor/ceil/trunc/round of an integer-dtype tensor -> identity."""
    name = node.op.scalar_op.name
    if name not in ("floor", "ceil", "trunc", "round_half_to_even"):
        return False
    x = node.inputs[0]
    if not x.type.dtype.startswith(("int", "uint", "bool")):
        return False
    res = _same_type_out(node, x)
    return [res] if res is not None else False


register_canonicalize(local_useless_floor_ceil_int,
                      name="local_useless_floor_ceil_int")


@node_rewriter([Elemwise])
def local_sign_of_sign(fgraph, node):
    """sign(sign(x)) -> sign(x)."""
    if not _is_ew(node, "sign"):
        return False
    inner = node.inputs[0].owner
    if inner is not None and _is_ew(inner, "sign"):
        res = _same_type_out(node, node.inputs[0])
        return [res] if res is not None else False
    return False


register_canonicalize(local_sign_of_sign, name="local_sign_of_sign")


@node_rewriter([CAReduce])
def local_reduce_empty_axis(fgraph, node):
    """reduce(x, axis=()) -> x (dtype-adjusted): reduces nothing."""
    if node.op.axis != ():
        return False
    x = node.inputs[0]
    res = _same_type_out(node, x)
    return [res] if res is not None else False


register_canonicalize(local_reduce_empty_axis, name="local_reduce_empty_axis")


@node_rewriter([CAReduce])
def local_sum_of_makevector(fgraph, node):
    """sum(make_vector(a, b, c)) -> a + b + c: no buffer, pure scalar
    adds."""
    from pytensor_tpu.tensor.basic import MakeVector

    if node.op.scalar_op.name != "add" or node.op.axis not in (None, (0,)):
        return False
    v = node.inputs[0]
    if v.owner is None or not isinstance(v.owner.op, MakeVector):
        return False
    if len(fgraph.clients.get(v, ())) != 1:
        return False
    elems = v.owner.inputs
    if not elems:
        return False
    res = elems[0] if len(elems) == 1 else tm.add(*elems)
    out = node.outputs[0]
    if res.type.dtype != out.type.dtype:
        res = cast(res, out.type.dtype)
    if not out.type.is_super(res.type):
        return False
    copy_stack_trace(out, res)
    return [res]


register_specialize(local_sum_of_makevector, name="local_sum_of_makevector")
