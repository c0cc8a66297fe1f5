"""Basic tensor rewrites: constant folding, useless-op removal.

Parallels /root/reference/pytensor/tensor/rewriting/basic.py
(constant_folding:1236 — evaluates through the host thunk at rewrite
time, registry helpers :261).
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.compile.mode import (
    register_canonicalize,
    register_specialize,
    register_useless,
)
from pytensor_tpu.graph.basic import Constant
from pytensor_tpu.graph.op import Op
from pytensor_tpu.graph.rewriting.basic import copy_stack_trace, node_rewriter
from pytensor_tpu.tensor.basic import Alloc, Join, MakeVector, Split, as_tensor_variable, cast, constant
from pytensor_tpu.tensor.elemwise import DimShuffle, Elemwise
from pytensor_tpu.tensor.shape import Reshape, SpecifyShape, Unbroadcast
from pytensor_tpu.tensor.type import TensorType
from pytensor_tpu.compile.ops import DeepCopyOp, ViewOp


@node_rewriter(None)
def constant_folding(fgraph, node):
    """Evaluate nodes whose inputs are all constants via the host oracle."""
    if not node.inputs:
        return False
    if not all(isinstance(i, Constant) for i in node.inputs):
        return False
    if not node.op.do_constant_folding(fgraph, node):
        return False
    storage = [[None] for _ in node.outputs]
    try:
        node.op.perform(node, [i.data for i in node.inputs], storage)
    except (NotImplementedError, Exception) as e:
        if isinstance(e, NotImplementedError):
            return False
        return False
    outs = []
    for o, s in zip(node.outputs, storage):
        if s[0] is None:
            return False
        try:
            c = o.type.make_constant(s[0])
        except Exception:
            return False
        copy_stack_trace(o, c)
        outs.append(c)
    return outs


register_canonicalize(constant_folding, name="constant_folding")
register_specialize(constant_folding, name="constant_folding_spec")


@node_rewriter([DimShuffle])
def local_useless_dimshuffle(fgraph, node):
    """Remove identity DimShuffles."""
    op = node.op
    if op.new_order == tuple(range(op.input_ndim)):
        return [node.inputs[0]]
    return False


register_canonicalize(local_useless_dimshuffle, name="local_useless_dimshuffle")


@node_rewriter([DimShuffle])
def local_dimshuffle_lift(fgraph, node):
    """Merge DimShuffle(DimShuffle(x)) into one DimShuffle."""
    op = node.op
    inner = node.inputs[0].owner
    if inner is None or not isinstance(inner.op, DimShuffle):
        return False
    inner_op = inner.op
    new_order = tuple(
        "x" if o == "x" else inner_op.new_order[o] for o in op.new_order
    )
    x = inner.inputs[0]
    if new_order == tuple(range(x.type.ndim)):
        return [x]
    out = DimShuffle(x.type.ndim, new_order)(x)
    copy_stack_trace(node.outputs[0], out)
    return [out]


register_canonicalize(local_dimshuffle_lift, name="local_dimshuffle_merge")


@node_rewriter([SpecifyShape])
def local_useless_specify_shape(fgraph, node):
    """Drop SpecifyShape when the input type already carries the info."""
    x = node.inputs[0]
    out = node.outputs[0]
    if x.type == out.type:
        return [x]
    return False


register_useless(local_useless_specify_shape, name="local_useless_specify_shape")


@node_rewriter([Unbroadcast])
def local_useless_unbroadcast(fgraph, node):
    x = node.inputs[0]
    if x.type == node.outputs[0].type:
        return [x]
    return False


register_useless(local_useless_unbroadcast, name="local_useless_unbroadcast")


@node_rewriter([Elemwise])
def local_useless_switch(fgraph, node):
    """switch(const, a, b) -> a or b; switch(c, x, x) -> x."""
    if node.op.scalar_op.name != "switch":
        return False
    cond, t, f = node.inputs
    out = node.outputs[0]
    if isinstance(cond, Constant):
        data = np.asarray(cond.data)
        if data.size and np.all(data == data.flat[0]):
            chosen = t if data.flat[0] else f
            chosen = _broadcast_like(chosen, out)
            if chosen is not None:
                return [chosen]
    if t is f:
        b = _broadcast_like(t, out)
        if b is not None:
            return [b]
    return False


def _broadcast_like(v, model):
    """Return v broadcast/cast to model's type, or None if not provable."""
    from pytensor_tpu.tensor import math as tm

    v = as_tensor_variable(v)
    if v.type == model.type:
        return v
    if v.type.dtype != model.type.dtype:
        v = cast(v, model.type.dtype)
    if v.type.ndim == model.type.ndim and all(
        ms is None or vs == ms for vs, ms in zip(v.type.shape, model.type.shape)
    ) and all(vs is not None for vs in v.type.shape):
        return v
    if model.type.is_super(v.type):
        return v
    # use `second` to broadcast against the model variable
    return tm.second(model, v) if _cheap(model) else None


def _cheap(model):
    # only safe to reference the model output if it's not what we're
    # replacing; use its inputs instead — conservatively bail out
    return False


register_canonicalize(local_useless_switch, name="local_useless_switch")


@node_rewriter([DeepCopyOp, ViewOp])
def local_remove_copies(fgraph, node):
    """DeepCopy/View are identities on the immutable-array XLA runtime; keep
    only if output aliasing protection matters (it does not: donation is
    explicit)."""
    return [node.inputs[0]]


register_specialize(local_remove_copies, name="local_remove_copies")


@node_rewriter([Elemwise])
def local_useless_cast(fgraph, node):
    name = node.op.scalar_op.name
    if not name.startswith("cast{"):
        return False
    x = node.inputs[0]
    if x.type.dtype == node.outputs[0].type.dtype and x.type == node.outputs[0].type:
        return [x]
    inner = x.owner
    if inner is not None and isinstance(inner.op, Elemwise) and \
            inner.op.scalar_op.name.startswith("cast{"):
        # cast(cast(x)) -> cast(x) when outer dtype wins losslessly is
        # subtle; only collapse identical casts
        if inner.op.scalar_op.name == node.op.scalar_op.name:
            return [x]
    return False


register_canonicalize(local_useless_cast, name="local_useless_cast")


@node_rewriter([Join])
def local_join_1(fgraph, node):
    """join(axis, x) -> x."""
    if len(node.inputs) == 2:
        x = node.inputs[1]
        if x.type == node.outputs[0].type:
            return [x]
    return False


register_canonicalize(local_join_1, name="local_join_1")
