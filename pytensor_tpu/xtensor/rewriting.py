"""lower_xtensor: erase labeled dims before the backend sees the graph.

Parallels /root/reference/pytensor/xtensor/rewriting/ (lower_xtensor
EquilibriumDB registered at optdb position 0.09,
rewriting/utils.py:21-28).
"""

from __future__ import annotations

from pytensor_tpu.compile.mode import optdb
from pytensor_tpu.graph.rewriting.basic import node_rewriter
from pytensor_tpu.graph.rewriting.db import EquilibriumDB
from pytensor_tpu.xtensor.ops import (
    TensorFromXTensor,
    XOp,
    XTensorFromTensor,
    tensor_from_xtensor,
    xtensor_from_tensor,
)

lower_xtensor_db = EquilibriumDB(name="lower_xtensor")
optdb.register("lower_xtensor", lower_xtensor_db, "fast_run", "fast_compile",
               "xtensor", position=0.09)


@node_rewriter([XOp])
def lower_xop(fgraph, node):
    tensor_inputs = []
    for i in node.inputs:
        if i.owner is not None and isinstance(i.owner.op, XTensorFromTensor):
            tensor_inputs.append(i.owner.inputs[0])
        else:
            tensor_inputs.append(tensor_from_xtensor(i))
    lowered = node.op.lower(node, tensor_inputs)
    return [
        xtensor_from_tensor(t, out.type.dims)
        for t, out in zip(lowered, node.outputs)
    ]


@node_rewriter([TensorFromXTensor])
def remove_boundary_pairs(fgraph, node):
    """TensorFromXTensor(XTensorFromTensor(t)) -> t."""
    inner = node.inputs[0].owner
    if inner is not None and isinstance(inner.op, XTensorFromTensor):
        t = inner.inputs[0]
        if t.type == node.outputs[0].type or node.outputs[0].type.is_super(t.type):
            return [t]
    return False


@node_rewriter([XTensorFromTensor])
def remove_boundary_pairs_rev(fgraph, node):
    """XTensorFromTensor(TensorFromXTensor(x)) -> x when dims match."""
    inner = node.inputs[0].owner
    if inner is not None and isinstance(inner.op, TensorFromXTensor):
        x = inner.inputs[0]
        if x.type.dims == node.op.dims and node.outputs[0].type.is_super(x.type):
            return [x]
    return False


lower_xtensor_db.register("lower_xop", lower_xop, "fast_run", "fast_compile")
lower_xtensor_db.register("remove_boundary_pairs", remove_boundary_pairs,
                          "fast_run", "fast_compile")
lower_xtensor_db.register("remove_boundary_pairs_rev", remove_boundary_pairs_rev,
                          "fast_run", "fast_compile")
