"""Softmax-family rewrites (reference tensor/rewriting/special.py:184).

The reference's softmax GRAD fusions exist to build one C kernel; on the
XLA path the inlined softmax-grad elemwise chain fuses inside the
compiler, so only the graph-semantic rules are ported: the
log(softmax) -> log_softmax stabilization and the subtensor lift
(softmax rows are independent along non-axis dims, so indexing commutes
with the op and skips computing dropped rows)."""

from __future__ import annotations

import numpy as np

from pytensor_tpu.compile.mode import register_specialize, register_stabilize
from pytensor_tpu.graph.rewriting.basic import copy_stack_trace, node_rewriter
from pytensor_tpu.tensor.elemwise import Elemwise
from pytensor_tpu.tensor.special import LogSoftmax, Softmax, log_softmax, softmax
from pytensor_tpu.tensor.subtensor import DYN, Subtensor


@node_rewriter([Elemwise])
def local_logsoftmax(fgraph, node):
    """log(softmax(x)) -> log_softmax(x): avoids the exp/normalize round
    trip and is stable for large logits (reference special.py:35)."""
    if node.op.scalar_op.name != "log":
        return False
    arg = node.inputs[0]
    if arg.owner is None or not isinstance(arg.owner.op, Softmax):
        return False
    if len(fgraph.clients.get(arg, ())) > 1:
        return False  # softmax value used elsewhere: keep it
    x = arg.owner.inputs[0]
    res = log_softmax(x, axis=arg.owner.op.axis)
    out = node.outputs[0]
    if not out.type.is_super(res.type):
        return False
    copy_stack_trace(out, res)
    return [res]


register_stabilize(local_logsoftmax, name="local_logsoftmax")


@node_rewriter([Elemwise])
def local_exp_logsoftmax(fgraph, node):
    """exp(log_softmax(x)) -> softmax(x) (reference special.py
    local_softmax_stabilize companion direction)."""
    if node.op.scalar_op.name != "exp":
        return False
    arg = node.inputs[0]
    if arg.owner is None or not isinstance(arg.owner.op, LogSoftmax):
        return False
    if len(fgraph.clients.get(arg, ())) > 1:
        return False
    x = arg.owner.inputs[0]
    res = softmax(x, axis=arg.owner.op.axis)
    out = node.outputs[0]
    if not out.type.is_super(res.type):
        return False
    copy_stack_trace(out, res)
    return [res]


register_stabilize(local_exp_logsoftmax, name="local_exp_logsoftmax")


@node_rewriter([Subtensor])
def local_subtensor_of_softmax(fgraph, node):
    """softmax(x, axis)[idx] -> softmax(x[idx], axis') when the indexed
    leading dims do not touch the softmax axis (reference
    subtensor_lift.py:610): dropped rows are never computed."""
    x = node.inputs[0]
    if x.owner is None or not isinstance(x.owner.op, (Softmax, LogSoftmax)):
        return False
    if len(fgraph.clients.get(x, ())) > 1:
        return False
    sm_op = x.owner.op
    inner = x.owner.inputs[0]
    axis = sm_op.axis
    idx_list = node.op.idx_list
    # index entries cover leading dims; they must all be BEFORE axis
    n_dropped = 0
    for d, e in enumerate(idx_list):
        if d >= axis:
            return False
        if e == DYN or isinstance(e, (int, np.integer)):
            if isinstance(e, (int, np.integer)):
                n_dropped += 1
        elif not (isinstance(e, tuple) and e[0] == "slice"):
            return False
        if e == DYN:
            n_dropped += 1  # dynamic scalar index drops the dim
    sub = Subtensor(idx_list)(inner, *node.inputs[1:])
    ctor = softmax if isinstance(sm_op, Softmax) else log_softmax
    res = ctor(sub, axis=axis - n_dropped)
    out = node.outputs[0]
    if not out.type.is_super(res.type):
        return False
    copy_stack_trace(out, res)
    return [res]


register_specialize(local_subtensor_of_softmax,
                    name="local_subtensor_of_softmax")