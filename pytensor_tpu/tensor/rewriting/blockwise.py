"""Blockwise rewrites (reference tensor/rewriting/blockwise.py)."""

from __future__ import annotations

from pytensor_tpu.compile.mode import register_canonicalize, register_specialize
from pytensor_tpu.graph.rewriting.basic import copy_stack_trace, node_rewriter
from pytensor_tpu.tensor.blockwise import Blockwise


@node_rewriter([Blockwise])
def local_useless_blockwise(fgraph, node):
    """Blockwise(core_op) with zero batch dims -> the core op itself
    (reference local_useless_blockwise): removes the vmap wrapper so the
    core op's own lowering/rewrites apply."""
    op = node.op
    in_core, _ = op._core_ndims()
    if any(i.type.ndim != c for i, c in zip(node.inputs, in_core)):
        return False
    core_node = op.core_op.make_node(*node.inputs)
    if len(core_node.outputs) != len(node.outputs):
        return False
    for new, old in zip(core_node.outputs, node.outputs):
        if new.type.dtype != old.type.dtype or not old.type.is_super(new.type):
            return False
        copy_stack_trace(old, new)
    return core_node.outputs


register_specialize(local_useless_blockwise, name="local_useless_blockwise")
register_canonicalize(local_useless_blockwise, name="local_useless_blockwise")
