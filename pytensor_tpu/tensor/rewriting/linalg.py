"""Linalg rewrites.

Parallels /root/reference/pytensor/tensor/rewriting/linalg/ (solvers.py:703
generic->structured solves — ours lives with the assumptions engine —
inverse.py:149, summary.py:258 det/logdet rules).
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.compile.mode import register_canonicalize, register_specialize, register_stabilize
from pytensor_tpu.graph.rewriting.basic import copy_stack_trace, node_rewriter
from pytensor_tpu.tensor.elemwise import Elemwise
from pytensor_tpu.tensor.linalg import (
    Cholesky,
    Det,
    MatrixInverse,
    SLogDet,
    Solve,
    slogdet,
    solve,
)
from pytensor_tpu.tensor.math import Dot


def _is_ew(node, name):
    return isinstance(node.op, Elemwise) and node.op.scalar_op.name == name


@node_rewriter([MatrixInverse])
def local_inv_inv(fgraph, node):
    """inv(inv(x)) -> x."""
    inner = node.inputs[0].owner
    if inner is not None and isinstance(inner.op, MatrixInverse):
        x = inner.inputs[0]
        if node.outputs[0].type.is_super(x.type):
            return [x]
    return False


register_canonicalize(local_inv_inv, name="local_inv_inv")


@node_rewriter([Dot])
def local_inv_as_solve(fgraph, node):
    """dot(inv(A), b) -> solve(A, b); dot(b, inv(A)) -> solve(A^T, b^T)^T.

    A direct solve is one triangular-factor pass instead of a full inverse
    followed by a matmul (reference inverse.py:149 analog).
    """
    from pytensor_tpu.tensor.basic import matrix_transpose

    x, y = node.inputs
    out = node.outputs[0]
    if x.owner is not None and isinstance(x.owner.op, MatrixInverse) \
            and len(fgraph.clients.get(x, ())) == 1:
        A = x.owner.inputs[0]
        res = solve(A, y, b_ndim=y.type.ndim)
        if out.type.is_super(res.type):
            copy_stack_trace(out, res)
            return [res]
    if y.owner is not None and isinstance(y.owner.op, MatrixInverse) \
            and len(fgraph.clients.get(y, ())) == 1 and x.type.ndim == 2:
        A = y.owner.inputs[0]
        res = matrix_transpose(
            solve(matrix_transpose(A), matrix_transpose(x), b_ndim=2)
        )
        if out.type.is_super(res.type):
            copy_stack_trace(out, res)
            return [res]
    return False


register_specialize(local_inv_as_solve, name="local_inv_as_solve")


@node_rewriter([Elemwise])
def local_log_det_to_slogdet(fgraph, node):
    """log(abs(det(A))) -> slogdet(A)[1]  (stable; avoids det overflow)."""
    if node.op.scalar_op.name != "log":
        return False
    arg = node.inputs[0].owner
    if arg is None:
        return False
    if _is_ew(arg, "abs"):
        inner = arg.inputs[0].owner
        if inner is not None and isinstance(inner.op, Det):
            res = slogdet(inner.inputs[0])[1]
            out = node.outputs[0]
            if out.type.is_super(res.type):
                copy_stack_trace(out, res)
                return [res]
    if isinstance(arg.op, Det):
        from pytensor_tpu.assumptions import FactState, holds

        if holds(arg.inputs[0], "positive_definite") == FactState.TRUE:
            res = slogdet(arg.inputs[0])[1]
            out = node.outputs[0]
            if out.type.is_super(res.type):
                copy_stack_trace(out, res)
                return [res]
    return False


register_stabilize(local_log_det_to_slogdet, name="local_log_det_to_slogdet")
