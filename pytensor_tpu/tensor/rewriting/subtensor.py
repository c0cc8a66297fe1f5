"""Subtensor rewrites (reference tensor/rewriting/subtensor.py, 2.9k LoC:
useless-slice removal, subtensor merging)."""

from __future__ import annotations

import numpy as np

from pytensor_tpu.compile.mode import (register_canonicalize, register_specialize, register_useless)
from pytensor_tpu.graph.rewriting.basic import copy_stack_trace, node_rewriter
from pytensor_tpu.tensor.subtensor import (DYN, AdvancedIncSubtensor, AdvancedIncSubtensor1, IncSubtensor, Subtensor)


def _full_slice(e):
    return isinstance(e, tuple) and e == ("slice", None, None, None)


@node_rewriter([Subtensor])
def local_useless_subtensor(fgraph, node):
    """x[:, :, ...] with only full slices -> x; drop trailing full slices."""
    idx_list = node.op.idx_list
    if all(_full_slice(e) for e in idx_list):
        return [node.inputs[0]]
    # strip trailing full slices
    n = len(idx_list)
    while n > 0 and _full_slice(idx_list[n - 1]):
        n -= 1
    if n < len(idx_list):
        out = Subtensor(idx_list[:n])(*node.inputs)
        copy_stack_trace(node.outputs[0], out)
        return [out]
    return False


register_useless(local_useless_subtensor, name="local_useless_subtensor")


@node_rewriter([Subtensor])
def local_subtensor_merge(fgraph, node):
    """x[a:b][c:d] -> one Subtensor when both are static simple slices."""
    inner_var = node.inputs[0]
    if inner_var.owner is None or not isinstance(inner_var.owner.op, Subtensor):
        return False
    if len(fgraph.clients.get(inner_var, ())) != 1:
        return False
    inner_op = inner_var.owner.op
    outer_op = node.op
    # only merge single-dim static positive slices with step 1
    def simple(idx_list):
        if len(idx_list) != 1:
            return None
        e = idx_list[0]
        if not isinstance(e, tuple) or e[0] != "slice":
            return None
        _, a, b, c = e
        if c not in (None, 1) or a == DYN or b == DYN:
            return None
        if (a is not None and a < 0) or (b is not None and b < 0):
            return None
        return (a or 0, b)

    inner = simple(inner_op.idx_list)
    outer = simple(outer_op.idx_list)
    if inner is None or outer is None:
        return None
    ia, ib = inner
    oa, ob = outer
    na = ia + oa
    if ib is None:
        nb = None if ob is None else ia + ob
    else:
        nb = ib if ob is None else min(ib, ia + ob)
    out = Subtensor([("slice", na if na else None, nb, None)])(
        inner_var.owner.inputs[0]
    )
    if not node.outputs[0].type.is_super(out.type):
        return False
    copy_stack_trace(node.outputs[0], out)
    return [out]


register_canonicalize(local_subtensor_merge, name="local_subtensor_merge")


@node_rewriter([Subtensor])
def local_subtensor_of_dot(fgraph, node):
    """dot(a, b)[i_rows] -> dot(a[i_rows], b) (reference
    rewriting/subtensor.py local_subtensor_of_dot): indexing before the
    matmul shrinks the MXU work and the HBM traffic."""
    from pytensor_tpu.tensor.math import Dot, dot

    x = node.inputs[0]
    if x.owner is None or not isinstance(x.owner.op, Dot):
        return False
    if len(fgraph.clients.get(x, ())) != 1:
        return False
    a, b = x.owner.inputs
    if a.type.ndim != 2:
        return False
    idx = node.op.idx_list
    if len(idx) != 1:
        return False  # only leading-dim indexing moves cleanly
    new_a = type(node.op)(node.op.idx_list)(a, *node.inputs[1:])
    res = dot(new_a, b)
    out = node.outputs[0]
    if res.type.dtype != out.type.dtype or not out.type.is_super(res.type):
        return False
    copy_stack_trace(out, res)
    return [res]


register_specialize(local_subtensor_of_dot, name="local_subtensor_of_dot")


@node_rewriter([AdvancedIncSubtensor, AdvancedIncSubtensor1])
def local_scatter_add_to_onehot_dot(fgraph, node):
    """zeros[..., idx, ...] += y  ->  moveaxis(tensordot(y, onehot), ...)
    for a constant integer-vector index.

    TPU-specific: XLA lowers scatter-add to a serialized loop on TPU while
    a (n_idx, n_bins) one-hot contraction rides the MXU — measured 1.4-1.9x
    faster at radon-model sizes.  This is the hot pattern of every
    hierarchical-model gradient (segment-sum of per-observation grads into
    group parameters); the reference instead relies on C impls of
    AdvancedIncSubtensor1 (tensor/subtensor.py:2275)."""
    import numpy as np

    from pytensor_tpu.graph.basic import Constant
    from pytensor_tpu.tensor.basic import as_tensor_variable, moveaxis
    from pytensor_tpu.tensor.math import tensordot
    from pytensor_tpu.tensor.rewriting.math import _unique_value

    op = node.op
    if op.set_instead_of_inc or getattr(op, "ignore_duplicates", False):
        return False
    x, y, *indices = node.inputs
    out = node.outputs[0]
    if out.type.dtype not in ("float16", "bfloat16", "float32"):
        # f64 matmul is emulated on the MXU (~10x slower than the VPU
        # scatter); only fire where the one-hot contraction actually wins
        return False
    if _unique_value(x) != 0:
        return False
    if isinstance(op, AdvancedIncSubtensor1):
        axis = 0
    else:
        # exactly one dynamic entry (the integer vector), everything else a
        # full slice
        axis = None
        n_dyn = 0
        for pos, e in enumerate(op.idx_list):
            if e == DYN:
                n_dyn += 1
                axis = pos
            elif isinstance(e, tuple) and e[0] == "slice" \
                    and e[1:] == (None, None, None):
                continue
            else:
                return False
        if n_dyn != 1 or len(indices) != 1:
            return False
    idx = indices[0]
    if not isinstance(idx, Constant) or idx.type.ndim != 1 \
            or np.asarray(idx.data).dtype.kind not in "iu":
        return False
    n_bins = x.type.shape[axis]
    if n_bins is None:
        return False
    idx_v = np.asarray(idx.data)
    if idx_v.size * n_bins > 8_000_000:
        return False  # keep the embedded one-hot constant bounded
    if idx_v.min() < -n_bins or idx_v.max() >= n_bins:
        return False
    onehot = np.zeros((idx_v.size, n_bins), dtype=out.type.dtype)
    onehot[np.arange(idx_v.size), idx_v % n_bins] = 1
    oh = as_tensor_variable(onehot)
    # y has x's ndim with length n_idx at `axis` (all other entries are
    # full slices / the leading axis); contract it against the one-hot rows
    if y.type.ndim != x.type.ndim:
        return False
    res = tensordot(y, oh, axes=[[axis], [0]])
    res = moveaxis(res, -1, axis)
    if any(d is not None for d in out.type.shape):
        from pytensor_tpu.tensor.shape import specify_shape

        res = specify_shape(res, out.type.shape)
    if res.type.dtype != out.type.dtype or not out.type.is_super(res.type):
        return False
    copy_stack_trace(out, res)
    return [res]


register_specialize(local_scatter_add_to_onehot_dot,
                    name="local_scatter_add_to_onehot_dot")
