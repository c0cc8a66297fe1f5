"""Shape rewrites: fold static shapes to constants.

Parallels /root/reference/pytensor/tensor/rewriting/shape.py
(ShapeFeature:70 / ShapeOptimizer:420) in effect: the local rewrites here
replace Shape/Shape_i with constants wherever the type carries static
dims, which is what makes downstream shapes trace-time concrete for XLA.
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.compile.mode import (register_canonicalize,
                                       register_specialize, register_useless)
from pytensor_tpu.graph.rewriting.basic import copy_stack_trace, node_rewriter
from pytensor_tpu.tensor.basic import MakeVector, constant
from pytensor_tpu.tensor.shape import (Reshape, Shape, Shape_i, SpecifyShape,
                                       _try_shape_entries, shape_i)
from pytensor_tpu.tensor.subtensor import DYN, Subtensor


@node_rewriter([Shape_i])
def local_shape_i_to_constant(fgraph, node):
    x = node.inputs[0]
    s = x.type.shape[node.op.i]
    if s is not None:
        return [constant(np.int64(s))]
    return False


register_canonicalize(local_shape_i_to_constant, name="local_shape_i_to_constant")


@node_rewriter([Shape])
def local_shape_to_makevector(fgraph, node):
    """Shape(x) -> MakeVector(dims): splits per-dim so static dims fold."""
    x = node.inputs[0]
    if x.type.ndim == 0:
        return [constant(np.zeros((0,), dtype="int64"))]
    if all(s is None for s in x.type.shape) and x.owner is None:
        # a graph input with fully unknown shape: Shape(x) is already
        # minimal.  When x is computed, split anyway so the per-dim
        # Shape_i entries can lift THROUGH the op (the ShapeFeature
        # propagation, reference tensor/rewriting/shape.py:70) and the
        # computation disappears from shape-only graphs.
        return False
    entries = []
    for i, s in enumerate(x.type.shape):
        if s is not None:
            entries.append(constant(np.int64(s)))
        else:
            entries.append(shape_i(x, i))
    out = MakeVector("int64")(*entries)
    copy_stack_trace(node.outputs[0], out)
    return [out]


register_canonicalize(local_shape_to_makevector, name="local_shape_to_makevector")


@node_rewriter([Subtensor])
def local_subtensor_of_shape(fgraph, node):
    """shape(x)[i] -> Shape_i(x); makevector(...)[i] -> element."""
    x = node.inputs[0]
    if len(node.op.idx_list) != 1:
        return False
    entry = node.op.idx_list[0]
    if not isinstance(entry, (int, np.integer)):
        return False
    if x.owner is None:
        return False
    if isinstance(x.owner.op, Shape):
        inner = x.owner.inputs[0]
        i = int(entry) % inner.type.ndim
        return [shape_i(inner, i)]
    if isinstance(x.owner.op, MakeVector):
        i = int(entry) % len(x.owner.inputs)
        elem = x.owner.inputs[i]
        out = node.outputs[0]
        if elem.type == out.type:
            return [elem]
        from pytensor_tpu.tensor.basic import cast

        if elem.type.ndim == 0:
            return [cast(elem, out.type.dtype)]
    return False


register_canonicalize(local_subtensor_of_shape, name="local_subtensor_of_shape")


@node_rewriter([Reshape])
def local_useless_reshape(fgraph, node):
    """reshape(x, shape-of-x) -> x when statically provable."""
    x = node.inputs[0]
    out = node.outputs[0]
    if x.type == out.type and all(s is not None for s in x.type.shape):
        return [x]
    return False


register_useless(local_useless_reshape, name="local_useless_reshape")


@node_rewriter([Reshape])
def local_reshape_reshape(fgraph, node):
    """reshape(reshape(x, s1), s2) -> reshape(x, s2)."""
    x = node.inputs[0]
    if x.owner is not None and isinstance(x.owner.op, Reshape) and \
            len(fgraph.clients.get(x, ())) == 1:
        out = Reshape(node.op.ndim)(x.owner.inputs[0], node.inputs[1])
        if out.type.is_super(node.outputs[0].type) or node.outputs[0].type.is_super(out.type):
            copy_stack_trace(node.outputs[0], out)
            if node.outputs[0].type.is_super(out.type):
                return [out]
    return False


register_canonicalize(local_reshape_reshape, name="local_reshape_reshape")


@node_rewriter([Shape_i])
def local_shape_i_through_op(fgraph, node):
    """Shape_i(op(...), i) -> the op's symbolic infer_shape entry.

    The local equivalent of the reference ShapeFeature propagation
    (tensor/rewriting/shape.py:70): shape queries bypass the computation
    (e.g. Shape_i(dot(a, b), 0) becomes Shape_i(a, 0)), which keeps shape
    arguments concrete under jit and removes dead compute.
    """
    x = node.inputs[0]
    if x.owner is None:
        return False
    op = x.owner.op
    try:
        input_shapes = [
            tuple(shape_i(inp, d) for d in range(inp.type.ndim))
            if hasattr(inp.type, "ndim") and hasattr(inp.type, "dtype")
            else None
            for inp in x.owner.inputs
        ]
        out_shapes = op.infer_shape(fgraph, x.owner, input_shapes)
    except (NotImplementedError, Exception):
        return False
    idx = x.index or 0
    if out_shapes is None or idx >= len(out_shapes):
        return False
    entry = out_shapes[idx][node.op.i]
    from pytensor_tpu.tensor.basic import as_tensor_variable, cast

    entry = as_tensor_variable(entry)
    if entry.type.dtype != "int64":
        entry = cast(entry, "int64")
    out = node.outputs[0]
    if not out.type.is_super(entry.type):
        return False
    # avoid replacing with something that still contains this very node
    copy_stack_trace(out, entry)
    return [entry]


register_canonicalize(local_shape_i_through_op, name="local_shape_i_through_op")


@node_rewriter([Reshape])
def local_reshape_to_static(fgraph, node):
    """Rebuild a Reshape whose output type has unknown dims when the shape
    entries now fold to constants (rewrites run after make_node, so types
    never retighten on their own).  Static output types feed Mosaic/XLA
    static specialization and the Pallas scan eligibility check."""
    from pytensor_tpu.tensor.basic import (NotScalarConstantError, constant,
                                           get_scalar_constant_value)

    out = node.outputs[0]
    if all(s is not None for s in out.type.shape):
        return False
    x, shp = node.inputs
    entries = _try_shape_entries(shp, node.op.ndim)
    if entries is None:
        return False
    dims = []
    for e in entries:
        try:
            dims.append(int(get_scalar_constant_value(e)))
        except NotScalarConstantError:
            return False
    if dims.count(-1) == 1 and all(s is not None for s in x.type.shape):
        total = int(np.prod(x.type.shape, initial=1))
        known = int(np.prod([d for d in dims if d != -1], initial=1))
        if known > 0 and total % known == 0:
            dims[dims.index(-1)] = total // known
    if any(d < 0 for d in dims):
        return False
    new_out = Reshape(node.op.ndim)(x, constant(np.asarray(dims, "int64")))
    if all(s is None for s in new_out.type.shape):
        return False  # nothing gained
    copy_stack_trace(out, new_out)
    return [new_out]


register_canonicalize(local_reshape_to_static, name="local_reshape_to_static")
register_specialize(local_reshape_to_static, name="local_reshape_to_static")
