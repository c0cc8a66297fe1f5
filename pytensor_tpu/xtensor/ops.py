"""XOps: generic labeled-dim operations + boundary converters.

Parallels /root/reference/pytensor/xtensor/vectorization.py (XElemwise:63)
and the math/reduce/transpose modules.  Every XOp implements ``lower``:
build the equivalent tensor graph given tensor-typed inputs — consumed by
the lower_xtensor rewrite.
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.graph.basic import Apply
from pytensor_tpu.graph.op import Op
from pytensor_tpu.xtensor.type import XTensorType, XTensorVariable


class TensorFromXTensor(Op):
    __props__ = ()
    view_map = {0: [0]}

    def make_node(self, x):
        from pytensor_tpu.tensor.type import TensorType

        if not isinstance(x.type, XTensorType):
            raise TypeError("expected an xtensor")
        return Apply(self, [x], [TensorType(x.type.dtype, x.type.shape)()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = inputs[0]

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def L_op(self, inputs, outputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [xtensor_from_tensor(gz, x.type.dims)]


tensor_from_xtensor = TensorFromXTensor()


class XTensorFromTensor(Op):
    __props__ = ("dims",)
    view_map = {0: [0]}

    def __init__(self, dims):
        self.dims = tuple(dims)

    def make_node(self, x):
        from pytensor_tpu.tensor.basic import as_tensor_variable

        x = as_tensor_variable(x)
        if x.type.ndim != len(self.dims):
            raise TypeError(f"{len(self.dims)} dims for ndim {x.type.ndim}")
        out = XTensorType(x.type.dtype, self.dims, x.type.shape)()
        return Apply(self, [x], [out])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = inputs[0]

    def L_op(self, inputs, outputs, output_grads):
        (gz,) = output_grads
        return [tensor_from_xtensor(gz)]


def xtensor_from_tensor(x, dims, name=None):
    out = XTensorFromTensor(dims)(x)
    if name:
        out.name = name
    return out


class XOp(Op):
    """Base: ops on XTensors that lower to tensor graphs."""

    def lower(self, node, tensor_inputs):
        """Return tensor-typed outputs equivalent to this node."""
        raise NotImplementedError

    def perform(self, node, inputs, output_storage):
        raise NotImplementedError(
            f"{self} must be lowered by the lower_xtensor rewrite before "
            "execution (run with a rewriting mode)"
        )

    def L_op(self, inputs, outputs, output_grads):
        """Generic pullback: differentiate through the lowered tensor
        subgraph and rewrap with each input's dims."""
        from pytensor_tpu.gradient import DisconnectedType, pullback
        from pytensor_tpu.graph.null_type import NullType
        from pytensor_tpu.xtensor.type import XTensorType

        node = outputs[0].owner
        t_ins = [tensor_from_xtensor(i) if isinstance(i.type, XTensorType)
                 else i for i in inputs]
        t_outs = self.lower(node, t_ins)
        cots = []
        for g, o in zip(output_grads, t_outs):
            if isinstance(getattr(g, "type", None), (DisconnectedType, NullType)):
                from pytensor_tpu.tensor.basic import zeros_like

                cots.append(zeros_like(o))
            elif isinstance(g.type, XTensorType):
                cots.append(tensor_from_xtensor(g))
            else:
                cots.append(g)
        igs = pullback(list(t_outs), t_ins, cots,
                       disconnected_inputs="ignore",
                       return_disconnected="disconnected")
        res = []
        for i, ig in zip(inputs, igs):
            if isinstance(getattr(ig, "type", None), (DisconnectedType, NullType)) \
                    or not isinstance(i.type, XTensorType):
                res.append(DisconnectedType()())
            else:
                res.append(xtensor_from_tensor(ig, i.type.dims))
        return res


class XElemwise(XOp):
    __props__ = ("scalar_op",)

    def __init__(self, scalar_op):
        self.scalar_op = scalar_op

    def make_node(self, *inputs):
        from pytensor_tpu.xtensor.type import as_xtensor

        inputs = [as_xtensor(i) for i in inputs]
        # output dims: union in first-seen order
        out_dims = []
        sizes = {}
        for i in inputs:
            for d, s in zip(i.type.dims, i.type.shape):
                if d not in out_dims:
                    out_dims.append(d)
                    sizes[d] = s
                elif s is not None:
                    if sizes[d] is None:
                        sizes[d] = s
                    elif sizes[d] != s and 1 not in (sizes[d], s):
                        raise ValueError(f"dim {d} size mismatch")
        dtype = self.scalar_op.output_dtype(*(i.type.dtype for i in inputs))
        out = XTensorType(dtype, tuple(out_dims),
                          tuple(sizes[d] for d in out_dims))()
        return Apply(self, list(inputs), [out])

    def lower(self, node, tensor_inputs):
        from pytensor_tpu.tensor.elemwise import DimShuffle, Elemwise

        out_dims = node.outputs[0].type.dims
        aligned = []
        for xt_in, t_in in zip(node.inputs, tensor_inputs):
            in_dims = xt_in.type.dims
            order = ["x" if d not in in_dims else in_dims.index(d)
                     for d in out_dims]
            if order != list(range(len(in_dims))):
                t_in = DimShuffle(t_in.type.ndim, order)(t_in)
            aligned.append(t_in)
        return [Elemwise(self.scalar_op)(*aligned)]

    def __str__(self):
        return f"XElemwise{{{self.scalar_op}}}"


class XReduce(XOp):
    __props__ = ("dims",)
    reduce_fn = None

    def __init__(self, dims=None):
        self.dims = None if dims is None else tuple(dims)

    def make_node(self, x):
        from pytensor_tpu.xtensor.type import as_xtensor

        x = as_xtensor(x)
        dims = self.dims if self.dims is not None else x.type.dims
        for d in dims:
            if d not in x.type.dims:
                raise ValueError(f"unknown dim {d}")
        keep = [(d, s) for d, s in zip(x.type.dims, x.type.shape) if d not in dims]
        dtype = self._out_dtype(x.type.dtype)
        out = XTensorType(dtype, tuple(d for d, _ in keep),
                          tuple(s for _, s in keep))()
        return Apply(self, [x], [out])

    def _out_dtype(self, dtype):
        return dtype

    def lower(self, node, tensor_inputs):
        (t,) = tensor_inputs
        x = node.inputs[0]
        dims = self.dims if self.dims is not None else x.type.dims
        axes = tuple(x.type.dims.index(d) for d in dims)
        return [self._reduce(t, axes)]


class XSum(XReduce):
    def _out_dtype(self, dtype):
        if dtype in ("bool", "int8", "int16", "int32", "int64"):
            return "int64"
        if dtype.startswith("uint"):
            return "uint64"
        return dtype

    def _reduce(self, t, axes):
        from pytensor_tpu.tensor import math as tm

        return tm.sum(t, axis=list(axes))


class XMean(XReduce):
    def _out_dtype(self, dtype):
        from pytensor_tpu.config import config
        from pytensor_tpu.tensor.type import discrete_dtypes

        return config.floatX if dtype in discrete_dtypes else dtype

    def _reduce(self, t, axes):
        from pytensor_tpu.tensor import math as tm

        return tm.mean(t, axis=list(axes))


class XMax(XReduce):
    def _reduce(self, t, axes):
        from pytensor_tpu.tensor import math as tm

        return tm.max(t, axis=list(axes))


class XMin(XReduce):
    def _reduce(self, t, axes):
        from pytensor_tpu.tensor import math as tm

        return tm.min(t, axis=list(axes))


class XTranspose(XOp):
    __props__ = ("dims",)

    def __init__(self, dims):
        self.dims = tuple(dims)

    def make_node(self, x):
        from pytensor_tpu.xtensor.type import as_xtensor

        x = as_xtensor(x)
        if set(self.dims) != set(x.type.dims):
            raise ValueError(f"transpose dims {self.dims} != {x.type.dims}")
        shape = tuple(x.type.shape[x.type.dims.index(d)] for d in self.dims)
        out = XTensorType(x.type.dtype, self.dims, shape)()
        return Apply(self, [x], [out])

    def lower(self, node, tensor_inputs):
        from pytensor_tpu.tensor.basic import transpose

        (t,) = tensor_inputs
        x = node.inputs[0]
        axes = [x.type.dims.index(d) for d in self.dims]
        return [transpose(t, axes)]


class XRename(XOp):
    __props__ = ("mapping",)

    def __init__(self, mapping):
        self.mapping = tuple(mapping)

    def make_node(self, x):
        from pytensor_tpu.xtensor.type import as_xtensor

        x = as_xtensor(x)
        m = dict(self.mapping)
        new_dims = tuple(m.get(d, d) for d in x.type.dims)
        out = XTensorType(x.type.dtype, new_dims, x.type.shape)()
        return Apply(self, [x], [out])

    def lower(self, node, tensor_inputs):
        return [tensor_inputs[0]]


class XIsel(XOp):
    """Integer selection by dim name (static indices)."""

    __props__ = ("indexers",)

    def __init__(self, indexers):
        self.indexers = tuple(indexers)

    def make_node(self, x):
        from pytensor_tpu.xtensor.type import as_xtensor

        x = as_xtensor(x)
        m = dict(self.indexers)
        keep = [(d, s) for d, s in zip(x.type.dims, x.type.shape) if d not in m]
        out = XTensorType(x.type.dtype, tuple(d for d, _ in keep),
                          tuple(s for _, s in keep))()
        return Apply(self, [x], [out])

    def lower(self, node, tensor_inputs):
        (t,) = tensor_inputs
        x = node.inputs[0]
        m = dict(self.indexers)
        idx = tuple(m.get(d, slice(None)) for d in x.type.dims)
        return [t[idx]]


class XDot(XOp):
    """Contraction over shared dims (xarray dot semantics)."""

    __props__ = ()

    def make_node(self, x, y):
        from pytensor_tpu.xtensor.type import as_xtensor

        x, y = as_xtensor(x), as_xtensor(y)
        shared = [d for d in x.type.dims if d in y.type.dims]
        out_dims = [d for d in x.type.dims if d not in shared] + \
                   [d for d in y.type.dims if d not in shared]
        from pytensor_tpu.scalar.basic import upcast

        shape = tuple(
            (x.type.shape[x.type.dims.index(d)] if d in x.type.dims
             else y.type.shape[y.type.dims.index(d)])
            for d in out_dims
        )
        out = XTensorType(upcast(x.type.dtype, y.type.dtype), tuple(out_dims),
                          shape)()
        return Apply(self, [x, y], [out])

    def lower(self, node, tensor_inputs):
        from pytensor_tpu.tensor.math import tensordot

        tx, ty = tensor_inputs
        x, y = node.inputs
        shared = [d for d in x.type.dims if d in y.type.dims]
        ax = [x.type.dims.index(d) for d in shared]
        ay = [y.type.dims.index(d) for d in shared]
        return [tensordot(tx, ty, axes=[ax, ay])]


def xdot(x, y):
    return XDot()(x, y)


def _register_xla():
    from pytensor_tpu.link.xla.dispatch import xla_funcify

    @xla_funcify.register(TensorFromXTensor)
    @xla_funcify.register(XTensorFromTensor)
    def _boundary(op, node=None, **kw):
        return lambda x: x


_register_xla()


class XConcat(XOp):
    """Concatenate along a named dim — xarray semantics (reference
    xtensor/shape.py Concat:277): operands broadcast to the union of
    dims; an operand missing the concat dim contributes ONE slice; a
    concat dim absent from every operand is a NEW leading dim (stack);
    dtype is the upcast of the operand dtypes."""

    __props__ = ("dim",)

    def __init__(self, dim):
        self.dim = dim

    def make_node(self, *xs):
        from pytensor_tpu.scalar.basic import upcast
        from pytensor_tpu.xtensor.type import as_xtensor

        xs = [as_xtensor(x) for x in xs]
        dims_and_shape = {}
        for x in xs:
            for d, s in zip(x.type.dims, x.type.shape):
                if d not in dims_and_shape:
                    dims_and_shape[d] = s
                elif d == self.dim:
                    if s is None:
                        dims_and_shape[d] = None
                    elif dims_and_shape[d] is not None:
                        dims_and_shape[d] += s
                elif s is not None:
                    if dims_and_shape[d] is not None and \
                            dims_and_shape[d] != s:
                        raise ValueError(
                            f"concat: non-concatenated dim {d} has "
                            f"conflicting sizes")
                    dims_and_shape[d] = s
        if self.dim not in dims_and_shape:
            # new dim: placed first, one slice per operand
            dims_and_shape = {self.dim: len(xs)} | dims_and_shape
        elif dims_and_shape[self.dim] is not None:
            dims_and_shape[self.dim] += sum(
                1 for x in xs if self.dim not in x.type.dims)
        dims = tuple(dims_and_shape)
        shape = tuple(dims_and_shape.values())
        dtype = upcast(*[x.type.dtype for x in xs])
        out = XTensorType(dtype, dims, shape)()
        return Apply(self, list(xs), [out])

    def lower(self, node, tensor_inputs):
        from pytensor_tpu.tensor.basic import concatenate
        from pytensor_tpu.tensor.elemwise import DimShuffle
        from pytensor_tpu.tensor.extra_ops import broadcast_to
        from pytensor_tpu.tensor.shape import shape as t_shape

        out = node.outputs[0]
        out_dims = out.type.dims
        axis = out_dims.index(self.dim)
        aligned = []
        for x, t in zip(node.inputs, tensor_inputs):
            # transpose-to-order + insert size-1 for missing dims
            have = x.type.dims
            order = []
            for d in out_dims:
                order.append(have.index(d) if d in have else "x")
            t = DimShuffle(t.type.ndim, tuple(order))(t)
            # broadcast non-concat dims up to the out size
            tgt = []
            for k, d in enumerate(out_dims):
                if d == self.dim:
                    tgt.append(t.shape[k])
                elif out.type.shape[k] is not None:
                    tgt.append(int(out.type.shape[k]))
                else:
                    src = next(tt for xx, tt in zip(node.inputs,
                                                    tensor_inputs)
                               if d in xx.type.dims)
                    owner_dims = next(xx.type.dims for xx in node.inputs
                                      if d in xx.type.dims)
                    tgt.append(t_shape(src)[owner_dims.index(d)])
            t = broadcast_to(t, tuple(tgt))
            aligned.append(t)
        return [concatenate(aligned, axis=axis)]


def concat(xs, dim):
    return XConcat(dim)(*xs)


class XExpandDims(XOp):
    __props__ = ("dim",)

    def __init__(self, dim):
        self.dim = dim

    def make_node(self, x):
        from pytensor_tpu.xtensor.type import as_xtensor

        x = as_xtensor(x)
        if self.dim in x.type.dims:
            raise ValueError(f"dim {self.dim} already present")
        out = XTensorType(x.type.dtype, (self.dim, *x.type.dims),
                          (1, *x.type.shape))()
        return Apply(self, [x], [out])

    def lower(self, node, tensor_inputs):
        from pytensor_tpu.tensor.basic import shape_padleft

        return [shape_padleft(tensor_inputs[0])]


def expand_dims(x, dim):
    return XExpandDims(dim)(x)


class XSqueeze(XOp):
    __props__ = ("dim",)

    def __init__(self, dim):
        self.dim = dim

    def make_node(self, x):
        from pytensor_tpu.xtensor.type import as_xtensor

        x = as_xtensor(x)
        axis = x.type.dims.index(self.dim)
        if x.type.shape[axis] not in (1, None):
            raise ValueError(f"cannot squeeze dim {self.dim} of size "
                             f"{x.type.shape[axis]}")
        dims = tuple(d for d in x.type.dims if d != self.dim)
        shape = tuple(s for d, s in zip(x.type.dims, x.type.shape)
                      if d != self.dim)
        out = XTensorType(x.type.dtype, dims, shape)()
        return Apply(self, [x], [out])

    def lower(self, node, tensor_inputs):
        from pytensor_tpu.tensor.extra_ops import squeeze
        from pytensor_tpu.tensor.shape import specify_shape

        x = node.inputs[0]
        axis = x.type.dims.index(self.dim)
        t = tensor_inputs[0]
        if x.type.shape[axis] is None:
            shp = list(t.type.shape)
            shp[axis] = 1
            t = specify_shape(t, shp)
        return [squeeze(t, axis)]


def squeeze(x, dim):
    return XSqueeze(dim)(x)


class XProd(XReduce):
    def _out_dtype(self, dtype):
        if dtype in ("bool", "int8", "int16", "int32", "int64"):
            return "int64"
        if dtype.startswith("uint"):
            return "uint64"
        return dtype

    def _reduce(self, t, axes):
        from pytensor_tpu.tensor import math as tm

        return tm.prod(t, axis=list(axes))


class XStd(XReduce):
    __props__ = ("dims", "ddof")

    def __init__(self, dims=None, ddof=0):
        super().__init__(dims)
        self.ddof = int(ddof)

    def _out_dtype(self, dtype):
        from pytensor_tpu.config import config
        from pytensor_tpu.tensor.type import discrete_dtypes

        return config.floatX if dtype in discrete_dtypes else dtype

    def _reduce(self, t, axes):
        from pytensor_tpu.tensor import math as tm

        return tm.std(t, axis=list(axes), ddof=self.ddof)


class XVar(XStd):
    def _reduce(self, t, axes):
        from pytensor_tpu.tensor import math as tm

        return tm.var(t, axis=list(axes), ddof=self.ddof)


class XAll(XReduce):
    """Logical-and reduction over named dims (reference
    xtensor/reduction.py bool_reduce:75)."""

    def _out_dtype(self, dtype):
        return "bool"

    def _reduce(self, t, axes):
        from pytensor_tpu.tensor import math as tm

        return tm.all(tm.neq(t, 0), axis=list(axes))


class XAny(XReduce):
    def _out_dtype(self, dtype):
        return "bool"

    def _reduce(self, t, axes):
        from pytensor_tpu.tensor import math as tm

        return tm.any(tm.neq(t, 0), axis=list(axes))


class XCumProd(XOp):
    """Cumulative product along a named dim (reference
    xtensor/reduction.py cumreduce:127)."""

    __props__ = ("dim",)

    def __init__(self, dim):
        self.dim = dim

    def make_node(self, x):
        from pytensor_tpu.xtensor.type import as_xtensor

        x = as_xtensor(x)
        if self.dim not in x.type.dims:
            raise ValueError(f"cumprod: unknown dim {self.dim}")
        return Apply(self, [x], [x.type()])

    def lower(self, node, tensor_inputs):
        from pytensor_tpu.tensor.extra_ops import cumprod

        axis = node.inputs[0].type.dims.index(self.dim)
        return [cumprod(tensor_inputs[0], axis=axis)]


class XCumSum(XOp):
    """Cumulative sum along a named dim (keeps dims)."""

    __props__ = ("dim",)

    def __init__(self, dim):
        self.dim = dim

    def make_node(self, x):
        from pytensor_tpu.xtensor.type import as_xtensor

        x = as_xtensor(x)
        if self.dim not in x.type.dims:
            raise ValueError(f"cumsum: unknown dim {self.dim}")
        return Apply(self, [x], [x.type()])

    def lower(self, node, tensor_inputs):
        from pytensor_tpu.tensor.extra_ops import cumsum

        axis = node.inputs[0].type.dims.index(self.dim)
        return [cumsum(tensor_inputs[0], axis=axis)]
