"""Dim-aware linalg (reference xtensor/linalg.py: cholesky:9, solve:43).

Matrix dims are named; everything else batches (Blockwise under the hood,
vmap on XLA).
"""

from __future__ import annotations

from pytensor_tpu.xtensor.ops import XOp
from pytensor_tpu.xtensor.type import XTensorType, as_xtensor
from pytensor_tpu.graph.basic import Apply


class XCholesky(XOp):
    __props__ = ("dims", "lower_tri")

    def __init__(self, dims, lower_tri=True):
        self.dims = tuple(dims)
        self.lower_tri = bool(lower_tri)

    def make_node(self, x):
        x = as_xtensor(x)
        d1, d2 = self.dims
        if d1 not in x.type.dims or d2 not in x.type.dims:
            raise ValueError(f"cholesky dims {self.dims} not in {x.type.dims}")
        batch = [d for d in x.type.dims if d not in self.dims]
        dims = tuple(batch) + self.dims
        shape = tuple(x.type.shape[x.type.dims.index(d)] for d in dims)
        return Apply(self, [x], [XTensorType(x.type.dtype, dims, shape)()])

    def lower(self, node, tensor_inputs):
        from pytensor_tpu.tensor.basic import transpose
        from pytensor_tpu.tensor.linalg import cholesky

        (t,) = tensor_inputs
        x = node.inputs[0]
        batch = [d for d in x.type.dims if d not in self.dims]
        order = [x.type.dims.index(d) for d in (*batch, *self.dims)]
        if order != list(range(x.type.ndim)):
            t = transpose(t, order)
        return [cholesky(t, lower=self.lower_tri)]


def cholesky(x, dims, lower=True):
    return XCholesky(tuple(dims), lower_tri=lower)(x)


class XSolve(XOp):
    __props__ = ("dims",)

    def __init__(self, dims):
        # dims = (eq_dim, unknown_dim): a has (eq, unknown), b has eq
        self.dims = tuple(dims)

    def make_node(self, a, b):
        a = as_xtensor(a)
        b = as_xtensor(b)
        eq, unk = self.dims
        if eq not in a.type.dims or unk not in a.type.dims:
            raise ValueError(f"solve dims {self.dims} not in {a.type.dims}")
        if eq not in b.type.dims:
            raise ValueError(f"rhs lacks dim {eq}")
        out_dims = tuple(unk if d == eq else d for d in b.type.dims)
        shape = []
        for d in out_dims:
            if d == unk:
                shape.append(a.type.shape[a.type.dims.index(unk)])
            else:
                shape.append(b.type.shape[b.type.dims.index(d)])
        from pytensor_tpu.scalar.basic import upcast_float, upcast

        dtype = upcast_float(upcast(a.type.dtype, b.type.dtype))
        return Apply(self, [a, b], [XTensorType(dtype, out_dims, tuple(shape))()])

    def lower(self, node, tensor_inputs):
        from pytensor_tpu.tensor.basic import moveaxis
        from pytensor_tpu.tensor.linalg import solve

        ta, tb = tensor_inputs
        a, b = node.inputs
        eq, unk = self.dims
        # bring a to (..., eq, unk); b to (..., eq)
        ia_eq, ia_unk = a.type.dims.index(eq), a.type.dims.index(unk)
        ta = moveaxis(ta, [ia_eq, ia_unk], [-2, -1])
        ib = b.type.dims.index(eq)
        tb = moveaxis(tb, [ib], [-1])
        x = solve(ta, tb, b_ndim=1)
        # move unknown dim back to where eq was in b
        out_dims = node.outputs[0].type.dims
        pos = out_dims.index(unk)
        return [moveaxis(x, [-1], [pos])]


def solve(a, b, dims):
    return XSolve(tuple(dims))(a, b)
