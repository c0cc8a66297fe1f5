"""Dim-aware shape ops: stack/unstack/broadcast/*_like.

Parallels /root/reference/pytensor/xtensor/shape.py (Stack:22, UnStack:91,
Broadcast:539, full_like:611).  Stack merges named dims into one (the
xarray convention: the stacked dim is appended last); UnStack splits one
dim into several with given sizes.  Lowering is a transpose + reshape —
metadata-only on XLA.
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.graph.basic import Apply
from pytensor_tpu.xtensor.ops import XElemwise, XOp
from pytensor_tpu.xtensor.type import XTensorType, as_xtensor


class XStack(XOp):
    __props__ = ("new_dim", "dims")

    def __init__(self, new_dim, dims):
        self.new_dim = new_dim
        self.dims = tuple(dims)

    def make_node(self, x):
        x = as_xtensor(x)
        if not self.dims:
            raise ValueError("stack: dims must not be empty")
        if self.new_dim in self.dims:
            raise ValueError(
                f"stack: new dim {self.new_dim} must not be in {self.dims}")
        for d in self.dims:
            if d not in x.type.dims:
                raise ValueError(f"stack: unknown dim {d}")
        if self.new_dim in x.type.dims:
            raise ValueError(f"stack: dim {self.new_dim} already present")
        keep = [(d, s) for d, s in zip(x.type.dims, x.type.shape)
                if d not in self.dims]
        sizes = [x.type.shape[x.type.dims.index(d)] for d in self.dims]
        merged = None if any(s is None for s in sizes) else int(np.prod(sizes))
        out = XTensorType(x.type.dtype,
                          tuple(d for d, _ in keep) + (self.new_dim,),
                          tuple(s for _, s in keep) + (merged,))()
        return Apply(self, [x], [out])

    def lower(self, node, tensor_inputs):
        from pytensor_tpu.tensor.basic import transpose

        (t,) = tensor_inputs
        x = node.inputs[0]
        keep = [d for d in x.type.dims if d not in self.dims]
        # the stacked block keeps the dims' ORDER IN THE OPERAND, not
        # the user-given order (xarray semantics; reference
        # xtensor/rewriting/shape.py lower_stack:30 enumerates
        # stacked_axes in x.type.dims order)
        stacked = [d for d in x.type.dims if d in self.dims]
        order = [x.type.dims.index(d) for d in keep + stacked]
        t = transpose(t, order)
        shp = t.shape
        merged = 1
        for k in range(len(keep), len(order)):
            merged = merged * shp[k]
        return [t.reshape([shp[k] for k in range(len(keep))] + [merged])]


def stack(x, dim=None, **dims):
    """``stack(x, z=("a", "b"))`` merges dims a,b into new dim z."""
    m = dict(dim or {})
    m.update(dims)
    out = as_xtensor(x)
    for new_dim, ds in m.items():
        out = XStack(new_dim, tuple(ds))(out)
    return out


class XUnStack(XOp):
    __props__ = ("dim", "new_dims", "sizes")

    def __init__(self, dim, new_dims, sizes):
        self.dim = dim
        self.new_dims = tuple(new_dims)
        self.sizes = tuple(int(s) for s in sizes)

    def make_node(self, x):
        x = as_xtensor(x)
        if self.dim in self.new_dims:
            raise ValueError(
                f"unstack: dim {self.dim} can't be in {self.new_dims}")
        if self.dim not in x.type.dims:
            raise ValueError(f"unstack: unknown dim {self.dim}")
        if not set(self.new_dims).isdisjoint(
                d for d in x.type.dims if d != self.dim):
            raise ValueError(
                f"unstack: dims {self.new_dims} overlap {x.type.dims}")
        axis = x.type.dims.index(self.dim)
        old = x.type.shape[axis]
        if old is not None and old != int(np.prod(self.sizes)):
            raise ValueError(
                f"unstack: sizes {self.sizes} do not multiply to {old}")
        # the unstacked dims land at the END, after the batch dims
        # (reference xtensor/shape.py UnStack make_node:150, mirroring
        # Stack's batch+stacked layout so unstack(stack(x)) round-trips)
        keep = [(d, s) for d, s in zip(x.type.dims, x.type.shape)
                if d != self.dim]
        dims = tuple(d for d, _ in keep) + self.new_dims
        shape = tuple(s for _, s in keep) + self.sizes
        return Apply(self, [x], [XTensorType(x.type.dtype, dims, shape)()])

    def lower(self, node, tensor_inputs):
        from pytensor_tpu.tensor.basic import transpose

        (t,) = tensor_inputs
        x = node.inputs[0]
        axis = x.type.dims.index(self.dim)
        order = [k for k in range(x.type.ndim) if k != axis] + [axis]
        t = transpose(t, order)
        shp = t.shape
        new_shape = ([shp[k] for k in range(x.type.ndim - 1)]
                     + list(self.sizes))
        return [t.reshape(new_shape)]


def unstack(x, dim=None, **dims):
    """``unstack(x, z={"a": 2, "b": 3})`` splits dim z into a(2), b(3)."""
    m = dict(dim or {})
    m.update(dims)
    out = as_xtensor(x)
    for d, parts in m.items():
        out = XUnStack(d, tuple(parts.keys()), tuple(parts.values()))(out)
    return out


def broadcast(*xs, exclude=()):
    """Broadcast xtensors against each other's union of dims (reference
    Broadcast:539).  Realized through dim-name elemwise ``second`` — the
    actual expansion is whatever XLA decides (usually free)."""
    import pytensor_tpu.scalar.basic as ps

    if exclude:
        raise NotImplementedError("broadcast(exclude=...) is not supported")
    xs = [as_xtensor(x) for x in xs]
    probe = xs[0]
    for other in xs[1:]:
        probe = XElemwise(ps.second)(other, probe)
    return tuple(XElemwise(ps.second)(probe, x) for x in xs)


def full_like(x, fill_value, dtype=None):
    import pytensor_tpu.scalar.basic as ps

    x = as_xtensor(x)
    fill = as_xtensor(fill_value)
    out = XElemwise(ps.second)(x, fill)
    if dtype is not None and out.type.dtype != dtype:
        out = XElemwise(ps.cast_op(dtype))(out)
    return out


def ones_like(x, dtype=None):
    return full_like(x, 1.0, dtype=dtype or as_xtensor(x).type.dtype)


def zeros_like(x, dtype=None):
    return full_like(x, 0.0, dtype=dtype or as_xtensor(x).type.dtype)


# ---------------------------------------------------------------------------
# reference-name surface (reference xtensor/shape.py: transpose:212,
# expand_dims, squeeze, concat; class names Stack/UnStack/Concat/...)
# ---------------------------------------------------------------------------

def transpose(x, *dim, missing_dims="raise"):
    """Reorder named dims; ``...`` stands for the remaining dims in
    their original order; no dims (or only ``...``) reverses them
    (reference xtensor/shape.py:212)."""
    import warnings

    x = as_xtensor(x)
    have = tuple(x.type.dims)
    dim = tuple(dim)
    bad = [d for d in dim if d is not Ellipsis and d not in have]
    if bad:
        if missing_dims == "raise":
            raise ValueError(
                f"transpose: dims {bad} not in {have}")
        if missing_dims == "warn":
            warnings.warn(f"transpose: dims {bad} not in {have}")
        dim = tuple(d for d in dim if d is Ellipsis or d in have)
    if not dim:
        order = tuple(reversed(have))
    elif Ellipsis in dim:
        if dim.count(Ellipsis) > 1:
            raise ValueError("transpose: at most one ellipsis")
        named = [d for d in dim if d is not Ellipsis]
        rest = [d for d in have if d not in named]
        i = dim.index(Ellipsis)
        order = tuple(list(dim[:i]) + rest + list(dim[i + 1:]))
    else:
        order = dim
    from pytensor_tpu.xtensor.ops import XTranspose

    if order == have:
        return x
    return XTranspose(order)(x)


from pytensor_tpu.xtensor.ops import (  # noqa: E402,F401
    XConcat as Concat,
    XExpandDims as ExpandDims,
    XSqueeze as Squeeze,
    XTranspose as Transpose,
    concat,
    expand_dims,
    squeeze,
)

# xarray-convention aliases for the stack ops defined above; the
# reference's Broadcast Op has no class counterpart here — broadcast()
# is compositional (XElemwise alignment does the work).
Stack = XStack
UnStack = XUnStack
