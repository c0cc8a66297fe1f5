"""Labeled-dimension tensors (xarray-like front end).

Parallels /root/reference/pytensor/xtensor/ (XTensorType:46,
XTensorVariable:247, vectorization.py XElemwise:63): named dims align
automatically in arithmetic and reductions select axes by name.  All
XOps are *lowered to plain tensor ops* by the ``lower_xtensor`` pass at
the top of the rewrite pipeline (optdb position 0.09), so the backend
only ever sees tensor ops.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from pytensor_tpu.compile.sharedvalue import SharedVariable
from pytensor_tpu.graph.basic import Constant, Variable
from pytensor_tpu.graph.type import HasDataType, HasShape, Type
from pytensor_tpu.tensor.type import TensorType


class XTensorType(Type, HasDataType, HasShape):
    __props__ = ("dtype", "dims", "shape")

    def __init__(self, dtype, dims: Sequence[str], shape=None, name=None):
        self.dtype = str(dtype) if dtype != "floatX" else _floatX()
        self.dims = tuple(dims)
        if len(set(self.dims)) != len(self.dims):
            raise ValueError(f"duplicate dims {self.dims}")
        self.shape = tuple(shape) if shape is not None else (None,) * len(self.dims)
        self.name = name

    @property
    def ndim(self):
        return len(self.dims)

    @property
    def numpy_dtype(self):
        from pytensor_tpu.tensor.type import _np_dtype

        return _np_dtype(self.dtype)

    def filter(self, data, strict=False, allow_downcast=None):
        return TensorType(self.dtype, self.shape).filter(
            data, strict=strict, allow_downcast=allow_downcast
        )

    def is_super(self, otype):
        return (
            isinstance(otype, XTensorType)
            and self.dtype == otype.dtype
            and self.dims == otype.dims
            and all(s is None or s == o for s, o in zip(self.shape, otype.shape))
        )

    def values_eq_approx(self, a, b, **kwargs):
        return TensorType(self.dtype, self.shape).values_eq_approx(a, b, **kwargs)

    def __str__(self):
        pairs = ", ".join(
            f"{d}={'?' if s is None else s}" for d, s in zip(self.dims, self.shape)
        )
        return f"XTensor({self.dtype}, {pairs})"


def _floatX():
    from pytensor_tpu.config import config

    return config.floatX


class XTensorVariable(Variable):
    __slots__ = ()

    @property
    def dims(self):
        return self.type.dims

    @property
    def dtype(self):
        return self.type.dtype

    @property
    def ndim(self):
        return self.type.ndim

    # arithmetic aligns by dim names
    def _binop(self, other, scalar_op_name):
        from pytensor_tpu.scalar import basic as ps
        from pytensor_tpu.xtensor.ops import XElemwise

        op = XElemwise(getattr(ps, scalar_op_name))
        return op(self, as_xtensor(other, like=self))

    def __add__(self, other):
        return self._binop(other, "add")

    def __radd__(self, other):
        return self._binop(other, "add")

    def __sub__(self, other):
        return self._binop(other, "sub")

    def __rsub__(self, other):
        from pytensor_tpu.scalar import basic as ps
        from pytensor_tpu.xtensor.ops import XElemwise

        return XElemwise(ps.sub)(as_xtensor(other, like=self), self)

    def __mul__(self, other):
        return self._binop(other, "mul")

    def __rmul__(self, other):
        return self._binop(other, "mul")

    def __truediv__(self, other):
        return self._binop(other, "true_div")

    def __pow__(self, other):
        return self._binop(other, "pow")

    def __neg__(self):
        from pytensor_tpu.scalar import basic as ps
        from pytensor_tpu.xtensor.ops import XElemwise

        return XElemwise(ps.neg)(self)

    def exp(self):
        from pytensor_tpu.scalar import basic as ps
        from pytensor_tpu.xtensor.ops import XElemwise

        return XElemwise(ps.exp)(self)

    def log(self):
        from pytensor_tpu.scalar import basic as ps
        from pytensor_tpu.xtensor.ops import XElemwise

        return XElemwise(ps.log)(self)

    def sum(self, dim=None):
        from pytensor_tpu.xtensor.ops import XSum

        return XSum(_norm_dims(dim))(self)

    def mean(self, dim=None):
        from pytensor_tpu.xtensor.ops import XMean

        return XMean(_norm_dims(dim))(self)

    def max(self, dim=None):
        from pytensor_tpu.xtensor.ops import XMax

        return XMax(_norm_dims(dim))(self)

    def min(self, dim=None):
        from pytensor_tpu.xtensor.ops import XMin

        return XMin(_norm_dims(dim))(self)

    def transpose(self, *dims):
        from pytensor_tpu.xtensor.ops import XTranspose

        return XTranspose(tuple(dims))(self)

    def rename(self, mapping=None, **kwargs):
        from pytensor_tpu.xtensor.ops import XRename

        m = dict(mapping or {})
        m.update(kwargs)
        return XRename(tuple(sorted(m.items())))(self)

    def isel(self, indexers=None, **kwargs):
        from pytensor_tpu.xtensor.indexing import isel

        return isel(self, indexers, **kwargs)

    def __getitem__(self, idx):
        from pytensor_tpu.xtensor.indexing import index

        if not isinstance(idx, tuple):
            idx = (idx,)
        return index(self, *idx)

    def set(self, value, indexers=None, **kwargs):
        from pytensor_tpu.xtensor.indexing import index_set

        return index_set(self, indexers, value, **kwargs)

    def inc(self, value, indexers=None, **kwargs):
        from pytensor_tpu.xtensor.indexing import index_inc

        return index_inc(self, indexers, value, **kwargs)

    def prod(self, dim=None):
        from pytensor_tpu.xtensor.ops import XProd

        return XProd(_norm_dims(dim))(self)

    def std(self, dim=None, ddof=0):
        from pytensor_tpu.xtensor.ops import XStd

        return XStd(_norm_dims(dim), ddof)(self)

    def var(self, dim=None, ddof=0):
        from pytensor_tpu.xtensor.ops import XVar

        return XVar(_norm_dims(dim), ddof)(self)

    def cumsum(self, dim):
        from pytensor_tpu.xtensor.ops import XCumSum

        return XCumSum(dim)(self)

    def cumprod(self, dim):
        from pytensor_tpu.xtensor.ops import XCumProd

        return XCumProd(dim)(self)

    def all(self, dim=None):
        from pytensor_tpu.xtensor.ops import XAll

        return XAll(_norm_dims(dim))(self)

    def any(self, dim=None):
        from pytensor_tpu.xtensor.ops import XAny

        return XAny(_norm_dims(dim))(self)

    def dot(self, other):
        from pytensor_tpu.xtensor.ops import xdot

        return xdot(self, other)

    def stack(self, dim=None, **dims):
        from pytensor_tpu.xtensor.shape import stack

        return stack(self, dim, **dims)

    def unstack(self, dim=None, **dims):
        from pytensor_tpu.xtensor.shape import unstack

        return unstack(self, dim, **dims)

    def expand_dims(self, dim):
        from pytensor_tpu.xtensor.ops import expand_dims

        return expand_dims(self, dim)

    def squeeze(self, dim):
        from pytensor_tpu.xtensor.ops import squeeze

        return squeeze(self, dim)

    def broadcast_like(self, other):
        from pytensor_tpu.xtensor.shape import broadcast

        return broadcast(other, self)[1]

    def astype(self, dtype):
        from pytensor_tpu.scalar.basic import cast_op
        from pytensor_tpu.xtensor.ops import XElemwise

        return XElemwise(cast_op(str(dtype)))(self)

    def __lt__(self, other):
        return self._binop(other, "lt")

    def __le__(self, other):
        return self._binop(other, "le")

    def __gt__(self, other):
        return self._binop(other, "gt")

    def __ge__(self, other):
        return self._binop(other, "ge")

    def __mod__(self, other):
        return self._binop(other, "mod")

    def __floordiv__(self, other):
        return self._binop(other, "int_div")

    def __abs__(self):
        from pytensor_tpu.scalar import basic as ps
        from pytensor_tpu.xtensor.ops import XElemwise

        return XElemwise(ps.abs)(self)

    @property
    def values(self):
        from pytensor_tpu.xtensor.ops import tensor_from_xtensor

        return tensor_from_xtensor(self)


def _norm_dims(dim):
    if dim is None:
        return None
    if isinstance(dim, str):
        return (dim,)
    return tuple(dim)


class XTensorConstant(XTensorVariable, Constant):
    __slots__ = ()


XTensorType.variable_type = XTensorVariable
XTensorType.constant_type = XTensorConstant


def xtensor(name=None, *, dims, shape=None, dtype="floatX"):
    return XTensorType(dtype, dims, shape)(name)


def as_xtensor(x, dims=None, like=None, name=None):
    """Wrap a tensor (or scalar) as an XTensor with named dims."""
    from pytensor_tpu.xtensor.ops import xtensor_from_tensor

    if isinstance(x, XTensorVariable):
        return x
    from pytensor_tpu.tensor.basic import as_tensor_variable

    x = as_tensor_variable(x)
    if dims is None:
        if x.type.ndim == 0:
            dims = ()
        elif like is not None and x.type.ndim == like.type.ndim:
            dims = like.type.dims
        else:
            raise ValueError("as_xtensor needs dims= for non-scalar input")
    return xtensor_from_tensor(x, tuple(dims), name=name)


def xtensor_constant(x, name=None, dims=None):
    """A constant XTensor (reference xtensor/type.py:1013)."""
    import numpy as np

    data = np.asarray(x)
    if dims is None:
        if data.ndim == 0:
            dims = ()
        else:
            raise TypeError("xtensor_constant needs dims= for non-scalar")
    dims = tuple(dims)
    if len(dims) != data.ndim:
        raise TypeError(f"{len(dims)} dims for ndim-{data.ndim} value")
    return XTensorConstant(
        XTensorType(str(data.dtype), dims, data.shape), data, name=name)


class XTensorSharedVariable(XTensorVariable, SharedVariable):
    """Shared variable of XTensorType (reference xtensor/type.py:1027):
    a persistent named-dim value usable directly in xtensor graphs and
    updatable through the usual get_value/set_value/updates machinery."""

    __slots__ = ()


def xtensor_shared(x, *, name=None, dims=None, shape=None, strict=False,
                   allow_downcast=None, borrow=False):
    """SharedVariable constructor for XTensorType (reference
    xtensor/type.py:1031)."""
    import numpy as np

    data = np.array(x, copy=not borrow)
    if dims is None:
        raise TypeError("xtensor_shared needs dims=")
    dims = tuple(dims)
    if len(dims) != data.ndim:
        raise TypeError(f"{len(dims)} dims for ndim-{data.ndim} value")
    typ = XTensorType(str(data.dtype), dims,
                      tuple(shape) if shape is not None else data.shape)
    return XTensorSharedVariable(typ, data, strict=strict,
                                 allow_downcast=allow_downcast, name=name)
