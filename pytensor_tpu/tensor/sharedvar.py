"""Tensor shared variables (reference tensor/sharedvar.py)."""

from __future__ import annotations

import numpy as np

from pytensor_tpu.compile.sharedvalue import SharedVariable, shared_constructor
from pytensor_tpu.tensor.type import TensorType
from pytensor_tpu.tensor.variable import _tensor_py_operators


class TensorSharedVariable(_tensor_py_operators, SharedVariable):
    __slots__ = ()


def tensor_shared_constructor(value, name=None, strict=False, allow_downcast=None,
                              borrow=False, shape=None, **kwargs):
    """Create a TensorSharedVariable from array-like data.

    Static shape defaults to fully-unknown dims (matching the reference:
    shared tensors can be resized via set_value) unless ``shape`` is given.
    """
    if type(value).__module__.startswith("jax") and hasattr(value, "dtype"):
        # keep device arrays on device (np.asarray = host round-trip);
        # jax arrays are immutable so borrow semantics are moot
        static_shape = (None,) * value.ndim if shape is None else tuple(shape)
        ttype = TensorType(str(value.dtype), static_shape)
        return TensorSharedVariable(ttype, value, strict=strict,
                                    allow_downcast=allow_downcast, name=name)
    arr = np.asarray(value)
    if shape is None:
        static_shape = (None,) * arr.ndim
    else:
        static_shape = tuple(shape)
    ttype = TensorType(str(arr.dtype), static_shape)
    return TensorSharedVariable(
        ttype, arr if borrow else arr.copy(), strict=strict,
        allow_downcast=allow_downcast, name=name,
    )


@shared_constructor.register(np.ndarray)
def _np_shared(value, name=None, strict=False, allow_downcast=None, **kwargs):
    return tensor_shared_constructor(value, name=name, strict=strict,
                                     allow_downcast=allow_downcast, **kwargs)


@shared_constructor.register(float)
@shared_constructor.register(int)
@shared_constructor.register(np.number)
def _scalar_shared(value, name=None, strict=False, allow_downcast=None, **kwargs):
    from pytensor_tpu.config import config

    if isinstance(value, np.generic):
        arr = np.asarray(value)  # keep the explicit numpy dtype
    elif isinstance(value, bool):
        arr = np.asarray(value)
    elif isinstance(value, int):
        arr = np.asarray(value, dtype="int64")
    else:
        arr = np.asarray(value, dtype=config.floatX)
    return tensor_shared_constructor(arr, name=name, strict=strict,
                                     allow_downcast=allow_downcast, **kwargs)
