"""Reference scalar-namespace compatibility names.

Design note (PARITY.md): this framework has no separate scalar graph
level — scalars ARE 0-d tensors, and per-op classes are instance
descriptors.  These helpers keep the reference's user-facing names
importable; C-codegen plumbing (convert_to_*, same_out/upcast_out
output-dtype helpers, c code paths) intentionally has no analog.
"""

from __future__ import annotations

import numpy as np

from pytensor_tpu.scalar.basic import (  # noqa: F401
    int_div as floor_div,
    maximum as scalar_maximum,
    minimum as scalar_minimum,
    abs as scalar_abs,
    upcast,
)


def _ctor(dtype):
    def f(name=None):
        from pytensor_tpu.tensor.type import TensorType

        return TensorType(dtype, ())(name)

    f.__name__ = dtype
    return f


bool = _ctor("bool")
int8 = _ctor("int8")
int16 = _ctor("int16")
int32 = _ctor("int32")
int64 = _ctor("int64")
uint8 = _ctor("uint8")
uint16 = _ctor("uint16")
uint32 = _ctor("uint32")
uint64 = _ctor("uint64")
float16 = _ctor("float16")
float32 = _ctor("float32")
float64 = _ctor("float64")
complex64 = _ctor("complex64")
complex128 = _ctor("complex128")

int_types = ("int8", "int16", "int32", "int64")
uint_types = ("uint8", "uint16", "uint32", "uint64")
integer_types = int_types + uint_types
float_types = ("float16", "float32", "float64")
complex_types = ("complex64", "complex128")
discrete_types = integer_types + ("bool",)
continuous_types = float_types + complex_types
all_types = discrete_types + continuous_types
discrete_dtypes = discrete_types


def as_scalar(x, name=None):
    from pytensor_tpu.tensor.basic import as_tensor_variable

    v = as_tensor_variable(x, name=name)
    if v.type.ndim != 0:
        raise TypeError("as_scalar expects a 0-d value")
    return v


def constant(value, dtype=None):
    from pytensor_tpu.tensor.basic import constant as t_constant

    return t_constant(np.asarray(value, dtype=dtype))


def cast(x, dtype):
    from pytensor_tpu.tensor.basic import cast as t_cast

    return t_cast(as_scalar(x), dtype)


def get_scalar_type(dtype):
    from pytensor_tpu.tensor.type import TensorType

    return TensorType(str(dtype), ())
