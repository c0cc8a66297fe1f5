from pytensor_tpu.scalar.basic import *  # noqa: F401,F403
from pytensor_tpu.scalar import math  # noqa: F401
from pytensor_tpu.scalar.math import *  # noqa: F401,F403
from pytensor_tpu.scalar.compatnames import (  # noqa: F401
    BinaryScalarOp,
    ComplexError,
    Composite,
    IntegerDivisionError,
    NumpyAutocaster,
    ScalarType,
    UnaryScalarOp,
    _RefStyleScalarOp as ScalarOp,  # the subclassable reference-style base
    all_types,
    apply_across_args,
    as_scalar,
    autocast_float,
    autocast_float_as,
    autocast_int,
    bool,
    cast,
    complex64,
    complex128,
    complex_types,
    constant,
    continuous_types,
    convert,
    discrete_dtypes,
    discrete_types,
    float16,
    float32,
    float64,
    float_out,
    float_types,
    floor_div,
    get_scalar_type,
    int8,
    int16,
    int32,
    int64,
    int_out,
    int_types,
    integer_types,
    mod_check,
    real_out,
    round_half_away_from_zero_,
    round_half_away_from_zero_vec,
    same_out,
    same_out_float_only,
    same_out_min8,
    same_out_nobool,
    same_out_nocomplex,
    scalar_abs,
    scalar_maximum,
    scalar_minimum,
    specific_out,
    uint8,
    uint16,
    uint32,
    uint64,
    uint_types,
    upcast_out,
    upcast_out_min8,
    upcast_out_no_complex,
    upcast_out_nobool,
    upgrade_to_float,
    upgrade_to_float64,
    upgrade_to_float_no_complex,
)
from pytensor_tpu.graph.fg import FrozenFunctionGraph  # noqa: F401

# reference scalar-namespace aliases for generated per-op classes
from pytensor_tpu.scalar.basic import (  # noqa: F401
    Maximum as ScalarMaximum,
    Minimum as ScalarMinimum,
)

# reference exposes the loop op here too (scalar/loop.py ScalarLoop) —
# lazy: scalar.loop pulls in tensor.basic, which imports this package
def __getattr__(name):
    if name == "ScalarLoop":
        from pytensor_tpu.scalar.loop import ScalarLoop

        return ScalarLoop
    from pytensor_tpu.scalar import compatnames as _cn

    return getattr(_cn, name)
