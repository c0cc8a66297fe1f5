from pytensor_tpu.scalar.basic import *  # noqa: F401,F403
from pytensor_tpu.scalar import math  # noqa: F401
from pytensor_tpu.scalar.math import *  # noqa: F401,F403
from pytensor_tpu.scalar.compatnames import (  # noqa: F401
    all_types,
    as_scalar,
    cast,
    constant,
    continuous_types,
    discrete_types,
    float16,
    float32,
    float64,
    floor_div,
    get_scalar_type,
    int8,
    int16,
    int32,
    int64,
    int_types,
    scalar_abs,
    scalar_maximum,
    scalar_minimum,
    uint8,
    uint16,
    uint32,
    uint64,
)
