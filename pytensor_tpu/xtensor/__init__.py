from pytensor_tpu.xtensor.type import XTensorType, as_xtensor, xtensor
from pytensor_tpu.xtensor import rewriting  # noqa: F401  (registers lower_xtensor)
from pytensor_tpu.xtensor import math  # noqa: F401
from pytensor_tpu.xtensor import linalg  # noqa: F401
from pytensor_tpu.xtensor import random  # noqa: F401
from pytensor_tpu.xtensor.indexing import (  # noqa: F401
    index_inc,
    index_set,
    index_update,
    isel,
)
from pytensor_tpu.xtensor.ops import concat, expand_dims, squeeze, xdot  # noqa: F401
from pytensor_tpu.xtensor.shape import (  # noqa: F401
    broadcast,
    full_like,
    ones_like,
    stack,
    unstack,
    zeros_like,
)
