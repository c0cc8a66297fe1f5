from pytensor_tpu.xtensor.type import XTensorType, as_xtensor, xtensor
from pytensor_tpu.xtensor import rewriting  # noqa: F401  (registers lower_xtensor)
from pytensor_tpu.xtensor import math  # noqa: F401
from pytensor_tpu.xtensor import linalg  # noqa: F401
from pytensor_tpu.xtensor import random  # noqa: F401
from pytensor_tpu.xtensor import signal  # noqa: F401
from pytensor_tpu.xtensor.signal import convolve1d  # noqa: F401
from pytensor_tpu.xtensor.indexing import (  # noqa: F401
    index_inc,
    index_set,
    index_update,
    isel,
)
from pytensor_tpu.xtensor.ops import concat, expand_dims, squeeze, xdot  # noqa: F401

dot = xdot


def where(cond, x, y):
    """Dim-aware ternary select."""
    import pytensor_tpu.scalar.basic as _ps

    from pytensor_tpu.xtensor.ops import XElemwise

    return XElemwise(_ps.switch)(cond, x, y)


def xtensor_constant(value, dims, name=None):
    from pytensor_tpu.xtensor.type import as_xtensor

    return as_xtensor(value, dims=dims, name=name)

from pytensor_tpu.xtensor.shape import (  # noqa: F401
    broadcast,
    full_like,
    ones_like,
    stack,
    unstack,
    zeros_like,
)

# reference-module-path aliases (plain assignment: a dotted import here
# would re-enter the parent package's lazy __getattr__ mid-init)
from pytensor_tpu.xtensor import ops as _ops_mod

basic = _ops_mod  # ref xtensor/basic.py
vectorization = _ops_mod
from pytensor_tpu.xtensor import reduction  # noqa: E402,F401
