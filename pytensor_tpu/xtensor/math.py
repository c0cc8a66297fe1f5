"""Dim-aware math: every scalar kernel lifted to XElemwise.

Parallels /root/reference/pytensor/xtensor/math.py (:19 ``_as_xelemwise``
generates one wrapper per scalar op).  Wrappers align operands by dim
*name* (not position) and broadcast over the union of dims.
"""

from __future__ import annotations

import sys

import pytensor_tpu.scalar.basic as ps
import pytensor_tpu.scalar.math as psm
from pytensor_tpu.scalar.basic import ScalarOp as _BasicScalarOp
from pytensor_tpu.xtensor.ops import XElemwise
from pytensor_tpu.xtensor.type import as_xtensor


def _as_xelemwise(scalar_op):
    def wrapper(*args):
        x_args = [a for a in args]
        return XElemwise(scalar_op)(*x_args)

    wrapper.__name__ = scalar_op.name
    wrapper.__doc__ = f"dim-aware elemwise {scalar_op.name}"
    return wrapper


_ALIASES = {
    "eq": ("equal",),
    "neq": ("not_equal",),
    "lt": ("less",),
    "le": ("less_equal",),
    "gt": ("greater",),
    "ge": ("greater_equal",),
    "and_": ("logical_and", "bitwise_and"),
    "or_": ("logical_or", "bitwise_or"),
    "xor": ("logical_xor", "bitwise_xor"),
    "invert": ("logical_not", "bitwise_not"),
    "true_div": ("divide",),
    "sub": ("subtract",),
    "mul": ("multiply",),
    "pow": ("power",),
    "neg": ("negative",),
    "psi": ("digamma",),
    "arctan2": ("arctan2",),
}

_mod = sys.modules[__name__]
for _ns in (ps, psm):
    for _name, _obj in list(vars(_ns).items()):
        if isinstance(_obj, _BasicScalarOp) and not _name.startswith("_"):
            if not hasattr(_mod, _name):
                setattr(_mod, _name, _as_xelemwise(_obj))
            for _alias in _ALIASES.get(_name, ()):
                if not hasattr(_mod, _alias):
                    setattr(_mod, _alias, getattr(_mod, _name))


where = switch  # noqa: F821  (generated wrapper; xarray name)
square = sqr  # noqa: F821
round = round_half_to_even  # noqa: F821
floor_divide = int_div  # noqa: F821
true_divide = true_div  # noqa: F821
bitwise_invert = invert  # noqa: F821


def cast(x, dtype):
    """Dim-aware dtype cast (reference xtensor/math.py cast)."""
    from pytensor_tpu.xtensor.type import as_xtensor

    return as_xtensor(x).astype(dtype)


def logsumexp(x, dim=None):
    """log(sum(exp(x), dim)) over named dims (reference math.py:533).
    Max-shifted for stability; dim-name broadcasting realigns the max."""
    from pytensor_tpu.xtensor.type import as_xtensor

    x = as_xtensor(x)
    m = x.max(dim)
    return log(exp(x - m).sum(dim)) + m  # noqa: F821


def softmax(x, dim):
    """Softmax over a named dim (dim-name broadcasting makes the reduced
    terms realign automatically)."""
    x = as_xtensor(x)
    e = exp(x - x.max(dim))  # noqa: F821  (generated wrapper)
    return e / e.sum(dim)


def dot(x, y):
    from pytensor_tpu.xtensor.ops import xdot

    return xdot(x, y)
