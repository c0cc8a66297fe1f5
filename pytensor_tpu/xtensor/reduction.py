"""Named-dim reductions: the reference ``xtensor/reduction.py`` surface
(reduce:61, bool_reduce:75, mean:93, var:100, std:107, cumreduce:127)
over this build's XReduce/XCumReduce op classes (``xtensor/ops.py``).

The generic entry points dispatch a scalar binary op (add/mul/maximum/
minimum/and_/or_) to the matching monoid-reduction XOp; ``dim`` accepts
a name, a sequence of names, ``None``, or ``...`` (both meaning all
dims), exactly like xarray.
"""

from __future__ import annotations

from functools import partial

from pytensor_tpu.xtensor.ops import (
    XAll,
    XAny,
    XCumProd,
    XCumSum,
    XMax,
    XMean,
    XMin,
    XProd,
    XReduce,
    XStd,
    XSum,
    XVar,
)


def _process_user_dims(x, dim):
    if isinstance(dim, str):
        return (dim,)
    if dim is None or dim is Ellipsis:
        return tuple(x.type.dims)
    return tuple(dim)


_REDUCE_BY_NAME = {
    "add": XSum,
    "mul": XProd,
    "maximum": XMax,
    "minimum": XMin,
    "and_": XAll,
    "or_": XAny,
}

_CUM_BY_NAME = {"add": XCumSum, "mul": XCumProd}


def _op_key(binary_op):
    """Accept a scalar op instance/class or its name."""
    if isinstance(binary_op, str):
        return binary_op
    name = getattr(binary_op, "name", None) or getattr(
        binary_op, "__name__", None) or str(binary_op)
    return name.lower()


def reduce(x, dim=None, *, binary_op, upcast_discrete_inp=False):
    """Monoid reduction of ``x`` over named dims.

    ``binary_op`` is a scalar binary op (or its name): add, mul,
    maximum, minimum, and_, or_ (reference xtensor/reduction.py:61).
    """
    from pytensor_tpu.xtensor.type import as_xtensor

    x = as_xtensor(x)
    key = _op_key(binary_op)
    try:
        cls = _REDUCE_BY_NAME[key]
    except KeyError:
        raise NotImplementedError(
            f"reduce with binary_op {binary_op!r}: supported ops are "
            f"{sorted(_REDUCE_BY_NAME)}") from None
    dims = _process_user_dims(x, dim)
    # upcast_discrete_inp is what sum/prod do; XSum/XProd already widen
    # discrete dtypes to 64-bit in _out_dtype, so the flag is honored
    # structurally rather than via an explicit cast node.
    return cls(dims)(x)


sum = partial(reduce, binary_op="add", upcast_discrete_inp=True)
prod = partial(reduce, binary_op="mul", upcast_discrete_inp=True)
max = partial(reduce, binary_op="maximum")
min = partial(reduce, binary_op="minimum")


def bool_reduce(x, dim=None, *, binary_op):
    """Coerce to bool (x != 0) then reduce (reference :75); the XAll /
    XAny lowerings fold the neq(x, 0) in."""
    return reduce(x, dim=dim, binary_op=binary_op)


all = partial(bool_reduce, binary_op="and_")
any = partial(bool_reduce, binary_op="or_")


def mean(x, dim=None):
    from pytensor_tpu.xtensor.type import as_xtensor

    x = as_xtensor(x)
    return XMean(_process_user_dims(x, dim))(x)


def var(x, dim=None, *, ddof=0):
    from pytensor_tpu.xtensor.type import as_xtensor

    x = as_xtensor(x)
    return XVar(_process_user_dims(x, dim), ddof=ddof)(x)


def std(x, dim=None, *, ddof=0):
    from pytensor_tpu.xtensor.type import as_xtensor

    x = as_xtensor(x)
    return XStd(_process_user_dims(x, dim), ddof=ddof)(x)


def cumreduce(x, dim, *, binary_op):
    """Cumulative monoid reduction along ONE named dim (reference
    :127; add and mul are the supported monoids, like the reference's
    cumsum/cumprod instantiations)."""
    from pytensor_tpu.xtensor.type import as_xtensor

    x = as_xtensor(x)
    key = _op_key(binary_op)
    try:
        cls = _CUM_BY_NAME[key]
    except KeyError:
        raise NotImplementedError(
            f"cumreduce with binary_op {binary_op!r}: supported ops "
            f"are {sorted(_CUM_BY_NAME)}") from None
    dims = _process_user_dims(x, dim)
    out = x
    for d in dims:
        out = cls(d)(out)
    return out


cumsum = partial(cumreduce, binary_op="add")
cumprod = partial(cumreduce, binary_op="mul")

# reference class-name aliases
XCumReduce = (XCumSum, XCumProd)

__all__ = [
    "XReduce", "XCumReduce", "reduce", "bool_reduce", "cumreduce",
    "sum", "prod", "max", "min", "all", "any", "mean", "var", "std",
    "cumsum", "cumprod",
]
